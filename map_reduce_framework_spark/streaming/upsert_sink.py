"""foreachBatch upsert sink: streaming MERGE into a keyed parquet table.

The missing rung of the sink ladder: append/complete memory and file
sinks are built-in, but production pipelines maintain a KEYED result
table (per-user aggregates, feature stores) that each micro-batch must
MERGE into.  Structured Streaming's contract for that is
``foreachBatch``: the batch DataFrame API runs per micro-batch, and the
merge is the same full-outer-join shape as
``relational_ext.snapshot_diff`` — at scale, the table format (Delta/
Iceberg) executes exactly this join under ``MERGE INTO``; here the
"table" is a plain parquet directory swapped atomically per batch.

Exactly-once note: parquet-swap is idempotent per batch id only if the
batch's input is deterministic (availableNow from files is); a real
deployment uses a transactional table format.  The demo contract —
tested — is: after draining the doubled-delivery feed, the upserted
table equals the batch per-user aggregate of the deduped events.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup_stream import streaming_dedup


def _merge_batch(spark: SparkSession, batch_df: DataFrame, table_dir: str) -> None:
    """MERGE the micro-batch's per-user partial aggregate into the keyed
    table: full outer join on the key, sum the measures."""
    inc = batch_df.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
    )
    if os.path.exists(table_dir):
        cur = spark.read.parquet(table_dir)
        merged = (
            cur.select(
                F.col("user_id").alias("k"),
                F.col("n_events").alias("n0"),
                F.col("total_value").alias("v0"),
            )
            .join(inc, F.col("k") == F.col("user_id"), "full_outer")
            .select(
                F.coalesce("user_id", "k").alias("user_id"),
                (F.coalesce("n0", F.lit(0)) + F.coalesce("n_events", F.lit(0))).alias(
                    "n_events"
                ),
                (
                    F.coalesce("v0", F.lit(0.0))
                    + F.coalesce("total_value", F.lit(0.0))
                ).alias("total_value"),
            )
        )
    else:
        merged = inc
    tmp = table_dir + ".next"
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.exists(table_dir):
        shutil.rmtree(table_dir)
    os.rename(tmp, table_dir)


def run_upsert_sink_demo(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Drain the deduped (doubled-feed) event stream through the upsert
    sink; return the final keyed table as a DataFrame."""
    import hashlib

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    table_dir = os.path.join(tempfile.gettempdir(), f"mrfs_upsert_table_{tag}")
    if os.path.exists(table_dir):
        shutil.rmtree(table_dir)  # fresh demo run

    stream = streaming_dedup(spark, sf_dir)
    q = (
        stream.writeStream.foreachBatch(
            lambda bdf, _bid: _merge_batch(spark, bdf, table_dir)
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(table_dir)
