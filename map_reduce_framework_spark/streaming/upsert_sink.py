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

Exactly-once note: ``foreachBatch`` is at-least-once — after a crash
between the sink write and the offset commit, Structured Streaming
REPLAYS the last batch with the SAME batch id.  An additive MERGE would
double-count it, so the sink records the last committed batch id in a
``_committed_batch`` marker written INSIDE the ``.next`` directory
before the atomic rename (one swap commits table + marker together;
Spark's parquet reader ignores ``_``-prefixed files, like ``_SUCCESS``)
and skips any batch id at or below the marker.  That is exactly the
txn-version check a transactional table format (Delta/Iceberg) performs
under ``MERGE INTO``.  Tested across a simulated crash-during-commit in
tests/test_streaming.py (test_upsert_sink_exactly_once_across_restart).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup_stream import streaming_dedup


def _committed_batch_id(table_dir: str) -> int:
    """Last batch id whose merge the table already holds (-1 if none)."""
    marker = os.path.join(table_dir, "_committed_batch")
    if os.path.exists(marker):
        with open(marker) as fh:
            return int(fh.read().strip())
    return -1


def _merge_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    table_dir: str,
    batch_id: int | None = None,
) -> None:
    """MERGE the micro-batch's per-user partial aggregate into the keyed
    table: full outer join on the key, sum the measures.

    Pass ``batch_id`` (the foreachBatch epoch) to make the merge
    idempotent under replay: a batch id at or below the table's
    ``_committed_batch`` marker is skipped — its output is already in
    the table, and re-adding it would double-count.
    """
    if batch_id is not None and batch_id <= _committed_batch_id(table_dir):
        return  # replayed epoch: the swap that wrote it also committed it
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
    if batch_id is not None:
        with open(os.path.join(tmp, "_committed_batch"), "w") as fh:
            fh.write(str(batch_id))
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
            lambda bdf, bid: _merge_batch(spark, bdf, table_dir, batch_id=bid)
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(table_dir)
