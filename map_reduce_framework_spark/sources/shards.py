"""Training-shard export: size-bounded, source-partitioned parquet + manifest.

The sink side of a pretraining data pipeline: after cleaning/dedup/
sampling, the kept corpus is exported as many bounded shards that a data
loader can schedule independently.  The two levers are Spark-native, so
the write scales with the cluster:

- ``partitionBy(source)`` → one directory per mixture source (the unit a
  loader weights at train time);
- ``maxRecordsPerFile`` → the writer rolls files at the bound, so shard
  size is capped WITHOUT a repartition: each task just splits its output.

The manifest is computed FROM the written files via Spark's hidden
``_metadata`` struct (file_path, file_size) — a distributed group-by per
shard, not a driver-side directory walk, so a million-shard export
manifests in one scan.  Loaders consume exactly this shape (path, rows,
bytes, id-range per shard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: default cap on rows per shard file (tiny for the test corpus; at real
#: scale this is set so a shard is ~256 MB-1 GB)
SHARD_MAX_RECORDS = 200


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    partition_by: str = "source",
    max_records_per_file: int = SHARD_MAX_RECORDS,
) -> None:
    """Export ``df`` as bounded parquet shards under ``out_dir``."""
    (
        df.write.mode("overwrite")
        .option("maxRecordsPerFile", str(max_records_per_file))
        .partitionBy(partition_by)
        .parquet(out_dir)
    )


def shard_manifest(
    spark: SparkSession, out_dir: str, id_col: str = "doc_id"
) -> DataFrame:
    """Per-shard manifest of a :func:`write_training_shards` output:
    (source, shard file, rows, bytes, min/max id), ordered by path."""
    df = spark.read.parquet(out_dir)
    return (
        df.select(
            "source",
            F.col("_metadata.file_path").alias("shard"),
            F.col("_metadata.file_size").alias("bytes"),
            F.col(id_col),
        )
        .groupBy("source", "shard", "bytes")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(id_col).alias("min_id"),
            F.max(id_col).alias("max_id"),
        )
        .orderBy("shard")
    )
