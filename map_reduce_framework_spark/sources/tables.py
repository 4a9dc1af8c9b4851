"""Parquet table sources for the synthetic star schema (TESTDATA.md).

The reference's only sources are an in-memory list scan
(MapReduceFramework.cpp:712-715) and a non-recursive directory listing
(Search.cpp:172-202).  The engine's primary source is columnar Parquet via
``spark.read.parquet`` — Catalyst pushes filters and prunes columns into
the scan, which is the scale path for ~100 TB inputs.  The directory-scan
source (Search parity) lives in :mod:`..operators.search_client`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one star-schema table from ``{sf_dir}/{name}.parquet``.

    Works on ANY session, not just the one built by :func:`..session.get_spark`:
    ``events.ts`` is TIMESTAMP(NANOS) on disk, which Spark rejects outright
    unless ``spark.sql.legacy.parquet.nanosAsLong`` is set.  That conf is
    runtime-settable, so we set it here (idempotent) rather than relying on
    the caller's session builder — an external caller with a vanilla session
    must still be able to read every table.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # With nanosAsLong, ts reads as a long of epoch-nanos.  Truncate
        # ns → µs exactly like DuckDB's µs-precision TIMESTAMP so oracles
        # agree.  Gate on the read dtype so a future Spark that reads nanos
        # natively (as timestamp) keeps working.
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every table as a dict name → DataFrame (lazy scans)."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view so ``spark.sql`` can use them."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
