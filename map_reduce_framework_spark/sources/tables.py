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
    """Load one star-schema table from ``{sf_dir}/{name}.parquet``."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # events.ts is TIMESTAMP(NANOS) on disk; Spark reads it as long
        # (spark.sql.legacy.parquet.nanosAsLong).  Truncate ns → µs exactly
        # like DuckDB's µs-precision TIMESTAMP so oracles agree.
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every table as a dict name → DataFrame (lazy scans)."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view so ``spark.sql`` can use them."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
