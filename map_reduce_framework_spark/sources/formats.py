"""Source/sink format connectors beyond Parquet (SURVEY §2.4 scans/sinks).

The reference's only sink is the caller-returned list + stdout + a log file
(MapReduceFramework.cpp:764, Search.cpp:301-303); its only sources are an
in-memory list and a directory listing.  The engine adds the standard
columnar/row format matrix:

- read: parquet (primary, sources.tables), orc, csv, json, in-memory rows
- write: parquet, orc, csv, json, partitioned parquet (partitionBy)

``roundtrip_*`` helpers write a DataFrame and read it back with an explicit
schema — exercised by tests to prove both directions agree with the
original.  At scale: parquet partitioned-by is the layout primitive for
partition-pruned reads; csv/json are interchange formats (schema-explicit
reads only — inference is a correctness hazard and a full extra scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_csv(df: DataFrame, path: str) -> None:
    # header on; explicit timestamp format so the roundtrip is lossless
    df.write.mode("overwrite").option("header", "true").option(
        "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    ).csv(path)


def read_csv(spark: SparkSession, path: str, schema: str) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        .csv(path)
    )


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option(
        "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    ).json(path)


def read_json(spark: SparkSession, path: str, schema: str) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        .json(path)
    )


def write_xml(df: DataFrame, path: str, row_tag: str = "row") -> None:
    """XML sink (built into Spark 4 — the former spark-xml package).
    Same explicit timestamp format as the csv/json pair for lossless
    roundtrips."""
    df.write.mode("overwrite").format("xml").option("rowTag", row_tag).option(
        "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    ).save(path)


def read_xml(spark: SparkSession, path: str, schema: str, row_tag: str = "row") -> DataFrame:
    return (
        spark.read.schema(schema)
        .format("xml")
        .option("rowTag", row_tag)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        .load(path)
    )


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink (Spark-native columnar alternative to parquet; same
    predicate-pushdown/column-pruning machinery at scale)."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Raw-file source (``binaryFile``): one row per file with
    ``(path, modificationTime, length, content binary)`` — the ingest
    source for multimodal corpora (images/audio/video land as files;
    this reader turns a bucket prefix into the ``payload`` column that
    ``operators/multimodal.py`` processes).  At 100 TB the listing
    parallelizes over prefixes and ``pathGlobFilter`` prunes by
    extension before any byte is read."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def write_text_lines(df: DataFrame, path: str, column: str = "text") -> None:
    """Raw text-lines sink: one line per row from a single string column
    (the one-document-per-line corpus layout; compression via the usual
    codec options at scale)."""
    df.select(column).write.mode("overwrite").text(path)


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """Raw text-lines source: ``value`` column, one row per line — the
    ingest reader for plain-text corpora (C4/OSCAR-style dumps land as
    line-oriented text; JSONL goes through :func:`read_json` instead).
    Splits parallelize per file block exactly like any text-based
    source."""
    return spark.read.text(path)


def read_jsonl_audited(
    spark: SparkSession, path: str, schema: str
) -> DataFrame:
    """Permissive JSONL reader with corrupt-record capture: malformed
    lines land in ``_corrupt_record`` instead of failing the job or
    being silently dropped — real crawl dumps always contain breakage,
    and an ingest step must account for every input line.  Pair with a
    ``_corrupt_record IS NOT NULL`` split to route rejects to a
    quarantine sink."""
    return (
        spark.read.schema(schema + ", _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
