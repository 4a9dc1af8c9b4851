"""Streaming perceptual-media ingest — the fingerprint family's
index-GROWTH loop (round-14, closing the round-13 verdict's item 8).

:mod:`.fingerprint_stream` computes band tables on a feed;
:func:`~..operators.multimodal.dedup_media_incremental` is the BATCH
shape of "screen an incoming media batch against the ingested corpus".
This module is the missing closure: streamed media actually APPENDS to
the persisted band index with exactly-once semantics, so an item in
batch N+1 duplicating a KEPT item from batch N is caught — the
:mod:`.keeplist_stream` discipline applied to the multimodal screen.

Topology per micro-batch (``foreachBatch``):

1. redelivered doc_ids drop against the verdict table (anti-join);
2. band tables compute through the SAME builders as the batch twin
   (real PNG/WAV encode → decode → fingerprint → 4×16-bit bands);
3. the asymmetric new×old screen is the modality-scoped band-key
   equi-join at the shared lossless ham ≤ 3 verify
   (:func:`~..operators.multimodal._banded_hamming_hits` semantics);
4. KEPT items' band rows land in a per-batch growth dir
   ``b<batch_id>/`` (stable checkpoint id ⇒ overwrite-idempotent);
5. verdicts append LAST — a crash anywhere earlier leaves the batch
   fully re-runnable, and the replay excludes its OWN growth dir from
   the screen (:func:`.keeplist_stream._read_index_side`), so a torn
   growth write can never make a batch match itself.

Scale shape: the index side is a skinny (doc_id, modality, 4 ints)
parquet table — band rows, never payloads — so the per-batch screen is
an equi-join on derived band keys exactly like the batch operator; the
decode cost is map-only work on the batch side.  No counterpart in the
reference (SURVEY §2.4 extension; multimodal family, ingest axis).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import _incr_is_new
from ..operators.multimodal import (
    PHASH_BANDS,
    PHASH_MAX_HAMMING,
    audio_corpus,
    audio_delta_bands,
    image_ahash_bands,
    image_corpus,
)
from ..sources import load_table
from ..sources.tables import table_row_count
from .keeplist_stream import _DOCS_SCHEMA, _read_index_side


def _work_dir(sf_dir: str, leaf: str, stream_id: str = "default") -> str:
    """Per-(corpus, stream) working dir — single-writer per
    (sf_dir, stream_id), same contract as the keeplist twin's."""
    tag = hashlib.md5(f"{sf_dir}#{stream_id}".encode()).hexdigest()[:8]
    return os.path.join(tempfile.gettempdir(), f"mrfs_mediafp_{leaf}_{tag}")


def _batch_bands(docs: DataFrame, n_hint: int | None = None) -> DataFrame:
    """Both modalities' band tables with the size-aware fan-out the
    BATCH side can afford (a streaming frame forbids ``df.rdd``, so the
    foreachBatch path passes ``n_hint=None`` and lets the micro-batch's
    own partitioning stand)."""
    hint = n_hint // 3 if n_hint else None
    ib = image_ahash_bands(image_corpus(docs, n_hint=hint)).withColumn(
        "modality", F.lit("image")
    )
    ab = audio_delta_bands(audio_corpus(docs, n_hint=hint)).withColumn(
        "modality", F.lit("audio")
    )
    return ib.unionByName(ab)


def build_media_band_index(
    spark: SparkSession, sf_dir: str, stream_id: str = "default"
) -> dict[str, str]:
    """Materialize the corpus-side band index once: (doc_id, modality,
    b0..b3) of the already-ingested (old) partition — exactly the
    skinny table a production pipeline keeps between runs."""
    path = _work_dir(sf_dir, "bands", stream_id)
    docs = load_table(spark, sf_dir, "documents").where(~_incr_is_new())
    n = table_row_count(spark, sf_dir, "documents")
    _batch_bands(docs, n_hint=n).write.mode("overwrite").parquet(path)
    return {"bands": path}


def _mm_chunks(bands: DataFrame) -> DataFrame:
    """Band-key rows with the MODALITY embedded in the key, so the
    new×old equi-join can never pair an image with an audio item —
    the streaming equivalent of the batch twin's per-modality screens."""
    return bands.select(
        "doc_id",
        "modality",
        "b0",
        "b1",
        "b2",
        "b3",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        ":",
                        F.col("modality"),
                        F.lit(k),
                        F.col(f"b{k}").cast("string"),
                    )
                    for k in range(PHASH_BANDS)
                ]
            )
        ).alias("band_key"),
    )


def _mm_hits(new_bands: DataFrame, old_bands: DataFrame) -> DataFrame:
    """Distinct NEW (doc_id, modality) within ham ≤ 3 of any indexed
    item of the same modality — lossless-at-ham≤3 pigeonhole banding,
    identical math to the batch screen."""
    a = _mm_chunks(new_bands).alias("a")
    b = _mm_chunks(old_bands).alias("b")
    hamming = sum(
        F.bit_count(F.col(f"a.b{k}").bitwiseXOR(F.col(f"b.b{k}")))
        for k in range(PHASH_BANDS)
    )
    return (
        a.join(
            b,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (hamming <= PHASH_MAX_HAMMING),
        )
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.col("a.modality").alias("modality"),
        )
        .distinct()
    )


def _screen_media_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    index: dict[str, str],
    verdict_dir: str,
    batch_id: int = -1,
    grow: bool = True,
) -> None:
    """One micro-batch: drop redeliveries, screen vs the band index,
    GROW the index with the kept items' band rows, append verdicts.

    Exactly-once discipline (the keeplist_stream contract, same write
    order): growth dir ``b<batch_id>/`` is per-batch OVERWRITE keyed by
    the checkpoint's stable batch_id; the screen excludes the batch's
    OWN growth dir, so a crash between the growth write and the verdict
    append replays to an identical screen; verdicts append LAST behind
    the verdict-table anti-join."""
    if grow and batch_id < 0:
        raise ValueError(
            "grow=True requires the checkpoint's stable batch_id — "
            "a shared default dir would let one batch's overwrite "
            "silently delete another's appended index rows"
        )
    tag = f"b{batch_id}"
    batch = batch_df.dropDuplicates(["doc_id"])
    if os.path.exists(verdict_dir):
        seen = spark.read.parquet(verdict_dir).select("doc_id")
        batch = batch.join(seen, "doc_id", "left_anti")
    new_bands = _batch_bands(batch).persist()
    try:
        if new_bands.count() == 0:
            return
        old_bands = _read_index_side(spark, index["bands"], exclude_tag=tag)
        hits = _mm_hits(new_bands, old_bands).withColumn("is_dup", F.lit(1))
        dup = F.coalesce("is_dup", F.lit(0))
        verdicts = (
            new_bands.select("doc_id", "modality")
            .join(hits, ["doc_id", "modality"], "left")
            .select(
                "doc_id",
                "modality",
                F.when(dup == 1, "near_dup").otherwise("kept").alias(
                    "verdict"
                ),
            )
            .persist()
        )
        try:
            kept = verdicts.where(F.col("verdict") == "kept").select(
                "doc_id", "modality"
            )
            if grow and kept.count() > 0:
                (
                    new_bands.join(
                        kept, ["doc_id", "modality"], "left_semi"
                    )
                    .select("doc_id", "modality", "b0", "b1", "b2", "b3")
                    .write.mode("overwrite")
                    .parquet(os.path.join(index["bands"], tag))
                )
            verdicts.write.mode("append").parquet(verdict_dir)
        finally:
            verdicts.unpersist()
    finally:
        new_bands.unpersist()


def _doubled_new_docs_dir(spark: SparkSession, sf_dir: str) -> str:
    """Stream dir delivering every NEW document exactly twice (the
    at-least-once redelivery fixture, keeplist shape)."""
    d = _work_dir(sf_dir, "feed")
    if os.path.exists(d):
        shutil.rmtree(d)
    new_docs = (
        load_table(spark, sf_dir, "documents").where(_incr_is_new()).coalesce(1)
    )
    for name in ("a", "b"):
        new_docs.write.mode("overwrite").parquet(os.path.join(d, "_stage"))
        staged = [
            f
            for f in os.listdir(os.path.join(d, "_stage"))
            if f.endswith(".parquet")
        ]
        os.rename(
            os.path.join(d, "_stage", staged[0]),
            os.path.join(d, f"docs_{name}.parquet"),
        )
    shutil.rmtree(os.path.join(d, "_stage"))
    return d


def run_streaming_media_ingest_demo(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Build the band index, drain the doubled new-document feed one
    file per micro-batch, and return the per-modality summary in
    ``dedup_media_incremental``'s exact shape (modality, n_new, n_dup,
    n_kept) for stream-equals-batch comparison."""
    index = build_media_band_index(spark, sf_dir)
    verdict_dir = _work_dir(sf_dir, "verdicts")
    if os.path.exists(verdict_dir):
        shutil.rmtree(verdict_dir)
    feed = _doubled_new_docs_dir(spark, sf_dir)
    stream = (
        spark.readStream.schema(_DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda bdf, bid: _screen_media_batch(
                spark, bdf, index, verdict_dir, batch_id=bid
            )
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    verdicts = spark.read.parquet(verdict_dir)
    v = F.col("verdict")
    return (
        verdicts.groupBy("modality")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_new"),
            F.sum(F.when(v == "near_dup", 1).otherwise(0))
            .cast("long")
            .alias("n_dup"),
            F.sum(F.when(v == "kept", 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
        )
        .orderBy("modality")
    )
