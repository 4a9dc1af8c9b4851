"""Streaming demo correctness: the availableNow streaming aggregation
must equal the batch events_time_window on the same data."""

from __future__ import annotations

import os

from map_reduce_framework_spark.operators.relational import events_time_window
from map_reduce_framework_spark.streaming import run_events_stream_demo

from .conftest import SF_DIR


def test_streaming_matches_batch(spark):
    stream_rows = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in run_events_stream_demo(spark, SF_DIR).collect()
    }
    batch_rows = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in events_time_window(spark, SF_DIR).collect()
    }
    assert stream_rows == batch_rows


def test_stateful_user_stats_matches_batch(spark):
    from pyspark.sql import functions as F

    from map_reduce_framework_spark.sources import load_table
    from map_reduce_framework_spark.streaming.stateful import run_user_stats_demo

    got = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 6))
        for r in run_user_stats_demo(spark, SF_DIR).collect()
    }
    want = {
        r["user_id"]: (r["n"], round(r["tv"], 6))
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == want[u][0]
        assert abs(got[u][1] - want[u][1]) < 1e-6


def test_streaming_session_windows_match_batch(spark):
    """The watermarked streaming session_window aggregation must equal
    the batch twin row-for-row."""
    from map_reduce_framework_spark.operators.relational_ext import (
        session_window_agg,
    )
    from map_reduce_framework_spark.streaming.session_stream import (
        run_session_stream_demo,
    )

    key = lambda r: (  # noqa: E731
        r["user_id"],
        r["session_start"],
        r["session_end"],
        r["n_events"],
        r["sum_value"],
    )
    got = sorted(map(key, run_session_stream_demo(spark, SF_DIR).collect()))
    want = sorted(map(key, session_window_agg(spark, SF_DIR).collect()))
    assert got == want and len(got) > 0


def test_streaming_dedup_exactly_once(spark):
    """dropDuplicatesWithinWatermark over a doubled feed (every event
    delivered twice) must yield exactly the batch DISTINCT rows."""
    from map_reduce_framework_spark.sources import load_table
    from map_reduce_framework_spark.streaming.dedup_stream import (
        run_streaming_dedup_demo,
    )

    got = run_streaming_dedup_demo(spark, SF_DIR)
    batch = load_table(spark, SF_DIR, "events")
    assert got.count() == batch.count()  # every duplicate dropped
    s_ids = sorted(r["event_id"] for r in got.select("event_id").collect())
    b_ids = sorted(r["event_id"] for r in batch.select("event_id").collect())
    assert s_ids == b_ids


def test_upsert_sink_equals_batch_aggregate(spark):
    """foreachBatch MERGE sink: after draining the doubled feed through
    streaming dedup + per-user upsert, the keyed table must equal the
    batch per-user aggregate over the (unduplicated) events."""
    from pyspark.sql import functions as F

    from map_reduce_framework_spark.sources import load_table
    from map_reduce_framework_spark.streaming.upsert_sink import (
        run_upsert_sink_demo,
    )

    got = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 6))
        for r in run_upsert_sink_demo(spark, SF_DIR).collect()
    }
    want = {
        r["user_id"]: (r["n"], round(r["tv"], 6))
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == want[u][0]
        assert abs(got[u][1] - want[u][1]) < 1e-6


def test_stream_stream_interval_join_equals_batch(spark):
    """The watermarked stream-stream join must emit exactly the batch
    interval join's pairs (availableNow drains the backlog once)."""
    from map_reduce_framework_spark.operators.relational_ext import (
        events_interval_join,
    )
    from map_reduce_framework_spark.streaming.interval_join import (
        run_interval_join_demo,
    )

    streamed = run_interval_join_demo(spark, SF_DIR)
    batch = events_interval_join(spark, SF_DIR)
    key = lambda r: (r["purchase_id"], r["click_id"])  # noqa: E731
    s_rows = sorted(map(key, streamed.collect()))
    b_rows = sorted(map(key, batch.collect()))
    assert s_rows == b_rows and len(s_rows) > 0


def test_stream_stream_interval_join_multi_batch(spark, tmp_path):
    """Same contract across MULTIPLE micro-batches: split events into 4
    time-ordered files, force maxFilesPerTrigger=1 (4 batches under
    availableNow), and the join must still equal the batch twin — this is
    what the 7-hour click-side watermark (6 h join range + 1 h disorder)
    guarantees.  With the old 1-hour click watermark, clicks 1-6 h older
    than the advancing purchase watermark would be expired/dropped across
    batch boundaries and pairs would go missing."""
    import pyarrow.parquet as pq

    from map_reduce_framework_spark.operators.relational_ext import (
        events_interval_join,
    )
    from map_reduce_framework_spark.streaming.interval_join import (
        run_interval_join_demo,
    )

    t = pq.read_table(f"{SF_DIR}/events.parquet")
    t = t.sort_by("ts")
    n = t.num_rows
    ds_dir = tmp_path / "events.parquet"
    ds_dir.mkdir()
    for i in range(4):
        chunk = t.slice(i * n // 4, (i + 1) * n // 4 - i * n // 4)
        path = ds_dir / f"part-{i}.parquet"
        pq.write_table(chunk, path)
        # FileStreamSource orders files by MODIFICATION TIME; four
        # writes can land inside one mtime tick under load, and a tie
        # processed out of order silently breaks every order-dependent
        # cross-batch fold (the one full-suite flake round 11 caught).
        # Pin strictly increasing mtimes so batch order IS chunk order.
        mt = os.stat(path).st_mtime + 10.0 * (i + 1)
        os.utime(path, (mt, mt))

    streamed = run_interval_join_demo(
        spark,
        str(tmp_path),
        table="interval_join_multibatch",
        stream_dir=str(ds_dir),
        max_files_per_trigger=1,
    )
    batch = events_interval_join(spark, str(tmp_path))
    key = lambda r: (r["purchase_id"], r["click_id"])  # noqa: E731
    s_rows = sorted(map(key, streamed.collect()))
    b_rows = sorted(map(key, batch.collect()))
    assert s_rows == b_rows and len(s_rows) > 0


def test_stream_static_join_equals_batch(spark):
    """The stream-static broadcast enrichment must equal its batch twin
    row-for-row (availableNow drains the backlog once)."""
    from map_reduce_framework_spark.operators.relational_ext import (
        events_user_enrichment,
    )
    from map_reduce_framework_spark.streaming.static_join import (
        run_static_join_demo,
    )

    streamed = run_static_join_demo(spark, SF_DIR)
    batch = events_user_enrichment(spark, SF_DIR)
    key = lambda r: (r["event_type"], r["first_day"], r["n_events"])  # noqa: E731
    assert sorted(map(key, streamed.collect())) == sorted(
        map(key, batch.collect())
    )


def test_streaming_arrow_scoring_equals_batch(spark):
    """The Arrow-kernel (mapInPandas) scoring pipeline must produce the
    same per-language profile when fed by readStream as by the batch
    reader — the builder function is literally shared."""
    from map_reduce_framework_spark.streaming.scoring_stream import (
        batch_twin,
        run_scoring_stream_demo,
    )

    streamed = run_scoring_stream_demo(spark, SF_DIR)
    batch = batch_twin(spark, SF_DIR)
    key = lambda r: (r["lang"], r["n_docs"], r["avg_quality"])  # noqa: E731
    assert sorted(map(key, streamed.collect())) == sorted(
        map(key, batch.collect())
    )


def test_streaming_keeplist_equals_batch_incremental(spark):
    """The foreachBatch incremental-dedup loop (screen each micro-batch
    vs the materialized corpus index, MERGE verdicts) must reproduce
    ``dedup_incremental``'s per-source summary exactly, even though the
    feed delivers every new document twice across two micro-batches
    (redelivery idempotence comes from the verdict-table anti-join)."""
    from map_reduce_framework_spark.operators.dedup import dedup_incremental
    from map_reduce_framework_spark.streaming.keeplist_stream import (
        run_streaming_keeplist_demo,
    )

    streamed = run_streaming_keeplist_demo(spark, SF_DIR)
    batch = dedup_incremental(spark, SF_DIR)
    key = lambda r: tuple(r[c] for c in (  # noqa: E731
        "source", "n_new", "n_exact_dup", "n_near_dup", "n_kept"))
    s_rows = sorted(map(key, streamed.collect()))
    b_rows = sorted(map(key, batch.collect()))
    assert s_rows == b_rows and len(s_rows) > 0


def test_streaming_keeplist_exactly_once_across_restart(spark, tmp_path):
    """Kill-and-resume (round-6 verdict item 5): drain file A with a
    checkpoint; simulate a crash BETWEEN the sink write and the offset
    commit by deleting the batch-0 commit marker; restart — Spark
    REPLAYS batch 0 against a verdict table that already holds its
    output; then deliver the redelivered copy B and resume from the
    same checkpoint.  Verdicts must be exactly-once end to end: one row
    per doc_id, summary equal to the batch twin."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from map_reduce_framework_spark.operators.dedup import (
        _incr_is_new,
        dedup_incremental,
    )
    from map_reduce_framework_spark.sources import load_table
    from map_reduce_framework_spark.streaming import keeplist_stream as ks

    index = ks.build_corpus_index(spark, SF_DIR)
    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    verdict_dir = str(tmp_path / "verdicts")
    os.makedirs(feed)

    new_docs = (
        load_table(spark, SF_DIR, "documents").where(_incr_is_new()).coalesce(1)
    )

    def deliver(name: str) -> None:
        stage = str(tmp_path / "_stage")
        new_docs.write.mode("overwrite").parquet(stage)
        part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
        os.rename(os.path.join(stage, part), os.path.join(feed, name))
        shutil.rmtree(stage)

    def drain() -> None:
        stream = (
            spark.readStream.schema(ks._DOCS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda bdf, bid: ks._screen_batch(
                    spark, bdf, index, verdict_dir, batch_id=bid
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    deliver("docs_a.parquet")
    drain()
    n_docs = spark.read.parquet(verdict_dir).count()
    assert n_docs > 0

    # crash-during-commit: the sink wrote, the offset commit didn't land
    # (drop the Hadoop .crc sidecar too — a stale checksum would make
    # the replay's re-commit rename fail as a spurious concurrent-query
    # conflict, which is a test-harness artifact, not the semantics
    # under test)
    for f in ("0", ".0.crc"):
        p = os.path.join(ckpt, "commits", f)
        if os.path.exists(p):
            os.remove(p)
    drain()  # restart replays batch 0 — the idempotent sink must absorb it
    assert spark.read.parquet(verdict_dir).count() == n_docs

    deliver("docs_b.parquet")  # at-least-once redelivery of every doc
    drain()
    verdicts = spark.read.parquet(verdict_dir)
    assert verdicts.count() == n_docs
    assert (
        verdicts.groupBy("doc_id").count().where(F.col("count") > 1).count()
        == 0
    )

    # final state equals the batch twin's per-source summary
    v = F.col("verdict")
    streamed = (
        verdicts.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_new"),
            F.sum(F.when(v == "exact_dup", 1).otherwise(0)).alias(
                "n_exact_dup"
            ),
            F.sum(F.when(v == "near_dup", 1).otherwise(0)).alias("n_near_dup"),
            F.sum(F.when(v == "kept", 1).otherwise(0)).alias("n_kept"),
        )
    )
    cols = ("source", "n_new", "n_exact_dup", "n_near_dup", "n_kept")
    s_rows = sorted(tuple(r[c] for c in cols) for r in streamed.collect())
    b_rows = sorted(
        tuple(r[c] for c in cols)
        for r in dedup_incremental(spark, SF_DIR).collect()
    )
    assert s_rows == b_rows


def test_streaming_keeplist_catches_intra_stream_duplicate(spark, tmp_path):
    """Index GROWTH across micro-batches (round 7): a document in batch
    2 with an UNSEEN doc_id but text identical to a KEPT document from
    batch 1 must be flagged exact_dup — with a frozen index it would
    sail through as 'kept'."""
    import os

    import pandas as pd
    from pyspark.sql import functions as F

    from map_reduce_framework_spark.operators.dedup import _incr_is_new
    from map_reduce_framework_spark.sources import load_table
    from map_reduce_framework_spark.streaming import keeplist_stream as ks

    index = ks.build_corpus_index(spark, SF_DIR)
    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    verdict_dir = str(tmp_path / "verdicts")
    os.makedirs(feed)

    new_docs = load_table(spark, SF_DIR, "documents").where(_incr_is_new())

    def drain() -> None:
        stream = (
            spark.readStream.schema(ks._DOCS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda bdf, bid: ks._screen_batch(
                    spark, bdf, index, verdict_dir, batch_id=bid
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # batch 1: the normal new-doc file
    stage = str(tmp_path / "_stage")
    new_docs.coalesce(1).write.mode("overwrite").parquet(stage)
    part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
    os.rename(os.path.join(stage, part), os.path.join(feed, "f1.parquet"))
    drain()
    v1 = spark.read.parquet(verdict_dir)
    kept_row = (
        new_docs.join(
            v1.where(F.col("verdict") == "kept").select("doc_id"), "doc_id"
        )
        .orderBy("doc_id")
        .limit(1)
        .collect()[0]
    )

    # batch 2: one clone of that kept doc under a fresh doc_id
    clone = pd.DataFrame(
        {
            "doc_id": [10_000_000],
            "text": [kept_row["text"]],
            "lang": [kept_row["lang"]],
            "source": [kept_row["source"]],
            "n_chars": [kept_row["n_chars"]],
        }
    )
    clone.to_parquet(tmp_path / "f2.parquet")
    os.rename(str(tmp_path / "f2.parquet"), os.path.join(feed, "f2.parquet"))
    drain()

    verdict = (
        spark.read.parquet(verdict_dir)
        .where(F.col("doc_id") == 10_000_000)
        .collect()
    )
    assert len(verdict) == 1
    assert verdict[0]["verdict"] == "exact_dup", verdict[0]


def test_streaming_keeplist_replay_after_torn_growth_write(spark, tmp_path):
    """Crash BETWEEN the index-growth writes and the verdict append:
    the replayed batch must not screen against its own growth output
    (it would re-verdict every kept doc as exact_dup).  Simulated by
    running the batch once, deleting ONLY the verdicts, and re-running
    with the same batch_id — the torn state exactly."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from map_reduce_framework_spark.operators.dedup import _incr_is_new
    from map_reduce_framework_spark.sources import load_table
    from map_reduce_framework_spark.streaming import keeplist_stream as ks

    index = ks.build_corpus_index(spark, SF_DIR)
    verdict_dir = str(tmp_path / "verdicts")
    batch = load_table(spark, SF_DIR, "documents").where(_incr_is_new())

    ks._screen_batch(spark, batch, index, verdict_dir, batch_id=0)
    clean = {
        r["doc_id"]: r["verdict"]
        for r in spark.read.parquet(verdict_dir).collect()
    }
    assert "kept" in set(clean.values())

    # torn state: growth dirs exist, verdicts do not
    shutil.rmtree(verdict_dir)
    assert any(
        os.path.isdir(os.path.join(index["grams"], d))
        for d in os.listdir(index["grams"])
        if d.startswith("b")
    )
    ks._screen_batch(spark, batch, index, verdict_dir, batch_id=0)
    replayed = {
        r["doc_id"]: r["verdict"]
        for r in spark.read.parquet(verdict_dir).collect()
    }
    assert replayed == clean, "replay diverged from the failed attempt"

    # and grow=True without a real batch_id must fail loudly
    import pytest

    with pytest.raises(ValueError, match="batch_id"):
        ks._screen_batch(spark, batch, index, verdict_dir)


def test_upsert_sink_exactly_once_across_restart(spark, tmp_path):
    """Round-7 verdict item 6: the foreachBatch MERGE sink must absorb a
    replayed epoch.  Drain event file A through the upsert sink with a
    checkpoint; simulate a crash BETWEEN the table swap and the offset
    commit by deleting the batch-0 commit marker; restart — Spark
    replays batch 0 with the same batch id against a table that already
    holds its merge, and the ``_committed_batch`` marker must make the
    replay a no-op (an additive MERGE would double every measure); then
    deliver file B and resume.  Final table must equal the batch
    per-user aggregate of A ∪ B."""
    import os

    from pyspark.sql import functions as F

    from map_reduce_framework_spark.sources import load_table
    from map_reduce_framework_spark.streaming.events_stream import (
        events_stream_source,
    )
    from map_reduce_framework_spark.streaming.upsert_sink import _merge_batch

    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    table_dir = str(tmp_path / "upsert_table")
    os.makedirs(feed)

    events = load_table(spark, SF_DIR, "events")
    half_a = events.where(F.col("event_id") % 2 == 0)
    half_b = events.where(F.col("event_id") % 2 == 1)

    def deliver(df, name: str) -> None:
        # int64-micros ts, so events_stream_source's footer probe sees
        # the same encoding the readStream schema will use (Spark's
        # default INT96 reads as timestamp[ns] in the probe but is not
        # int64-nanos, which would desync probe and schema)
        prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
        spark.conf.set(
            "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
        )
        try:
            stage = str(tmp_path / "_stage")
            df.coalesce(1).write.mode("overwrite").parquet(stage)
        finally:
            spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
        part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
        os.rename(os.path.join(stage, part), os.path.join(feed, name))

    def drain() -> None:
        q = (
            events_stream_source(spark, feed)
            .writeStream.foreachBatch(
                lambda bdf, bid: _merge_batch(
                    spark, bdf, table_dir, batch_id=bid, checkpoint_dir=ckpt
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def table_rows() -> dict:
        return {
            r["user_id"]: (r["n_events"], round(r["total_value"], 6))
            for r in spark.read.parquet(table_dir).collect()
        }

    deliver(half_a, "events_a.parquet")
    drain()
    after_a = table_rows()
    assert len(after_a) > 0

    # crash-during-commit: the table swap landed, the offset commit
    # didn't (drop the Hadoop .crc sidecar too — see the keeplist twin)
    for f in ("0", ".0.crc"):
        p = os.path.join(ckpt, "commits", f)
        if os.path.exists(p):
            os.remove(p)
    drain()  # restart replays batch 0 with the same batch id
    assert table_rows() == after_a, "replayed epoch was double-counted"

    deliver(half_b, "events_b.parquet")
    drain()
    want = {
        r["user_id"]: (r["n"], round(r["tv"], 6))
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    assert table_rows() == want


def test_upsert_sink_survives_crash_between_swap_renames(spark, tmp_path):
    """Round-8 verdict item 2: the rename-aside swap must survive a kill
    BETWEEN its two renames — the window where the old delete-then-
    rename swap had NO table and NO marker and silently rebuilt from
    only the replayed batch.  Simulate the exact torn state (table
    renamed aside to ``.old``, candidate ``.next`` in place, offset
    commit missing) and restart: recovery must adopt the old table and
    the replayed epoch must re-merge against it, not replace it."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from map_reduce_framework_spark.sources import load_table
    from map_reduce_framework_spark.streaming.events_stream import (
        events_stream_source,
    )
    from map_reduce_framework_spark.streaming.upsert_sink import (
        _merge_batch,
        read_upsert_table,
    )

    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    table_dir = str(tmp_path / "upsert_table")
    os.makedirs(feed)

    events = load_table(spark, SF_DIR, "events")

    def deliver(df, name: str) -> None:
        prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
        spark.conf.set(
            "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
        )
        try:
            stage = str(tmp_path / "_stage")
            df.coalesce(1).write.mode("overwrite").parquet(stage)
        finally:
            spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
        part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
        os.rename(os.path.join(stage, part), os.path.join(feed, name))

    def drain() -> None:
        q = (
            events_stream_source(spark, feed)
            .writeStream.foreachBatch(
                lambda bdf, bid: _merge_batch(
                    spark, bdf, table_dir, batch_id=bid, checkpoint_dir=ckpt
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def table_rows() -> dict:
        return {
            r["user_id"]: (r["n_events"], round(r["total_value"], 6))
            for r in read_upsert_table(spark, table_dir).collect()
        }

    deliver(events.where(F.col("event_id") % 2 == 0), "events_a.parquet")
    drain()
    after_a = table_rows()
    assert len(after_a) > 0

    # torn state: batch-1 swap killed between rename(table, .old) and
    # rename(.next, table) — table gone, .old is batch-0 state, .next
    # is the (complete) batch-1 candidate; offset commit never landed
    os.rename(table_dir, table_dir + ".old")
    os.makedirs(table_dir + ".next")  # stand-in for a torn candidate
    for f in ("0", ".0.crc"):
        p = os.path.join(ckpt, "commits", f)
        if os.path.exists(p):
            os.remove(p)

    drain()  # restart: recovery adopts .old, batch 0 replays against it
    assert table_rows() == after_a, "crash between renames lost the table"
    assert not os.path.exists(table_dir + ".old")
    assert not os.path.exists(table_dir + ".next")

    # post-commit debris: .old left behind after a crash between
    # rename(.next, table) and rmtree(.old) — recovery must drop it
    # and keep the (already-committed) table
    shutil.copytree(table_dir, table_dir + ".old")
    deliver(events.where(F.col("event_id") % 2 == 1), "events_b.parquet")
    drain()
    want = {
        r["user_id"]: (r["n"], round(r["tv"], 6))
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    assert table_rows() == want
    assert not os.path.exists(table_dir + ".old")


def test_upsert_sink_rejects_foreign_lineage(spark, tmp_path):
    """Round-8 advice item: batch ids are monotonic only within one
    checkpoint lineage.  If the checkpoint is recreated while the table
    persists, fresh batch 0 must NOT be silently dropped as 'already
    committed' — the sink raises and tells the caller to delete table
    and checkpoint together."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from map_reduce_framework_spark.sources import load_table
    from map_reduce_framework_spark.streaming.events_stream import (
        events_stream_source,
    )
    from map_reduce_framework_spark.streaming.upsert_sink import _merge_batch

    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    table_dir = str(tmp_path / "upsert_table")
    os.makedirs(feed)

    events = load_table(spark, SF_DIR, "events").limit(100)
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try:
        stage = str(tmp_path / "_stage")
        events.coalesce(1).write.mode("overwrite").parquet(stage)
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
    os.rename(os.path.join(stage, part), os.path.join(feed, "a.parquet"))

    def drain(ckpt_dir: str) -> None:
        q = (
            events_stream_source(spark, feed)
            .writeStream.foreachBatch(
                lambda bdf, bid: _merge_batch(
                    spark, bdf, table_dir, batch_id=bid, checkpoint_dir=ckpt_dir
                )
            )
            .option("checkpointLocation", ckpt_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain(ckpt)

    # checkpoint lost/recreated; table persists; new lineage restarts
    # batch ids at 0 — the old bare-id check would silently drop them
    ckpt2 = str(tmp_path / "ckpt2")
    from pyspark.sql.utils import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="different query lineage"):
        drain(ckpt2)


def test_keeplist_compaction_preserves_screen(spark, tmp_path):
    """compact_index folds every per-batch growth dir into the base —
    the N-delta case the batch compactor's docstring promises.  The
    gold invariant: a later batch screens IDENTICALLY against the
    compacted index and an uncompacted twin (fold is content-preserving
    below the df-cap boundary, which the test SFs never cross)."""
    import os
    import uuid

    from pyspark.sql import functions as F

    from map_reduce_framework_spark.operators.dedup import _incr_is_new
    from map_reduce_framework_spark.sources import load_table
    from map_reduce_framework_spark.streaming import keeplist_stream as ks

    new_docs = load_table(spark, SF_DIR, "documents").where(_incr_is_new())
    b0 = new_docs.where(F.col("doc_id") % 2 == 0)
    b1 = new_docs.where(F.col("doc_id") % 2 == 1)

    def run(stream_id: str, compact_between: bool) -> dict:
        index = ks.build_corpus_index(spark, SF_DIR, stream_id=stream_id)
        vd = str(tmp_path / f"verdicts_{stream_id}")
        ks._screen_batch(spark, b0, index, vd, batch_id=0)
        if compact_between:
            n = ks.compact_index(spark, index)
            assert n > 0, "fixture must produce at least one growth dir"
            # folded dirs cleaned; marker committed inside the base
            assert ks._growth_dirs(index["grams"]) == []
            assert ks._folded_tags(index["grams"]) == {"b0"}
            # rerun-safe: nothing left to fold
            assert ks.compact_index(spark, index) == 0
        ks._screen_batch(spark, b1, index, vd, batch_id=1)
        return {
            r["doc_id"]: r["verdict"]
            for r in spark.read.parquet(vd).collect()
        }

    sid = uuid.uuid4().hex[:8]
    compacted = run(f"cmp_{sid}", True)
    reference = run(f"ref_{sid}", False)
    assert compacted == reference and len(compacted) > 0
    kinds = set(compacted.values())
    assert "kept" in kinds


def test_keeplist_compaction_marker_and_crash_recovery(spark, tmp_path):
    """A folded growth dir left on disk is inert (_read_index_side
    skips marker-named dirs — re-reading it would double Jaccard's
    shared counts), and a kill between the two swap renames is adopted
    by the recovery sweep with no content change."""
    import os
    import shutil
    import uuid

    from pyspark.sql import functions as F

    from map_reduce_framework_spark.operators.dedup import _incr_is_new
    from map_reduce_framework_spark.sources import load_table
    from map_reduce_framework_spark.streaming import keeplist_stream as ks

    sid = f"mk_{uuid.uuid4().hex[:8]}"
    index = ks.build_corpus_index(spark, SF_DIR, stream_id=sid)
    new_docs = load_table(spark, SF_DIR, "documents").where(_incr_is_new())
    vd = str(tmp_path / "verdicts")
    ks._screen_batch(spark, new_docs, index, vd, batch_id=0)

    before = ks._read_index_side(spark, index["grams"]).count()
    assert ks.compact_index(spark, index) > 0
    after = ks._read_index_side(spark, index["grams"]).count()
    assert after == before  # fold preserved every posting (cap silent)

    # stale folded dir reappears (e.g. cleanup crashed): inert by marker
    stale = os.path.join(index["grams"], "b0")
    os.makedirs(os.path.join(stale), exist_ok=True)
    # give it real parquet content that WOULD double counts if read
    src = [
        f
        for f in os.listdir(index["grams"])
        if f.endswith(".parquet") and not f.startswith("_")
    ][0]
    shutil.copy(
        os.path.join(index["grams"], src), os.path.join(stale, "part.parquet")
    )
    assert ks._read_index_side(spark, index["grams"]).count() == after
    shutil.rmtree(stale)

    # kill between the two renames: base aside, .next in place
    os.rename(index["grams"], index["grams"] + ".old")
    os.makedirs(index["grams"] + ".next")
    from map_reduce_framework_spark.streaming.upsert_sink import (
        _recover_table,
    )

    _recover_table(index["grams"])
    assert ks._read_index_side(spark, index["grams"]).count() == after
    assert not os.path.exists(index["grams"] + ".old")
    assert not os.path.exists(index["grams"] + ".next")


def test_streaming_expectations_monitor_equals_batch(spark):
    """The live violation counters (shared conditional-sum builder over
    the streamed events feed) must equal the batch audit on the same
    data — and be non-vacuous: every event type present with real
    counts."""
    from map_reduce_framework_spark.streaming.expectations_stream import (
        batch_violation_profile,
        run_expectations_stream_demo,
    )

    streamed = run_expectations_stream_demo(spark, SF_DIR)
    batch = batch_violation_profile(spark, SF_DIR)
    s = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b and len(s) >= 3
    assert sum(r["n_events"] for r in batch.collect()) > 0


def test_streaming_drift_monitor_equals_batch(spark):
    """The drift table derived from live complete-mode bucket counters
    must equal the batch distribution_drift on the same data."""
    from map_reduce_framework_spark.plans import registry
    from map_reduce_framework_spark.streaming.drift_stream import (
        run_drift_stream_demo,
    )

    streamed = run_drift_stream_demo(spark, SF_DIR)
    batch = registry.QUERIES["distribution_drift"](spark, SF_DIR)
    s = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b and len(s) >= 5


def test_streaming_interval_coalesce_equals_batch(spark):
    """The stateful streaming interval union must equal the batch
    gaps-and-islands exactly — integer seconds arithmetic, identical
    (s, event_id) ordering, running-max break carried as state."""
    from map_reduce_framework_spark.plans import registry
    from map_reduce_framework_spark.streaming.interval_stream import (
        run_interval_stream_demo,
    )

    streamed = run_interval_stream_demo(spark, SF_DIR)
    batch = registry.QUERIES["interval_coalesce"](spark, SF_DIR)
    s = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b and len(s) > 0


def test_streaming_interval_coalesce_multi_batch_equals_batch(
    spark, tmp_path
):
    """Micro-batch boundaries must be invisible to the island fold:
    with the feed time-split into 4 files and maxFilesPerTrigger=1, an
    island growing across batches re-emits per batch and the final
    (max-n_events) emission per (user, island) still equals the batch
    operator — including islands that straddle file boundaries."""
    import pyarrow.parquet as pq

    from map_reduce_framework_spark.plans import registry
    from map_reduce_framework_spark.streaming.interval_stream import (
        run_interval_stream_demo,
    )

    t = pq.read_table(f"{SF_DIR}/events.parquet").sort_by("ts")
    n = t.num_rows
    ds_dir = tmp_path / "events.parquet"
    ds_dir.mkdir()
    for i in range(4):
        chunk = t.slice(i * n // 4, (i + 1) * n // 4 - i * n // 4)
        path = ds_dir / f"part-{i}.parquet"
        pq.write_table(chunk, path)
        # FileStreamSource orders files by MODIFICATION TIME; four
        # writes can land inside one mtime tick under load, and a tie
        # processed out of order silently breaks every order-dependent
        # cross-batch fold (the one full-suite flake round 11 caught).
        # Pin strictly increasing mtimes so batch order IS chunk order.
        mt = os.stat(path).st_mtime + 10.0 * (i + 1)
        os.utime(path, (mt, mt))

    streamed = run_interval_stream_demo(
        spark,
        SF_DIR,
        table="interval_multibatch",
        stream_dir=str(ds_dir),
        max_files_per_trigger=1,
    )
    batch = registry.QUERIES["interval_coalesce"](spark, SF_DIR)
    s = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b and len(s) > 0


def test_streaming_ewma_equals_batch(spark):
    """The stateful streaming EWMA must equal the batch fold exactly —
    same seeds, same recursion, same 4-dp rounding (the segment-merge
    identity makes the single-drain case bit-exact)."""
    from map_reduce_framework_spark.plans import registry
    from map_reduce_framework_spark.streaming.ewma_stream import (
        run_ewma_stream_demo,
    )

    streamed = run_ewma_stream_demo(spark, SF_DIR)
    batch = registry.QUERIES["ewma_smooth"](spark, SF_DIR)
    key = lambda r: (r["user_id"], r["n_events"], r["last_value"], r["ewma"])  # noqa: E731
    s = sorted(map(key, streamed.collect()))
    b = sorted(map(key, batch.collect()))
    assert s == b and len(s) > 0


def test_streaming_ewma_multi_batch_equals_batch(spark, tmp_path):
    """Micro-batch boundaries are segment boundaries: with the feed
    time-split into 4 files and maxFilesPerTrigger=1, the cross-batch
    state fold must STILL equal the whole-history batch fold exactly —
    the operational form of test_ewma_segment_merge_equals_full_fold,
    and the reason a per-user multi-segment history is safe to drain
    incrementally."""
    import pyarrow.parquet as pq

    from map_reduce_framework_spark.plans import registry
    from map_reduce_framework_spark.streaming.ewma_stream import (
        run_ewma_stream_demo,
    )

    t = pq.read_table(f"{SF_DIR}/events.parquet").sort_by("ts")
    n = t.num_rows
    ds_dir = tmp_path / "events.parquet"
    ds_dir.mkdir()
    for i in range(4):
        chunk = t.slice(i * n // 4, (i + 1) * n // 4 - i * n // 4)
        path = ds_dir / f"part-{i}.parquet"
        pq.write_table(chunk, path)
        # FileStreamSource orders files by MODIFICATION TIME; four
        # writes can land inside one mtime tick under load, and a tie
        # processed out of order silently breaks every order-dependent
        # cross-batch fold (the one full-suite flake round 11 caught).
        # Pin strictly increasing mtimes so batch order IS chunk order.
        mt = os.stat(path).st_mtime + 10.0 * (i + 1)
        os.utime(path, (mt, mt))

    streamed = run_ewma_stream_demo(
        spark,
        str(tmp_path),
        table="ewma_multibatch",
        stream_dir=str(ds_dir),
        max_files_per_trigger=1,
    )
    batch = registry.QUERIES["ewma_smooth"](spark, SF_DIR)
    key = lambda r: (r["user_id"], r["n_events"], r["last_value"], r["ewma"])  # noqa: E731
    s = sorted(map(key, streamed.collect()))
    b = sorted(map(key, batch.collect()))
    assert s == b and len(s) > 0


def test_streaming_pii_redact_equals_batch(spark):
    """The map-only PII scrub must emit identical rows from the stream
    source as from the batch reader — the builder is literally shared."""
    from map_reduce_framework_spark.streaming.cleaning_stream import (
        pii_batch_twin,
        run_pii_stream_demo,
    )

    streamed = run_pii_stream_demo(spark, SF_DIR)
    batch = pii_batch_twin(spark, SF_DIR)
    key = lambda r: tuple(  # noqa: E731
        r[c]
        for c in ("doc_id", "n_emails", "n_phones", "n_ips", "redacted_text")
    )
    got = sorted(map(key, streamed.collect()))
    assert got == sorted(map(key, batch.collect()))
    assert any(r[1] or r[2] or r[3] for r in got), "plants must fire"


def test_streaming_encoding_repair_equals_batch(spark):
    """The map-only mojibake repair must emit identical rows from the
    stream source as from the batch reader."""
    from map_reduce_framework_spark.streaming.cleaning_stream import (
        encoding_batch_twin,
        run_encoding_stream_demo,
    )

    streamed = run_encoding_stream_demo(spark, SF_DIR)
    batch = encoding_batch_twin(spark, SF_DIR)
    key = lambda r: tuple(  # noqa: E731
        r[c]
        for c in ("doc_id", "n_mojibake", "repaired_text", "was_clean")
    )
    got = sorted(map(key, streamed.collect()))
    assert got == sorted(map(key, batch.collect()))
    assert any(not r[3] for r in got), "plants must fire"


def test_streaming_fingerprint_bands_equal_batch(spark):
    """The map-only fingerprint band extraction must emit identical
    rows from the stream source as from the batch reader — the builder
    (real PNG/WAV encode + decode + integer fingerprint) is literally
    shared; only the source differs."""
    from map_reduce_framework_spark.streaming.fingerprint_stream import (
        fingerprint_batch_twin,
        run_fingerprint_stream_demo,
    )

    streamed = run_fingerprint_stream_demo(spark, SF_DIR)
    batch = fingerprint_batch_twin(spark, SF_DIR)
    key = lambda r: tuple(  # noqa: E731
        r[c] for c in ("doc_id", "modality", "b0", "b1", "b2", "b3")
    )
    got = sorted(map(key, streamed.collect()))
    assert got == sorted(map(key, batch.collect()))
    assert len(got) > 0
    assert {r[1] for r in got} == {"image", "audio"}


def test_streaming_media_ingest_equals_batch_incremental(spark):
    """The media ingest stream (band-index growth, keeplist discipline)
    must end at dedup_media_incremental's exact per-modality summary:
    file A carries every new doc (screened vs the base index only —
    growth can't affect a batch's own screen), file B is the
    at-least-once redelivery the verdict anti-join absorbs."""
    from map_reduce_framework_spark.operators.multimodal import (
        dedup_media_incremental,
    )
    from map_reduce_framework_spark.streaming.media_ingest_stream import (
        run_streaming_media_ingest_demo,
    )

    streamed = run_streaming_media_ingest_demo(spark, SF_DIR)
    cols = ("modality", "n_new", "n_dup", "n_kept")
    s_rows = sorted(tuple(r[c] for c in cols) for r in streamed.collect())
    b_rows = sorted(
        tuple(r[c] for c in cols)
        for r in dedup_media_incremental(spark, SF_DIR).collect()
    )
    assert s_rows == b_rows
    assert sum(r[1] for r in s_rows) > 0  # non-vacuous


def test_streaming_media_ingest_exactly_once_across_restart(spark, tmp_path):
    """Kill-and-resume for the media ingest loop: drain file A with a
    checkpoint, delete the batch-0 commit marker (crash between sink
    write and offset commit), restart — the replay must anti-join to
    empty against the verdict table; then the redelivered copy B drains
    to zero new verdicts.  One verdict row per doc_id end to end."""
    import os

    from pyspark.sql import functions as F

    from map_reduce_framework_spark.operators.dedup import _incr_is_new
    from map_reduce_framework_spark.sources import load_table
    from map_reduce_framework_spark.streaming import media_ingest_stream as ms

    index = ms.build_media_band_index(spark, SF_DIR, stream_id="restart-test")
    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    verdict_dir = str(tmp_path / "verdicts")
    os.makedirs(feed)

    new_docs = (
        load_table(spark, SF_DIR, "documents").where(_incr_is_new()).coalesce(1)
    )

    def deliver(name: str) -> None:
        import shutil

        stage = str(tmp_path / "_stage")
        new_docs.write.mode("overwrite").parquet(stage)
        part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
        os.rename(os.path.join(stage, part), os.path.join(feed, name))
        shutil.rmtree(stage)

    def drain() -> None:
        stream = (
            spark.readStream.schema(ms._DOCS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda bdf, bid: ms._screen_media_batch(
                    spark, bdf, index, verdict_dir, batch_id=bid
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    deliver("docs_a.parquet")
    drain()
    n_rows = spark.read.parquet(verdict_dir).count()
    assert n_rows > 0

    # crash-during-commit: sink wrote, offset commit didn't land (drop
    # the Hadoop .crc sidecar too — see the keeplist twin)
    for f in ("0", ".0.crc"):
        p = os.path.join(ckpt, "commits", f)
        if os.path.exists(p):
            os.remove(p)
    drain()  # replay of batch 0 must be absorbed
    assert spark.read.parquet(verdict_dir).count() == n_rows

    deliver("docs_b.parquet")  # at-least-once redelivery of every doc
    drain()
    verdicts = spark.read.parquet(verdict_dir)
    assert verdicts.count() == n_rows
    assert (
        verdicts.groupBy("doc_id").count().where(F.col("count") > 1).count()
        == 0
    )


def test_streaming_media_ingest_catches_intra_stream_duplicate(
    spark, tmp_path
):
    """Index GROWTH across micro-batches: a batch-B image within ham ≤ 3
    of a KEPT batch-A image (the planted predecessor-reuse shape, at
    synthetic doc_ids far beyond the corpus so the base index can't
    interfere) must verdict near_dup — only possible because batch A's
    kept band rows joined the index."""
    import os

    from map_reduce_framework_spark.streaming import media_ingest_stream as ms

    # X = 3k with k % 16 == 0 (not itself a planted dup); Y = X + 3 has
    # (Y div 3) % 16 == 1, so Y's pixels are X's with the +8 perturbation
    x_id = 3 * 16_000_000
    y_id = x_id + 3

    index = ms.build_media_band_index(spark, SF_DIR, stream_id="intra-test")
    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    verdict_dir = str(tmp_path / "verdicts")
    os.makedirs(feed)

    def deliver(name: str, doc_id: int) -> None:
        import shutil

        stage = str(tmp_path / "_stage")
        spark.createDataFrame(
            [(doc_id, "synthetic", "en", "syn", 9)], ms._DOCS_SCHEMA
        ).coalesce(1).write.mode("overwrite").parquet(stage)
        part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
        os.rename(os.path.join(stage, part), os.path.join(feed, name))
        shutil.rmtree(stage)

    def drain() -> None:
        stream = (
            spark.readStream.schema(ms._DOCS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda bdf, bid: ms._screen_media_batch(
                    spark, bdf, index, verdict_dir, batch_id=bid
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    deliver("docs_a.parquet", x_id)
    drain()
    deliver("docs_b.parquet", y_id)
    drain()
    rows = {
        r["doc_id"]: r["verdict"]
        for r in spark.read.parquet(verdict_dir).collect()
    }
    assert rows == {x_id: "kept", y_id: "near_dup"}
