"""Heavy-hitters (two-pass Misra-Gries) semantic tests.

The oracle row proves value parity on the real corpus, but the testdata
vocabulary (31 words) never overflows the counter budget — these tests
drive a synthetic 5000-word corpus through the REAL prune path with a
starved budget and assert the two contracts that make the design sound:
the MG summary is a superset of every true heavy hitter, and the final
output is EXACT regardless of what the candidate pool looked like.
"""

from __future__ import annotations

import pandas as pd

from map_reduce_framework_spark.operators import text as T

from .conftest import SF_DIR


def test_heavy_hitters_matches_oracle(spark, duck):
    from .conftest import assert_matches_oracle

    assert_matches_oracle(
        spark,
        duck,
        T.heavy_hitters,
        T.ORACLES["heavy_hitters"],
        "heavy_hitters",
    )


def test_mg_summary_is_superset_of_true_heavies():
    """Direct generator contract: a heavy token spread thinly across
    many batches must survive a 5-counter budget over a 100-token
    vocabulary (the decrement can reduce but never evict an item whose
    count exceeds the stream-length/(budget+1) bound)."""
    batches = []
    for b in range(20):
        toks = [f"noise{b}_{i}" for i in range(5) for _ in range(2)]
        toks += ["heavy"] * 8  # 160 of 360 total — far over N/6
        batches.append(pd.DataFrame({"token": toks}))
    out = list(T._mg_candidates(5)(iter(batches)))
    cands = set(out[0]["token"])  # summary rows are (token, cnt)
    assert "heavy" in cands
    assert len(cands) <= 5


def test_heavy_hitters_exact_under_starved_budget(spark):
    """End-to-end on a 5000-word Zipf-less uniform corpus with two
    planted heavies and a 50-counter budget (vocab ≫ budget, so every
    partition prunes repeatedly): the output must EQUAL the exact
    groupBy-HAVING computation — same tokens, same exact counts."""
    rows = []
    for i in range(200):
        toks = [f"w{(i * 100 + j) % 5000}" for j in range(100)]
        toks += ["hh1"] * 4 + ["hh2"] * 3
        rows.append((i, " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(4)

    got = {
        (r["token"], r["cnt"])
        for r in T._heavy_hitters_over(docs, k=50, counters=50).collect()
    }

    from pyspark.sql import functions as F

    toks = docs.select(F.explode(F.split("text", " ")).alias("token"))
    n = toks.count()
    exact = {
        (r["token"], r["cnt"])
        for r in toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") > n / 50)
        .collect()
    }
    assert exact == {("hh1", 800), ("hh2", 600)}
    assert got == exact


def test_streaming_heavy_hitters_equals_batch(spark):
    """Stream-equals-batch: the mergeable-MG stream over the split
    document feed must produce exactly the batch operator's frame."""
    from map_reduce_framework_spark.streaming.heavy_hitters_stream import (
        run_streaming_heavy_hitters_demo,
    )

    got = {
        (r["token"], r["cnt"], r["share"])
        for r in run_streaming_heavy_hitters_demo(spark, SF_DIR).collect()
    }
    want = {
        (r["token"], r["cnt"], r["share"])
        for r in T.heavy_hitters(spark, SF_DIR).collect()
    }
    assert got == want and len(want) > 0


def test_streaming_heavy_hitters_exact_under_starved_budget(spark, tmp_path):
    """The synthetic large-vocabulary corpus through the STREAM path
    with a starved 50-counter budget: per-batch prunes fire, the
    cross-batch merge decrements, and the final recount must still
    equal the exact answer."""
    rows = []
    for i in range(200):
        toks = [f"w{(i * 100 + j) % 5000}" for j in range(100)]
        toks += ["hh1"] * 4 + ["hh2"] * 3
        rows.append((i, " ".join(toks), "en", "src0", 0))
    feed = str(tmp_path / "feed")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).repartition(4).write.mode("overwrite").parquet(feed)

    from map_reduce_framework_spark.streaming.heavy_hitters_stream import (
        run_streaming_heavy_hitters_demo,
    )

    got = {
        (r["token"], r["cnt"])
        for r in run_streaming_heavy_hitters_demo(
            spark, feed_dir=feed, k=50, counters=50
        ).collect()
    }
    assert got == {("hh1", 800), ("hh2", 600)}


def test_streaming_merge_batch_is_replay_idempotent(spark, tmp_path):
    """Epoch replay: re-running merge_batch with the same batch_id must
    leave the summary file identical (recomputed from the same
    immutable predecessor, atomically replaced)."""
    import json
    import os

    from map_reduce_framework_spark.streaming import heavy_hitters_stream as H

    work = str(tmp_path / "work")
    docs = spark.createDataFrame(
        [(0, "a a b c", "en", "s", 0), (1, "a b b d", "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    H.merge_batch(docs, work, 0, counters=10)
    first = json.load(open(H._summary_path(work, 0)))
    H.merge_batch(docs, work, 0, counters=10)
    second = json.load(open(H._summary_path(work, 0)))
    assert first == second
    assert first["a"] == 3 and first["b"] == 3
    assert not any(f.endswith(".tmp") for f in os.listdir(work))
