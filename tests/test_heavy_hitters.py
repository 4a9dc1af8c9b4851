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
    cands = set(out[0]["token"])
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
