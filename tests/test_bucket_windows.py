"""Bucket-sliced window rewrites (round-6 scale fix).

A window partitioned by a low-cardinality key alone (``event_type``,
``source``) serializes each key's entire history into ONE task at
100 TB.  The rewrites slice every row-level window by a bounded bucket
key — frame-width time buckets with ghost rows for the trailing RANGE
frames, doc_id buckets + a bucket-offset prefix for the packing cumsum.
Output equivalence is pinned by the DuckDB oracles (which keep the
naive single-key formulation — ``test_relational.test_query_matches_
oracle``); these tests pin the PLAN property: no row-level Window node
partitioned by the hot key alone, and real bucket granularity in the
data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_framework_spark.operators import relational_ext, text
from map_reduce_framework_spark.sources import load_table

from .conftest import SF_DIR
from .test_plans import plan_of


def _window_lines(plan: str) -> list[str]:
    lines = [l for l in plan.splitlines() if "windowspecdefinition" in l]
    assert lines, f"no Window node found:\n{plan}"
    return lines


def test_rolling_zscore_window_is_bucket_partitioned(spark):
    plan = plan_of(relational_ext.rolling_zscore(spark, SF_DIR), mode="simple")
    for line in _window_lines(plan):
        assert "bkt" in line, line


def test_window_range_interval_is_bucket_partitioned(spark):
    plan = plan_of(
        relational_ext.window_range_interval(spark, SF_DIR), mode="simple"
    )
    for line in _window_lines(plan):
        assert "bkt" in line, line


def test_pack_sequences_row_windows_are_bucket_partitioned(spark):
    """Both windows must carry the bucket key: the row-level cumsum is
    partitioned by (source, bkt), and the offset prefix — though it may
    order by bkt within a source — runs over the per-bucket AGGREGATE
    table (rows = buckets, not documents), visible as a Window above a
    HashAggregate rather than above the scan."""
    plan = plan_of(text.pack_sequences(spark, SF_DIR), mode="simple")
    for line in _window_lines(plan):
        assert "bkt" in line, line


def test_window_distribution_ranks_are_bucket_partitioned(spark):
    """The rank decomposition must never sort a whole nation in one
    task: the only row-level Window is the per-(nation, balance-bucket)
    row_number; the nation-only window runs over the per-bucket COUNT
    table (a Window above a HashAggregate, not above the scan)."""
    plan = plan_of(
        relational_ext.window_distribution(spark, SF_DIR), mode="simple"
    )
    for line in _window_lines(plan):
        assert "bkt" in line, line


def test_ann_topk_local_pass_is_salted(spark):
    """The ANN rankers' corpus-scale window must carry the salt key:
    the only per-query_id-alone window runs over the already-pruned
    ≤ SALTS·k rows.  Plan shape: ≥ 2 Window nodes, the first (bottom,
    corpus-side) partitioned by (query_id, _salt)."""
    from map_reduce_framework_spark.operators import similarity

    for fn in (similarity.ann_cosine_topk, similarity.ann_lsh_bucketed):
        plan = plan_of(fn(spark, SF_DIR), mode="simple")
        lines = _window_lines(plan)
        assert any("_salt" in l for l in lines), plan
        # bottom-most Window node (deepest = executed first) is the
        # salted local pass
        assert "_salt" in lines[-1], lines[-1]


def test_bucket_keys_fan_out_beyond_key_cardinality(spark):
    """The partition-count evidence: at the smallest test SF the bucket
    key already multiplies task granularity well beyond the raw key's
    cardinality (> 4 buckets per event_type / per source)."""
    ev = load_table(spark, SF_DIR, "events")
    width = relational_ext.ZSCORE_WINDOW_HOURS * 3600
    types = ev.select("event_type").distinct().count()
    groups = (
        ev.select(
            "event_type",
            F.floor(F.col("ts").cast("long") / width).alias("bkt"),
        )
        .distinct()
        .count()
    )
    assert groups > 4 * types, (groups, types)

    # the small SFs' 500 doc_ids fit one PACK_ID_BUCKET; the granularity
    # claim needs sf0.1 (doc_ids 0-4999 → 5 buckets per source)
    docs = load_table(spark, "/root/testdata/sf0.1", "documents")
    sources = docs.select("source").distinct().count()
    doc_groups = (
        docs.select(
            "source",
            F.floor(F.col("doc_id") / text.PACK_ID_BUCKET).alias("bkt"),
        )
        .distinct()
        .count()
    )
    assert doc_groups > 4 * sources, (doc_groups, sources)


def test_ccnet_windows_run_over_the_value_table(spark):
    """ccnet_buckets' two lang-partitioned windows must consume the
    DISTINCT-(pred_lang, ppl) aggregate (rows bounded by 4-dp value
    cardinality), never the raw corpus: in the plan, every Window node
    sits in a subtree whose input is HashAggregate(keys=[pred_lang,
    ppl]) — i.e. the aggregate appears BELOW the deepest Window."""
    from map_reduce_framework_spark.operators.cleaning import ccnet_buckets

    plan = plan_of(ccnet_buckets(spark, SF_DIR), mode="simple")
    lines = plan.splitlines()
    win_idx = [i for i, l in enumerate(lines) if "windowspecdefinition" in l]
    assert win_idx, f"no Window node found:\n{plan}"
    # the windows partition by pred_lang (the low-card key the lint
    # flags) ...
    for i in win_idx:
        assert "pred_lang" in lines[i]
    # ... and the first plan node BELOW the deepest window that touches
    # rows is the (pred_lang, ppl) value aggregate — the corpus never
    # reaches a window
    below = "\n".join(lines[max(win_idx):])
    agg = [
        l
        for l in below.splitlines()
        if "HashAggregate(keys=[pred_lang" in l and "ppl" in l
    ]
    assert agg, f"value-table aggregate not below the windows:\n{plan}"
