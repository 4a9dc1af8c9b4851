"""Central query/oracle registry — the single source the driver consumes.

Each operator module contributes ``QUERIES`` (name → callable(spark, sf_dir)
→ DataFrame) and ``ORACLES`` (name → DuckDB ANSI SQL).  A query without an
oracle entry is allowed (non-SQL-expressible op → driver's rows-only check),
but an oracle without a query is a bug, as is a duplicate name.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..operators import (
    cleaning,
    clustering,
    dedup,
    graph,
    multimodal,
    relational,
    relational_ext,
    search_client,
    similarity,
    text,
    udfs,
    wordcount_client,
)

_MODULES = [
    cleaning,
    relational,
    relational_ext,
    wordcount_client,
    search_client,
    dedup,
    graph,
    similarity,
    clustering,
    text,
    multimodal,
    udfs,
]

# The external correctness driver checks only the FIRST 50 ``queries()``
# entries in insertion order.  Round-4 curation: after rounds 1+3, 89 of
# 91 distinct driver-checked queries are green, so this window rotates to
# (a) sessionize — the one red row, its oracle's HUGEINT→BIGINT cast just
# fixed; (b) every query that has NEVER had a driver row (the 26
# checkable ones — approx_percentile_summary and approx_distinct_hll are
# excluded PERMANENTLY: their sketches can never hash-match DuckDB's by
# design, their correctness rests on accuracy pytests vs exact twins, and
# a window slot spent on a guaranteed `no_oracle` row is wasted); (c) the
# new clean_corpus capstone; (d) 22 round-1-only greens re-proving the
# current code — prioritized on timestamp-touching queries (TPC-H date
# predicates, date_arithmetic) because the testdata's timestamp encoding
# changed this round (see sources/tables.load_table), plus one exemplar
# per join/window/sort/search family.  Queries NOT listed follow in
# module order; every one of them has a green r01 or r03 driver row.
DRIVER_WINDOW = [
    # (a) the last red row — oracle dtype fixed this round
    "sessionize",
    # (c) new end-to-end cleaning capstone
    "clean_corpus",
    # (b) never driver-checked: cleaning, TPC-H tail, relational_ext
    # tail, facade, graph/ANN/text/multimodal tail
    "dedup_passage",
    "blocklist_redact",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q12_priority_lateness",
    "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_global_sales_opportunity",
    "multi_distinct_agg",
    "events_window_distinct",
    "funnel_analysis",
    "events_user_enrichment",
    "band_join_pricing",
    "window_distribution",
    "histogram_totalprice",
    "set_intersect_all",
    "set_except_all",
    "mr_inverted_index_facade",
    "pagerank_dup_graph",
    "ann_ivf_kmeans",
    "embedding_norm_stats",
    "bpe_pair_stats",
    "training_manifest",
    "frame_sample_schedule",
    "payload_chunks",
    # (d) round-1-only greens, re-proven on current code — timestamp-
    # sensitive first (the data's timestamp encoding changed this round)
    "date_arithmetic",
    "pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items",
    "tpch_q14_promo_effect",
    "tpch_q17_small_quantity",
    "tpch_q18_large_volume",
    "tpch_q19_discounted_revenue",
    "join_equi",
    "join_full_outer",
    "join_skew_salted",
    "window_rank_lag",
    "top_k_per_group",
    "search_substring",
    # round-4 new operators (SemDeDup-style learned-cluster dedup, LM
    # context-window chunking, BM25 retrieval, SCD2 dimension
    # versioning, rolling z-score anomaly flags) — displacing the five
    # most redundant re-proof candidates (filter_project, distinct_keys,
    # join_outer, join_semi, join_anti: r01-green rows, no timestamp
    # exposure, and their families keep other in-window rows — tpch_q21
    # plans semi+anti, join_equi/full_outer/skew stay)
    "dedup_semantic",
    "chunk_documents",
    "bm25_topk",
    "scd2_apply",
    "rolling_zscore",
    # (wordcount evicted for this: mr_wordcount_facade shares its oracle
    # and has a green r03 row)
    "graph_triangle_stats",
]


def _structural_release(fn: Callable) -> Callable:
    """Wrap a query so its operators' staged persists are adopted by the
    returned DataFrame: the caches live exactly as long as the caller
    holds the result — no cooperative ``cache.release()`` needed (see
    :mod:`..cache`)."""
    from functools import wraps

    from .. import cache

    @wraps(fn)
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return cache.adopt(fn(spark, sf_dir))

    return run


def _collect() -> tuple[dict, dict]:
    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for mod in _MODULES:
        for name, fn in getattr(mod, "QUERIES", {}).items():
            if name in queries:
                raise ValueError(f"duplicate query name {name!r} in {mod.__name__}")
            queries[name] = _structural_release(fn)
        for name, sql in getattr(mod, "ORACLES", {}).items():
            if name in oracles:
                raise ValueError(f"duplicate oracle name {name!r} in {mod.__name__}")
            oracles[name] = sql
    missing = set(oracles) - set(queries)
    if missing:
        raise ValueError(f"oracles without queries: {sorted(missing)}")
    unknown = set(DRIVER_WINDOW) - set(queries)
    if unknown:
        raise ValueError(f"DRIVER_WINDOW names without queries: {sorted(unknown)}")
    if len(DRIVER_WINDOW) != len(set(DRIVER_WINDOW)):
        raise ValueError("duplicate names in DRIVER_WINDOW")
    # Reorder: curated driver window first, remaining queries after in
    # module order.  dict preserves insertion order, which is what the
    # driver's 50-entry check consumes.
    ordered = {name: queries[name] for name in DRIVER_WINDOW}
    ordered.update(
        {name: fn for name, fn in queries.items() if name not in ordered}
    )
    return ordered, oracles


QUERIES, ORACLES = _collect()


def get_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def get_oracles() -> dict[str, str]:
    return dict(ORACLES)
