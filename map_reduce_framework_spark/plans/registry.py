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
    tpch_extra,
    udfs,
    wordcount_client,
)

_MODULES = [
    cleaning,
    relational,
    relational_ext,
    tpch_extra,
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
# entries in insertion order.  Round-5 curation (CORRECTNESS_r04 was
# 50/50 green, so no red rows to re-prove): (a) the six NEW TPC-H
# breadth queries (Q2/Q5/Q9/Q11/Q16/Q20 shapes — never driver-checked);
# (b) the three queries whose PLANS changed this round
# (graph_triangle_stats degree orientation, bm25_topk TakeOrdered
# rewrite, rolling_zscore overflow-safe variance); (c) all 25 queries
# whose only green row is round 1 — the oldest evidence, re-proven on
# current code; (d) 16 round-3-only greens prioritized on cache-adopt
# exposure (the dedup/ANN/k-means family persists intermediates and the
# release mechanism was rebuilt this round) and timestamp-sensitive
# event queries (tables.load_table's conf scoping changed).  The approx
# sketches stay excluded PERMANENTLY (can never hash-match DuckDB's
# sketches; accuracy pytests vs exact twins cover them).  Queries NOT
# listed follow in module order; every one has a green r01/r03/r04 row.
DRIVER_WINDOW = [
    # (a) new TPC-H breadth — correlated min, co-located join, profit
    # rollup, group-vs-global-scalar, NOT-IN NAAJ, nested semi chain
    "tpch_q2_min_cost_supplier",
    "tpch_q5_local_supplier_volume",
    "tpch_q9_product_type_profit",
    "tpch_q11_important_stock",
    "tpch_q16_supplier_part_count",
    "tpch_q20_promo_stock_suppliers",
    # (a²) new containment-dedup operator (SlimPajama-style screen)
    "dedup_containment",
    # (b) plans changed this round
    "graph_triangle_stats",
    "bm25_topk",
    "rolling_zscore",
    # (c) round-1-only greens, oldest evidence
    "array_functions",
    "cube_agg",
    "distinct_keys",
    "filter_project",
    "group_having",
    "hash_sample",
    "join_anti",
    "join_cross",
    "join_outer",
    "join_semi",
    "lateral_posexplode",
    "map_functions",
    "null_semantics",
    "percentile_summary",
    "pivot_priority",
    "rollup_agg",
    "scalar_functions",
    "set_except",
    # (set_union_all evicted for dedup_containment, set_intersect for
    # dedup_incremental_indexed: both r01-green trivially-stable set-op
    # plans whose multiset cousins hold r04 rows)
    "stats_agg",
    "top_k",
    "unpivot_measures",
    "window_extended",
    "wordcount",
    # (d) round-3-only greens: cache-adopt-exposed dedup/ANN family
    # first, then timestamp-sensitive event queries
    "dedup_exact",
    "dedup_exact_normalized",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_incremental",
    # the bucketed-index screen (zero index-side exchange) — driver-
    # checked alongside its self-deriving twin; displaces set_intersect
    # (r01-green; its multiset cousin set_intersect_all has an r04 row)
    "dedup_incremental_indexed",
    "dedup_embedding_cosine",
    "dedup_clusters",
    "dedup_pipeline_keeplist",
    "ann_cosine_topk",
    "ann_ivf",
    "ann_lsh_bucketed",
    "kmeans_embeddings",
    "events_interval_join",
    "session_window_agg",
    "cohort_retention",
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
        try:
            return cache.adopt(fn(spark, sf_dir))
        except BaseException:
            # a query that fails after staging persists must not hand its
            # caches to the NEXT query's result (whose finalizer would
            # unpersist caches it never owned) — drop them here
            cache.release()
            raise

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
