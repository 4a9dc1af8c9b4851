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
# entries in insertion order.  Round-6 curation (CORRECTNESS_r05 was
# 50/50 green, so no red rows to re-prove — evidence-freshness rotation):
# (a) every query whose PLAN changed this round — the bucket-sliced
# window rewrites (rolling_zscore, and window_range_interval /
# pack_sequences inside block c), the skew-safe gram-df cap consumers
# (ngram_jaccard, containment, incremental, incremental_indexed), and
# tpch_q2's deterministic tiebreak; (b) the two round-1-only greens;
# (c) all 32 queries whose newest green row is round 3 — the oldest
# evidence on current code; (d) 10 round-4-only greens prioritized on
# persist/cache exposure (the df-cap rebuild touched the cache
# machinery), the event/window family (sf1 probe coverage this round),
# and bench headliners.  The approx sketches stay excluded PERMANENTLY
# (can never hash-match DuckDB's sketches; accuracy pytests vs exact
# twins cover them).  Queries NOT listed follow in module order; every
# one has a green r01/r03/r04/r05 row.
# ROUND-7 ROTATION DEBT: seven stable rows were displaced late in round
# 6 to give the new operators their first driver evidence —
# clean_corpus + dedup_semantic/dedup_passage/sessionize/
# events_window_distinct (r04-green) and search_dir_listing/
# string_agg_sorted/json_extract/gap_fill_hourly + the three stable ANN
# displacees (r03/r04-green).  Rotate them back next round so no green
# is older than 3 rounds.
DRIVER_WINDOW = [
    # (a) plans changed this round: bucket-sliced zscore window,
    # skew-safe df-cap consumers, q2 tiebreak
    "rolling_zscore",
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_incremental",
    "dedup_incremental_indexed",
    "tpch_q2_min_cost_supplier",
    # (b) round-1-only greens (evicted from the r05 window; trivially
    # stable plans — set_union_all re-proves the family, set_intersect
    # yielded its slot to the NEW ann_ivf_indexed and rotates back next
    # round)
    "set_union_all",
    "ann_ivf_indexed",
    # (c) round-3-latest greens — oldest evidence on current code.
    # window_range_interval and pack_sequences also carry this round's
    # bucket-sliced rewrites.
    "asof_join",
    "contamination_check",
    "doc_fingerprint",
    "events_sliding_window",
    "events_time_window",
    # NEW late in round 6: indexed MinHash band screen (displaces
    # gap_fill_hourly — sequence-expansion stable plan; r03-green,
    # rotates back next round)
    "dedup_incremental_minhash_indexed",
    "grouping_sets",
    # NEW late in round 6: incremental MinHash band screen (displaces
    # json_extract — pure scalar-function plan, trivially stable;
    # r03-green, rotates back next round)
    "dedup_incremental_minhash",
    "lang_id",
    "mixture_sample",
    "mr_wordcount_facade",
    "multimodal_features",
    "ngram_topk",
    "not_exists_subquery",
    "pack_sequences",
    "pandas_udf_grouped_agg",
    "pandas_udf_scalar",
    "perplexity_proxy",
    "python_udtf_tokens",
    "quality_score",
    "repetition_stats",
    "scalar_subquery_above_avg",
    # NEW late in round 6: multi-round BPE trainer (displaces
    # search_dir_listing — the registry's most trivially-stable plan, a
    # directory listing; r03-green, rotates back next round)
    "bpe_train_merges",
    "snapshot_diff",
    "sql_api_revenue",
    "stratified_sample",
    # NEW late in round 6: BPE tokenizer application (displaces
    # string_agg_sorted — single-listagg plan, trivially stable;
    # r03-green, rotates back next round)
    "bpe_segment_docs",
    "table_profile",
    "text_stats",
    "tfidf_topterms",
    "token_count_bpe",
    "window_range_interval",
    # (d) round-4-latest greens: persist-heavy dedup/ANN/graph rows
    # (cache-adopt exposure), the event/window family the sf1 probe
    # now covers
    "ann_ivf_kmeans",
    # NEW late in round 6: Bloom-bypass incremental screen (displaces
    # clean_corpus — r04-green, plan unchanged, rotates back next round)
    "dedup_incremental_bloom",
    # NEW late in round 6: source-pair gram-overlap governance matrix
    # (displaces dedup_semantic — r04-green, plan unchanged)
    "source_overlap_matrix",
    # plan changed late in round 6: skew-safe exact-dup star edges
    # (partial-agg roots + join replaces min-over-content-hash window);
    # displaces dedup_passage (r04-green, plan unchanged)
    "dedup_pipeline_keeplist",
    # NEW this round (no driver row exists yet): substring-level dedup
    # and the Gopher rule gate — displacing two plan-unchanged
    # r04-green rows (sessionize, events_window_distinct), which rotate
    # back next round
    "dedup_exact_substring",
    "quality_filter_rules",
    # plans changed late in round 6: bucket-sliced rank decomposition +
    # the salted two-phase ANN top-k (displacing three stable r04-green
    # rows — pagerank_dup_graph, tpch_q18_large_volume, join_skew_salted
    # — which rotate back next round)
    "window_distribution",
    "ann_cosine_topk",
    "ann_lsh_bucketed",
    "ann_ivf",
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
