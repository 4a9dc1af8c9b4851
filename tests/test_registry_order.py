"""The driver checks only the first 50 ``queries()`` entries (insertion
order) — lock in what lands inside that window.

Round-9 policy (CORRECTNESS_r08 was 50/50 green and the round-8 judge
re-verified the full 147/147 sweep): the window holds (a) FIRST the 4
r05-green rows round 8 deferred — the pre-planned debt, honoured
exactly as written — (b) the plan-changed dedup_embedding_cosine
(canonical per-pair min-cosine) and the NEW compaction matrix
(dedup/band/ann_index_compact) plus the hierarchical
dedup_semantic_scalable, the IVF-PQ search (ann_ivf_pq) and the
two-pass Misra-Gries heavy_hitters, the int8 quantization audit
(embedding_quantize_int8), the indexed PQ search
(ann_ivf_pq_indexed) and the Ed-Join fuzzy pair join
(fuzzy_edit_pairs), and (c) 36 of the 47 r06-latest greens.
Eleven trivially-stable r06 rows (set/subquery/window-agg/profile/
SQL-front-end shapes) are deferred to round 10 (named in
registry.py — rotate them in FIRST next round).  The two approx sketches are
excluded permanently — they can never hash-match DuckDB's sketches and
would burn slots on guaranteed `no_oracle` rows.
"""

from __future__ import annotations

import json
import os

from map_reduce_framework_spark.plans import registry

PLAN_CHANGED_OR_NEW_IN_R9 = {
    # per-pair cosine canonicalized (round-8 advice: arbitrary-survivor
    # dropDuplicates → deterministic groupBy.min)
    "dedup_embedding_cosine",
    # NEW: the LSM delta-compaction matrix (gram fold with
    # tombstone-exact df re-capping; band/IVF plain-union folds)
    "dedup_index_compact",
    "band_index_compact",
    "ann_index_compact",
    # NEW: hierarchical SemDeDup (fix for the flat n²/256 assignment)
    "dedup_semantic_scalable",
    # NEW: product-quantized ADC search with exact refine (FAISS IVFPQ)
    "ann_ivf_pq",
    # NEW: two-pass exact Misra-Gries frequent tokens
    "heavy_hitters",
    # NEW: symmetric int8 quantization audit (the 4x serving tier)
    "embedding_quantize_int8",
    # NEW: PQ search from the materialized bucketed code index
    "ann_ivf_pq_indexed",
    # NEW: exact edit-distance pair join (Ed-Join prefix filter)
    "fuzzy_edit_pairs",
    # NEW (second round-9 batch): constraint validation + skew
    # diagnostics, variable-interval union, EWMA fold, cluster-
    # consistent splits, value-bucketed global rank
    "expectations_audit",
    "key_skew_profile",
    "interval_coalesce",
    "ewma_smooth",
    "leakage_safe_splits",
    "global_rank_quality",
    "distribution_drift",
    "record_linkage_scores",
    "kcore_membership",
    "agg_view_maintain",
    "zorder_locality_audit",
    "token_budget_plan",
    "golden_record_assembly",
}

#: r05-green rows deferred by round 8 — the debt this window pays FIRST
DEFERRED_FROM_R8 = [
    "scalar_functions",
    "array_functions",
    "map_functions",
    "null_semantics",
]

#: r06-green rows deferred to round 10 for the block-b slots —
#: rotate these in FIRST next round (they go 4 rounds stale otherwise)
DEFERRED_TO_R10 = {
    "grouping_sets",
    "set_union_all",
    "not_exists_subquery",
    "events_time_window",
    "events_sliding_window",
    "sql_api_revenue",
    "scalar_subquery_above_avg",
    "window_distribution",
    "table_profile",
    "snapshot_diff",
    "tpch_q2_min_cost_supplier",
    # second round-9 batch displaced 6 more (Arrow-batch UDF exemplars
    # and kernel-backed text scorers — stable shapes, r06-green)
    "pandas_udf_grouped_agg",
    "pandas_udf_scalar",
    "python_udtf_tokens",
    "text_stats",
    "quality_score",
    "ngram_topk",
    "perplexity_proxy",
    "repetition_stats",
    "doc_fingerprint",
    "lang_id",
    "token_count_bpe",
    "mixture_sample",
    "contamination_check",
}

NO_ORACLE_BY_DESIGN = {"approx_distinct_hll", "approx_percentile_summary"}

PRIOR_ROUNDS = (
    "CORRECTNESS_r01.json",
    "CORRECTNESS_r03.json",
    "CORRECTNESS_r04.json",
    "CORRECTNESS_r05.json",
    "CORRECTNESS_r06.json",
    "CORRECTNESS_r07.json",
    "CORRECTNESS_r08.json",
)


def _prior_checked() -> set[str]:
    checked: set[str] = set()
    for rec in PRIOR_ROUNDS:
        path = os.path.join(os.path.dirname(__file__), "..", rec)
        if os.path.exists(path):
            checked |= set(json.load(open(path)))
    return checked


def test_driver_window_is_first_50():
    keys = list(registry.get_queries().keys())
    assert keys[: len(registry.DRIVER_WINDOW)] == registry.DRIVER_WINDOW
    assert len(registry.DRIVER_WINDOW) == 50


def test_window_covers_new_and_changed_queries():
    window = set(registry.DRIVER_WINDOW)
    assert PLAN_CHANGED_OR_NEW_IN_R9 <= window


def test_r8_debt_paid_first():
    """The 4 r05 rows round 8 deferred must head the window, in order
    — the rotation contract test_registry_order pinned last round."""
    assert registry.DRIVER_WINDOW[: len(DEFERRED_FROM_R8)] == DEFERRED_FROM_R8


def test_deferred_rows_are_known_and_green_elsewhere():
    """Every deferred row must be a real query with a prior driver
    green (they are debt, not gaps)."""
    window = set(registry.DRIVER_WINDOW)
    assert not (DEFERRED_TO_R10 & window)
    assert DEFERRED_TO_R10 <= set(registry.get_queries())
    assert DEFERRED_TO_R10 <= _prior_checked()


def test_no_evidence_older_than_r06_after_this_round():
    """The round-9 freshness goal (VERDICT r8 item 3): after this
    window lands, no query's newest driver row may be older than round
    6 — i.e. every query whose newest green is r05 or older must be IN
    the window now."""
    latest: dict[str, int] = {}
    for rec in PRIOR_ROUNDS:
        path = os.path.join(os.path.dirname(__file__), "..", rec)
        if os.path.exists(path):
            rnum = int(rec.split("_r")[1][:2])
            for q in json.load(open(path)):
                latest[q] = max(latest.get(q, 0), rnum)
    window = set(registry.DRIVER_WINDOW)
    stale = {
        q
        for q, r in latest.items()
        if r < 6 and q in registry.get_queries() and q not in NO_ORACLE_BY_DESIGN
    }
    assert stale <= window, f"r05-or-older evidence left outside: {sorted(stale - window)}"


def test_no_oracle_queries_stay_out_of_window():
    # sketches can never hash-match the DuckDB oracle; keep them out so
    # no window slot produces a guaranteed `no_oracle` row
    window = set(registry.DRIVER_WINDOW)
    assert not (NO_ORACLE_BY_DESIGN & window)
    for name in NO_ORACLE_BY_DESIGN:
        assert name in registry.get_queries()
        assert name not in registry.get_oracles()


def test_every_window_query_has_an_oracle():
    missing = set(registry.DRIVER_WINDOW) - set(registry.get_oracles())
    assert not missing, f"window rows with no oracle: {sorted(missing)}"


def test_every_query_has_a_driver_row_across_rounds():
    """Every registered checkable query either has a driver row from a
    prior round or sits in the current window (so it gets one now)."""
    checked = set(registry.DRIVER_WINDOW) | _prior_checked()
    unchecked = set(registry.get_queries()) - checked - NO_ORACLE_BY_DESIGN
    assert not unchecked, f"never driver-checked: {sorted(unchecked)}"


def test_every_query_still_registered():
    # the reorder must not drop or duplicate anything
    names = list(registry.get_queries().keys())
    assert len(names) == len(set(names))
    assert set(registry.DRIVER_WINDOW) <= set(names)
