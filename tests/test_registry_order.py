"""The driver checks only the first 50 ``queries()`` entries (insertion
order) — lock in what lands inside that window.

Round-12 policy (CORRECTNESS_r11 was the first fully-green 50/50
window): the window holds (a) FIRST the 41 r08-green rows round 11
deferred — the pre-planned debt, honoured exactly as pinned in round
11's registry comment — (b) the round-12 plan/oracle changes and NEW
operators: contamination_embedding (mapInPandas GEMM kernel),
encoding_repair (generated full cp1252 table + checkpoint counts),
kn_perplexity_heldout (backoff + OOV floor), ccnet_buckets (perplexity
terciles capstone), quality_classifier_eval (held-out AUC/precision),
dedup_recall_audit (sampled LSH-recall governance audit),
tokenizer_fertility (per-language BPE fertility rollup),
ann_recall_audit (measured IVF recall@k) —
and (c) the alphabetically-first of the 40 r09-latest greens.  The
remaining 39 r09 rows are deferred to round 13 (named in registry.py —
rotate them in FIRST next round).  The two approx sketches are excluded
permanently — they can never hash-match DuckDB's sketches and would
burn slots on guaranteed `no_oracle` rows.
"""

from __future__ import annotations

import json
import os

from map_reduce_framework_spark.plans import registry

ORACLE_OR_PLAN_CHANGED_OR_NEW_IN_R12 = {
    # plan change: broadcast-crossJoin JVM higher-order dot → one BLAS
    # GEMM per Arrow batch + boundary-exact sequential rescue (output
    # identical; 13.7× at the 2M-vector decade)
    "contamination_embedding",
    # table + counts change: generated 117-entry cp1252 round-trip
    # table; counts = per-stage length checkpoints (replaces performed)
    "encoding_repair",
    # NEW: held-out Kneser–Ney with explicit backoff + 2^-20 OOV floor
    "kn_perplexity_heldout",
    # NEW: CCNet perplexity-tercile capstone (value-bucketed cuts)
    "ccnet_buckets",
    # NEW: held-out evaluation of the trained quality classifier
    "quality_classifier_eval",
    # NEW: sampled LSH-recall governance audit (engineered-miss pytest)
    "dedup_recall_audit",
    # NEW: per-language BPE fertility governance rollup
    "tokenizer_fertility",
    # NEW: measured IVF recall@k vs the exact scan (embedding-axis
    # audit twin)
    "ann_recall_audit",
}

#: r08-green rows deferred by round 11 — the debt this window pays FIRST
DEFERRED_FROM_R11 = [
    "date_arithmetic",
    "dedup_clusters",
    "dedup_exact",
    "dedup_exact_normalized",
    "dedup_index_maintain",
    "dedup_simhash",
    "distinct_keys",
    "embedding_norm_stats",
    "events_interval_join",
    "filter_project",
    "frame_sample_schedule",
    "funnel_analysis",
    "graph_triangle_stats",
    "group_having",
    "hash_sample",
    "histogram_totalprice",
    "join_anti",
    "join_cross",
    "join_outer",
    "join_semi",
    "kmeans_embeddings",
    "lateral_posexplode",
    "payload_chunks",
    "percentile_summary",
    "pivot_priority",
    "rollup_agg",
    "search_substring",
    "session_window_agg",
    "set_except",
    "set_intersect_all",
    "stats_agg",
    "top_k",
    "tpch_q11_important_stock",
    "tpch_q16_supplier_part_count",
    "tpch_q20_promo_stock_suppliers",
    "tpch_q5_local_supplier_volume",
    "tpch_q9_product_type_profit",
    "training_manifest",
    "unpivot_measures",
    "window_extended",
    "wordcount",
]

#: r09-latest rows deferred to round 13 for the block-b/c slots —
#: rotate these in FIRST next round (they go 4 rounds stale otherwise)
DEFERRED_TO_R13 = {
    "ann_cosine_topk",
    "ann_index_compact",
    "ann_ivf",
    "ann_ivf_indexed",
    "ann_ivf_kmeans",
    "ann_ivf_pq",
    "ann_ivf_pq_indexed",
    "ann_lsh_bucketed",
    "array_functions",
    "asof_join",
    "dedup_containment",
    "dedup_incremental",
    "dedup_incremental_bloom",
    "dedup_incremental_indexed",
    "dedup_index_compact",
    "dedup_ngram_jaccard",
    "dedup_pipeline_keeplist",
    "dedup_semantic_scalable",
    "distribution_drift",
    "embedding_quantize_int8",
    "fuzzy_edit_pairs",
    "global_rank_quality",
    "golden_record_assembly",
    "heavy_hitters",
    "kcore_membership",
    "leakage_safe_splits",
    "mr_wordcount_facade",
    "multimodal_features",
    "null_semantics",
    "pack_sequences",
    "quality_filter_rules",
    "rolling_zscore",
    "scalar_functions",
    "source_overlap_matrix",
    "stratified_sample",
    "tfidf_topterms",
    "token_budget_plan",
    "window_range_interval",
    "zorder_locality_audit",
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
    "CORRECTNESS_r09.json",
    "CORRECTNESS_r10.json",
    "CORRECTNESS_r11.json",
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
    assert ORACLE_OR_PLAN_CHANGED_OR_NEW_IN_R12 <= window


def test_r11_debt_paid_first():
    """The 41 r08 rows round 11 deferred must head the window, in order
    — the rotation contract test_registry_order pinned last round."""
    assert (
        registry.DRIVER_WINDOW[: len(DEFERRED_FROM_R11)] == DEFERRED_FROM_R11
    )


def test_deferred_rows_are_known_and_green_elsewhere():
    """Every deferred row must be a real query with a prior driver
    green (they are debt, not gaps)."""
    window = set(registry.DRIVER_WINDOW)
    assert not (DEFERRED_TO_R13 & window)
    assert DEFERRED_TO_R13 <= set(registry.get_queries())
    assert DEFERRED_TO_R13 <= _prior_checked()


def test_no_evidence_older_than_r09_after_this_round():
    """The round-12 freshness goal: after this window lands, no
    query's newest driver row may be older than round 9 — i.e. every
    query whose newest green is r08 or older must be IN the window
    now."""
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
        if r < 9 and q in registry.get_queries() and q not in NO_ORACLE_BY_DESIGN
    }
    assert stale <= window, (
        f"r08-or-older evidence left outside: {sorted(stale - window)}"
    )


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
