"""The driver checks only the first 50 ``queries()`` entries (insertion
order) — lock in what lands inside that window.

Round-6 policy (CORRECTNESS_r05 was 50/50 green — pure evidence-
freshness rotation): the window holds (a) every query whose plan
changed this round (bucket-sliced windows, skew-safe gram-df cap
consumers, the q2 tiebreak), (b) the two round-1-only greens, (c) all
32 round-3-latest greens (oldest evidence on current code), (d) 10
round-4-latest greens picked for persist/cache exposure and sf1-probe
family coverage.  The two approx sketches are excluded permanently —
they can never hash-match DuckDB's sketches and would burn slots on
guaranteed `no_oracle` rows.
"""

from __future__ import annotations

import json
import os

from map_reduce_framework_spark.plans import registry

PLAN_CHANGED_IN_R6 = {
    "rolling_zscore",
    "window_range_interval",
    "pack_sequences",
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_incremental",
    "dedup_incremental_indexed",
    "tpch_q2_min_cost_supplier",
    "window_distribution",
    # salted two-phase ANN top-k (ann_ivf_kmeans shares the rewrite and
    # already sits in block d)
    "ann_cosine_topk",
    "ann_lsh_bucketed",
    "ann_ivf",
}

# r01-only greens: set_intersect yielded its slot to ann_ivf_indexed
# late in round 6 (trivially-stable plan, rotates back next round)
OLDEST_EVIDENCE = {"set_union_all"}

NO_ORACLE_BY_DESIGN = {"approx_distinct_hll", "approx_percentile_summary"}

PRIOR_ROUNDS = (
    "CORRECTNESS_r01.json",
    "CORRECTNESS_r03.json",
    "CORRECTNESS_r04.json",
    "CORRECTNESS_r05.json",
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
    assert PLAN_CHANGED_IN_R6 <= window
    assert OLDEST_EVIDENCE <= window


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
