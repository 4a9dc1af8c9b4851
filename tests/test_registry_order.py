"""The driver checks only the first 50 ``queries()`` entries (insertion
order) — lock in what lands inside that window.

Round-5 policy (CORRECTNESS_r04 was 50/50 green): the window holds
(a) the six new TPC-H breadth queries (never driver-checked), (b) the
three queries whose plans changed this round, (c) all 25 round-1-only
greens (oldest evidence), (d) 16 round-3-only greens picked for
cache-adopt exposure and timestamp sensitivity.  The two approx
sketches are excluded permanently — they can never hash-match DuckDB's
sketches and would burn slots on guaranteed `no_oracle` rows.
"""

from __future__ import annotations

import json
import os

from map_reduce_framework_spark.plans import registry

NEW_IN_R5 = {
    "tpch_q2_min_cost_supplier",
    "tpch_q5_local_supplier_volume",
    "tpch_q9_product_type_profit",
    "tpch_q11_important_stock",
    "tpch_q16_supplier_part_count",
    "tpch_q20_promo_stock_suppliers",
    "dedup_containment",
    "dedup_incremental_indexed",
}

PLAN_CHANGED_IN_R5 = {"graph_triangle_stats", "bm25_topk", "rolling_zscore"}

NO_ORACLE_BY_DESIGN = {"approx_distinct_hll", "approx_percentile_summary"}

PRIOR_ROUNDS = (
    "CORRECTNESS_r01.json",
    "CORRECTNESS_r03.json",
    "CORRECTNESS_r04.json",
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
    assert NEW_IN_R5 <= window
    assert PLAN_CHANGED_IN_R5 <= window


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
