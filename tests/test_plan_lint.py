"""Plan lint: structural anti-pattern sweep over EVERY registered query.

test_plans.py asserts positive plan properties on chosen exemplars; this
suite asserts the NEGATIVE space across the whole registry — no
unbounded cartesian product and no row-at-a-time Python evaluation may
appear in any query's physical plan.  Both are 100×-scale performance
bugs that value-level tests can never catch.

Plans are built (not executed) at the smallest SF.  Queries whose
CONSTRUCTION trains a model (k-means) execute small jobs while building;
they are included anyway — the lint inspects their final plan like any
other.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from map_reduce_framework_spark.plans import registry

from .conftest import SF_DIR

#: queries whose plan legitimately contains a CartesianProduct: the
#: deliberate cross-join exemplar only.  Broadcast-scalar crossJoins
#: (avgdl, n_docs, spines) plan as BroadcastNestedLoopJoin, which is
#: fine — a broadcast of 1-row/dim-sized sides, not a shuffle product.
CARTESIAN_OK = {"join_cross"}

#: queries allowed to evaluate Python row-at-a-time: the Spark-4 Python
#: UDTF (its evaluation node is the UDTF contract, Arrow-optimized via
#: the session conf, but plans print as BatchEvalPythonUDTF).
ROW_PYTHON_OK = {"python_udtf_tokens"}


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_no_structural_antipatterns(spark, name):
    from map_reduce_framework_spark import cache

    try:
        plan = _plan(registry.QUERIES[name](spark, SF_DIR))
    finally:
        cache.release()
    if name not in CARTESIAN_OK:
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    if name not in ROW_PYTHON_OK:
        assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python"


#: columns with a handful of distinct values at any scale — a Window
#: partitioned ONLY by these serializes each key's whole history into
#: one task (the round-6 "wrong plan at 100 TB" class; fixed by
#: bucket-slicing or partial-agg+join rewrites)
LOW_CARD_COLS = {
    "event_type", "source", "lang", "kind", "pred_lang",
    "l_returnflag", "l_linestatus", "quality_bucket", "o_orderpriority",
}

#: queries whose plan legitimately windows a LOW-CARD key: the second
#: phase of a two-pass decomposition, where the window input is the
#: BUCKET-LEVEL aggregate (one row per (key, bucket) — kilobytes per
#: key even at 100 TB), not the raw table.  Each is individually
#: plan-audited in test_plans/test_bucket_windows.
AGGREGATE_PHASE_WINDOW_OK = {
    "rolling_zscore",
    "window_range_interval",
    "pack_sequences",
    "window_distribution",
    "mr_wordcount_facade",  # facade contract: global k3 sort of tiny output
    # tercile cuts run over the DISTINCT-(pred_lang, ppl) value table
    # (Window directly above HashAggregate(keys=[pred_lang, ppl]) —
    # bounded by 4-dp value cardinality, never the corpus); audited in
    # test_bucket_windows.test_ccnet_windows_run_over_the_value_table
    "ccnet_buckets",
}

import re  # noqa: E402

_WSPEC = re.compile(r"windowspecdefinition\(([^)]*)\)")


def _partition_cols(plan: str) -> list[set]:
    """Partition-column-name sets for every window spec in a plan."""
    specs = []
    for m in _WSPEC.finditer(plan):
        cols = set()
        for arg in m.group(1).split(","):
            arg = arg.strip()
            if " ASC" in arg or " DESC" in arg or "specifiedwindowframe" in arg:
                break  # order spec begins — partition spec is done
            name = arg.split("#")[0].strip()
            if name:
                cols.add(name)
        specs.append(cols)
    return specs


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_no_low_cardinality_windows(spark, name):
    """No query may window a RAW table by a low-cardinality key alone:
    every window must carry at least one high-cardinality or bucket
    column in its partition spec (or be an allow-listed second-phase
    window over bucket-level aggregates)."""
    if name in AGGREGATE_PHASE_WINDOW_OK:
        pytest.skip("audited second-phase window over bucket aggregates")
    from map_reduce_framework_spark import cache

    try:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            registry.QUERIES[name](spark, SF_DIR).explain(mode="simple")
        plan = buf.getvalue()
    finally:
        cache.release()
    for cols in _partition_cols(plan):
        if cols:  # global windows are audited case-by-case elsewhere
            assert not cols <= LOW_CARD_COLS, (
                f"{name}: window partitioned only by low-cardinality "
                f"{sorted(cols)} — one task per key at scale"
            )
