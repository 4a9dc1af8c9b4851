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
