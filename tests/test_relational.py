"""Oracle-equivalence tests for every registered query (driver-gate mirror)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from map_reduce_framework_spark.plans import registry

from .conftest import SF_DIR, assert_matches_oracle


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["query", "p_name"]
    # every returned name actually contains its query term
    for r in rows:
        assert r["query"] in r["p_name"]


def test_registry_consistency():
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) > 0


@pytest.mark.parametrize("name", sorted(registry.ORACLES))
def test_query_matches_oracle(spark, duck, name):
    assert_matches_oracle(
        spark, duck, registry.QUERIES[name], registry.ORACLES[name], name, SF_DIR
    )
