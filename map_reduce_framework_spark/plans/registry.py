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
    dedup,
    graph,
    multimodal,
    relational,
    relational_ext,
    similarity,
    text,
    udfs,
    wordcount_client,
)

_MODULES = [
    relational,
    relational_ext,
    wordcount_client,
    dedup,
    graph,
    similarity,
    text,
    multimodal,
    udfs,
]


def _collect() -> tuple[dict, dict]:
    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for mod in _MODULES:
        for name, fn in getattr(mod, "QUERIES", {}).items():
            if name in queries:
                raise ValueError(f"duplicate query name {name!r} in {mod.__name__}")
            queries[name] = fn
        for name, sql in getattr(mod, "ORACLES", {}).items():
            if name in oracles:
                raise ValueError(f"duplicate oracle name {name!r} in {mod.__name__}")
            oracles[name] = sql
    missing = set(oracles) - set(queries)
    if missing:
        raise ValueError(f"oracles without queries: {sorted(missing)}")
    return queries, oracles


QUERIES, ORACLES = _collect()


def get_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def get_oracles() -> dict[str, str]:
    return dict(ORACLES)
