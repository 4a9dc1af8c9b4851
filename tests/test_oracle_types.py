"""Oracle OUTPUT-TYPE lint — every DuckDB oracle must emit only types
with an exact Spark/Arrow twin.

Why this exists: the round-9/10 driver red on ``interval_coalesce`` was a
pure TYPE divergence — DuckDB ``sum(int) OVER`` yields HUGEINT (int128),
which Arrow exports as ``decimal128(38,0)`` while the Spark side emits
int64; a driver that hashes typed values then diverges even though every
value is numerically equal (rows/schema green, hash red, locally
unreproducible via pandas where Python ints compare equal).  That class of
bug is invisible to value-level tests, so this lint bans it at the type
level for ALL oracles, not just the 50-row driver window.

``DESCRIBE <query>`` types the query through DuckDB's binder without
executing it, so the sweep covers every oracle in milliseconds.
"""

from __future__ import annotations

import re

import pytest

from map_reduce_framework_spark.plans import registry

# DuckDB types whose Arrow export is identical to what Spark emits for
# the same logical value.  Anything NOT on this list (HUGEINT, UBIGINT,
# any unsigned int, DECIMAL, INTERVAL, TIME, UUID, ENUM, BIT, ...) has
# no exact Spark twin and must be CAST in the oracle SQL.
_ALLOWED = {
    "BIGINT",
    "INTEGER",
    "SMALLINT",
    "TINYINT",
    "DOUBLE",
    "FLOAT",
    "VARCHAR",
    "BOOLEAN",
    "DATE",
    "TIMESTAMP",
    # DuckDB JSON is a VARCHAR alias at the Arrow boundary (string
    # payload); used by map_functions' to_json output.
    "JSON",
}

# container wrappers are fine as long as every leaf type is allowed:
#   BIGINT[]  /  STRUCT(a BIGINT, b VARCHAR)  /  VARCHAR[][]
_LEAF = re.compile(r"[A-Z_ ]+")


def _leaf_types(duck_type: str) -> set[str]:
    """Extract leaf type names from a (possibly nested) DuckDB type."""
    t = duck_type.upper()
    # strip DECIMAL(p,s) args so the word DECIMAL itself surfaces
    t = re.sub(r"\([0-9, ]*\)", "", t)
    # split on container syntax: [], STRUCT(...), MAP(...), commas, field names
    parts = re.split(r"[\[\](),]", t)
    leaves = set()
    for p in parts:
        p = p.strip()
        if not p or p in {"STRUCT", "MAP", "UNION"}:
            continue
        # struct fields come through as "name TYPE" — keep the last word
        leaves.add(p.split()[-1])
    return leaves


def test_every_oracle_emits_only_spark_twin_types(duck):
    oracles = registry.get_oracles()
    assert len(oracles) >= 170
    offenders: list[str] = []
    for name, sql in sorted(oracles.items()):
        rows = duck.execute("DESCRIBE " + sql).fetchall()
        for col, duck_type, *_ in rows:
            bad = _leaf_types(duck_type) - _ALLOWED
            if bad:
                offenders.append(f"{name}.{col}: {duck_type} (bad: {sorted(bad)})")
    assert not offenders, (
        "oracle columns with no exact Spark type twin (CAST them in the "
        "oracle SQL):\n  " + "\n  ".join(offenders)
    )


def test_leaf_extractor_flags_the_known_offender_shapes():
    """Pin the extractor itself so a regex regression can't silently
    whitelist HUGEINT again."""
    assert "HUGEINT" in _leaf_types("HUGEINT")
    assert "DECIMAL" in _leaf_types("DECIMAL(6,2)")
    assert "UBIGINT" in _leaf_types("UBIGINT")
    assert _leaf_types("BIGINT[]") == {"BIGINT"}
    assert _leaf_types("STRUCT(a BIGINT, b VARCHAR)") == {"BIGINT", "VARCHAR"}
    assert "HUGEINT" in _leaf_types("STRUCT(x HUGEINT)[]")


@pytest.mark.parametrize(
    "name", ["interval_coalesce", "map_functions", "record_linkage_scores"]
)
def test_round10_offenders_are_fixed(duck, name):
    """The three columns the round-11 sweep flagged (island HUGEINT,
    n_keys UBIGINT, score DECIMAL) must stay CAST."""
    rows = duck.execute("DESCRIBE " + registry.get_oracles()[name]).fetchall()
    types = {col: t for col, t, *_ in rows}
    if name == "interval_coalesce":
        assert types["island"] == "BIGINT"
    elif name == "map_functions":
        assert types["n_keys"] == "INTEGER"
    else:
        assert types["score"] == "DOUBLE"
