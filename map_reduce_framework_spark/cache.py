"""Tracked operator caches: deterministic release of persisted intermediates.

Several operators ``persist()`` an intermediate that BOTH feeds the
returned (lazy) DataFrame and is consumed by more than one downstream
branch (posting lists, MinHash signatures, embedding matrices).  The
driver contract returns lazy DataFrames, so the operator itself cannot
``unpersist()`` before the caller's action without silently losing the
cache — instead every such persist registers here, and session owners
(bench loops, test fixtures, long-running drivers) call :func:`release`
between queries.

Why this is safe even for callers that never release: the default DF
storage level is MEMORY_AND_DISK with LRU eviction, so an uncooperative
session degrades to spill/recompute, never OOM.  Why it matters anyway:
a 50-query driver session otherwise accumulates every query's cached
intermediates in executor storage for the life of the session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """``df.persist()`` + register for later :func:`release`."""
    _TRACKED.append(df)
    return df.persist()


def release() -> int:
    """Unpersist every tracked cache; return how many were released."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            # session already stopped — nothing left to release
            pass
    return n
