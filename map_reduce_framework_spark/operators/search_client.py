"""Search-client parity: the reference's one demo application, re-expressed.

Reference: Search.cpp — given a query substring and N folders, emit every
directory-entry name (non-recursive, all entry types, including ``.`` and
``..``; Search.cpp:191 uses raw ``readdir``) whose name contains the query,
printed space-separated in sorted order (Search.cpp:277-309; expected
output example spec PDF p.5: query "os" ⇒ ``osTargil sos``).

Semantics preserved:
- invalid/unreadable folder ⇒ contributes 0 rows, silently
  (Search.cpp:186-189);
- the containment filter runs in the *reduce* phase, as in the reference
  (Search.cpp:217-227) — the reference never did the cheaper map-side
  filter (SURVEY §4.1); the facade client keeps reduce-side filtering for
  parity, duplicates preserved (one output per matching entry, §2.3d);
- output sorted by key (the query word), §2.3a.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession

from ..mapreduce import run_map_reduce

NUM_OF_THREADS = 20  # reference default parallelism, Search.cpp:12


def _list_dir(query: str, folder: str):
    """Map fn (S1): one (query, entry_name) per directory entry.

    Emits ``.`` and ``..`` like readdir; silently emits nothing for an
    invalid path (Search.cpp:186-189).
    """
    try:
        names = [".", ".."] + sorted(os.listdir(folder))
    except OSError:
        return
    for name in names:
        yield query, name


def _filter_matches(query: str, names: list):
    """Reduce fn (S2/S3): keep names containing the query substring —
    reduce-side for parity with Search.cpp:217-227."""
    for name in names:
        if query in name:
            yield query, name


def search(
    spark: SparkSession,
    pairs: list[tuple[str, str]],
    num_partitions: int = NUM_OF_THREADS,
    log_path: str | None = None,
) -> list[tuple[str, str]]:
    """Run the Search query over (query, folder) input pairs.

    Returns (query, matching_name) pairs sorted by query (§2.3a); within a
    query, order is unspecified (§2.3b).
    """
    return run_map_reduce(
        spark, pairs, _list_dir, _filter_matches, num_partitions,
        log_path=log_path,
    )


def search_df(spark: SparkSession, pairs: list[tuple[str, str]]):
    """DataFrame-path Search: the scale variant of :func:`search`.

    The (query, folder) list becomes a DataFrame; directory listing runs
    *distributed* inside ``mapInPandas`` (each partition lists its own
    folders — the pattern for listing millions of prefixes on a cluster),
    filtering is a Catalyst ``contains`` predicate (map-side, unlike the
    reference's reduce-side filter), output is k3-ordered (§2.3a).
    Returns a DataFrame (query string, name string).
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import functions as F

    def list_entries(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            queries, names = [], []
            for q, folder in zip(pdf["query"], pdf["folder"]):
                try:
                    entries = [".", ".."] + sorted(os.listdir(folder))
                except OSError:
                    continue  # invalid path ⇒ 0 rows, silently
                queries.extend([q] * len(entries))
                names.extend(entries)
            yield pd.DataFrame({"query": queries, "name": names})

    input_df = spark.createDataFrame(pairs, "query string, folder string")
    return (
        input_df.mapInPandas(list_entries, "query string, name string")
        .where(F.col("name").contains(F.col("query")))
        .orderBy("query", "name")
    )


#: search_dir_listing fixture: files named after the first N part names
SEARCH_FIXTURE_PARTKEYS = 200
#: "ol" hits the "cold *" and "* bolt" part names (a non-trivial strict
#: subset of the fixture at every SF — never 0 rows, never all rows)
SEARCH_FIXTURE_QUERY = "ol"


def _fixture_dir(spark: SparkSession, sf_dir: str) -> str:
    """Materialize a deterministic directory fixture derived from the
    ``part`` table: one (empty) file per distinct ``p_name`` with
    ``p_partkey <= SEARCH_FIXTURE_PARTKEYS``.  Idempotent per sf_dir, so
    the driver can run the query repeatedly; collecting ≤200 dimension
    names driver-side is the fixture WRITE, not part of the measured
    query."""
    import hashlib
    import tempfile

    from ..sources import load_table

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    d = os.path.join(tempfile.gettempdir(), f"mrfs_search_fixture_{tag}")
    marker = os.path.join(d, ".complete")
    if not os.path.exists(marker):
        os.makedirs(d, exist_ok=True)
        from pyspark.sql import functions as F

        names = [
            r["p_name"]
            for r in load_table(spark, sf_dir, "part")
            .where(F.col("p_partkey") <= SEARCH_FIXTURE_PARTKEYS)
            .select("p_name")
            .distinct()
            .collect()
        ]
        for n in names:
            open(os.path.join(d, n), "w").close()
        open(marker, "w").close()
    return d


def search_dir_listing(spark: SparkSession, sf_dir: str):
    """S1 as a driver-checkable query: distributed directory listing +
    substring filter over a part-table-derived filesystem fixture.

    Exercises the full Search surface against a SQL oracle: the real
    ``os.listdir`` inside ``mapInPandas`` (S1, Search.cpp:172-202
    semantics incl. ``.``/``..`` and the silent invalid-folder skip — an
    invalid folder is included in the input), Catalyst ``contains``
    (S2), and k3 ordering (O5).  The oracle reproduces the listing
    relationally from ``part``.  The ``.complete`` marker file is
    excluded from both sides (fixture bookkeeping, not a directory
    entry under test)."""
    from pyspark.sql import functions as F

    d = _fixture_dir(spark, sf_dir)
    pairs = [
        (SEARCH_FIXTURE_QUERY, d),
        (SEARCH_FIXTURE_QUERY, os.path.join(d, "does-not-exist")),
    ]
    return search_df(spark, pairs).where(F.col("name") != ".complete")


ORACLES = {
    "search_dir_listing": f"""
        WITH entries AS (
            SELECT DISTINCT p_name AS name FROM part
            WHERE p_partkey <= {SEARCH_FIXTURE_PARTKEYS}
            UNION ALL SELECT '.' UNION ALL SELECT '..')
        SELECT '{SEARCH_FIXTURE_QUERY}' AS query, name
        FROM entries
        WHERE position('{SEARCH_FIXTURE_QUERY}' IN name) > 0
        ORDER BY query, name
    """,
}

QUERIES = {
    "search_dir_listing": search_dir_listing,
}


def main(argv: list[str] | None = None) -> int:
    """CLI parity with Search.cpp:277-309: ``search <substring> <folders...>``.

    Like the reference, every run writes the ``.MapReduceFramework.log``
    side-file in the working directory (the reference opens it
    unconditionally in the run prologue, MapReduceFramework.cpp:685);
    library callers of :func:`search` still opt in via ``log_path``."""
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) < 1:
        print("Usage: <substring to search> <folders, separated by space>", file=sys.stderr)
        return 1
    query, folders = argv[0], argv[1:]
    from ..mapreduce import DEFAULT_LOG_PATH
    from ..session import get_spark

    spark = get_spark("search-client")
    out = search(
        spark, [(query, f) for f in folders], log_path=DEFAULT_LOG_PATH
    )
    print(" ".join(name for _, name in out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
