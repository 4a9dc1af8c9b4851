"""Round-12 quiet decade probe: cleaning re-measure + the new queries.

Isolated-ish (one fresh session per invocation) warm best-of-2,
noop-write materialization, same method as the round-11 probes:

- pii_redact / encoding_repair — the round-11 verdict's item 9 asked
  for a QUIET re-measure of pii_redact's 14.1× decade (94.4 s @ sf10
  was captured on a loaded host), and encoding_repair's decade row is
  stale anyway (the table grew 6 → 117 entries this round);
- kn_perplexity_heldout / ccnet_buckets / quality_classifier_eval —
  first decade rows for the round-12 queries.

Usage: python scripts/probe_r12.py <sf_dir> [query ...]
Prints one JSON line per query.  Refuses if 1-min load > 1.0 unless
SPARK_GRAFT_MAX_LOAD overrides.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "pii_redact",
    "encoding_repair",
    "kn_perplexity_heldout",
    "ccnet_buckets",
    "quality_classifier_eval",
]


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    load = os.getloadavg()[0]
    bound = float(os.environ.get("SPARK_GRAFT_MAX_LOAD", "1.0"))
    if load > bound:
        print(f"refusing: load {load:.2f} > {bound}", file=sys.stderr)
        sys.exit(2)

    from map_reduce_framework_spark import cache
    from map_reduce_framework_spark.plans.registry import QUERIES
    from map_reduce_framework_spark.session import get_spark

    spark = get_spark("probe-r12", shuffle_partitions=32)
    for name in names:
        fn = QUERIES[name]
        best, rows = float("inf"), None
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            cache.release()
            spark.catalog.clearCache()
        rows = fn(spark, sf_dir).count()
        cache.release()
        spark.catalog.clearCache()
        print(
            json.dumps(
                {
                    "query": name,
                    "sf_dir": sf_dir,
                    "warm_best_s": round(best, 2),
                    "rows": rows,
                    "load_1m": round(os.getloadavg()[0], 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()

# NOTE (round-12 method): unlike the older probe scripts, this one uses
# the engine's get_spark(), whose heap defaults to 8 GB (vs their 48 g
# sessions) — export SPARK_GRAFT_DRIVER_MEM=48g for decade-3 corpora.
# The sf1/sf10 rows recorded in BASELINE.md ran (and passed) at 8 GB,
# which makes them CONSERVATIVE relative to the older probes.
