"""Round-13 decade probe: third decade (5M-doc Zipf corpus) for the
round-12 families the verdict flagged as two-decade-only —
kn_perplexity_heldout, ccnet_buckets, quality_classifier_eval,
tokenizer_fertility — plus first decade rows for the round-13 queries
(dedup_image_phash, ann recall audits run on the shipped SFs only: the
Zipf corpus has no embeddings table).

Method matches the round-11/12 decade probes: one fresh session,
noop-write materialization, warm best-of-N (N via SPARK_GRAFT_PROBE_RUNS,
default 2; decade-3 runs use 1 — the "cold solo" precedent of the
round-11 sf100 column) and a rows count.  48 g heap for decade 3 via
SPARK_GRAFT_DRIVER_MEM, like every prior decade-3 probe.

Usage: python scripts/probe_r13.py <sf_dir> [query ...]
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
    "kn_perplexity_heldout",
    "ccnet_buckets",
    "quality_classifier_eval",
    "tokenizer_fertility",
]


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    load = os.getloadavg()[0]
    bound = float(os.environ.get("SPARK_GRAFT_MAX_LOAD", "1.0"))
    if load > bound:
        print(f"refusing: load {load:.2f} > {bound}", file=sys.stderr)
        sys.exit(2)
    runs = int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "2"))

    from map_reduce_framework_spark import cache
    from map_reduce_framework_spark.plans.registry import QUERIES
    from map_reduce_framework_spark.session import get_spark

    spark = get_spark("probe-r13", shuffle_partitions=32)
    for name in names:
        fn = QUERIES[name]
        best = float("inf")
        for _ in range(runs):
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
                    "runs": runs,
                    "rows": rows,
                    "load_1m": round(os.getloadavg()[0], 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
