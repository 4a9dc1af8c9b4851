"""Scale probe for the round-9 second-batch operators.

Runs each new operator at the given SF dirs (warm best-of-2, noop sink)
and prints one JSON line per (query, sf).  The TPC-H-backed audits
(expectations_audit, key_skew_profile) probe across the SHIPPED decade
sf0.01 → sf0.1 (gen_sf1 emits only documents/embeddings/events); the
documents/events-backed operators probe the generated sf1/sf10 dirs.

Usage: python scripts/probe_r9b.py <sf_dir> <query> [<query> ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    from pyspark.sql import SparkSession

    from map_reduce_framework_spark import cache
    from map_reduce_framework_spark.plans.registry import QUERIES

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("mrfs-probe-r9b")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.warehouse.dir", "/tmp/mrfs_warehouse_probe")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn = QUERIES[name]
        best, rows = float("inf"), -1
        for _ in range(2):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            rows = df.count()
            best = min(best, time.perf_counter() - t0)
            cache.release()
            spark.catalog.clearCache()
        print(
            json.dumps(
                {
                    "probe": name,
                    "sf_dir": sf_dir,
                    "rows": rows,
                    "wall_s": round(best, 2),
                    "load_1m": round(os.getloadavg()[0], 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
