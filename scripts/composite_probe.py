"""Composite-run accumulation probe (round-8, VERDICT r7 item 3).

BASELINE.md's full-sequence sf1 composite (25 probe queries, ONE
session) showed tail queries inflating up to 3x vs their solo records
(bpe_train_merges 22.6 vs 7.5 s).  This script reproduces the composite
with per-query instrumentation to attribute the gap:

- JVM heap used (Runtime.totalMemory - freeMemory) before each query;
- cumulative JVM GC time/count (all collectors, via
  ManagementFactory.getGarbageCollectorMXBeans);
- live RDD/storage block count (sc.getRDDStorageInfo length) and
  cached-table count, to catch cache/localCheckpoint residue that
  ``clearCache`` does not drop;
- live python worker count (pyspark.daemon children), to catch worker
  pool growth from Arrow/pandas stages.

Two modes, selected by SPARK_GRAFT_COMPOSITE_HYGIENE:

- unset/0 — round-7 protocol: ``cache.release()`` +
  ``spark.catalog.clearCache()`` between queries (the suspect run);
- 1 — adds explicit session hygiene after each query: a Python
  ``gc.collect()`` (drives the weakref finalizers + releases py4j
  handles so the JVM ContextCleaner can drop localCheckpoint RDD
  blocks and broadcasts) and a JVM ``System.gc()`` hint.

Usage: python scripts/composite_probe.py [sf_dir]  (default /tmp/mrfs_sf1)
Prints one JSON line per query and a summary; compare mode totals on a
quiet host (check uptime first — see BASELINE.md's noise caveat).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mrfs_sf1"
HYGIENE = os.environ.get("SPARK_GRAFT_COMPOSITE_HYGIENE", "0") == "1"


def main() -> None:
    import gc

    from pyspark.sql import SparkSession

    from map_reduce_framework_spark import cache
    from map_reduce_framework_spark.plans.registry import QUERIES
    from scale_probe import PROBE_QUERIES

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("mrfs-composite-probe")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.warehouse.dir", "/tmp/mrfs_warehouse_composite")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc.sc()

    def jvm_stats() -> dict:
        rt = jvm.java.lang.Runtime.getRuntime()
        heap_mb = (rt.totalMemory() - rt.freeMemory()) // (1 << 20)
        gc_ms = 0
        gc_n = 0
        it = (
            jvm.java.lang.management.ManagementFactory
            .getGarbageCollectorMXBeans().iterator()
        )
        while it.hasNext():
            b = it.next()
            gc_ms += max(b.getCollectionTime(), 0)
            gc_n += max(b.getCollectionCount(), 0)
        return {
            "heap_mb": int(heap_mb),
            "gc_ms": int(gc_ms),
            "gc_count": int(gc_n),
            "rdd_blocks": len(jsc.getRDDStorageInfo()),
        }

    results: dict[str, float] = {}
    prev = jvm_stats()
    for name in PROBE_QUERIES:
        t0 = time.time()
        try:
            n = QUERIES[name](spark, SF1).count()
        except Exception as e:  # keep probing the rest
            print(json.dumps({"query": name, "error": str(e)[:200]}))
            continue
        dt = round(time.time() - t0, 2)
        cache.release()
        spark.catalog.clearCache()
        if HYGIENE:
            gc.collect()
            jvm.java.lang.System.gc()
        cur = jvm_stats()
        results[name] = dt
        print(
            json.dumps(
                {
                    "query": name,
                    "sec": dt,
                    "rows": n,
                    "heap_mb": cur["heap_mb"],
                    "gc_ms_delta": cur["gc_ms"] - prev["gc_ms"],
                    "gc_n_delta": cur["gc_count"] - prev["gc_count"],
                    "rdd_blocks": cur["rdd_blocks"],
                }
            ),
            flush=True,
        )
        prev = cur
    print(
        json.dumps(
            {
                "metric": "composite_probe_total",
                "value": round(sum(results.values()), 2),
                "unit": "sec",
                "hygiene": HYGIENE,
                "queries": results,
                "sf_dir": SF1,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
