"""Round-14 per-query profiler: wall seconds + execution-shape metrics.

For each named query, runs it with the noop sink on a UI-enabled session
and reports, from the Spark UI REST API (the only place stage metrics
live without a listener bus hook):

- wall seconds (best of N, same protocol as bench.py),
- number of jobs / stages / tasks the materialization scheduled,
- total shuffle read/write bytes and records,
- aggregate executor run time vs wall (parallelism efficiency),
- memory/disk spill bytes.

This quantifies WHERE a query's seconds go (guide §1: measure first) —
a query whose task time is tiny but whose wall is seconds is paying
scheduling/exchange-count overhead, not compute; one with large shuffle
bytes needs §2.3; one with spill needs §5.

Usage: python scripts/profile_r14.py <sf_dir> <query> [query ...]
Prints one JSON line per query.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rest(port: int, path: str):
    with urllib.request.urlopen(
        f"http://localhost:{port}/api/v1/{path}", timeout=10
    ) as r:
        return json.load(r)


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    runs = int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "2"))

    from map_reduce_framework_spark import cache
    from map_reduce_framework_spark.plans.registry import QUERIES
    from map_reduce_framework_spark import session as mrfs_session

    # UI must be on for the REST API; mirror get_spark's configs exactly
    # by monkeypatching the builder's ui flag via a pre-set SparkConf is
    # messy — instead call get_spark, then verify; get_spark hardcodes
    # ui.enabled=false, so build an identical session here with UI on.
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("profile-r14")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/mrfs_warehouse"),
        )
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedJobs", "100000")
        .config("spark.ui.retainedStages", "100000")
        .getOrCreate()
    )
    assert mrfs_session  # imported for parity documentation only
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    port = int(ui.rsplit(":", 1)[1]) if ui else 4040
    app_id = spark.sparkContext.applicationId

    # warm-up (same as bench.py: JVM + parquet footers + Python workers)
    QUERIES["filter_project"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite"
    ).save()

    for name in names:
        fn = QUERIES[name]
        best, best_metrics = float("inf"), None
        for _ in range(runs):
            jobs_before = {j["jobId"] for j in rest(port, f"applications/{app_id}/jobs")}
            t0 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"profile:{name}")
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
            cache.release()
            spark.catalog.clearCache()
            jobs = [
                j
                for j in rest(port, f"applications/{app_id}/jobs")
                if j["jobId"] not in jobs_before
            ]
            stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
            stages = [
                s
                for s in rest(port, f"applications/{app_id}/stages")
                if s["stageId"] in set(stage_ids)
                and s["status"] == "COMPLETE"
            ]
            m = {
                "n_jobs": len(jobs),
                "n_stages": len(stages),
                "n_tasks": sum(s["numCompleteTasks"] for s in stages),
                "task_time_sec": round(
                    sum(s.get("executorRunTime", 0) for s in stages) / 1e3, 2
                ),
                "cpu_time_sec": round(
                    sum(s.get("executorCpuTime", 0) for s in stages) / 1e9, 2
                ),
                "shuffle_write_mb": round(
                    sum(s.get("shuffleWriteBytes", 0) for s in stages) / 1e6, 2
                ),
                "shuffle_read_mb": round(
                    sum(s.get("shuffleReadBytes", 0) for s in stages) / 1e6, 2
                ),
                "spill_disk_mb": round(
                    sum(s.get("diskBytesSpilled", 0) for s in stages) / 1e6, 2
                ),
                "input_mb": round(
                    sum(s.get("inputBytes", 0) for s in stages) / 1e6, 2
                ),
            }
            if dt < best:
                best, best_metrics = dt, m
        print(
            json.dumps(
                {"query": name, "sec": round(best, 3), **(best_metrics or {})}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
