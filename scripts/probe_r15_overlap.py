"""Round-15 §2.6 overlap A/B: interleaved same-session measurement.

The composite queries read ``SPARK_GRAFT_OVERLAP`` at construction
time, so ONE session can alternate overlap-on/overlap-off runs of the
same query back-to-back — the only comparison this host's external
load bursts cannot fake (BASELINE.md noise protocol).  For each query:

- N interleaved (on, off) wall pairs with the noop sink,
- per-variant min + all samples,
- for the final ON run, the job time-windows from the UI REST API and
  the summed pairwise overlap seconds — deterministic evidence that
  independent branches actually ran concurrently.

Usage: python scripts/probe_r15_overlap.py <sf_dir> <query> [query ...]
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
    pairs = int(os.environ.get("SPARK_GRAFT_PROBE_PAIRS", "3"))

    from pyspark.sql import SparkSession

    from map_reduce_framework_spark import cache
    from map_reduce_framework_spark.plans.registry import QUERIES

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("probe-r15-overlap")
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
    spark.sparkContext.setLogLevel("ERROR")
    port = spark.sparkContext.uiWebUrl.rsplit(":", 1)[1]
    app_id = spark.sparkContext.applicationId

    # warm-up: parquet footers + Python worker pool
    QUERIES["filter_project"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(int(cpus) * 4).repartition(int(cpus)).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    def run_once(name: str) -> tuple[float, int, int]:
        """(wall, first_job_id, last_job_id) of one noop-sink run."""
        st = spark.sparkContext.statusTracker()
        before = max(st.getJobIdsForGroup() or [-1])
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.perf_counter() - t0
        after = max(st.getJobIdsForGroup() or [-1])
        cache.release()
        spark.catalog.clearCache()
        return wall, before + 1, after

    for name in names:
        out = {"query": name, "on": [], "off": [], "pairs": pairs}
        last_on_jobs = None
        for _ in range(pairs):
            os.environ["SPARK_GRAFT_OVERLAP"] = "1"
            w, j0, j1 = run_once(name)
            out["on"].append(round(w, 3))
            last_on_jobs = (j0, j1)
            os.environ["SPARK_GRAFT_OVERLAP"] = "0"
            w, _, _ = run_once(name)
            out["off"].append(round(w, 3))
        os.environ.pop("SPARK_GRAFT_OVERLAP", None)
        out["min_on"] = min(out["on"])
        out["min_off"] = min(out["off"])
        # overlap evidence from the last ON run's job windows
        j0, j1 = last_on_jobs
        jobs = [
            j
            for j in rest(port, f"applications/{app_id}/jobs?status=succeeded")
            if j0 <= j["jobId"] <= j1
        ]
        def ms(s):
            return time.mktime(
                time.strptime(s[:19], "%Y-%m-%dT%H:%M:%S")
            ) * 1000 + float(s[20:23] or 0)
        spans = sorted(
            (ms(j["submissionTime"]), ms(j["completionTime"]))
            for j in jobs
            if "completionTime" in j
        )
        overlap_ms = 0.0
        for i, (s, e) in enumerate(spans):
            for s2, e2 in spans[i + 1 :]:
                if s2 >= e:
                    break
                overlap_ms += min(e, e2) - s2
        out["n_jobs_on"] = len(spans)
        out["job_overlap_sec"] = round(overlap_ms / 1000, 3)
        print(json.dumps(out))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
