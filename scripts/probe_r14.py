"""Round-14 decade probe.

Validates the round's two execution rewrites at the decades where their
walls were measured, and gives the round-13 late operators their decade
rows (round-13 verdict items 3, 4, 6):

- kn_perplexity_heldout / ccnet_buckets — the distinct-trigram scoring
  join (spill fix) vs the 284.6 / 1386.2 s round-13 decade-3 walls;
- dedup_image_phash / dedup_audio_fingerprint / media_dedup_clusters —
  the vectorized md5-grid + batched banding kernels vs 161.7 / 127.0 /
  300.9 s;
- dedup_media_incremental — first decade rows (ingest screen);
- STREAM:fingerprint / STREAM:media_ingest — the streaming demos, timed
  end-to-end (feed staging included; they are driver-orchestrated
  demos, not registry queries).

Method matches probe_r13: one fresh session, noop-write
materialization, warm best-of-N (SPARK_GRAFT_PROBE_RUNS, default 2;
decade-3 runs use 1 — cold solo precedent), rows count.  48 g heap for
decade 3 via SPARK_GRAFT_DRIVER_MEM.

Usage: python scripts/probe_r14.py <sf_dir> [query ...]
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
    "dedup_image_phash",
    "dedup_audio_fingerprint",
    "media_dedup_clusters",
    "dedup_media_incremental",
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

    spark = get_spark("probe-r14", shuffle_partitions=32)

    def run_one(name):
        if name == "STREAM:fingerprint":
            from map_reduce_framework_spark.streaming.fingerprint_stream import (
                run_fingerprint_stream_demo,
            )

            return lambda: run_fingerprint_stream_demo(spark, sf_dir)
        if name == "STREAM:media_ingest":
            from map_reduce_framework_spark.streaming.media_ingest_stream import (
                run_streaming_media_ingest_demo,
            )

            return lambda: run_streaming_media_ingest_demo(spark, sf_dir)
        fn = QUERIES[name]
        return lambda: fn(spark, sf_dir)

    for name in names:
        fn = run_one(name)
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            cache.release()
            spark.catalog.clearCache()
        rows = fn().count()
        cache.release()
        spark.catalog.clearCache()
        print(
            json.dumps(
                {
                    "query": name,
                    "sf_dir": sf_dir,
                    "best_sec": round(best, 2),
                    "runs": runs,
                    "rows": rows,
                    "load_1m": round(os.getloadavg()[0], 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
