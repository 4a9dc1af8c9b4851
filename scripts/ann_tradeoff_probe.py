"""ANN recall/cost trade curve: sweep IVF probe width and LSH bit count
at sf1 and record recall@5 vs wall time, so the registered constants
(N_PROBE=2, LSH_SIGN_BITS=8) rest on a measured curve instead of
folklore (round-6 verdict, stretch item).

Method: 50 query vectors (the registered operators use 5 — too few for
a stable recall estimate; the probe widens the batch by monkeypatching
``similarity.N_QUERIES``, which the operators read at call time), exact
brute-force cosine top-5 as ground truth, then each sweep point runs
the REGISTERED operator with the dial passed explicitly (the operators
grew keyword dials in round 7; defaults unchanged).

Usage: python scripts/ann_tradeoff_probe.py [sf_dir]   (default /tmp/mrfs_sf1)
Prints one JSON line per sweep point + a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mrfs_sf1"
N_PROBE_SWEEP = (1, 2, 4, 8)
LSH_BITS_SWEEP = (4, 6, 8, 10)
RECALL_K = 5
PROBE_QUERIES = 50


def _topk_sets(rows, k) -> dict[int, set[int]]:
    by_q: dict[int, set[int]] = {}
    for r in rows:
        if r["rank"] <= k:
            by_q.setdefault(r["query_id"], set()).add(r["cand_id"])
    return by_q


def _recall(exact: dict, approx: dict) -> float:
    hits = total = 0
    for q, want in exact.items():
        got = approx.get(q, set())
        hits += len(want & got)
        total += len(want)
    return hits / total if total else 0.0


def main() -> None:
    from pyspark.sql import SparkSession

    from map_reduce_framework_spark.operators import similarity

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("mrfs-ann-tradeoff")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    similarity.N_QUERIES = PROBE_QUERIES

    t0 = time.time()
    exact_rows = similarity.ann_cosine_topk(spark, SF).collect()
    exact_sec = round(time.time() - t0, 2)
    exact = _topk_sets(exact_rows, RECALL_K)
    print(
        json.dumps(
            {
                "point": "exact_bruteforce",
                "sec": exact_sec,
                "n_queries": PROBE_QUERIES,
                "recall_at_5": 1.0,
            }
        )
    )

    results = []
    for n_probe in N_PROBE_SWEEP:
        t0 = time.time()
        rows = similarity.ann_ivf(spark, SF, n_probe=n_probe).collect()
        sec = round(time.time() - t0, 2)
        r = round(_recall(exact, _topk_sets(rows, RECALL_K)), 4)
        rec = {"point": f"ivf_nprobe={n_probe}", "sec": sec, "recall_at_5": r}
        results.append(rec)
        print(json.dumps(rec))

    for bits in LSH_BITS_SWEEP:
        for multiprobe in (False, True):
            t0 = time.time()
            rows = similarity.ann_lsh_bucketed(
                spark, SF, multiprobe=multiprobe, bits=bits
            ).collect()
            sec = round(time.time() - t0, 2)
            r = round(_recall(exact, _topk_sets(rows, RECALL_K)), 4)
            tag = "multi" if multiprobe else "single"
            rec = {
                "point": f"lsh_bits={bits}_{tag}",
                "sec": sec,
                "recall_at_5": r,
            }
            results.append(rec)
            print(json.dumps(rec))

    print(
        json.dumps(
            {
                "metric": "ann_tradeoff_probe",
                "sf_dir": SF,
                "exact_sec": exact_sec,
                "points": results,
            }
        )
    )


if __name__ == "__main__":
    main()
