"""Direct recall measurement for ``dedup_embedding_cosine`` (round-8,
VERDICT r7 item 5).

The operator blocks on ``adaptive_sign_bits(n)`` sign-LSH buckets with
Hamming-1 ghost replication; its recall was previously argued by
analogy to ``ann_lsh_bucketed``'s CI floor.  This probe measures it
DIRECTLY against exhaustive ground truth at the bit counts the
adaptive rule actually picks:

- ground truth: the full exact pair set {(i, j): round4(cos) >= 0.35}
  by blocked numpy GEMM over the unit-normalized corpus (exact is
  cheap at sf0.1/sf1: 2k/20k vectors);
- measured: the REGISTERED operator's emitted pair set;
- reported: overall recall, precision (should be exactly 1.0 — every
  emitted pair is exact-verified within its block), and per-cosine-band
  recall — the borderline band [0.35, 0.50) is the honest number,
  since sign-LSH misses concentrate just above threshold where the
  per-bit agreement probability is lowest.

Usage: python scripts/embdedup_recall_probe.py [sf_dir ...]
       (default: /root/testdata/sf0.1 /tmp/mrfs_sf1)
Prints one JSON line per sf_dir.  Recall is load-insensitive (no
timing), so this can run on a busy host.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIRS = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/mrfs_sf1"]
BANDS = ((0.35, 0.50), (0.50, 0.80), (0.80, 1.01))


def exact_pairs(vecs: np.ndarray, threshold: float) -> dict[tuple, float]:
    """All (i, j) i<j with round4(cosine) >= threshold, by blocked GEMM."""
    m = vecs / np.sqrt((vecs * vecs).sum(axis=1, keepdims=True))
    n = len(m)
    out: dict[tuple, float] = {}
    block = 4096
    for a0 in range(0, n, block):
        a1 = min(a0 + block, n)
        sims = m[a0:a1] @ m.T
        # same portable rounding as the engine/oracle
        sims = np.floor(sims * 1e4 + 0.5) / 1e4
        ia, ib = np.nonzero(sims >= threshold)
        for i, j in zip(ia, ib):
            gi = a0 + i
            if gi < j:
                out[(gi, j)] = sims[i, j]
    return out


def main() -> None:
    from pyspark.sql import SparkSession

    from map_reduce_framework_spark.operators.dedup import (
        COSINE_DUP_THRESHOLD,
        adaptive_sign_bits,
        dedup_embedding_cosine,
    )
    from map_reduce_framework_spark.sources import load_table

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("mrfs-embdedup-recall")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "48g")
        .config("spark.sql.warehouse.dir", "/tmp/mrfs_warehouse_recall")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    for sf_dir in DIRS:
        emb = (
            load_table(spark, sf_dir, "embeddings")
            .select("vec_id", "embedding")
            .toPandas()
            .sort_values("vec_id")
        )
        ids = emb["vec_id"].to_numpy()
        vecs = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
        idx_of = {v: i for i, v in enumerate(ids)}
        truth = exact_pairs(vecs, COSINE_DUP_THRESHOLD)
        got_rows = dedup_embedding_cosine(spark, sf_dir).collect()
        got = {
            (idx_of[r["id_a"]], idx_of[r["id_b"]]) for r in got_rows
        }
        n = len(ids)
        hits = len(set(truth) & got)
        band_stats = {}
        for lo, hi in BANDS:
            want = {p for p, c in truth.items() if lo <= c < hi}
            band_stats[f"recall_{lo:.2f}_{hi:.2f}"] = (
                round(len(want & got) / len(want), 4) if want else None
            )
        print(
            json.dumps(
                {
                    "probe": "embdedup_recall",
                    "sf_dir": sf_dir,
                    "n_vectors": n,
                    "bits": adaptive_sign_bits(n),
                    "n_true_pairs": len(truth),
                    "n_emitted_pairs": len(got),
                    "recall": round(hits / len(truth), 4) if truth else None,
                    "precision": (
                        round(hits / len(got), 4) if got else None
                    ),
                    **band_stats,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
