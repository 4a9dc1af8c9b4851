"""contamination_embedding decade probe: GEMM path vs corpus size.

Round-11 measured the JVM higher-order-dot plan at a GC-bound 32× wall
across the 200k → 2M decade (1.71 → 54.8 s; BASELINE.md round-11
section) — per-row allocation of K boxed array pairs, not shuffle.
This probe times the REGISTERED query (now the mapInPandas GEMM kernel
with the boundary-exact rescue) on the same synthetic corpus shape:
n 64-dim unit vectors drawn around 32 weak cluster centers, benchmark
= the 8 lowest vec_ids (the operator's own convention).

Expected law: one scan, one BLAS call per Arrow batch, one row out per
row in — wall ~linear in n once past session overhead.

Usage: python scripts/contam_emb_probe.py [n1 n2 ...]
Defaults: 20_000 200_000 2_000_000.  Warm best-of-2; prints one JSON
line per size.  Deterministic: numpy PCG64 seed 7.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = [int(a) for a in sys.argv[1:]] or [20_000, 200_000, 2_000_000]
DIM = 64
CENTERS = 32


def gen(n: int, out_dir: str) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.Generator(np.random.PCG64(7))
    centers = rng.standard_normal((CENTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    lab = rng.integers(0, CENTERS, size=n)
    v = centers[lab] + 0.6 * rng.standard_normal((n, DIM))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    # build the list column from flat values + offsets — a .tolist()
    # round-trip at 2M×64 floats dominates the whole probe otherwise
    emb = pa.ListArray.from_arrays(
        pa.array(np.arange(0, (n + 1) * DIM, DIM, dtype=np.int32)),
        pa.array(v.astype("float32").ravel()),
    )
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": emb,
            "label": pa.array(lab, pa.int64()),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(tbl, os.path.join(out_dir, "embeddings.parquet"))


def main() -> None:
    from map_reduce_framework_spark import cache
    from map_reduce_framework_spark.plans.registry import QUERIES
    from map_reduce_framework_spark.session import get_spark

    spark = get_spark("contam-emb-probe", shuffle_partitions=32)
    fn = QUERIES["contamination_embedding"]
    for n in SIZES:
        d = f"/tmp/contam_probe_{n}"
        gen(n, d)
        best, rows = float("inf"), 0
        for _ in range(2):
            t0 = time.perf_counter()
            rows = fn(spark, d).count()
            best = min(best, time.perf_counter() - t0)
            cache.release()
            spark.catalog.clearCache()
        print(
            json.dumps(
                {
                    "n": n,
                    "warm_best_s": round(best, 2),
                    "rows": rows,
                    "load_1m": round(os.getloadavg()[0], 2),
                }
            ),
            flush=True,
        )
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
