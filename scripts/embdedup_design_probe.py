"""Embedding-dedup decade probe: the banding work law at bounded output.

Two regimes, two findings (both recorded in BASELINE.md round 9):

1. **The label-clustered synthetic corpora are OUTPUT-bound.** gen_sf1's
   embeddings concentrate in 10 tight label blocks: at sf1 the true
   pair set is ~20.0 M pairs even at cosine ≥ 0.8 (≈ every within-label
   pair) — quadratic in the corpus at ANY threshold at or below the
   cluster cosine, at sf10 ~2×10⁹ pairs.  No candidate-generation
   scheme beats the size of its own answer; the production operator for
   that regime is ``dedup_semantic`` (cluster + per-cluster drop list —
   LINEAR output; it ran sf10 in 66 s warm), not pairwise reporting.

2. **The banding law needs the regime it was built for**: a corpus
   where near-duplicates are a bounded fraction, not all-pairs.  This
   probe synthesizes exactly that — n 64-d vectors, 5% planted
   near-dup clones (cos ≥ ~0.95 after perturbation), the rest random
   unit vectors (pairwise cos ~ N(0, 1/64); P(cos ≥ 0.8) ≈ 10⁻¹⁰, so
   output = the planted set) — at three decades (2k / 20k / 200k,
   matching sf0.1/sf1/sf10 vector counts) and times the REGISTERED
   ``dedup_embedding_cosine`` plan with the reporting threshold at the
   design cosine 0.8.  Expected law: exploded rows n·R with R stepping
   per ``EMB_BANDS`` (10 → 24 → 47), block occupancy ~EMB_BLOCK_TARGET
   — total work ~ n^1.33 at constant ≥ 0.95 design-point recall, with
   recall checkable against the planted pair list (reported).

Usage: python scripts/embdedup_design_probe.py [n1 n2 ...]
Prints one JSON line per corpus size.  Warm best-of-2.
Deterministic: numpy PCG64 seed 11.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = [int(a) for a in sys.argv[1:]] or [2_000, 20_000, 200_000]
DIM = 64
DUP_FRAC = 0.05


def gen_spread(n: int, out_dir: str) -> int:
    """n unit vectors, DUP_FRAC of them near-clones of earlier vectors.
    Returns the planted pair count."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.Generator(np.random.PCG64(11))
    n_dup = int(n * DUP_FRAC)
    base = rng.standard_normal((n - n_dup, DIM))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    src = rng.integers(0, n - n_dup, size=n_dup)
    # per-component sigma 0.04 → noise norm ≈ 0.32 → clone cosine ≈ 0.95
    clones = base[src] + 0.04 * rng.standard_normal((n_dup, DIM))
    clones /= np.linalg.norm(clones, axis=1, keepdims=True)
    emb = np.vstack([base, clones]).astype(np.float32)
    labels = np.zeros(n, dtype=np.int32)
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "doc_id": pa.array(range(n), pa.int64()),
                "label": pa.array(labels),
                "embedding": pa.array(
                    [emb[i] for i in range(n)], pa.list_(pa.float32())
                ),
            }
        ),
        os.path.join(out_dir, "embeddings.parquet"),
    )
    return n_dup


def main() -> None:
    from pyspark.sql import SparkSession

    from map_reduce_framework_spark import cache
    from map_reduce_framework_spark.operators import dedup
    from map_reduce_framework_spark.sources.tables import table_row_count

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("mrfs-embdedup-design-probe")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.warehouse.dir", "/tmp/mrfs_warehouse_embprobe")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    orig = dedup.COSINE_DUP_THRESHOLD
    dedup.COSINE_DUP_THRESHOLD = 0.8
    try:
        for n in SIZES:
            d = f"/tmp/mrfs_embspread_{n}"
            planted = gen_spread(n, d)
            nn = table_row_count(spark, d, "embeddings")
            r = dedup.adaptive_sign_bits(nn)
            times, rows = [], 0
            for _ in range(2):
                t0 = time.time()
                rows = dedup.dedup_embedding_cosine(spark, d).count()
                times.append(round(time.time() - t0, 2))
                cache.release()
                spark.catalog.clearCache()
            print(
                json.dumps(
                    {
                        "n_vectors": nn,
                        "r_bits": r,
                        "R_bands": dedup.EMB_BANDS[r],
                        "design_cosine": 0.8,
                        "sec": times[0],
                        "sec_warm": times[-1],
                        "pairs": rows,
                        "planted_dups": planted,
                    }
                )
            )
    finally:
        dedup.COSINE_DUP_THRESHOLD = orig
    spark.stop()


if __name__ == "__main__":
    main()
