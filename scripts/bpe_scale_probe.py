"""Production-vocab BPE probe: ground the 32k-merge extrapolation.

The registered ``bpe_train_merges`` trains 64 merges in ~8 batched
rounds; the scale claim (round-6 onward) is that a production vocab
costs ``merges / BPE_BATCH`` scheduled jobs with each round running on
the bounded (term, count) vocabulary table — i.e. wall time LINEAR in
the merge count with bounded per-round cost, provided lineage is
truncated (the per-round fold nests one plan level per round, and the
analyzer cost of a 4k-deep nested plan is itself superlinear).

The shipped synthetic corpora cannot ground that claim: their 31-word
vocabulary exhausts learnable merges below ~200.  BPE training scales
on the VOCABULARY axis, not the corpus axis (the corpus is touched
only by the round-0 word count), so this probe builds a
vocabulary-rich corpus — 40k distinct syllable-structured pseudo-words
under a Zipf distribution over 50k documents (the sf1 document count)
— and runs ``_bpe_train`` with ``checkpoint_every=16`` at 128 → 1024
merges, recording wall time, rounds, and sec/merge.  Linear-in-merges
wall at flat sec/merge is the law that makes the 32k extrapolation
(32k/8 = 4k rounds) credible; the checkpoint dial is what keeps plan
depth at ≤ 16 folds the whole way.

Usage: python scripts/bpe_scale_probe.py [out_dir]
Prints one JSON line per merge budget plus a summary line.
Deterministic: numpy PCG64 seed 7.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mrfs_bpe_vocab"
N_DOCS = 50_000
N_VOCAB = 40_000
WORDS_PER_DOC = 30
MERGE_BUDGETS = (128, 256, 512, 1024)
CHECKPOINT_EVERY = 16


def gen_corpus() -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.Generator(np.random.PCG64(7))
    syll = [
        c + v
        for c in "bcdfghjklmnprstvwz"
        for v in ("a", "e", "i", "o", "u", "ai", "on", "er")
    ]
    n_syll = rng.integers(2, 5, size=N_VOCAB)
    picks = rng.integers(0, len(syll), size=(N_VOCAB, 4))
    vocab = np.array(
        ["".join(syll[picks[i, j]] for j in range(n_syll[i])) for i in range(N_VOCAB)]
    )
    # Zipf-ish rank weights — hot heads give early high-count merges,
    # the long tail keeps later rounds from running dry
    w = 1.0 / (np.arange(1, N_VOCAB + 1) ** 1.1)
    w /= w.sum()
    ids = rng.choice(N_VOCAB, size=(N_DOCS, WORDS_PER_DOC), p=w)
    texts = [" ".join(vocab[row]) for row in ids]
    os.makedirs(OUT, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(N_DOCS), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * N_DOCS),
                "source": pa.array([f"src{i % 20}" for i in range(N_DOCS)]),
                "n_chars": pa.array([len(t) for t in texts], pa.int32()),
            }
        ),
        os.path.join(OUT, "documents.parquet"),
    )


def main() -> None:
    from pyspark.sql import SparkSession

    from map_reduce_framework_spark import cache
    from map_reduce_framework_spark.operators import text as T

    if not os.path.exists(os.path.join(OUT, "documents.parquet")):
        gen_corpus()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("mrfs-bpe-probe")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.warehouse.dir", "/tmp/mrfs_warehouse_bpeprobe")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setCheckpointDir("/tmp/mrfs_bpe_ckpt")

    results = []
    orig = (T.BPE_MERGES, T.BPE_ROUNDS_MAX)
    try:
        for budget in MERGE_BUDGETS:
            T.BPE_MERGES = budget
            T.BPE_ROUNDS_MAX = budget  # selection decides the real count
            t0 = time.time()
            merges, vocab_df = T._bpe_train(
                spark, OUT, checkpoint_every=CHECKPOINT_EVERY
            )
            n_vocab_rows = vocab_df.count()
            dt = round(time.time() - t0, 2)
            cache.release()
            spark.catalog.clearCache()
            rec = {
                "merges": len(merges),
                "rounds": T._LAST_TRAIN_ROUNDS,
                "sec": dt,
                "sec_per_merge": round(dt / len(merges), 4),
                "vocab_rows": n_vocab_rows,
                "checkpoint_every": CHECKPOINT_EVERY,
            }
            results.append(rec)
            print(json.dumps(rec))
    finally:
        T.BPE_MERGES, T.BPE_ROUNDS_MAX = orig
    base = results[0]
    last = results[-1]
    print(
        json.dumps(
            {
                "metric": "bpe_vocab_probe",
                "merge_ratio": round(last["merges"] / base["merges"], 2),
                "wall_ratio": round(last["sec"] / base["sec"], 2),
                "extrapolated_32k_merges_hours": round(
                    last["sec_per_merge"] * 32_000 / 3600, 2
                ),
                "n_docs": N_DOCS,
                "n_vocab": N_VOCAB,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
