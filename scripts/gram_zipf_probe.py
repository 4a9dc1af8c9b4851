"""Zipfian-vocabulary scale probe for the gram family (round-10,
verdict items 4 + 8).

The sf1/sf10 corpora from gen_sf1.py reuse the shipped 31-word
vocabulary, so at sf10 ALL 29,791 possible 3-grams cross
``NGRAM_DF_CAP`` and the gram operators' second-decade behavior is
unmeasurable ("cap saturation", BASELINE.md round 9).  Real corpora
are Zipfian: a hot head of grams crosses any df cap (and is dropped —
that is the cap's job) while the long tail carries the discriminative
postings.  This probe builds that corpus and gives ngram_jaccard /
containment / winnowing / simhash / kcore their honest two-decade
rows.

Corpus: 40k syllable-structured pseudo-words (the bpe_scale_probe
generator's construction) under a Zipf(s=1.1) rank law, 10-100-word
documents, ~5% planted near-dups (single-token perturbation) and
~0.2% exact dups — the same duplication statistics as gen_sf1.py, so
operator outputs are non-trivial and comparable.  Scales: 1× = 50k
docs, 10× = 500k docs (the same decade step as the round-9 probes).

Usage:
    python scripts/gram_zipf_probe.py               # both decades
    python scripts/gram_zipf_probe.py 10            # one scale only
Env: SPARK_GRAFT_PROBE_RUNS=2 for cold+warm rows (recommended);
     SPARK_GRAFT_ZIPF_QUERIES=a,b to override the query list.
Prints one JSON line per (scale, query) plus df-cap stats per scale.
Deterministic: numpy PCG64 seed 11.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS_BASE = 50_000
N_VOCAB = 40_000
ZIPF_S = 1.1
NEAR_DUP_FRAC = 0.05
EXACT_DUP_FRAC = 0.002
OUT_TMPL = "/tmp/mrfs_zipf_sf{scale}"

PROBE_QUERIES = [
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_winnowing",
    "dedup_simhash",
    "kcore_membership",
]


def gen_corpus(out: str, scale: int) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.Generator(np.random.PCG64(11))
    syll = [
        c + v
        for c in "bcdfghjklmnprstvwz"
        for v in ("a", "e", "i", "o", "u", "ai", "on", "er")
    ]
    n_syll = rng.integers(2, 5, size=N_VOCAB)
    picks = rng.integers(0, len(syll), size=(N_VOCAB, 4))
    vocab = np.array(
        [
            "".join(syll[picks[i, j]] for j in range(n_syll[i]))
            for i in range(N_VOCAB)
        ]
    )
    w = 1.0 / (np.arange(1, N_VOCAB + 1) ** ZIPF_S)
    w /= w.sum()
    n_docs = N_DOCS_BASE * scale
    # pre-draw the whole Zipf word stream in ONE choice() call (a
    # per-doc choice with a 40k-dim p is pathologically slow, and a
    # uniform rng.integers draw — the bug the first probe run caught
    # via max_df=7 — is not Zipfian at all)
    lens = rng.integers(10, 101, size=n_docs)
    pool = rng.choice(N_VOCAB, size=int(lens.sum()), p=w)
    off = 0
    texts: list[str] = []
    for i in range(n_docs):
        n = int(lens[i])
        fresh = " ".join(vocab[pool[off : off + n]])
        off += n
        r = rng.random()
        if i > 10 and r < EXACT_DUP_FRAC:
            texts.append(texts[int(rng.integers(0, i))])
        elif i > 10 and r < EXACT_DUP_FRAC + NEAR_DUP_FRAC:
            base = texts[int(rng.integers(0, i))].split()
            base[-1] = vocab[int(rng.integers(0, N_VOCAB))]
            texts.append(" ".join(base))
        else:
            texts.append(fresh)
    langs = rng.choice(
        ["en", "de", "es", "fr", "zh"], size=n_docs, p=[0.41, 0.14, 0.15, 0.14, 0.16]
    )
    os.makedirs(out, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n_docs), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
                "source": pa.array(
                    [f"src{i % 20}" for i in range(n_docs)], pa.string()
                ),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(out, "documents.parquet"),
    )
    print(json.dumps({"probe": "zipf_gen", "scale": scale, "n_docs": n_docs}))


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from map_reduce_framework_spark import cache
    from map_reduce_framework_spark.operators import dedup
    from map_reduce_framework_spark.plans.registry import QUERIES
    from map_reduce_framework_spark.sources import load_table

    scales = [int(a) for a in sys.argv[1:]] or [1, 10]
    queries = PROBE_QUERIES
    subset = os.environ.get("SPARK_GRAFT_ZIPF_QUERIES")
    if subset:
        queries = [q.strip() for q in subset.split(",") if q.strip()]
    runs = int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "1"))

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("mrfs-zipf-probe")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.warehouse.dir", "/tmp/mrfs_warehouse_zipf")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setCheckpointDir("/tmp/mrfs_zipf_ckpt")

    for scale in scales:
        out = OUT_TMPL.format(scale=scale)
        if not os.path.exists(os.path.join(out, "documents.parquet")):
            gen_corpus(out, scale)
        # df-cap regime check: a Zipf corpus should cap the HEAD and
        # keep the tail — nonzero n_capped but small vs n_grams
        docs = dedup.fan_out(load_table(spark, out, "documents"))
        posting = dedup._shingled_docs(docs, with_hashes=True).select(
            "doc_id", F.explode("gh").alias("g")
        )
        dfs = posting.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
        stats = dfs.agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.max("df").alias("max_df"),
            F.sum(
                F.when(F.col("df") > dedup.NGRAM_DF_CAP, 1).otherwise(0)
            ).alias("n_capped"),
        ).collect()[0]
        print(
            json.dumps(
                {
                    "probe": "zipf_df_cap",
                    "scale": scale,
                    "n_grams": stats["n_grams"],
                    "max_df": stats["max_df"],
                    "n_capped_grams": stats["n_capped"],
                    "cap": dedup.NGRAM_DF_CAP,
                }
            )
        )
        cache.release()
        spark.catalog.clearCache()
        results = {}
        for name in queries:
            try:
                times, n = [], 0
                for _ in range(runs):
                    t0 = time.time()
                    # noop WRITE, not count(): under count() Catalyst
                    # prunes unused output branches (e.g. span_clip's
                    # whole text rebuild — measured 2.6 s vs 16.9 s
                    # materialized), so count() under-times any
                    # wide-output operator
                    QUERIES[name](spark, out).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    times.append(round(time.time() - t0, 2))
                    cache.release()
                    spark.catalog.clearCache()
                n = QUERIES[name](spark, out).count()  # untimed row check
                cache.release()
                spark.catalog.clearCache()
                results[name] = times[-1]
                rec = {"scale": scale, "query": name, "sec": times[0], "rows": n}
                if runs > 1:
                    rec["sec_warm"] = times[-1]
                print(json.dumps(rec))
            except Exception as e:
                print(
                    json.dumps(
                        {"scale": scale, "query": name, "error": str(e)[:200]}
                    )
                )
                cache.release()
                spark.catalog.clearCache()
        print(
            json.dumps(
                {
                    "metric": f"zipf_scale_probe_sf{scale}",
                    "value": round(sum(results.values()), 2),
                    "unit": "sec",
                    "queries": results,
                    "scale": scale,
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
