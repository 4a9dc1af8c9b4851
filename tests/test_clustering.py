"""K-means trainer: structure, determinism, and that training helps."""

from __future__ import annotations

import numpy as np

from map_reduce_framework_spark.operators import clustering
from map_reduce_framework_spark.operators.dedup import fan_out
from map_reduce_framework_spark.sources import load_table

from .conftest import SF_DIR


def test_kmeans_partitions_the_corpus(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    total = emb.count()
    rows = clustering.kmeans_embeddings(spark, SF_DIR).collect()
    assert len(rows) == clustering.K_CLUSTERS
    assert sum(r.n_points for r in rows) == total
    assert [r.cid for r in rows] == sorted(r.cid for r in rows)


def test_kmeans_training_reduces_mean_distance(spark):
    """After KMEANS_ITERS Lloyd steps, mean point→centroid distance must
    beat the untrained init (the K lowest-vec_id vectors)."""
    emb = (
        fan_out(load_table(spark, SF_DIR, "embeddings"))
        .select("vec_id", "embedding")
        .persist()
    )
    init = emb.select("embedding").orderBy("vec_id").limit(
        clustering.K_CLUSTERS
    ).collect()
    C0 = np.array([r.embedding for r in init], dtype=np.float64)
    C = clustering.train_kmeans(emb)

    def mean_dist(centroids):
        assigned = emb.mapInPandas(
            clustering._assign_fn(centroids), clustering._ASSIGN_SCHEMA
        )
        return assigned.agg({"dist": "avg"}).collect()[0][0]

    assert mean_dist(C) < mean_dist(C0)


def test_kmeans_deterministic(spark):
    a = clustering.kmeans_embeddings(spark, SF_DIR).collect()
    b = clustering.kmeans_embeddings(spark, SF_DIR).collect()
    assert a == b


def test_dedup_semantic_survivors_precede_drops(spark):
    """Every dropped vector's survivor has a lower id, lives in the same
    cluster, and is itself never dropped by that survivor chain's head."""
    from map_reduce_framework_spark.operators.clustering import dedup_semantic

    from .conftest import SF_DIR

    drops = dedup_semantic(spark, SF_DIR).collect()
    assert len(drops) > 0
    dropped_ids = {r.vec_id for r in drops}
    for r in drops:
        assert r.dup_of < r.vec_id
        assert r.cosine >= 0.35
    # the lowest id of every cluster's drop chain survives: a dup_of that
    # is itself dropped must point transitively to an undropped vector
    dup_of = {r.vec_id: r.dup_of for r in drops}
    for r in drops:
        seen, cur = set(), r.dup_of
        while cur in dup_of:
            assert cur not in seen, "cycle in dup chains"
            seen.add(cur)
            cur = dup_of[cur]
        assert cur not in dropped_ids


def test_semantic_k_scales_with_corpus():
    """dedup_semantic's cluster count must grow with the corpus so
    within-cluster GEMM blocks stay ≈SEM_TARGET_BLOCK vectors (the
    round-6 constant-K weak class)."""
    from map_reduce_framework_spark.operators.clustering import (
        K_CLUSTERS,
        SEM_TARGET_BLOCK,
        semantic_k,
    )

    assert semantic_k(500) == K_CLUSTERS      # sf0.01: trajectory unchanged
    assert semantic_k(2_000) == K_CLUSTERS    # sf0.1: trajectory unchanged
    assert semantic_k(20_000) == 79           # sf1: blocks bounded
    for n in (10**6, 10**9):
        k = semantic_k(n)
        # expected block size within one target of the dial
        assert n / k <= SEM_TARGET_BLOCK
        assert k >= n // SEM_TARGET_BLOCK
    # 10x the corpus -> ~10x the clusters (linear, not constant)
    assert 9 <= semantic_k(10**7) / semantic_k(10**6) <= 11


def test_dedup_semantic_scalable_matches_oracle(spark, duck):
    from map_reduce_framework_spark.operators.clustering import (
        ORACLES,
        dedup_semantic_scalable,
    )

    from .conftest import assert_matches_oracle

    assert_matches_oracle(
        spark,
        duck,
        dedup_semantic_scalable,
        ORACLES["dedup_semantic_scalable"],
        "dedup_semantic_scalable",
    )


def test_dedup_semantic_scalable_catches_planted_clones(spark, tmp_path):
    """Hierarchical blocking must still catch planted near-clones: 40
    spread unit vectors + 10 exact-ish clones (tiny perturbation) — each
    clone must drop with its source (or an earlier clone of it) as the
    survivor."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from map_reduce_framework_spark.operators.clustering import (
        dedup_semantic_scalable,
    )

    rng = np.random.Generator(np.random.PCG64(3))
    base = rng.standard_normal((40, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    src = np.arange(10)  # clone the first ten
    clones = base[src] + 0.01 * rng.standard_normal((10, 64))
    clones /= np.linalg.norm(clones, axis=1, keepdims=True)
    emb = np.vstack([base, clones]).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(50), pa.int64()),
                "doc_id": pa.array(range(50), pa.int64()),
                "label": pa.array([0] * 50, pa.int32()),
                "embedding": pa.array(
                    [emb[i] for i in range(50)], pa.list_(pa.float32())
                ),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    rows = {
        r["vec_id"]: r["dup_of"]
        for r in dedup_semantic_scalable(spark, str(tmp_path)).collect()
    }
    # every clone (ids 40..49) drops against its source (ids 0..9)
    for i in range(10):
        assert 40 + i in rows, f"clone {40 + i} not dropped"
        assert rows[40 + i] == i, rows


# --------------------------------------------------------------------------
# quality classifier (round 11)
# --------------------------------------------------------------------------


def _py_train_and_score(docs):
    """Independent pure-Python replay of the classifier: same hashing
    contract (md5 60-bit % B), same zero-init fixed-iteration GD, same
    scoring — triangulates the Spark trajectory AND the SQL oracle."""
    import hashlib
    import math

    from map_reduce_framework_spark.operators.clustering import (
        QC_BUCKETS,
        QC_ITERS,
        QC_LR,
        QC_POS_LANG,
    )

    def h(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % QC_BUCKETS

    feats, ys = {}, {}
    for doc_id, text, lang in docs:
        toks = [t for t in text.split(" ") if t]
        if not toks:
            continue
        f = {}
        for t in toks:
            b = h(t)
            f[b] = f.get(b, 0.0) + 1.0 / len(toks)
        f[QC_BUCKETS] = 1.0  # bias
        feats[doc_id] = f
        ys[doc_id] = 1.0 if lang == QC_POS_LANG else 0.0
    n = len(feats)
    w = [0.0] * (QC_BUCKETS + 1)
    for _ in range(QC_ITERS):
        g = [0.0] * (QC_BUCKETS + 1)
        for d, f in feats.items():
            m = sum(x * w[b] for b, x in f.items())
            r = 1.0 / (1.0 + math.exp(-m)) - ys[d]
            for b, x in f.items():
                g[b] += x * r
        w = [wi - QC_LR * gi / n for wi, gi in zip(w, g)]
    out = {}
    for d, f in feats.items():
        m = sum(x * w[b] for b, x in f.items())
        out[d] = 1.0 / (1.0 + math.exp(-m))
    return out


def test_quality_classifier_matches_oracle(spark, duck):
    from .conftest import assert_matches_oracle

    assert_matches_oracle(
        spark,
        duck,
        clustering.quality_classifier_score,
        clustering.ORACLES["quality_classifier_score"],
        "quality_classifier_score",
    )


def test_quality_classifier_matches_pure_python(spark, tmp_path):
    """Spark scores must equal the independent Python GD replay to
    ~1e-9 (only float reassociation separates them) on a corpus small
    enough to audit."""
    import itertools

    import pandas as pd

    from map_reduce_framework_spark.operators.clustering import (
        QC_POS_LANG,
        quality_classifier_score,
    )

    va = [f"good{i}" for i in range(9)]
    vb = [f"junk{i}" for i in range(9)]

    def doc(vocab, seed, n=25):
        it = itertools.cycle(vocab[seed % len(vocab) :] + vocab[: seed % len(vocab)])
        return " ".join(next(it) for _ in range(n))

    docs = []
    for i in range(8):
        docs.append((i, doc(va, i), QC_POS_LANG))
    for i in range(8, 16):
        docs.append((i, doc(vb, i), "de"))
    # two ambiguous docs mixing both vocabularies
    docs.append((16, doc(va, 0, 12) + " " + doc(vb, 0, 12), QC_POS_LANG))
    docs.append((17, doc(vb, 1, 12) + " " + doc(va, 1, 12), "de"))

    pdf = pd.DataFrame(
        {
            "doc_id": [d[0] for d in docs],
            "text": [d[1] for d in docs],
            "lang": [d[2] for d in docs],
            "source": ["t"] * len(docs),
            "n_chars": [len(d[1]) for d in docs],
        }
    )
    sf = tmp_path / "sf_qc"
    sf.mkdir()
    pdf.to_parquet(sf / "documents.parquet", index=False)

    expect = _py_train_and_score(docs)
    got = {
        r["doc_id"]: r for r in quality_classifier_score(spark, str(sf)).collect()
    }
    assert set(got) == set(expect)
    for d, p in expect.items():
        import math

        p4 = math.floor(p * 1e4 + 0.5) / 1e4
        assert abs(got[d]["score"] - p4) <= 1e-4 + 1e-9, (d, got[d]["score"], p4)
    # the separable part must actually be LEARNED: every pure-vocab doc
    # classified correctly with clear margins
    assert all(got[i]["correct"] for i in range(16))
    assert min(got[i]["score"] for i in range(8)) > 0.6
    assert max(got[i]["score"] for i in range(8, 16)) < 0.4


# --------------------------------------------------------------------------
# round 12: gradient-kernel vectorization + held-out evaluation
# --------------------------------------------------------------------------


def test_qc_grad_vectorization_matches_loop():
    """The bincount segment-sum kernel must reproduce the retired
    per-doc Python loop's partial gradients to ≤ 1e-12 on random dense
    rows (only the margin dot's summation order separates them)."""
    import pandas as pd

    rng = np.random.Generator(np.random.PCG64(5))
    B = clustering.QC_BUCKETS
    w = rng.standard_normal(B + 1)
    rows = []
    for _ in range(40):
        k = int(rng.integers(1, 12))
        bs = rng.choice(B + 1, size=k, replace=False).astype(np.int64)
        xs = rng.random(k)
        rows.append((bs, xs, float(rng.integers(0, 2))))
    pdf = pd.DataFrame(
        {
            "bs": [r[0] for r in rows],
            "xs": [r[1] for r in rows],
            "y": [r[2] for r in rows],
        }
    )

    # the retired loop, inlined as the reference
    g_ref = np.zeros_like(w)
    for bs, xs, y in rows:
        r = 1.0 / (1.0 + np.exp(-float(xs @ w[bs]))) - y
        g_ref[bs] += xs * r

    (out,) = list(clustering._qc_grad_fn(w)([pdf]))
    g_new = np.zeros_like(w)
    g_new[out["b"].to_numpy()] = out["g"].to_numpy()
    assert np.max(np.abs(g_new - g_ref)) <= 1e-12


def _qc_eval_fixture(tmp_path):
    """Separable corpus whose hash-held split contains both classes."""
    import hashlib
    import itertools

    import pandas as pd

    from map_reduce_framework_spark.operators.clustering import (
        QC_EVAL_MOD,
        QC_POS_LANG,
    )

    va = [f"good{i}" for i in range(9)]
    vb = [f"junk{i}" for i in range(9)]

    def doc(vocab, seed, n=25):
        it = itertools.cycle(vocab[seed % len(vocab):] + vocab[: seed % len(vocab)])
        return " ".join(next(it) for _ in range(n))

    docs = []
    for i in range(40):
        vocab, lang = (va, QC_POS_LANG) if i % 2 == 0 else (vb, "de")
        docs.append((i, doc(vocab, i), lang))
    held = {
        i
        for i, _, _ in docs
        if int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
        % QC_EVAL_MOD
        == 0
    }
    held_langs = {lang for i, _, lang in docs if i in held}
    assert held and held_langs == {QC_POS_LANG, "de"}, (
        "fixture must hold out both classes"
    )
    pdf = pd.DataFrame(
        {
            "doc_id": [d[0] for d in docs],
            "text": [d[1] for d in docs],
            "lang": [d[2] for d in docs],
            "source": ["t"] * len(docs),
            "n_chars": [len(d[1]) for d in docs],
        }
    )
    sf = tmp_path / "sf_qc_eval"
    sf.mkdir()
    pdf.to_parquet(sf / "documents.parquet", index=False)
    return str(sf), held


def test_quality_classifier_eval_auc_on_separable_corpus(spark, tmp_path):
    """Held-out metrics on a cleanly separable corpus: the trained
    model must rank essentially perfectly (AUC > 0.9) and the counts
    must reconcile with the hash split."""
    sf, held = _qc_eval_fixture(tmp_path)
    (row,) = clustering.quality_classifier_eval(spark, sf).collect()
    assert row["n_eval"] == len(held)
    assert row["n_pos"] + row["n_neg"] == row["n_eval"]
    assert row["auc"] is not None and row["auc"] > 0.9, row
    assert row["precision"] == 1.0 and row["recall"] == 1.0
    assert row["accuracy"] == 1.0


def test_quality_classifier_eval_matches_oracle(spark, duck):
    from .conftest import assert_matches_oracle

    assert_matches_oracle(
        spark,
        duck,
        clustering.quality_classifier_eval,
        clustering.ORACLES["quality_classifier_eval"],
        "quality_classifier_eval",
    )
