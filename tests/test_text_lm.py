"""kn_perplexity — interpolated Kneser–Ney trigram LM tests.

The oracle replays the smoothing arithmetic in DuckDB; this file pins
the MODEL itself against an independent pure-Python implementation of
Chen & Goodman's interpolated KN (fixed discount), so an error mirrored
into both engines cannot hide.
"""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from map_reduce_framework_spark.operators.text import (
    KN_DISCOUNT,
    ORACLES,
    kn_perplexity,
)

from .conftest import SF_DIR, assert_matches_oracle


def _py_kn(docs: dict[int, str]) -> dict[int, tuple[int, float, float]]:
    """Reference interpolated KN trigram scorer (type-count lower
    orders, fixed discount), written independently of the Spark/SQL
    expressions: returns {doc_id: (n_trigrams, ce_bits, ppl)}."""
    D = KN_DISCOUNT
    toks = {d: [t for t in s.split(" ") if t] for d, s in docs.items()}
    tri = Counter()
    big_types = set()
    for ts in toks.values():
        for i in range(len(ts) - 2):
            tri[(ts[i], ts[i + 1], ts[i + 2])] += 1
        for i in range(len(ts) - 1):
            big_types.add((ts[i], ts[i + 1]))
    cuv = Counter()
    n1uv = Counter()
    n1vw = Counter()
    n1vdot = Counter()
    for (u, v, w), c in tri.items():
        cuv[(u, v)] += c
        n1uv[(u, v)] += 1
        n1vw[(v, w)] += 1
        n1vdot[v] += 1
    lam2 = Counter()
    for v, w in n1vw:
        lam2[v] += 1
    r1w = Counter()
    for a, b in big_types:
        r1w[b] += 1
    nbt = len(big_types)

    def p3(u, v, w):
        p1 = r1w[w] / nbt
        p2 = max(n1vw[(v, w)] - D, 0.0) / n1vdot[v] + D * lam2[v] / n1vdot[
            v
        ] * p1
        return max(tri[(u, v, w)] - D, 0.0) / cuv[(u, v)] + D * n1uv[
            (u, v)
        ] / cuv[(u, v)] * p2

    out = {}
    for d, ts in toks.items():
        grams = [
            (ts[i], ts[i + 1], ts[i + 2]) for i in range(len(ts) - 2)
        ]
        if not grams:
            continue
        ce = -sum(math.log2(p3(*g)) for g in grams) / len(grams)
        out[d] = (len(grams), ce, 2.0**ce)
    return out


def test_kn_matches_pure_python_on_toy_corpus(spark, tmp_path):
    """Per-doc cross-entropy/perplexity must agree with the independent
    Python KN to float precision on a corpus small enough to hand-audit
    — including repeated trigrams, shared contexts, and a doc too short
    to score."""
    docs = {
        0: "the cat sat on the mat",
        1: "the cat sat on the hat",
        2: "a dog sat on the mat today",
        3: "the cat ran",
        4: "short one",  # < 3 tokens after split: must drop out
    }
    pdf = pd.DataFrame(
        {
            "doc_id": list(docs),
            "text": list(docs.values()),
            "lang": ["en"] * len(docs),
            "source": ["t"] * len(docs),
            "n_chars": [len(s) for s in docs.values()],
        }
    )
    sf = tmp_path / "sf_kn"
    sf.mkdir()
    pdf.to_parquet(sf / "documents.parquet", index=False)

    expect = _py_kn(docs)
    got = {
        r["doc_id"]: (r["n_trigrams"], r["ce_bits"], r["ppl"])
        for r in kn_perplexity(spark, str(sf)).collect()
    }
    assert set(got) == set(expect) and 4 not in got
    for d, (n, ce, ppl) in expect.items():
        gn, gce, gppl = got[d]
        assert gn == n
        assert abs(gce - ce) <= 5e-5 + 1e-9, (d, gce, ce)
        assert abs(gppl - ppl) <= 5e-5 + abs(ppl) * 1e-9, (d, gppl, ppl)


def test_kn_probabilities_sum_to_one_over_seen_continuations():
    """Interpolated KN is a proper distribution: for a fixed context
    (u, v), summing P₃(w|uv) over the WHOLE vocabulary must give 1.
    The toy corpus has a small closed vocabulary, so the sum is exact
    up to float error — this catches denominator/lambda mistakes that
    per-doc scoring can mask."""
    docs = {
        0: "x y z x y w x y z",
        1: "y z w y z x",
        2: "z x y z x w",
    }
    D = KN_DISCOUNT
    toks = {d: s.split(" ") for d, s in docs.items()}
    vocab = sorted({t for ts in toks.values() for t in ts})
    tri = Counter()
    big_types = set()
    for ts in toks.values():
        for i in range(len(ts) - 2):
            tri[(ts[i], ts[i + 1], ts[i + 2])] += 1
        for i in range(len(ts) - 1):
            big_types.add((ts[i], ts[i + 1]))
    n1vw = Counter()
    n1vdot = Counter()
    cuv = Counter()
    n1uv = Counter()
    for (u, v, w), c in tri.items():
        cuv[(u, v)] += c
        n1uv[(u, v)] += 1
        n1vw[(v, w)] += 1
        n1vdot[v] += 1
    lam2 = Counter()
    for v, w in n1vw:
        lam2[v] += 1
    r1w = Counter()
    for a, b in big_types:
        r1w[b] += 1
    nbt = len(big_types)

    # precondition for exact normalization: every vocab word has a left
    # neighbor somewhere (Σ_w N1+(·w) then equals N1+(··) over vocab)
    assert all(r1w[w] > 0 for w in vocab)

    for u, v in cuv:
        total = 0.0
        for w in vocab:
            p1 = r1w[w] / nbt
            p2 = (
                max(n1vw[(v, w)] - D, 0.0) / n1vdot[v]
                + D * lam2[v] / n1vdot[v] * p1
            )
            total += (
                max(tri[(u, v, w)] - D, 0.0) / cuv[(u, v)]
                + D * n1uv[(u, v)] / cuv[(u, v)] * p2
            )
        assert abs(total - 1.0) <= 1e-9, (u, v, total)


def test_dsir_upweights_target_like_documents(spark, tmp_path):
    """The importance weight must rank raw-corpus docs written in the
    TARGET domain's vocabulary above docs from a disjoint vocabulary —
    the defining property of the likelihood-ratio selection.  Two
    disjoint vocabularies; target (lang=en) docs use vocab A; the
    non-target pool mixes A-like and B-like docs; every A-like doc must
    outscore every B-like doc on log_weight."""
    import itertools

    from map_reduce_framework_spark.operators.text import (
        DSIR_TARGET_LANG,
        dsir_sample,
    )

    va = [f"alpha{i}" for i in range(12)]
    vb = [f"beta{i}" for i in range(12)]

    def doc(vocab, seed, n=30):
        it = itertools.cycle(vocab[seed % len(vocab) :] + vocab[: seed % len(vocab)])
        return " ".join(next(it) for _ in range(n))

    rows = []
    for i in range(10):  # target corpus: vocab A, lang=en
        rows.append((i, doc(va, i), DSIR_TARGET_LANG))
    for i in range(10, 20):  # raw pool, target-like (vocab A), lang=de
        rows.append((i, doc(va, i), "de"))
    for i in range(20, 30):  # raw pool, off-domain (vocab B), lang=de
        rows.append((i, doc(vb, i), "de"))
    pdf = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": [r[2] for r in rows],
            "source": ["t"] * len(rows),
            "n_chars": [len(r[1]) for r in rows],
        }
    )
    sf = tmp_path / "sf_dsir"
    sf.mkdir()
    pdf.to_parquet(sf / "documents.parquet", index=False)

    out = {r["doc_id"]: r for r in dsir_sample(spark, str(sf)).collect()}
    a_like = [out[i]["log_weight"] for i in range(10, 20)]
    b_like = [out[i]["log_weight"] for i in range(20, 30)]
    assert min(a_like) > max(b_like), (min(a_like), max(b_like))
    # and target docs themselves score like the A-like pool (positive)
    assert all(out[i]["log_weight"] > 0 for i in range(10))
    assert all(w < 0 for w in b_like)


def test_kn_matches_oracle(spark, duck):
    assert_matches_oracle(
        spark,
        duck,
        kn_perplexity,
        ORACLES["kn_perplexity"],
        "kn_perplexity",
    )


# --------------------------------------------------------------------------
# held-out scoring (round 12): backoff + OOV floor
# --------------------------------------------------------------------------


def _held(doc_id: int) -> bool:
    """The engine's split predicate, recomputed independently."""
    import hashlib

    h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
    from map_reduce_framework_spark.operators.text import KN_HELDOUT_MOD

    return h % KN_HELDOUT_MOD == 0


def _kn_model_py(train_docs: dict[int, str]):
    D = KN_DISCOUNT
    toks = {d: [t for t in s.split(" ") if t] for d, s in train_docs.items()}
    tri = Counter()
    big_types = set()
    for ts in toks.values():
        for i in range(len(ts) - 2):
            tri[(ts[i], ts[i + 1], ts[i + 2])] += 1
        for i in range(len(ts) - 1):
            big_types.add((ts[i], ts[i + 1]))
    cuv, n1uv, n1vw, n1vdot = Counter(), Counter(), Counter(), Counter()
    for (u, v, w), c in tri.items():
        cuv[(u, v)] += c
        n1uv[(u, v)] += 1
        n1vw[(v, w)] += 1
        n1vdot[v] += 1
    lam2 = Counter()
    for v, w in n1vw:
        lam2[v] += 1
    r1w = Counter()
    for a, b in big_types:
        r1w[b] += 1
    nbt = len(big_types)

    def p3(u, v, w):
        from map_reduce_framework_spark.operators.text import KN_OOV_EPS

        p1 = r1w[w] / nbt if w in r1w else KN_OOV_EPS
        if v in n1vdot:
            p2 = (
                max(n1vw[(v, w)] - D, 0.0) / n1vdot[v]
                + D * lam2[v] / n1vdot[v] * p1
            )
        else:
            p2 = p1
        if (u, v) in cuv:
            return (
                max(tri[(u, v, w)] - D, 0.0) / cuv[(u, v)]
                + D * n1uv[(u, v)] / cuv[(u, v)] * p2
            )
        return p2

    return p3, r1w, cuv, n1vdot, nbt


def _py_kn_heldout(train_docs, held_docs):
    """Independent reference for the backed-off held-out scorer:
    {doc_id: (n_trigrams, n_oov, ce_bits, ppl)}."""
    p3, r1w, _, _, _ = _kn_model_py(train_docs)
    out = {}
    for d, s in held_docs.items():
        ts = [t for t in s.split(" ") if t]
        grams = [(ts[i], ts[i + 1], ts[i + 2]) for i in range(len(ts) - 2)]
        if not grams:
            continue
        ce = -sum(math.log2(p3(*g)) for g in grams) / len(grams)
        n_oov = sum(1 for (_, _, w) in grams if w not in r1w)
        out[d] = (len(grams), n_oov, ce, 2.0**ce)
    return out


def test_kn_heldout_matches_pure_python_with_oov(spark, tmp_path):
    """A held-out doc carrying trigrams the training split never saw —
    unseen trigram under a SEEN context, an unseen context, and a fully
    out-of-vocabulary word — must score through every rung of the
    backoff ladder and agree with the independent Python reference,
    with n_oov counting exactly the OOV continuations."""
    from map_reduce_framework_spark.operators.text import (
        kn_perplexity_heldout,
    )

    base = {
        "the cat sat on the mat",
        "the cat sat on the hat",
        "a dog sat on the mat today",
        "the dog ran to the mat",
        "a cat ran to the hat",
    }
    # held doc: "the cat ran" = unseen trigram over seen words;
    # "mat hat dog" = unseen contexts; "zzz" = OOV continuation
    held_text = "the cat ran mat hat dog chased zzz quickly"
    train_docs, held_docs, texts = {}, {}, iter(sorted(base))
    held_planted = False
    i = 0
    while not held_planted or len(train_docs) < len(base):
        if _held(i):
            if not held_planted:
                held_docs[i] = held_text
                held_planted = True
        elif len(train_docs) < len(base):
            train_docs[i] = next(texts)
        i += 1
    docs = {**train_docs, **held_docs}
    pdf = pd.DataFrame(
        {
            "doc_id": list(docs),
            "text": list(docs.values()),
            "lang": ["en"] * len(docs),
            "source": ["t"] * len(docs),
            "n_chars": [len(s) for s in docs.values()],
        }
    )
    sf = tmp_path / "sf_knh"
    sf.mkdir()
    pdf.to_parquet(sf / "documents.parquet", index=False)

    expect = _py_kn_heldout(train_docs, held_docs)
    got = {
        r["doc_id"]: (r["n_trigrams"], r["n_oov"], r["ce_bits"], r["ppl"])
        for r in kn_perplexity_heldout(spark, str(sf)).collect()
    }
    assert set(got) == set(expect)
    (d,) = expect
    assert expect[d][1] >= 1, "fixture must actually contain an OOV word"
    gn, goov, gce, gppl = got[d]
    n, n_oov, ce, ppl = expect[d]
    assert (gn, goov) == (n, n_oov)
    assert abs(gce - ce) <= 5e-5 + 1e-9
    assert abs(gppl - ppl) <= 5e-5 + abs(ppl) * 1e-9


def test_kn_heldout_backoff_sums_to_one_per_ladder_rung():
    """The backed-off distribution stays proper over the TRAINING
    vocabulary at every rung: Σ_w P(w|u,v) = 1 for a trained context,
    for an untrained context with trained middle word (pure P₂), and
    for an untrained middle word (pure continuation unigram)."""
    train = {
        0: "x y z x y w x y z",
        1: "y z w y z x",
        2: "z x y z x w",
    }
    p3, r1w, cuv, n1vdot, _ = _kn_model_py(train)
    vocab = sorted({t for s in train.values() for t in s.split(" ")})
    assert all(w in r1w for w in vocab)

    some_trained_ctx = next(iter(sorted(cuv)))
    assert abs(sum(p3(*some_trained_ctx, w) for w in vocab) - 1.0) <= 1e-9
    # untrained context, trained middle word → P₂ rung
    v = next(iter(sorted(n1vdot)))
    assert ("QQQ", v) not in cuv
    assert abs(sum(p3("QQQ", v, w) for w in vocab) - 1.0) <= 1e-9
    # untrained middle word → continuation-unigram rung
    assert "QQQ" not in n1vdot
    assert abs(sum(p3("zz", "QQQ", w) for w in vocab) - 1.0) <= 1e-9


def test_kn_heldout_matches_oracle(spark, duck):
    from map_reduce_framework_spark.operators.text import (
        kn_perplexity_heldout,
    )

    assert_matches_oracle(
        spark,
        duck,
        kn_perplexity_heldout,
        ORACLES["kn_perplexity_heldout"],
        "kn_perplexity_heldout",
    )
