"""Independent check of the BPE trainer: a pure-Python reference
implementation (no Spark, no DuckDB) must produce the identical merge
trajectory — rules, order, and weighted counts — on the same corpus.

This triangulates the engine against something other than its oracle:
the oracle replays the algorithm in SQL, this replays it in plain
Python dictionaries, and all three must agree exactly.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd

from .conftest import SF_DIR


def _reference_bpe(words: list[str], n_merges: int):
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in Counter(words).items():
        vocab[tuple(w)] = c
    merges = []
    for rank in range(1, n_merges + 1):
        pc: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        assert pc, f"reference ran out of pairs at round {rank}"
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, a + b, n))
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


def test_bpe_merges_match_pure_python_reference(spark):
    from map_reduce_framework_spark.operators.text import (
        BPE_MERGES,
        bpe_train_merges,
    )

    got = [
        (r["rank"], r["pair_a"], r["pair_b"], r["merged"], r["pair_count"])
        for r in bpe_train_merges(spark, SF_DIR).collect()
    ]
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    words = [w for t in docs["text"] for w in t.split(" ") if w]
    want = _reference_bpe(words, BPE_MERGES)
    assert got == want
    # the trajectory must be non-degenerate: counts strictly positive
    # and weakly decreasing is NOT guaranteed by BPE, but rules must be
    # distinct
    assert len({(a, b) for _, a, b, _, _ in got}) == BPE_MERGES


def test_bpe_greedy_overlap_semantics(spark):
    """The fold must be greedy left-to-right: 'aaa' under merge (a,a)
    segments as (aa, a), never (a, aa) — pinned on a planted corpus
    where 'aa' is the dominant pair."""
    import pandas as pd

    from map_reduce_framework_spark.operators.text import _bpe_apply_merge

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        pd.DataFrame({"syms": ["a\x1fa\x1fa", "b\x1fa\x1fa", "a\x1fb"]})
    )
    out = [
        r["m"]
        for r in df.select(
            _bpe_apply_merge("a", "a").alias("m")
        ).collect()
    ]
    assert out == ["aa\x1fa", "b\x1faa", "a\x1fb"]


def test_bpe_segmentation_matches_reference(spark):
    """Per-document token counts from the vocab-join application pass
    must equal applying the reference merge list greedily to every word
    in plain Python."""
    from map_reduce_framework_spark.operators.text import (
        BPE_MERGES,
        bpe_segment_docs,
    )

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    words = [w for t in docs["text"] for w in t.split(" ") if w]
    merges = _reference_bpe(words, BPE_MERGES)

    def apply_merges(word: str) -> int:
        syms = list(word)
        for _, a, b, _, _ in merges:
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            syms = out
        return len(syms)

    tok_cache = {}
    want = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        ws = [w for w in text.split(" ") if w]
        want[doc_id] = (
            len(ws),
            sum(tok_cache.setdefault(w, apply_merges(w)) for w in ws),
            sum(len(w) for w in ws),
        )
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"], r["n_chars"])
        for r in bpe_segment_docs(spark, SF_DIR).collect()
    }
    assert got == want
    # merges must actually compress: tokens < chars somewhere
    assert any(t < c for _, t, c in got.values())
