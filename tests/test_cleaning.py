"""Semantic tests for the cleaning operators (passage dedup, redaction).

The oracle-equivalence rows in ``test_relational.py`` prove value parity;
these prove the operators actually DO the thing — a fully-duplicated
document loses all passages, redaction hits the planted terms — and that
the real corpus makes neither query vacuous.
"""

from __future__ import annotations

import pandas as pd
import pytest

from map_reduce_framework_spark.operators import cleaning

from .conftest import SF_DIR

DOC_A = " ".join(f"tok{i}" for i in range(16))  # exactly 2 passages of 8
DOC_C = " ".join(f"other{i}" for i in range(8)) + " " + " ".join(
    f"tok{i}" for i in range(8)
)  # second passage == DOC_A's first


@pytest.fixture(scope="module")
def passage_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cleaning")
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [DOC_A, DOC_A, DOC_C, "slow dup words big slow"],
            "lang": ["en"] * 4,
            "source": ["src0"] * 4,
            "n_chars": [len(t) for t in [DOC_A, DOC_A, DOC_C, "slow dup words big slow"]],
        }
    )
    docs.to_parquet(d / "documents.parquet")
    return str(d)


def test_passage_dedup_drops_duplicated_doc(spark, passage_dir):
    rows = {r["doc_id"]: r for r in cleaning.dedup_passage(spark, passage_dir).collect()}
    # doc 0 owns both its passages; doc 1 (exact dup) keeps nothing
    assert rows[0]["n_kept"] == 2 and rows[0]["kept_text"] == DOC_A
    assert rows[1]["n_kept"] == 0 and rows[1]["kept_text"] is None
    # doc 2 keeps only its first (novel) passage — reconstruction order holds
    assert rows[2]["n_kept"] == 1
    assert rows[2]["kept_text"] == " ".join(f"other{i}" for i in range(8))


def test_blocklist_redact_hits_planted_terms(spark, passage_dir):
    rows = {r["doc_id"]: r for r in cleaning.blocklist_redact(spark, passage_dir).collect()}
    assert rows[3]["n_hits"] == 4
    assert rows[3]["redacted_text"] == (
        f"{cleaning.REDACTED} {cleaning.REDACTED} words "
        f"{cleaning.REDACTED} {cleaning.REDACTED}"
    )
    assert rows[0]["n_hits"] == 0 and rows[0]["redacted_text"] == DOC_A


def test_cleaning_non_vacuous_on_corpus(spark):
    dp = cleaning.dedup_passage(spark, SF_DIR)
    dup_docs = dp.filter("n_kept < n_passages").count()
    assert dup_docs > 0, "corpus has no duplicate passages — query vacuous"
    br = cleaning.blocklist_redact(spark, SF_DIR)
    assert br.filter("n_hits > 0").count() > 0, "blocklist never fires"


def test_chunk_documents_covers_every_token(spark):
    """Chunks tile each document: ≤ CHUNK_TOKENS long, stride apart, and
    their union covers the full token sequence in order."""
    from map_reduce_framework_spark.operators.text import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        chunk_documents,
    )
    from map_reduce_framework_spark.sources import load_table

    from .conftest import SF_DIR

    chunks = chunk_documents(spark, SF_DIR).collect()
    docs = {
        r.doc_id: r.text.split(" ")
        for r in load_table(spark, SF_DIR, "documents").collect()
    }
    by_doc: dict[int, list] = {}
    for r in chunks:
        assert 1 <= r.n_chunk_tokens <= CHUNK_TOKENS
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_idx)
        toks = docs[doc_id]
        for r in rows:
            start = r.chunk_idx * CHUNK_STRIDE
            assert r.chunk_text.split(" ") == toks[start : start + CHUNK_TOKENS]
        covered = max(
            r.chunk_idx * CHUNK_STRIDE + r.n_chunk_tokens for r in rows
        )
        assert covered == len(toks)


def test_clean_corpus_verdict_composition(spark):
    """kept_final must equal the AND of its three stage verdicts."""
    from map_reduce_framework_spark.operators.cleaning import clean_corpus

    from .conftest import SF_DIR

    rows = clean_corpus(spark, SF_DIR).collect()
    assert len(rows) > 0
    n_kept = 0
    for r in rows:
        expect = r.kept_dedup and r.quality_bucket != "low" and r.kept_sample
        assert r.kept_final == expect
        n_kept += int(r.kept_final)
    # the pipeline must neither drop everything nor keep everything
    assert 0 < n_kept < len(rows)
