"""WordCount — the spec's canonical MapReduce workload (MapReduceEX.pdf
pp.3-4: Map = tokenize → (word, 1); Reduce = sum → (word, count)), run
three ways to demonstrate the engine's layers agree:

1. object-path facade (:func:`wordcount_mr`) — faithful reference shape;
2. DataFrame-path facade (:func:`wordcount_mr_df`) — mapInPandas /
   applyInPandas, registered in the driver gate as ``mr_wordcount_facade``
   with the same oracle as the Layer A ``wordcount``;
3. Layer A native (``relational.wordcount``) — explode/groupBy/count,
   the plan you'd actually run at 100 TB (map-side partial agg, no Python).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..mapreduce import run_map_reduce, run_map_reduce_df
from ..sources import load_table


def _tokenize(doc_name: str, text: str):
    for w in text.split():
        yield w, 1


def _count(word: str, ones: list):
    yield word, len(ones)


def wordcount_mr(
    spark: SparkSession, docs: list[tuple[str, str]]
) -> list[tuple[str, int]]:
    """Object-path WordCount over (doc_name, text) pairs → sorted (word, n)."""
    return run_map_reduce(spark, docs, _tokenize, _count)


def _map_tokenize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Emit2 analogue: each yielded row is one (word, one) pair."""
    for pdf in batches:
        words = pdf["text"].str.split().explode().dropna()
        words = words[words != ""]
        yield pd.DataFrame({"word": words, "one": 1})


def _reduce_count(pdf: pd.DataFrame) -> pd.DataFrame:
    """Emit3 analogue: whole group in one call (§2.3f), emits one row."""
    return pd.DataFrame({"word": [pdf["word"].iloc[0]], "cnt": [len(pdf)]})


def wordcount_mr_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame-path facade WordCount over the documents table."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    return run_map_reduce_df(
        docs,
        _map_tokenize,
        "word string, one int",
        ["word"],
        _reduce_count,
        "word string, cnt long",
        ["word"],
    )


#: inverted index: bound the posting-list width for the driver compare
INVIDX_DOC_LIMIT = 50


def _map_postings(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Emit2 analogue: one (word, doc_id) pair per token occurrence."""
    for pdf in batches:
        ex = pdf.set_index("doc_id")["text"].str.split().explode().dropna()
        ex = ex[ex != ""]
        yield pd.DataFrame(
            {"word": ex.values, "doc_id": ex.index.values}
        )


def _reduce_postings(pdf: pd.DataFrame) -> pd.DataFrame:
    """Whole-group Emit3: distinct sorted doc ids → one posting row.
    Distinctness lives IN the reduce (non-associative whole-group
    semantics, §2.3f — a combiner could not compute this row shape)."""
    ids = sorted({int(x) for x in pdf["doc_id"]})
    return pd.DataFrame(
        {
            "word": [pdf["word"].iloc[0]],
            "n_docs": [len(ids)],
            "postings": [",".join(map(str, ids))],
        }
    )


def inverted_index_mr_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OTHER canonical MapReduce workload: word → sorted posting
    list, run through the DataFrame-path facade (Map emits per-occurrence
    (word, doc_id); Reduce dedupes + sorts the group — exactly the shape
    that needs the reference's all-values-in-one-call contract)."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < INVIDX_DOC_LIMIT)
        .select("doc_id", "text")
    )
    return run_map_reduce_df(
        docs,
        _map_postings,
        "word string, doc_id long",
        ["word"],
        _reduce_postings,
        "word string, n_docs long, postings string",
        ["word"],
    )


QUERIES = {
    "mr_wordcount_facade": wordcount_mr_df,
    "mr_inverted_index_facade": inverted_index_mr_df,
}

ORACLES = {
    # identical semantics to relational.wordcount: whitespace-split tokens
    "mr_wordcount_facade": """
        SELECT word, count(*) AS cnt
        FROM (SELECT unnest(regexp_split_to_array(text, '\\s+')) AS word
              FROM documents)
        WHERE word <> ''
        GROUP BY word ORDER BY word
    """,
    "mr_inverted_index_facade": f"""
        WITH toks AS (
            SELECT DISTINCT word, doc_id
            FROM (SELECT doc_id,
                         unnest(regexp_split_to_array(text, '\\s+')) AS word
                  FROM documents WHERE doc_id < {INVIDX_DOC_LIMIT})
            WHERE word <> '')
        SELECT word, count(*) AS n_docs,
               string_agg(doc_id, ',' ORDER BY doc_id) AS postings
        FROM toks GROUP BY word ORDER BY word
    """,
}
