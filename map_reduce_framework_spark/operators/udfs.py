"""User-defined function surface: Arrow-vectorized Pandas UDFs.

The reference's entire programming model is user code (Map/Reduce are
UDTFs, ``operator<`` a user comparator — SURVEY §2.4 UDF row).  The
engine's UDF story is Spark's full ladder, demonstrated here with the two
Pandas UDF flavors not already covered by the facade's mapInPandas /
applyInPandas UDTFs:

- scalar Pandas UDF (``normalize_priority``): Arrow-batched, vectorized
  pandas string ops — the 10-100× faster alternative to row-at-a-time
  Python UDFs (which this engine bans from hot paths);
- grouped-aggregate Pandas UDF (``weighted_avg_price``): a custom UDAF
  over whole groups.

Both are deterministic and oracle-checked.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions import rnd
from ..sources import load_table


from functools import cache


# DDL-string pandas_udf decorators parse their schema eagerly and need an
# active SparkSession — build them lazily, once, at first query call.
@cache
def _norm_priority():
    @pandas_udf("string")
    def norm_priority(s: pd.Series) -> pd.Series:
        # vectorized: strip the "N-" rank prefix, lowercase
        return s.str.replace(r"^[0-9]-", "", regex=True).str.lower()

    return norm_priority


@cache
def _weighted_avg():
    @pandas_udf("double")
    def weighted_avg(price: pd.Series, weight: pd.Series) -> float:
        return float((price * weight).sum() / weight.sum())

    return weighted_avg


def pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Pandas UDF: normalized priority label per order."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            _norm_priority()(F.col("o_orderpriority")).alias("priority_label"),
        )
        .orderBy("o_orderkey")
    )


def pandas_udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg Pandas UDF: discount-weighted average price per flag."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            rnd(
                _weighted_avg()(F.col("l_extendedprice"), F.col("l_quantity")), 4
            ).alias("qty_weighted_price")
        )
        .orderBy("l_returnflag")
    )


@cache
def _tokenize_udtf():
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class Tokenize:
        """Lateral tokenizer: one (position, token) row per whitespace
        token — the Spark-4 Python UDTF surface (the reference's Map IS
        a UDTF: 1 input row → 0..n output rows, SURVEY §2.1 O2)."""

        def eval(self, text: str):
            if text is None:
                return
            for i, tok in enumerate(text.split(" ")):
                yield i, tok

    return Tokenize


def python_udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF in a LATERAL join: tokenize the first 50 documents
    into (doc_id, pos, token) rows.

    Arrow-optimized UDTF execution is enabled on the session (runtime
    conf) so batches cross the Python boundary via Arrow, consistent
    with the engine's no-row-at-a-time rule; the UDTF itself is the
    demonstration of Spark's table-function surface — bulk tokenization
    hot paths use the codegen'd ``split``/``explode`` (see
    ``text.text_stats``) or ``mapInPandas`` instead.
    """
    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
    load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 50
    ).createOrReplaceTempView("_udtf_docs")
    spark.udtf.register("tokenize", _tokenize_udtf())
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM _udtf_docs d, LATERAL tokenize(d.text) t
        ORDER BY d.doc_id, t.pos
        """
    )


QUERIES = {
    "pandas_udf_scalar": pandas_udf_scalar,
    "pandas_udf_grouped_agg": pandas_udf_grouped_agg,
    "python_udtf_tokens": python_udtf_tokens,
}

ORACLES = {
    "pandas_udf_scalar": """
        SELECT o_orderkey,
               lower(regexp_replace(o_orderpriority, '^[0-9]-', '')) AS priority_label
        FROM orders ORDER BY o_orderkey
    """,
    # pandas (price*weight).sum() is pairwise summation; DuckDB sum is
    # sequential — both land within rounding tolerance at 4dp via the
    # portable floor-rounding (see functions/rounding.py)
    "pandas_udf_grouped_agg": """
        SELECT l_returnflag,
               (floor((sum(l_extendedprice * l_quantity) / sum(l_quantity))
                      * 10000::DOUBLE + 0.5::DOUBLE) / 10000::DOUBLE)
                   AS qty_weighted_price
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "python_udtf_tokens": """
        SELECT d.doc_id, gs.i AS pos,
               string_split(d.text, ' ')[gs.i + 1] AS token
        FROM documents d,
             LATERAL (SELECT unnest(range(len(string_split(d.text, ' ')))) AS i) gs
        WHERE d.doc_id < 50
        ORDER BY d.doc_id, pos
    """,
}
