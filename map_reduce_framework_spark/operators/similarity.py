"""Similarity search over the ``embeddings`` table (array<float> column).

Two paths, both pure DataFrame compositions (JVM-side ``zip_with`` /
``aggregate`` arithmetic in double precision — no Python in the loop):

- :func:`ann_cosine_topk` — brute-force exact top-k: broadcast the (tiny)
  query set against the corpus, window row_number per query.  The exact
  baseline every ANN variant is measured against.
- :func:`ann_lsh_bucketed` — sign-bit LSH bucketing (random-hyperplane
  LSH with axis-aligned hyperplanes = sign of the first
  ``LSH_SIGN_BITS`` dims): corpus and queries bucket by bit-signature,
  search only within the query's bucket.  At 100 TB the bucket key is a
  shuffle/bucketing key — each query touches one partition-set instead of
  the corpus; the deterministic signature makes the oracle exact.

The reference has no similarity operators (SURVEY §2.4) — mandated
extension ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import rnd
from ..sources import load_table
from .dedup import dot_col, fan_out, unit_vector_col

#: queries = this many lowest vec_ids (a stand-in for an external query set)
N_QUERIES = 5
TOP_K = 10
LSH_SIGN_BITS = 8
BUCKET_TOP_K = 5


def _corpus_and_queries(spark: SparkSession, sf_dir: str):
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    corpus = emb.select(
        F.col("vec_id").alias("cand_id"),
        unit_vector_col("embedding").alias("vc"),
    )
    queries = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        unit_vector_col("embedding").alias("vq"),
    )
    return corpus, queries


def _pair_cosine() -> "F.Column":
    """cosine = dot of pre-unit-normalized vectors (1 aggregate/pair)."""
    return dot_col("vq", "vc")


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-k for each query vector.

    Ranking uses cosine rounded to 6dp with vec_id tiebreak so the order
    is reproducible across engines (float-ulp-stable).
    """
    corpus, queries = _corpus_and_queries(spark, sf_dir)
    scored = (
        F.broadcast(queries)
        .join(corpus, F.col("query_id") != F.col("cand_id"))
        .withColumn("cos6", rnd(_pair_cosine(), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos6").desc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "cand_id",
            "rank",
            rnd(F.col("cos6"), 4).alias("cosine"),
        )
        .orderBy("query_id", "rank")
    )


def sign_bucket_col(vec_col: str, bits: int = LSH_SIGN_BITS):
    """Sign-bit LSH bucket id: bit j set iff vec[j] >= 0 (axis-aligned
    hyperplanes — deterministic, engine-portable)."""
    terms = " + ".join(
        f"(CASE WHEN {vec_col}[{j}] >= 0 THEN {1 << j} ELSE 0 END)"
        for j in range(bits)
    )
    return F.expr(f"({terms})").cast("int")


def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: search only the query's sign-bit LSH bucket.

    The bucket equi-join replaces the brute-force cross product; recall
    loss is the standard LSH trade-off (multiprobe = also search buckets
    at Hamming distance 1 — left as a parameter sweep for bench).
    """
    corpus, queries = _corpus_and_queries(spark, sf_dir)
    corpus_b = corpus.withColumn("cbucket", sign_bucket_col("vc"))
    queries_b = queries.withColumn("bucket", sign_bucket_col("vq"))
    scored = (
        F.broadcast(queries_b)
        .join(
            corpus_b,
            (F.col("bucket") == F.col("cbucket"))
            & (F.col("query_id") != F.col("cand_id")),
        )
        .withColumn("cos6", rnd(_pair_cosine(), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos6").desc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= BUCKET_TOP_K)
        .select(
            "query_id",
            "cand_id",
            "bucket",
            "rank",
            rnd(F.col("cos6"), 4).alias("cosine"),
        )
        .orderBy("query_id", "rank")
    )


# NOTE: sign_bucket_col uses SQL `vec[j]`, 0-based in Spark but 1-based
# in DuckDB — the oracle uses [j+1] to align (see _sign_bucket_sql).

_COS_SQL = "list_dot_product(a.v, b.v)"
_UNIT_V_SQL = (
    "list_transform(embedding::DOUBLE[], x -> "
    "x / sqrt(list_sum(list_transform(embedding::DOUBLE[], y -> y*y))))"
)


def _sign_bucket_sql(vec: str, bits: int = LSH_SIGN_BITS) -> str:
    return (
        "("
        + " + ".join(
            f"(CASE WHEN {vec}[{j + 1}] >= 0 THEN {1 << j} ELSE 0 END)"
            for j in range(bits)
        )
        + ")"
    )


ORACLES = {
    "ann_cosine_topk": f"""
        WITH e AS (SELECT vec_id, {_UNIT_V_SQL} AS v FROM embeddings),
        scored AS (
            SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
                   (floor(({_COS_SQL}) * 1000000::DOUBLE + 0.5::DOUBLE) / 1000000::DOUBLE) AS cos6
            FROM e a JOIN e b ON a.vec_id < {N_QUERIES}
                 AND b.vec_id <> a.vec_id),
        ranked AS (
            SELECT query_id, cand_id, cos6,
                   row_number() OVER (PARTITION BY query_id
                       ORDER BY cos6 DESC, cand_id) AS rank
            FROM scored)
        SELECT query_id, cand_id, rank, (floor((cos6) * 10000::DOUBLE + 0.5::DOUBLE) / 10000::DOUBLE) AS cosine
        FROM ranked WHERE rank <= {TOP_K} ORDER BY query_id, rank
    """,
    "ann_lsh_bucketed": f"""
        WITH e AS (SELECT vec_id, {_UNIT_V_SQL} AS v,
                          {_sign_bucket_sql('embedding')} AS bucket
                   FROM embeddings),
        scored AS (
            SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
                   a.bucket AS bucket, (floor(({_COS_SQL}) * 1000000::DOUBLE + 0.5::DOUBLE) / 1000000::DOUBLE) AS cos6
            FROM e a JOIN e b ON a.bucket = b.bucket
                 AND a.vec_id < {N_QUERIES} AND b.vec_id <> a.vec_id),
        ranked AS (
            SELECT query_id, cand_id, bucket, cos6,
                   row_number() OVER (PARTITION BY query_id
                       ORDER BY cos6 DESC, cand_id) AS rank
            FROM scored)
        SELECT query_id, cand_id, bucket, rank, (floor((cos6) * 10000::DOUBLE + 0.5::DOUBLE) / 10000::DOUBLE) AS cosine
        FROM ranked WHERE rank <= {BUCKET_TOP_K} ORDER BY query_id, rank
    """,
}

QUERIES = {
    "ann_cosine_topk": ann_cosine_topk,
    "ann_lsh_bucketed": ann_lsh_bucketed,
}
