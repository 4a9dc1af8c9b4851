"""TPC-H breadth completion: Q2, Q5, Q9, Q11, Q16, Q20 shapes.

These six close the plan-shape gaps the first sixteen TPC-H-style
queries left open (correlated min-subquery, co-located nation join,
multi-join profit rollup, group-share-vs-global-scalar, NOT-IN
null-aware anti join, nested semi-join chain).  None exist in the
reference (its only query is the Search substring scan,
``Search.cpp:167-229``); they are part of the widened Spark-native
surface mirroring the published TPC-H spec, adapted to the synthetic
star schema.

Schema adaptation: the synthetic data has no ``partsupp`` table, so the
four queries that need one (Q2/Q9/Q11/Q16/Q20 in the official spec)
derive it from ``lineitem``: one row per (part, supplier) pair that ever
traded, ``ps_supplycost`` = the minimum unit price that pair ever
shipped at, ``ps_availqty`` = total quantity shipped.  Both aggregates
are order-independent (min of identical IEEE doubles; sum of integral
quantities), so the derived table is bit-identical across engines and
partitionings.

Scale notes (the 100 TB plan for each):
- The derived partsupp is ONE hash aggregation over lineitem with
  map-side partials — the same shuffle a real partsupp scan would avoid,
  but each query then joins it on its grouping keys, so no extra
  exchange is introduced downstream.
- Q2's correlated min is the aggregate-then-equijoin decorrelation: the
  per-part min-cost table is tiny next to partsupp and the final
  equality join is an equi-join on (partkey, cost).
- Q5's region/nation/supplier dimensions broadcast; the only big
  shuffles are the orders⋈lineitem equi-join and the final 5-row agg.
- Q9 joins lineitem to the filtered part list (broadcast after the
  ``LIKE`` prune) before touching partsupp, so the big partsupp join
  only sees promo-part rows.
- Q11's global scalar (avg part value) broadcasts back over the per-part
  values — no second scan of partsupp.
- Q16 goes through ``spark.sql`` so the ``NOT IN`` subquery plans as
  Spark's null-aware anti join (single-key NAAJ broadcast), the one
  anti-join variant the DataFrame API cannot spell.
- Q20's two ``IN`` chains are left-semi joins end to end — nothing
  materializes a product, and the promo-part filter prunes partsupp
  before the correlated-quantity join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import rnd, rnd_sql
from ..sources import load_table

#: Q2: parts at most this size, suppliers from this region
Q2_REGION = "EUROPE"
Q2_MAX_SIZE = 10
Q2_TOP_N = 100

#: Q5: customer-and-supplier nation revenue, region + order-date window
Q5_REGION = "ASIA"
Q5_DATE_FROM = "1996-01-01"
Q5_DATE_TO = "1998-01-01"

#: Q9: profit rollup over parts whose name starts with this prefix
Q9_NAME_PREFIX = "blue"

#: Q11: a part is "important stock" when its inventory value exceeds
#: this multiple of the average part's value (the official query's
#: FRACTION-of-total threshold is SF-dependent by design; the
#: avg-relative form keeps the group-vs-global-scalar shape at any SF)
Q11_VALUE_MULT = 1.5

#: Q16: brand/type/size exclusions + the supplier NOT-IN screen
Q16_EXCL_BRAND = "Brand#5"
Q16_EXCL_TYPE = "PROMO"
Q16_SIZES = (1, 5, 9, 13, 17, 21, 25, 29)

#: Q20: promo-part prefix, ship-year window, and the excess-stock factor
#: (availqty > factor × that year's shipped quantity)
Q20_NAME_PREFIX = "red"
Q20_SHIP_FROM = "1996-01-01"
Q20_SHIP_TO = "1997-01-01"
Q20_STOCK_FACTOR = 15

_REV = "l_extendedprice * (1 - l_discount)"

#: derived partsupp (see module docstring) — shared by the Spark helper
#: and every oracle below, so both engines see the same relation
_PARTSUPP_SQL = """
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               min(l_extendedprice / l_quantity) AS ps_supplycost,
               sum(l_quantity) AS ps_availqty
        FROM lineitem GROUP BY 1, 2"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
            "ps_supplycost"
        ),
        F.sum("l_quantity").alias("ps_availqty"),
    )


def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2: for each small part, the region's minimum-cost supplier(s) —
    the correlated min-subquery shape, decorrelated into an aggregate
    plus an equi-join on (partkey, cost).  The cost equality compares
    the RAW min (order-independent, bit-identical across engines);
    rounding happens only in the projection."""
    ps = _partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(
        F.col("r_name") == Q2_REGION
    )
    dims = F.broadcast(
        supp.join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eligible = ps.join(dims, F.col("ps_suppkey") == F.col("s_suppkey"))
    mn = eligible.groupBy(
        F.col("ps_partkey").alias("mn_partkey")
    ).agg(F.min("ps_supplycost").alias("min_cost"))
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_size") <= Q2_MAX_SIZE
    )
    return (
        eligible.join(
            mn,
            (F.col("ps_partkey") == F.col("mn_partkey"))
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .join(part, F.col("p_partkey") == F.col("ps_partkey"))
        .select(
            rnd(F.col("s_acctbal"), 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            rnd(F.col("ps_supplycost"), 2).alias("supplycost"),
            "s_suppkey",
        )
        # s_suppkey as the final key makes the LIMIT boundary fully
        # deterministic even if two same-name suppliers tie on rounded
        # balance at the cutoff (engine-dependent otherwise)
        .orderBy(F.col("s_acctbal").desc(), "s_name", "p_partkey", "s_suppkey")
        .limit(Q2_TOP_N)
        .drop("s_suppkey")
    )


def tpch_q5_local_supplier_volume(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Q5: revenue per nation from orders where the customer and the
    line's supplier share that nation — the co-located-join shape (the
    extra ``c_nationkey = s_nationkey`` equality rides the supplier
    join; dimensions broadcast)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= Q5_DATE_FROM)
        & (F.col("o_orderdate") < Q5_DATE_TO)
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(
        F.col("r_name") == Q5_REGION
    )
    return (
        cust.join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(rnd(F.sum(F.expr(_REV)), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


def tpch_q9_product_type_profit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Q9: profit (revenue minus supply cost) per supplier nation and
    order year over promo-prefixed parts — the widest multi-join rollup
    in the set (lineitem ⋈ part ⋈ supplier ⋈ partsupp ⋈ orders ⋈
    nation).  The part prune broadcasts ahead of the partsupp join, so
    the only large-large exchange is lineitem⋈partsupp on (part, supp)."""
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_name").startswith(Q9_NAME_PREFIX)
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    ps = _partsupp(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    amount = F.expr(_REV) - F.col("ps_supplycost") * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            ps,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(rnd(F.sum(amount), 2).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11: parts whose inventory value (supplycost × availqty summed
    over suppliers) exceeds ``Q11_VALUE_MULT`` × the average part's
    value — the group-share-vs-global-scalar shape: one aggregation
    produces the per-part values, its single-row average broadcasts
    back over them (no second partsupp scan)."""
    ps = _partsupp(spark, sf_dir)
    vals = ps.groupBy("ps_partkey").agg(
        rnd(F.sum(F.col("ps_supplycost") * F.col("ps_availqty")), 2).alias(
            "value"
        )
    )
    avg_val = vals.agg(F.avg("value").alias("avg_value"))
    return (
        vals.crossJoin(F.broadcast(avg_val))
        .where(F.col("value") > Q11_VALUE_MULT * F.col("avg_value"))
        .select("ps_partkey", "value")
        .orderBy(F.col("value").desc(), "ps_partkey")
    )


def tpch_q16_supplier_part_count(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Q16: distinct suppliers per (brand, type, size) for non-excluded
    parts, screening out flagged suppliers with ``NOT IN`` — routed
    through ``spark.sql`` because only the SQL front-end plans a true
    null-aware anti join (single-key NAAJ broadcast); the DataFrame
    API's ``left_anti`` is not null-aware.  (The screen adapts the
    official complaint-comment ``LIKE`` to negative account balance —
    the synthetic supplier table has no comment column.)"""
    from ..sources import register_views

    register_views(spark, sf_dir)
    _partsupp(spark, sf_dir).createOrReplaceTempView("partsupp")
    sizes = ", ".join(str(s) for s in Q16_SIZES)
    return spark.sql(
        f"""
        SELECT p_brand, p_type, p_size,
               count(DISTINCT ps_suppkey) AS supplier_cnt
        FROM partsupp JOIN part ON p_partkey = ps_partkey
        WHERE p_brand <> '{Q16_EXCL_BRAND}'
          AND p_type <> '{Q16_EXCL_TYPE}'
          AND p_size IN ({sizes})
          AND ps_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """
    )


def tpch_q20_promo_stock_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Q20: suppliers holding excess stock of promo-prefixed parts —
    the nested semi-join chain: parts prune partsupp (semi), the
    correlated year-quantity scalar joins in (inner ≡ the official
    NULL-rejecting comparison), and the surviving pairs prune supplier
    (semi).  No step widens rows; every join is an equi-join."""
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_name").startswith(Q20_NAME_PREFIX)
    )
    ps = _partsupp(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    yearqty = (
        li.where(
            (F.col("l_shipdate") >= Q20_SHIP_FROM)
            & (F.col("l_shipdate") < Q20_SHIP_TO)
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("year_qty"))
    )
    eligible = (
        ps.join(
            F.broadcast(part.select("p_partkey")),
            F.col("ps_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .join(
            yearqty,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .where(F.col("ps_availqty") > Q20_STOCK_FACTOR * F.col("year_qty"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        supp.join(
            eligible.select("ps_suppkey"),
            F.col("s_suppkey") == F.col("ps_suppkey"),
            "left_semi",
        )
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_name")
    )


ORACLES = {
    "tpch_q2_min_cost_supplier": f"""
        WITH partsupp AS ({_PARTSUPP_SQL}),
        dims AS (
            SELECT s_suppkey, s_name, s_acctbal, n_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = '{Q2_REGION}'),
        eligible AS (
            SELECT ps.*, d.s_name, d.s_acctbal, d.n_name
            FROM partsupp ps JOIN dims d ON d.s_suppkey = ps.ps_suppkey),
        mn AS (SELECT ps_partkey, min(ps_supplycost) AS min_cost
               FROM eligible GROUP BY ps_partkey)
        SELECT {rnd_sql("e.s_acctbal", 2)} AS s_acctbal, e.s_name, e.n_name,
               p.p_partkey, p.p_name,
               {rnd_sql("e.ps_supplycost", 2)} AS supplycost
        FROM eligible e
        JOIN mn ON mn.ps_partkey = e.ps_partkey
               AND e.ps_supplycost = mn.min_cost
        JOIN part p ON p.p_partkey = e.ps_partkey
        WHERE p.p_size <= {Q2_MAX_SIZE}
        ORDER BY s_acctbal DESC, e.s_name, p.p_partkey, e.ps_suppkey
        LIMIT {Q2_TOP_N}
    """,
    "tpch_q5_local_supplier_volume": f"""
        SELECT n_name, {rnd_sql(f"sum({_REV})", 2)} AS revenue
        FROM customer
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
                     AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = '{Q5_REGION}'
          AND o_orderdate >= TIMESTAMP '{Q5_DATE_FROM}'
          AND o_orderdate < TIMESTAMP '{Q5_DATE_TO}'
        GROUP BY n_name ORDER BY revenue DESC, n_name
    """,
    "tpch_q9_product_type_profit": f"""
        WITH partsupp AS ({_PARTSUPP_SQL})
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS INTEGER) AS o_year,
               {rnd_sql(
                   f"sum({_REV} - ps_supplycost * l_quantity)", 2
               )} AS sum_profit
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN nation ON n_nationkey = s_nationkey
        WHERE p_name LIKE '{Q9_NAME_PREFIX}%'
        GROUP BY 1, 2 ORDER BY nation, o_year DESC
    """,
    "tpch_q11_important_stock": f"""
        WITH partsupp AS ({_PARTSUPP_SQL}),
        vals AS (
            SELECT ps_partkey,
                   {rnd_sql("sum(ps_supplycost * ps_availqty)", 2)} AS value
            FROM partsupp GROUP BY ps_partkey)
        SELECT ps_partkey, value
        FROM vals
        WHERE value > {Q11_VALUE_MULT} * (SELECT avg(value) FROM vals)
        ORDER BY value DESC, ps_partkey
    """,
    "tpch_q16_supplier_part_count": f"""
        WITH partsupp AS ({_PARTSUPP_SQL})
        SELECT p_brand, p_type, p_size,
               count(DISTINCT ps_suppkey) AS supplier_cnt
        FROM partsupp JOIN part ON p_partkey = ps_partkey
        WHERE p_brand <> '{Q16_EXCL_BRAND}'
          AND p_type <> '{Q16_EXCL_TYPE}'
          AND p_size IN ({", ".join(str(s) for s in Q16_SIZES)})
          AND ps_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    "tpch_q20_promo_stock_suppliers": f"""
        WITH partsupp AS ({_PARTSUPP_SQL})
        SELECT s_suppkey, s_name, n_name
        FROM supplier JOIN nation ON n_nationkey = s_nationkey
        WHERE s_suppkey IN (
            SELECT ps_suppkey FROM partsupp
            WHERE ps_partkey IN (
                SELECT p_partkey FROM part
                WHERE p_name LIKE '{Q20_NAME_PREFIX}%')
              AND ps_availqty > {Q20_STOCK_FACTOR} * (
                  SELECT sum(l_quantity) FROM lineitem
                  WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
                    AND l_shipdate >= TIMESTAMP '{Q20_SHIP_FROM}'
                    AND l_shipdate < TIMESTAMP '{Q20_SHIP_TO}'))
        ORDER BY s_name
    """,
}

QUERIES = {
    "tpch_q2_min_cost_supplier": tpch_q2_min_cost_supplier,
    "tpch_q5_local_supplier_volume": tpch_q5_local_supplier_volume,
    "tpch_q9_product_type_profit": tpch_q9_product_type_profit,
    "tpch_q11_important_stock": tpch_q11_important_stock,
    "tpch_q16_supplier_part_count": tpch_q16_supplier_part_count,
    "tpch_q20_promo_stock_suppliers": tpch_q20_promo_stock_suppliers,
}
