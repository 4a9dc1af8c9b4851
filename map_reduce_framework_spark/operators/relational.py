"""Core relational operators, each as a named query over the star schema.

Every function here takes ``(spark, sf_dir)`` and returns a DataFrame; the
module-level ``QUERIES`` / ``ORACLES`` dicts feed ``plans.registry`` and the
driver contract.  All computed columns are aliased identically in the Spark
code and the DuckDB oracle SQL (the driver's compare hashes columns by name).

Reference parity notes (SURVEY.md §2):

- ``search_substring`` re-expresses the Search client's query shape
  (Search.cpp:167-229): a set of query terms × a namespace of names,
  substring containment, grouped/ordered output.  Here the "directory" is
  the ``part`` table; the true filesystem source lives in
  ``search_client.py``.
- ``wordcount`` is the spec's canonical MapReduce workload
  (MapReduceEX.pdf pp.3-4): tokenize → count per word.
- Everything else (joins, windows, set ops, rollup...) has **no**
  counterpart in the reference (SURVEY §2.4 marks them absent) and is part
  of the engine's widened, Spark-native surface.

Scale notes: filters/projections are plain Column expressions so Catalyst
pushes them into the Parquet scan; dimension-side joins use explicit
``F.broadcast``; aggregations are expressed with built-in ``F`` functions so
partial (map-side) aggregation and whole-stage codegen apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import rnd
from ..sources import load_table

# Terms for the Search-parity flagship query: substring matching over names.
SEARCH_TERMS = ("old", "wid", "gree", "sma")


# --------------------------------------------------------------------------
# Search parity + canonical MapReduce workloads
# --------------------------------------------------------------------------


def search_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search-client parity: names containing each query term, k3-ordered.

    Shape of Search.cpp:167-229 — (query, name) pairs filtered by substring
    containment, output ordered by key.  The terms side is tiny and
    broadcast; the scan side only reads ``p_name`` (column pruning).
    """
    part = load_table(spark, sf_dir, "part")
    terms = spark.createDataFrame([(t,) for t in SEARCH_TERMS], "query string")
    return (
        part.join(F.broadcast(terms), F.col("p_name").contains(F.col("query")))
        .select("query", "p_name")
        .orderBy("query", "p_name")
    )


def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical WordCount (spec PDF pp.3-4): tokenize documents, count.

    ``explode(split())`` stays JVM-side; ``groupBy().count()`` gets a
    map-side partial aggregate — the combiner the reference never had
    (SURVEY §2.4 aggregations row).
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("word")
    )


# --------------------------------------------------------------------------
# Projection / filter / scalar functions
# --------------------------------------------------------------------------


def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate + projection, pushed into the Parquet scan."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.where((F.col("p_size") >= 20) & (F.col("p_type") == "ECONOMY"))
        .select(
            "p_partkey",
            "p_name",
            (F.col("p_retailprice") * F.lit(0.9)).alias("discounted_price"),
        )
    )


def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date/math scalar function exemplars over orders."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.upper(F.col("o_orderstatus")).alias("status_upper"),
        F.substring(F.col("o_orderpriority"), 1, 1).alias("prio_code"),
        F.length(F.col("o_orderpriority")).alias("prio_len"),
        F.year(F.col("o_orderdate")).alias("order_year"),
        F.month(F.col("o_orderdate")).alias("order_month"),
        rnd(F.sqrt(F.col("o_totalprice")), 4).alias("sqrt_price"),
        rnd(F.abs(F.col("o_totalprice") - 100000.0), 2).alias("abs_diff"),
        F.concat_ws("-", F.col("o_orderstatus"), F.col("o_orderpriority")).alias(
            "status_prio"
        ),
    )


# --------------------------------------------------------------------------
# Aggregation
# --------------------------------------------------------------------------


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: the engine's headline aggregation.

    Filter is a scan-level predicate; all aggregates are built-in so Spark
    runs partial_hashagg → exchange → final_hashagg with codegen.  Double
    aggregates are rounded in both engines to absorb summation-order jitter.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            rnd(F.sum("l_quantity"), 2).alias("sum_qty"),
            rnd(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            rnd(F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ), 2).alias("sum_charge"),
            rnd(F.avg("l_quantity"), 4).alias("avg_qty"),
            rnd(F.avg("l_extendedprice"), 4).alias("avg_price"),
            rnd(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def group_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-by with HAVING: customers with ≥ 5 orders and their spend."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            rnd(F.sum("o_totalprice"), 2).alias("total_spend"),
            rnd(F.max("o_totalprice"), 2).alias("max_order"),
            rnd(F.min("o_totalprice"), 2).alias("min_order"),
        )
        .where(F.col("n_orders") >= 5)
        .orderBy("o_custkey")
    )


def distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over a projection (SURVEY §2.4 distinct row)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select("o_orderstatus", "o_orderpriority").distinct().orderBy(
        "o_orderstatus", "o_orderpriority"
    )


def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus) — multi-level aggregates."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            rnd(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


# --------------------------------------------------------------------------
# Joins (none exist in the reference — SURVEY §2.4 joins row)
# --------------------------------------------------------------------------


def join_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way equi-join: revenue per nation.

    ``nation`` and ``customer`` are dimension-sized → explicit broadcast;
    only the orders↔customer side can shuffle, and AQE may convert it too.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.join(
            F.broadcast(customer), orders.o_custkey == customer.c_custkey
        )
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            rnd(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("n_name")
    )


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers that have at least one urgent order."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT")
    return (
        customer.join(
            urgent, customer.c_custkey == urgent.o_custkey, "left_semi"
        )
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no urgent order (selective predicate
    so the check is non-trivial at every SF — every customer has *some*
    order in the testdata)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT")
    return (
        customer.join(
            urgent, customer.c_custkey == urgent.o_custkey, "left_anti"
        )
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join + null-handling aggregate: order count per customer."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        customer.join(
            orders, customer.c_custkey == orders.o_custkey, "left_outer"
        )
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            rnd(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "total_spend"
            ),
        )
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# Sort / limit / top-k
# --------------------------------------------------------------------------


def top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k by value: Spark plans TakeOrderedAndProject (no full
    sort — per-partition heap + driver merge), the scale-correct top-k."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


def top_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via window row_number (shuffle on the
    partition key once; no self-join)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    )


# --------------------------------------------------------------------------
# Window functions (none in reference — SURVEY §2.4 window row)
# --------------------------------------------------------------------------


def window_rank_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank + lag + running frame aggregate per customer order history."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.rank().over(w).cast("long").alias("order_seq"),
        rnd(F.lag("o_totalprice", 1).over(w), 2).alias("prev_price"),
        rnd(F.sum("o_totalprice").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ), 2).alias("running_spend"),
    ).orderBy("o_custkey", "order_seq")


# --------------------------------------------------------------------------
# Set operations (none in reference — SURVEY §2.4 set-ops row)
# --------------------------------------------------------------------------


def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two filtered key sets (duplicates preserved, §2.3d)."""
    orders = load_table(spark, sf_dir, "orders")
    hi = orders.where(F.col("o_totalprice") > 150000).select("o_custkey")
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    )
    return (
        hi.unionAll(urgent)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("o_custkey")
    )


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT of customer key sets from two predicates."""
    orders = load_table(spark, sf_dir, "orders")
    hi = orders.where(F.col("o_totalprice") > 150000).select("o_custkey")
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    )
    return hi.intersect(urgent).orderBy("o_custkey")


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) of customer key sets."""
    orders = load_table(spark, sf_dir, "orders")
    hi = orders.where(F.col("o_totalprice") > 150000).select("o_custkey")
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    )
    return hi.exceptAll(urgent.distinct()).distinct().orderBy("o_custkey")


# --------------------------------------------------------------------------
# Semi-structured (events.props JSON)
# --------------------------------------------------------------------------


def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the JSON ``props`` column and aggregate an extracted field."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.select(
            "event_type",
            F.get_json_object(F.col("props"), "$.k").cast("bigint").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            rnd(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


def events_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch tumbling-window aggregate over event time (1-hour buckets).

    Same logical query as the Structured Streaming demo
    (:mod:`..streaming.events_stream`); here computed on the batch table so
    it is oracle-checkable.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            rnd(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("hour", "event_type")
    )




def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority) — all 4 grouping combinations."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            rnd(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


def date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar functions: quarter, day-of-month, day name,
    date difference, date offset (orders dates are midnight-aligned, so
    timestamp->date semantics agree across engines)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.quarter("o_orderdate").cast("long").alias("order_quarter"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_dom"),
        F.date_format("o_orderdate", "EEEE").alias("order_dayname"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_95"),
        # stringified: DATE-typed outputs land as date vs datetime64
        # depending on the engine/pandas path — a compare hazard
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").alias("plus_30d"),
    ).orderBy("o_orderkey")


def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar functions over tokenized documents (array outputs are
    stringified — engine-portable compare)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.array_join(F.slice(toks, 1, 3), ",").alias("first3"),
        F.array_join(F.slice(F.array_sort(F.array_distinct(toks)), 1, 2), ",").alias(
            "min2_tokens"
        ),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_position(toks, "the").cast("long").alias("first_the_pos"),
        F.element_at(toks, -1).alias("last_token"),
    ).orderBy("doc_id")




def sql_api_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL front-end exemplar: the same engine through spark.sql over
    registered temp views (TPC-H Q5-shaped revenue per region)."""
    from ..sources import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT r_name,
               floor(sum(o_totalprice) * 100D + 0.5D) / 100D AS revenue,
               count(*) AS n_orders
        FROM region
        JOIN nation ON n_regionkey = r_regionkey
        JOIN customer ON c_nationkey = n_nationkey
        JOIN orders ON o_custkey = c_custkey
        GROUP BY r_name ORDER BY r_name
        """
    )


def window_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended window-function surface: lead, dense_rank, ntile,
    percent_rank, cume_dist + a RANGE frame aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    wr = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.lead("o_orderkey", 1).over(w).alias("next_orderkey"),
        F.dense_rank().over(w).alias("drank"),
        F.ntile(4).over(w).alias("quartile"),
        rnd(F.percent_rank().over(w), 6).alias("pct_rank"),
        rnd(F.cume_dist().over(w), 6).alias("cdist"),
        F.count(F.lit(1)).over(wr).alias("n_within_10k"),
    ).orderBy("o_custkey", "o_orderkey")


def stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: stddev/variance/correlation/covariance and
    exact interpolated median per group."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            rnd(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
            rnd(F.var_samp("l_quantity"), 4).alias("var_qty"),
            rnd(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
            rnd(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("cov_qty_price"),
            rnd(F.median("l_quantity"), 4).alias("median_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )




def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join of two small dimensions (the one join shape
    that is NEVER acceptable on fact tables at scale — kept to small
    dims, Catalyst plans a broadcast nested loop)."""
    region = load_table(spark, sf_dir, "region")
    prios = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderpriority")
        .distinct()
    )
    return (
        region.crossJoin(prios)
        .select("r_name", "o_orderpriority")
        .orderBy("r_name", "o_orderpriority")
    )


def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join over two partial key sets (high-value vs urgent
    orders) — null-extension on both sides."""
    orders = load_table(spark, sf_dir, "orders")
    hi = (
        orders.where(F.col("o_totalprice") > 200000)
        .groupBy(F.col("o_custkey").alias("hk"))
        .agg(F.count(F.lit(1)).alias("n_high"))
    )
    urg = (
        orders.where(F.col("o_orderpriority") == "1-URGENT")
        .groupBy(F.col("o_custkey").alias("uk"))
        .agg(F.count(F.lit(1)).alias("n_urgent"))
    )
    return (
        hi.join(urg, hi.hk == urg.uk, "full_outer")
        .select(
            F.coalesce(F.col("hk"), F.col("uk")).alias("custkey"),
            F.coalesce(F.col("n_high"), F.lit(0)).alias("n_high"),
            F.coalesce(F.col("n_urgent"), F.lit(0)).alias("n_urgent"),
        )
        .orderBy("custkey")
    )


def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the SQL front-end: chosen subtotal combinations
    (by status, by priority, grand total) — the general form of
    rollup/cube."""
    from ..sources import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               floor(sum(o_totalprice) * 100D + 0.5D) / 100D AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """
    )


def not_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated NOT EXISTS through the SQL front-end (planned as an
    anti-join by Catalyst)."""
    from ..sources import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)
        ORDER BY c_custkey
        """
    )




def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment filter → 2 joins → revenue agg → top-10.

    customer side is broadcast; the orders↔lineitem join shuffles on the
    order key; top-10 via TakeOrderedAndProject.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    building = customer.where(F.col("c_mktsegment") == "BUILDING")
    cutoff = F.lit("1998-03-15").cast("timestamp")
    return (
        li.join(orders.where(F.col("o_orderdate") < cutoff),
                li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(building), F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate — every predicate is
    parquet-pushable; the whole query is one codegen stage + one exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(rnd(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
             .alias("revenue"),
             F.count(F.lit(1)).alias("n_rows"))
    )


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization over the events table (30-minute
    inactivity gap): lag → gap flag → running session id per user —
    the batch twin of streaming session windows."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact microsecond arithmetic: unix_timestamp/epoch() disagree on
    # fractional seconds across engines; unix_micros/epoch_us are integral
    gap_us = 30 * 60 * 1_000_000
    with_gap = events.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            (F.unix_micros("ts") - F.unix_micros(F.lag("ts", 1).over(w)))
            > gap_us,
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    with_sid = with_gap.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        with_sid.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
        )
        .orderBy("user_id", "session_id")
    )


QUERIES = {
    "tpch_q3_shipping_priority": tpch_q3_shipping_priority,
    "tpch_q6_forecast_revenue": tpch_q6_forecast_revenue,
    "sessionize": sessionize,
    "join_cross": join_cross,
    "join_full_outer": join_full_outer,
    "grouping_sets": grouping_sets,
    "not_exists_subquery": not_exists_subquery,
    "sql_api_revenue": sql_api_revenue,
    "window_extended": window_extended,
    "stats_agg": stats_agg,
    "cube_agg": cube_agg,
    "date_arithmetic": date_arithmetic,
    "array_functions": array_functions,
    "search_substring": search_substring,
    "wordcount": wordcount,
    "filter_project": filter_project,
    "scalar_functions": scalar_functions,
    "pricing_summary": pricing_summary,
    "group_having": group_having,
    "distinct_keys": distinct_keys,
    "rollup_agg": rollup_agg,
    "join_equi": join_equi,
    "join_semi": join_semi,
    "join_anti": join_anti,
    "join_outer": join_outer,
    "top_k": top_k,
    "top_k_per_group": top_k_per_group,
    "window_rank_lag": window_rank_lag,
    "set_union_all": set_union_all,
    "set_intersect": set_intersect,
    "set_except": set_except,
    "json_extract": json_extract,
    "events_time_window": events_time_window,
}

_SEARCH_VALUES = ", ".join(f"('{t}')" for t in SEARCH_TERMS)

ORACLES = {
    "tpch_q3_shipping_priority": """
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               (floor((sum(l_extendedprice * (1 - l_discount))) * 100::DOUBLE + 0.5::DOUBLE) / 100::DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate > TIMESTAMP '1998-03-15'
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
    "tpch_q6_forecast_revenue": """
        SELECT (floor((sum(l_extendedprice * l_discount)) * 100::DOUBLE + 0.5::DOUBLE) / 100::DOUBLE) AS revenue,
               count(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
    """,
    "sessionize": """
        WITH g AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN epoch_us(ts) - epoch_us(lag(ts, 1) OVER w)
                             > 1800000000
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s AS (
            SELECT user_id, event_id,
                   -- CAST: DuckDB window sum over INT yields HUGEINT; Spark's
                   -- is BIGINT, and the driver's value-hash is dtype-sensitive
                   CAST(sum(new_session) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS session_id
            FROM g)
        SELECT user_id, session_id, count(*) AS n_events,
               min(event_id) AS first_event, max(event_id) AS last_event
        FROM s GROUP BY 1, 2 ORDER BY user_id, session_id
    """,
    "join_cross": """
        SELECT r_name, o_orderpriority
        FROM region CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders)
        ORDER BY r_name, o_orderpriority
    """,
    "join_full_outer": """
        WITH hi AS (SELECT o_custkey AS hk, count(*) AS n_high FROM orders
                    WHERE o_totalprice > 200000 GROUP BY 1),
             urg AS (SELECT o_custkey AS uk, count(*) AS n_urgent FROM orders
                     WHERE o_orderpriority = '1-URGENT' GROUP BY 1)
        SELECT coalesce(hk, uk) AS custkey,
               coalesce(n_high, 0) AS n_high,
               coalesce(n_urgent, 0) AS n_urgent
        FROM hi FULL OUTER JOIN urg ON hk = uk
        ORDER BY custkey
    """,
    "grouping_sets": """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               (floor((sum(o_totalprice)) * 100::DOUBLE + 0.5::DOUBLE) / 100::DOUBLE) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    "not_exists_subquery": """
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)
        ORDER BY c_custkey
    """,
    "sql_api_revenue": """
        SELECT r_name,
               (floor((sum(o_totalprice)) * 100::DOUBLE + 0.5::DOUBLE) / 100::DOUBLE) AS revenue,
               count(*) AS n_orders
        FROM region
        JOIN nation ON n_regionkey = r_regionkey
        JOIN customer ON c_nationkey = n_nationkey
        JOIN orders ON o_custkey = c_custkey
        GROUP BY r_name ORDER BY r_name
    """,
    "window_extended": """
        SELECT o_custkey, o_orderkey,
               lead(o_orderkey, 1) OVER w AS next_orderkey,
               dense_rank() OVER w AS drank,
               ntile(4) OVER w AS quartile,
               (floor((percent_rank() OVER w) * 1000000::DOUBLE + 0.5::DOUBLE) / 1000000::DOUBLE) AS pct_rank,
               (floor((cume_dist() OVER w) * 1000000::DOUBLE + 0.5::DOUBLE) / 1000000::DOUBLE) AS cdist,
               count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                   RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS n_within_10k
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        ORDER BY o_custkey, o_orderkey
    """,
    "stats_agg": """
        SELECT l_returnflag,
               (floor((stddev_samp(l_quantity)) * 10000::DOUBLE + 0.5::DOUBLE) / 10000::DOUBLE) AS sd_qty,
               (floor((var_samp(l_quantity)) * 10000::DOUBLE + 0.5::DOUBLE) / 10000::DOUBLE) AS var_qty,
               (floor((corr(l_quantity, l_extendedprice)) * 10000::DOUBLE + 0.5::DOUBLE) / 10000::DOUBLE) AS corr_qty_price,
               (floor((covar_samp(l_quantity, l_extendedprice)) * 100::DOUBLE + 0.5::DOUBLE) / 100::DOUBLE) AS cov_qty_price,
               (floor((median(l_quantity)) * 10000::DOUBLE + 0.5::DOUBLE) / 10000::DOUBLE) AS median_qty,
               count(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "cube_agg": """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
               (floor((sum(o_totalprice)) * 100::DOUBLE + 0.5::DOUBLE) / 100::DOUBLE) AS total_price
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    "date_arithmetic": """
        SELECT o_orderkey,
               quarter(o_orderdate) AS order_quarter,
               day(o_orderdate) AS order_dom,
               dayname(o_orderdate) AS order_dayname,
               date_diff('day', TIMESTAMP '1995-01-01', o_orderdate)
                   AS days_since_95,
               strftime(o_orderdate::DATE + 30, '%Y-%m-%d') AS plus_30d
        FROM orders ORDER BY o_orderkey
    """,
    "array_functions": """
        SELECT doc_id,
               array_to_string(string_split(text, ' ')[1:3], ',') AS first3,
               array_to_string(
                   list_sort(list_distinct(string_split(text, ' ')))[1:2], ',')
                   AS min2_tokens,
               list_contains(string_split(text, ' '), 'spark') AS has_spark,
               coalesce(list_position(string_split(text, ' '), 'the'), 0)::BIGINT
                   AS first_the_pos,
               string_split(text, ' ')[-1] AS last_token
        FROM documents ORDER BY doc_id
    """,
    "search_substring": f"""
        SELECT t.query, p.p_name
        FROM (VALUES {_SEARCH_VALUES}) AS t(query)
        JOIN part p ON contains(p.p_name, t.query)
        ORDER BY t.query, p.p_name
    """,
    "wordcount": """
        SELECT word, count(*) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        WHERE word <> ''
        GROUP BY word ORDER BY word
    """,
    "filter_project": """
        SELECT p_partkey, p_name, p_retailprice * 0.9 AS discounted_price
        FROM part WHERE p_size >= 20 AND p_type = 'ECONOMY'
    """,
    "scalar_functions": """
        SELECT o_orderkey,
               upper(o_orderstatus) AS status_upper,
               substr(o_orderpriority, 1, 1) AS prio_code,
               length(o_orderpriority) AS prio_len,
               year(o_orderdate) AS order_year,
               month(o_orderdate) AS order_month,
               (floor((sqrt(o_totalprice)) * 10000::DOUBLE + 0.5::DOUBLE) / 10000::DOUBLE) AS sqrt_price,
               (floor((abs(o_totalprice - 100000.0)) * 100::DOUBLE + 0.5::DOUBLE) / 100::DOUBLE) AS abs_diff,
               concat_ws('-', o_orderstatus, o_orderpriority) AS status_prio
        FROM orders
    """,
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               (floor((sum(l_quantity)) * 100::DOUBLE + 0.5::DOUBLE) / 100::DOUBLE) AS sum_qty,
               (floor((sum(l_extendedprice)) * 100::DOUBLE + 0.5::DOUBLE) / 100::DOUBLE) AS sum_base_price,
               (floor((sum(l_extendedprice * (1 - l_discount))) * 100::DOUBLE + 0.5::DOUBLE) / 100::DOUBLE) AS sum_disc_price,
               (floor((sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))) * 100::DOUBLE + 0.5::DOUBLE) / 100::DOUBLE)
                   AS sum_charge,
               (floor((avg(l_quantity)) * 10000::DOUBLE + 0.5::DOUBLE) / 10000::DOUBLE) AS avg_qty,
               (floor((avg(l_extendedprice)) * 10000::DOUBLE + 0.5::DOUBLE) / 10000::DOUBLE) AS avg_price,
               (floor((avg(l_discount)) * 10000::DOUBLE + 0.5::DOUBLE) / 10000::DOUBLE) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "group_having": """
        SELECT o_custkey, count(*) AS n_orders,
               (floor((sum(o_totalprice)) * 100::DOUBLE + 0.5::DOUBLE) / 100::DOUBLE) AS total_spend,
               (floor((max(o_totalprice)) * 100::DOUBLE + 0.5::DOUBLE) / 100::DOUBLE) AS max_order,
               (floor((min(o_totalprice)) * 100::DOUBLE + 0.5::DOUBLE) / 100::DOUBLE) AS min_order
        FROM orders GROUP BY o_custkey HAVING count(*) >= 5
        ORDER BY o_custkey
    """,
    "distinct_keys": """
        SELECT DISTINCT o_orderstatus, o_orderpriority
        FROM orders ORDER BY o_orderstatus, o_orderpriority
    """,
    "rollup_agg": """
        SELECT l_returnflag, l_linestatus,
               (floor((sum(l_quantity)) * 100::DOUBLE + 0.5::DOUBLE) / 100::DOUBLE) AS sum_qty, count(*) AS n_rows
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    "join_equi": """
        SELECT n_name, (floor((sum(o_totalprice)) * 100::DOUBLE + 0.5::DOUBLE) / 100::DOUBLE) AS revenue,
               count(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name
    """,
    "join_semi": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE c_custkey IN (
            SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        ORDER BY c_custkey
    """,
    "join_anti": """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey NOT IN (
            SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        ORDER BY c_custkey
    """,
    "join_outer": """
        SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
               (floor((coalesce(sum(o_totalprice), 0.0)) * 100::DOUBLE + 0.5::DOUBLE) / 100::DOUBLE) AS total_spend
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_name ORDER BY c_custkey
    """,
    "top_k": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    "top_k_per_group": """
        SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders) WHERE rn <= 3
        ORDER BY o_custkey, rn
    """,
    "window_rank_lag": """
        SELECT o_custkey, o_orderkey, o_totalprice,
               rank() OVER w AS order_seq,
               (floor((lag(o_totalprice, 1) OVER w) * 100::DOUBLE + 0.5::DOUBLE) / 100::DOUBLE) AS prev_price,
               (floor((sum(o_totalprice) OVER ( PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 100::DOUBLE + 0.5::DOUBLE) / 100::DOUBLE)
                   AS running_spend
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, order_seq
    """,
    "set_union_all": """
        SELECT o_custkey, count(*) AS cnt FROM (
            SELECT o_custkey FROM orders WHERE o_totalprice > 150000
            UNION ALL
            SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        GROUP BY o_custkey ORDER BY o_custkey
    """,
    "set_intersect": """
        SELECT o_custkey FROM orders WHERE o_totalprice > 150000
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        ORDER BY o_custkey
    """,
    "set_except": """
        SELECT DISTINCT o_custkey FROM (
            SELECT o_custkey FROM orders WHERE o_totalprice > 150000
            EXCEPT ALL
            SELECT DISTINCT o_custkey FROM orders
            WHERE o_orderpriority = '1-URGENT')
        ORDER BY o_custkey
    """,
    "json_extract": """
        SELECT event_type,
               (floor((avg(k)) * 10000::DOUBLE + 0.5::DOUBLE) / 10000::DOUBLE) AS avg_k, max(k) AS max_k,
               count(*) AS n_events
        FROM (SELECT event_type,
                     CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
              FROM events)
        GROUP BY event_type ORDER BY event_type
    """,
    "events_time_window": """
        SELECT date_trunc('hour', ts) AS hour, event_type,
               count(*) AS n_events, (floor((sum(value)) * 100::DOUBLE + 0.5::DOUBLE) / 100::DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2 ORDER BY hour, event_type
    """,
}
