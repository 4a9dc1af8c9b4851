"""Physical-plan quality gates (the 100 TB checklist, SURVEY §4).

Correctness tests prove the right rows come back; these prove the right
PLAN produces them — predicate pushdown reaching the parquet scan, column
pruning, broadcast joins on dimension sides, TakeOrderedAndProject for
top-k (no global sort), and partial (map-side) aggregation.  A regression
here is a 100×-scale performance bug even when every value still matches.
"""

from __future__ import annotations

import contextlib
import io

from map_reduce_framework_spark.operators import relational

from .conftest import SF_DIR


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def test_filter_pushdown_and_pruning(spark):
    plan = plan_of(relational.filter_project(spark, SF_DIR))
    assert "PushedFilters" in plan
    assert "p_size" in plan.split("PushedFilters")[1].split("]")[0]
    # column pruning: the scan must not read unused columns
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "p_brand" not in read_schema

def test_pricing_summary_pushes_date_filter(spark):
    plan = plan_of(relational.pricing_summary(spark, SF_DIR))
    pushed = plan.split("PushedFilters")[1].split("]")[0]
    assert "l_shipdate" in pushed


def test_join_equi_broadcasts_dimensions(spark):
    plan = plan_of(relational.join_equi(spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 2  # customer and nation
    assert "SortMergeJoin" not in plan


def test_top_k_avoids_global_sort(spark):
    plan = plan_of(relational.top_k(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan


def test_wordcount_partial_aggregation(spark):
    plan = plan_of(relational.wordcount(spark, SF_DIR))
    # partial + final HashAggregate around the exchange = map-side combine
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_whole_stage_codegen_active(spark):
    # AQE wraps the plan pre-execution and hides codegen stage markers;
    # disable it for this single plan capture
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = plan_of(relational.pricing_summary(spark, SF_DIR), mode="simple")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "*(" in plan  # WholeStageCodegen stage markers


def test_bucketed_join_no_shuffle(spark):
    from map_reduce_framework_spark.sources.bucketing import (
        bucketed_orders_customer,
    )

    orders_b, customer_b = bucketed_orders_customer(spark, SF_DIR)
    # force the SMJ path so the assertion is about bucketing, not broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = orders_b.join(
            customer_b, orders_b.o_custkey == customer_b.c_custkey
        )
        plan = plan_of(joined, mode="simple")
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # co-located: bucket layout IS the shuffle
    # and the result is correct
    assert joined.count() == orders_b.count()


def test_salted_join_equals_plain_join(spark):
    from map_reduce_framework_spark.functions.skew import salted_join
    from map_reduce_framework_spark.sources import load_table
    from pyspark.sql import functions as F

    li = load_table(spark, SF_DIR, "lineitem")
    part = load_table(spark, SF_DIR, "part")
    plain = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    salted = (
        salted_join(li, part, li.l_partkey == part.p_partkey, n_salts=4)
        .groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )
