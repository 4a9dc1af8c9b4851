"""Regression: every events-table query must work on a 100% bare session.

Round-1 driver failure mode: the driver builds its own SparkSession with
ZERO engine configs, and events.parquet is TIMESTAMP(NANOS) which Spark
rejects unless ``spark.sql.legacy.parquet.nanosAsLong`` is set.  The fix
lives in ``sources/tables.load_table`` (runtime ``spark.conf.set``); this
test proves it by spawning a FRESH JVM (subprocess) whose session gets no
configs at all — not even the UTC pin — and oracle-checking the nine
queries that were red in CORRECTNESS_r01.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# the 9 round-1 red rows (all the same root cause: events nanos read)
RED_R01 = [
    "sessionize",
    "grouping_sets",
    "not_exists_subquery",
    "sql_api_revenue",
    "json_extract",
    "events_time_window",
    "window_range_interval",
    "approx_distinct_hll",  # rows-only by design (no oracle)
    "asof_join",
]

_SCRIPT = r"""
import json, sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

# deliberately NO configs beyond master: this mirrors the driver's session
spark = SparkSession.builder.master("local[4]").appName("bare").getOrCreate()

import duckdb
from map_reduce_framework_spark.plans.registry import get_queries, get_oracles
from map_reduce_framework_spark.sources.tables import TABLES
from tests.conftest import assert_frames_match

con = duckdb.connect()
for t in TABLES:
    con.execute(
        "CREATE VIEW %s AS SELECT * FROM read_parquet('%s/%s.parquet')" % (t, {sf!r}, t)
    )

queries, oracles = get_queries(), get_oracles()
results = {{}}
for name in {names!r}:
    spark_pdf = queries[name](spark, {sf!r}).toPandas()
    if name in oracles:
        oracle_pdf = con.execute(oracles[name]).df()
        assert_frames_match(spark_pdf, oracle_pdf, name)
        results[name] = "oracle-match:%d" % len(spark_pdf)
    else:
        assert len(spark_pdf) > 0, name
        results[name] = "rows-only:%d" % len(spark_pdf)
print("BARE_OK " + json.dumps(results))
"""


@pytest.mark.slow
def test_red_r01_queries_on_bare_session():
    script = _SCRIPT.format(repo=REPO, sf=SF_DIR, names=RED_R01)
    env = dict(os.environ)
    env.pop("PYSPARK_SUBMIT_ARGS", None)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
        env=env,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-4000:]}"
    line = [l for l in proc.stdout.splitlines() if l.startswith("BARE_OK ")]
    assert line, proc.stdout
    results = json.loads(line[0][len("BARE_OK ") :])
    assert set(results) == set(RED_R01)
