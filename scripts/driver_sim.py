"""Local simulation of the external correctness driver.

Runs each named query (default: the 50-entry ``DRIVER_WINDOW``) on a
deliberately VANILLA SparkSession at sf0.01 alongside its DuckDB oracle
and applies the same compare the driver does (row count + column names +
order-insensitive canonicalized values).  Use before round end to
pre-validate a window rotation:

    python scripts/driver_sim.py                # the driver window
    python scripts/driver_sim.py tpch_q2_min_cost_supplier wordcount
    python scripts/driver_sim.py --all          # every oracle-backed query
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SIM_SF_DIR", "/root/testdata/sf0.01")


def main(argv: list[str]) -> int:
    import duckdb
    from pyspark.sql import SparkSession

    from map_reduce_framework_spark.plans import registry
    from map_reduce_framework_spark.sources.tables import TABLES
    from tests.conftest import assert_frames_match

    if argv and argv[0] == "--all":
        names = [n for n in registry.QUERIES if n in registry.ORACLES]
    elif argv:
        names = argv
    else:
        names = list(registry.QUERIES)[:50]

    spark = (
        SparkSession.builder.appName("driver-sim")
        .master("local[16]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.warehouse.dir", "/tmp/mrfs_warehouse_sim")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.isdir(p):  # sharded table: directory of part files
            p = f"{p}/**/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_green = 0
    failures: list[str] = []
    for name in names:
        t0 = time.time()
        try:
            sql = registry.ORACLES.get(name)
            if sql is None:
                rows = registry.QUERIES[name](spark, SF).count()
                print(f"  {name}: rows-only check, {rows} rows "
                      f"({time.time() - t0:.1f}s)")
                n_green += 1
                continue
            spark_pdf = registry.QUERIES[name](spark, SF).toPandas()
            oracle_pdf = con.execute(sql).df()
            assert len(spark_pdf) > 0, f"{name}: vacuous 0-row result"
            assert_frames_match(spark_pdf, oracle_pdf, name)
            print(f"  {name}: GREEN {len(spark_pdf)} rows "
                  f"({time.time() - t0:.1f}s)")
            n_green += 1
        except Exception:
            failures.append(name)
            print(f"  {name}: RED ({time.time() - t0:.1f}s)")
            traceback.print_exc(limit=3)
    print(f"\n{n_green}/{len(names)} green at {SF}")
    if failures:
        print("RED:", ", ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
