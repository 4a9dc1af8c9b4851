"""map_reduce_framework_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query capabilities of
``alexgoft/Map_Reduce_Framework`` (a single-machine C++ MapReduce framework,
see SURVEY.md), widened into a complete DataFrame analytics engine:

- **Layer A** (``operators/``): named, composable DataFrame operators —
  relational (filter/project/agg/join/window/set-ops/sort), plus
  LLM-data-pipeline operators (dedup, similarity search, text analysis,
  multimodal column plumbing). Catalyst/Tungsten do the physical planning.
- **Layer B** (``mapreduce.py``): a faithful compatibility facade with the
  reference's ``runMapReduceFramework`` semantics
  (MapReduceFramework.cpp:698-765) — ``run_map_reduce(spark, input, map_fn,
  reduce_fn)`` built on ``mapInPandas → groupBy → applyInPandas → orderBy``.

All operators register in ``plans.registry`` so the driver contract
(``__spark_entry__.py``) can enumerate them with DuckDB oracle SQL.
"""

__version__ = "0.1.0"
