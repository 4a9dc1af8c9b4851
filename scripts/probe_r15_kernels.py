"""Round-15 kernel A/B: mapInArrow+vectorized vs the old mapInPandas
per-row-loop stopword kernel, interleaved in ONE session (the only
comparison the host's external load bursts cannot fake — BASELINE.md
noise protocol).

Measures, on the given corpus:

- NEW: `_stopword_counts` (mapInArrow, Arrow C++ kernels + numpy
  segment reductions) → noop sink;
- OLD: an inline copy of the round-14 kernel (mapInPandas, per-document
  Python loops) over the same scan → noop sink;
- FLOOR: a pass-through 32-task mapInArrow vs mapInPandas job over a
  32-row frame — the pure JVM↔Python boundary cost with no work in it.

Usage: python scripts/probe_r15_kernels.py <sf_dir> [pairs]
Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F  # noqa: F401

    from map_reduce_framework_spark.operators.dedup import fan_out
    from map_reduce_framework_spark.operators.text import (
        LANG_STOPWORDS,
        _stopword_counts,
    )
    from map_reduce_framework_spark.session import get_spark
    from map_reduce_framework_spark.sources import load_table

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("probe-r15-kernels", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    langs = sorted(LANG_STOPWORDS)

    def old_stopword_counts(docs):
        """The round-14 kernel, verbatim (mapInPandas + Python loops)."""

        def batches(it):
            import pandas as pd

            sets = {lang: frozenset(LANG_STOPWORDS[lang]) for lang in langs}
            for pdf in it:
                toks_list = [t.split(" ") for t in pdf["text"]]
                out = {
                    "doc_id": pdf["doc_id"].values,
                    "lang": pdf["lang"].values,
                    "n_tokens": [len(ts) for ts in toks_list],
                    "n_uniq_tokens": [len(set(ts)) for ts in toks_list],
                }
                for lang in langs:
                    s = sets[lang]
                    out[f"s_{lang}"] = [
                        sum(1 for t in ts if t in s) for ts in toks_list
                    ]
                yield pd.DataFrame(out)

        schema = (
            "doc_id bigint, lang string, n_tokens int, n_uniq_tokens int, "
            + ", ".join(f"s_{lang} int" for lang in langs)
        )
        return docs.select("doc_id", "lang", "text").mapInPandas(
            batches, schema
        )

    docs = fan_out(load_table(spark, sf_dir, "documents"))

    def timed(df, desc):
        spark.sparkContext.setJobDescription(desc)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    # warm-up both paths once (worker pool, parquet footers)
    timed(_stopword_counts(docs), "warmup new")
    timed(old_stopword_counts(docs), "warmup old")

    out = {"corpus": sf_dir, "pairs": pairs, "new": [], "old": []}
    for _ in range(pairs):
        out["new"].append(timed(_stopword_counts(docs), "stopword NEW arrow"))
        out["old"].append(timed(old_stopword_counts(docs), "stopword OLD pandas"))
    out["min_new"] = min(out["new"])
    out["min_old"] = min(out["old"])
    print(json.dumps(out), flush=True)

    # boundary floor: pass-through over 32 rows x 32 tasks, no work
    base = spark.range(cpus).repartition(cpus)

    def floor(kind):
        if kind == "arrow":
            df = base.mapInArrow(lambda it: it, "id long")
        else:
            df = base.mapInPandas(lambda it: it, "id long")
        timed(df, f"floor warmup {kind}")
        runs = [timed(df, f"floor {kind}") for _ in range(5)]
        return min(runs), runs

    arrow_min, arrow_runs = floor("arrow")
    pandas_min, pandas_runs = floor("pandas")
    jvm = base.select("id")
    timed(jvm, "floor warmup jvm")
    jvm_runs = [timed(jvm, "floor jvm") for _ in range(5)]
    print(
        json.dumps(
            {
                "floor_32task_sec": {
                    "mapInArrow": arrow_min,
                    "mapInPandas": pandas_min,
                    "jvm_noop": min(jvm_runs),
                },
                "runs": {
                    "arrow": arrow_runs,
                    "pandas": pandas_runs,
                    "jvm": jvm_runs,
                },
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
