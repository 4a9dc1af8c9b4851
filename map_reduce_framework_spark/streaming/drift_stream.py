"""Streaming distribution-drift monitor: the live twin of the batch
:func:`..operators.audit.distribution_drift`.

A continuously-fed pipeline watches value-distribution drift AS THE
FEED ARRIVES: the per-bucket (baseline, batch) counters run as a
complete-mode streaming aggregate — state is exactly ``DRIFT_BUCKETS``
rows at any corpus size — and the divergence table derives from the
drained counters with the SAME share/TVD/chi-square arithmetic as the
batch operator (both halves are literally shared builders:
``drift_bucket_counts`` runs inside the stream, ``drift_from_counts``
over its output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.audit import drift_bucket_counts, drift_from_counts
from .events_stream import _events_stream_dir, events_stream_source


def run_drift_stream_demo(
    spark: SparkSession, sf_dir: str, table: str = "drift_stream_demo"
) -> DataFrame:
    """Drain the events feed with availableNow; return the drift table
    computed from the live counters."""
    stream = events_stream_source(spark, _events_stream_dir(sf_dir))
    q = (
        drift_bucket_counts(stream)
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return drift_from_counts(spark.table(table))
