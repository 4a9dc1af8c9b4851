"""Streaming demo correctness: the availableNow streaming aggregation
must equal the batch events_time_window on the same data."""

from __future__ import annotations

from map_reduce_framework_spark.operators.relational import events_time_window
from map_reduce_framework_spark.streaming import run_events_stream_demo

from .conftest import SF_DIR


def test_streaming_matches_batch(spark):
    stream_rows = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in run_events_stream_demo(spark, SF_DIR).collect()
    }
    batch_rows = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in events_time_window(spark, SF_DIR).collect()
    }
    assert stream_rows == batch_rows
