from .events_stream import run_events_stream_demo, streaming_event_counts  # noqa: F401
