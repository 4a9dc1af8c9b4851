from .events_stream import run_events_stream_demo, streaming_event_counts  # noqa: F401
from .static_join import run_static_join_demo  # noqa: F401
from .scoring_stream import run_scoring_stream_demo  # noqa: F401
from .keeplist_stream import run_streaming_keeplist_demo  # noqa: F401
