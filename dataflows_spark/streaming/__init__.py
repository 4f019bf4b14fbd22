from .join import stream_stream_join
from .listener import LineageListener
from .sink import ExactlyOnceParquetSink, KeyedMergeSink, start_exactly_once_query
from .windows import session_window_agg, sliding_window_agg, tumbling_window_agg

__all__ = [
    "ExactlyOnceParquetSink",
    "KeyedMergeSink",
    "LineageListener",
    "session_window_agg",
    "sliding_window_agg",
    "start_exactly_once_query",
    "stream_stream_join",
    "tumbling_window_agg",
]
