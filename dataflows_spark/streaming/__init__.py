from .curation import (
    StreamingCorpusCleaner,
    StreamingEmbeddingDeduper,
    compact_index,
    curation_filter,
    rebucket_index,
)
from .join import stream_stream_join
from .listener import LineageListener
from .sink import ExactlyOnceParquetSink, KeyedMergeSink, start_exactly_once_query
from .stages import (
    dump_stream,
    load_stream,
    stream_deduplicate,
    stream_join,
    watermark,
    window_agg,
)
from .stateful import latest_revision_coalescer, session_counters_stream, windowed_counters_stream
from .windows import session_window_agg, sliding_window_agg, tumbling_window_agg

__all__ = [
    "StreamingCorpusCleaner",
    "StreamingEmbeddingDeduper",
    "compact_index",
    "curation_filter",
    "rebucket_index",
    "dump_stream",
    "load_stream",
    "stream_deduplicate",
    "stream_join",
    "watermark",
    "window_agg",
    "ExactlyOnceParquetSink",
    "KeyedMergeSink",
    "LineageListener",
    "session_window_agg",
    "sliding_window_agg",
    "start_exactly_once_query",
    "stream_stream_join",
    "tumbling_window_agg",
    "latest_revision_coalescer",
    "windowed_counters_stream",
    "session_counters_stream",
]
