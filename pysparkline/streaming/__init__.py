from .ingest import (
    StreamingIngest,
    stream_flatten,
    streaming_dedup_exact,
    streaming_incremental_dedup,
    windowed_rollup,
)
from .stateful import streaming_sessionize

__all__ = [
    "StreamingIngest",
    "stream_flatten",
    "streaming_dedup_exact",
    "streaming_incremental_dedup",
    "windowed_rollup",
    "streaming_sessionize",
]
