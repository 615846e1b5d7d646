from .ingest import StreamingIngest, stream_flatten, windowed_rollup
from .stateful import streaming_sessionize

__all__ = [
    "StreamingIngest",
    "stream_flatten",
    "windowed_rollup",
    "streaming_sessionize",
]
