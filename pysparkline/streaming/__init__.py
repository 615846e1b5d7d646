from .ingest import StreamingIngest, stream_flatten, windowed_rollup

__all__ = ["StreamingIngest", "stream_flatten", "windowed_rollup"]
