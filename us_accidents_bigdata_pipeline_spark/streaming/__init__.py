from .windows import (
    kafka_stream_reader,
    parquet_stream_reader,
    run_windowed_batch,
    session_window_counts,
    windowed_counts,
)

__all__ = [
    "kafka_stream_reader",
    "parquet_stream_reader",
    "run_windowed_batch",
    "session_window_counts",
    "windowed_counts",
]
