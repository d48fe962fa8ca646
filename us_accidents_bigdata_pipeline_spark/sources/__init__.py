from .io import (
    kafka_batch_sink,
    kafka_payload,
    load_tables,
    mongodb_sink,
    read_csv,
    read_parquet,
    write_csv,
    write_json,
    write_parquet,
    write_table,
)

__all__ = [
    "kafka_batch_sink",
    "kafka_payload",
    "load_tables",
    "mongodb_sink",
    "read_csv",
    "read_parquet",
    "write_csv",
    "write_json",
    "write_parquet",
    "write_table",
]
