from .io import read_parquet, read_csv, write_parquet, write_json, load_tables

__all__ = ["read_parquet", "read_csv", "write_parquet", "write_json", "load_tables"]
