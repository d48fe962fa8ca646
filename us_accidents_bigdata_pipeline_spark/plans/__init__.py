from .queries import REGISTRY, QuerySpec, queries, oracle_sql

__all__ = ["REGISTRY", "QuerySpec", "queries", "oracle_sql"]
