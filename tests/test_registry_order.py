"""Driver-sampling contract: the correctness driver checks the FIRST 50
entries of queries() — every one of those slots must carry a DuckDB
oracle, and the export must remain a permutation of the full registry."""

from __future__ import annotations

from us_accidents_bigdata_pipeline_spark.plans.queries import (
    REGISTRY,
    oracle_sql,
    queries,
)

DRIVER_WINDOW = 50


def test_first_window_all_oracled():
    names = list(queries())
    oracles = oracle_sql()
    window = names[: min(DRIVER_WINDOW, len(names))]
    missing = [n for n in window if n not in oracles]
    assert not missing, f"rows-only queries inside the checked window: {missing}"


def test_export_is_permutation_of_registry():
    names = list(queries())
    assert sorted(names) == sorted(REGISTRY)
    assert len(names) == len(set(names))


def test_rows_only_sorted_last():
    names = list(queries())
    oracles = oracle_sql()
    seen_rows_only = False
    for n in names:
        if n not in oracles:
            seen_rows_only = True
        else:
            assert not seen_rows_only, f"oracled query {n} after a rows-only entry"
