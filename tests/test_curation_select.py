"""Unit pins for the token-budget selection and source quota cap
operators (the oracle test certifies the registered queries; these pin
the operator edge cases the fixture can't hit)."""

from __future__ import annotations

from pyspark.sql import functions as F

from us_accidents_bigdata_pipeline_spark.operators.curation import (
    source_quota_cap,
    token_budget_select,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, n_chars long, n_toks long"
    )


def test_token_budget_select_matches_global_greedy(spark):
    """The histogram-cutoff plan must equal the global greedy prefix:
    rank by (n_chars DESC, doc_id), take while cumsum <= budget —
    including a partial bin split between same-length docs."""
    rows = [
        (1, 100, 40),
        (2, 100, 40),   # cutoff bin: doc 1 fits, doc 2 would overflow
        (3, 200, 30),   # fully in (best rank)
        (4, 50, 10),    # below cutoff, excluded
    ]
    got = {
        r["doc_id"]
        for r in token_budget_select(_docs(spark, rows), budget=75).collect()
    }
    # greedy order: 3 (30), 1 (70), 2 would hit 110 > 75 -> stop
    assert got == {3, 1}


def test_token_budget_select_whole_corpus_fits(spark):
    rows = [(1, 10, 5), (2, 20, 5)]
    got = token_budget_select(_docs(spark, rows), budget=100)
    assert {r["doc_id"] for r in got.collect()} == {1, 2}


def test_token_budget_select_zero_budget(spark):
    rows = [(1, 10, 5), (2, 20, 5)]
    assert token_budget_select(_docs(spark, rows), budget=0).count() == 0


def test_token_budget_select_boundary_doc_included_at_exact_budget(spark):
    rows = [(1, 20, 50), (2, 10, 50)]
    got = {
        r["doc_id"]
        for r in token_budget_select(_docs(spark, rows), budget=100).collect()
    }
    assert got == {1, 2}  # cumsum == budget is in


def test_source_quota_cap_prefers_long_docs_deterministic_ties(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 100),
            (2, "a", 100),  # tie with 1 -> lower doc_id wins
            (3, "a", 50),
            (4, "b", 10),
        ],
        "doc_id long, source string, n_chars long",
    )
    got = {
        r["doc_id"]
        for r in source_quota_cap(
            df, cap=2, group_col="source"
        ).collect()
    }
    assert got == {1, 2, 4}
