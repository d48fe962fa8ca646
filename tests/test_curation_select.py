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


def test_token_budget_select_rejects_null_order_col(spark):
    import pytest

    rows = [(1, 10, 5), (2, None, 5)]
    with pytest.raises(ValueError, match="NULL values in order_col"):
        token_budget_select(_docs(spark, rows), budget=7).collect()


def test_token_budget_select_pathological_one_length_bucketed(spark):
    """Every doc shares one exact length — the whole corpus IS the
    cutoff bin. With cutoff_bin_max_docs forced tiny, the sub-bucketed
    guard path must still produce exactly the global greedy prefix
    (doc_id ASC, cumsum <= budget)."""
    n = 200
    rows = [(i, 100, 3) for i in range(n)]  # 600 tokens total
    got = sorted(
        r["doc_id"]
        for r in token_budget_select(
            _docs(spark, rows), budget=100, cutoff_bin_max_docs=10
        ).collect()
    )
    # greedy by id ASC: 33 docs * 3 toks = 99 <= 100; doc 33 would be 102
    assert got == list(range(33))


def test_token_budget_select_bucketed_spans_full_and_partial(spark):
    """Guard path with a real cutoff: longer docs fully in, oversized
    same-length cutoff bin split across sub-buckets, still exact."""
    rows = [(100 + i, 500, 10) for i in range(3)]  # 30 toks, all in
    rows += [(i, 100, 5) for i in range(50)]  # cutoff bin: 250 toks
    got = sorted(
        r["doc_id"]
        for r in token_budget_select(
            _docs(spark, rows), budget=30 + 52, cutoff_bin_max_docs=5
        ).collect()
    )
    # bin prefix: 10 docs * 5 = 50 <= 52; doc 10 would hit 55
    assert got == list(range(10)) + [100, 101, 102]


def test_token_budget_select_bucketed_rejects_string_id(spark):
    import pytest

    df = spark.createDataFrame(
        [(f"d{i:03d}", 100, 5) for i in range(40)],
        "doc_id string, n_chars long, n_toks long",
    )
    with pytest.raises(ValueError, match="numeric id"):
        token_budget_select(
            df, budget=50, cutoff_bin_max_docs=5
        ).collect()


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


def test_epoch_upsample_full_and_boundary_regimes(spark):
    from us_accidents_bigdata_pipeline_spark.operators.curation import (
        epoch_upsample_assign,
    )

    rows = [(1, 30, 10), (2, 20, 10), (3, 10, 10)]  # total = 30 toks
    # budget 75 = 2 full passes (60) + 15 left -> docs 1 (10) is the
    # boundary prefix at rem=15 (doc 2 would hit 20)
    got = {
        r["doc_id"]: r["n_epochs"]
        for r in epoch_upsample_assign(
            _docs(spark, rows), budget=75, max_epochs=4
        ).collect()
    }
    assert got == {1: 3, 2: 2, 3: 2}


def test_epoch_upsample_caps_at_max_epochs(spark):
    from us_accidents_bigdata_pipeline_spark.operators.curation import (
        epoch_upsample_assign,
    )

    rows = [(1, 30, 10), (2, 20, 10)]
    got = {
        r["doc_id"]: r["n_epochs"]
        for r in epoch_upsample_assign(
            _docs(spark, rows), budget=10**9, max_epochs=3
        ).collect()
    }
    assert got == {1: 3, 2: 3}


def test_epoch_upsample_drops_zero_epoch_docs(spark):
    from us_accidents_bigdata_pipeline_spark.operators.curation import (
        epoch_upsample_assign,
    )

    rows = [(1, 30, 10), (2, 20, 10), (3, 10, 10)]
    # budget below one pass: boundary-only regime, only doc 1 fits
    got = {
        r["doc_id"]: r["n_epochs"]
        for r in epoch_upsample_assign(
            _docs(spark, rows), budget=15, max_epochs=4
        ).collect()
    }
    assert got == {1: 1}


def test_source_dedup_quota_report_counts(spark):
    from us_accidents_bigdata_pipeline_spark.operators.curation import (
        source_dedup_quota_report,
    )

    df = spark.createDataFrame(
        [
            (1, "a", 100, "xx"),
            (2, "a", 90, "xx"),   # dup of 1's text
            (3, "a", 80, "yy"),
            (4, "b", 70, "zz"),
        ],
        "doc_id long, source string, n_chars long, text string",
    )
    got = {
        r["source"]: r.asDict()
        for r in source_dedup_quota_report(df, cap=2).collect()
    }
    a = got["a"]
    assert (a["n_docs"], a["n_unique_texts"], a["n_dup_docs"]) == (3, 2, 1)
    assert a["dup_per_10k"] == 3333  # floor(1*10000/3)
    assert (a["n_kept"], a["fill_per_10k"], a["over_quota"]) == (2, 10000, 1)
    b = got["b"]
    assert (b["n_docs"], b["n_kept"], b["over_quota"]) == (1, 1, 0)
    assert b["fill_per_10k"] == 5000


def test_mixture_epoch_plan_allocations_sum_to_budget(spark):
    from us_accidents_bigdata_pipeline_spark.operators.curation import (
        mixture_epoch_plan,
    )

    # 3 sources, doc counts 3/2/2 -> budget 100 can't split evenly:
    # base = floor(100*d/7) = 42/28/28, leftover 2 goes to the two
    # largest remainders (100*3%7=6 -> a; 100*2%7=4 -> b,c tie by name)
    rows = []
    for i in range(3):
        rows.append((100 + i, "a", 10))
    for i in range(2):
        rows.append((200 + i, "b", 40))
    for i in range(2):
        rows.append((300 + i, "c", 5))
    df = spark.createDataFrame(rows, "doc_id long, source string, n_toks long")
    got = {
        r["source"]: r.asDict()
        for r in mixture_epoch_plan(df, budget=100, max_epochs=4).collect()
    }
    assert sum(v["alloc_toks"] for v in got.values()) == 100
    assert got["a"]["alloc_toks"] == 43  # 42 + 1 (largest remainder)
    assert got["b"]["alloc_toks"] == 29  # 28 + 1 (tie, 'b' < 'c')
    assert got["c"]["alloc_toks"] == 28
    # epochs: a has 30 toks -> 43//30 = 1; b has 80 -> 0; c has 10 ->
    # 28//10 = 2 (inside cap)
    assert got["a"]["n_epochs"] == 1 and got["a"]["residual_toks"] == 13
    assert got["b"]["n_epochs"] == 0 and got["b"]["residual_toks"] == 29
    assert got["c"]["n_epochs"] == 2 and got["c"]["residual_toks"] == 8


def test_mixture_epoch_plan_epoch_cap(spark):
    from us_accidents_bigdata_pipeline_spark.operators.curation import (
        mixture_epoch_plan,
    )

    df = spark.createDataFrame(
        [(1, "a", 5), (2, "b", 5)], "doc_id long, source string, n_toks long"
    )
    got = {
        r["source"]: r["n_epochs"]
        for r in mixture_epoch_plan(df, budget=1000, max_epochs=3).collect()
    }
    assert got == {"a": 3, "b": 3}


def test_token_budget_bucketed_random_equivalence(spark):
    """Randomized sweep: the sub-bucketed guard path must equal the
    plain Python global greedy (order by n_chars DESC, doc_id; take
    while cumsum <= budget) on corpora with heavy rank-value ties —
    the regime the guard exists for."""
    import random

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        rows = [
            (i, rng.choice([50, 100, 100, 100, 200]), rng.randint(1, 9))
            for i in range(300)
        ]
        budget = rng.randint(200, 1200)
        ref = []
        cum = 0
        for doc_id, n_chars, n_toks in sorted(
            rows, key=lambda r: (-r[1], r[0])
        ):
            if cum + n_toks > budget:
                break
            cum += n_toks
            ref.append(doc_id)
        got = sorted(
            r["doc_id"]
            for r in token_budget_select(
                _docs(spark, rows), budget=budget, cutoff_bin_max_docs=20
            ).collect()
        )
        assert got == sorted(ref), (seed, budget)
