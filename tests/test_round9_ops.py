"""Property pins for the round-9 second-wave operators (the oracle
sweep in test_oracle.py checks value parity; these pin the CONTRACTS
the oracle comparison can't express)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_ORACLE, SF_SMOKE


def test_cms_estimate_one_sided(spark):
    """Count-Min guarantee: estimate ≥ exact for EVERY token (collisions
    only add), and with w=16 the synthetic vocab actually collides."""
    from us_accidents_bigdata_pipeline_spark.operators.sketches import (
        count_min_heavy_hitters,
    )

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    out = count_min_heavy_hitters(docs, width=16).collect()
    assert len(out) == 20
    assert all(r.est_count >= r.exact_count for r in out)
    assert any(r.est_count > r.exact_count for r in out)


def test_cms_wide_sketch_collision_free_on_tiny_vocab(spark):
    """At w=256 the ~30-token vocab can't collide across all 4 rows:
    estimates collapse to exact — the eps·N error bound's easy case."""
    from us_accidents_bigdata_pipeline_spark.operators.sketches import (
        count_min_heavy_hitters,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    out = count_min_heavy_hitters(docs, width=256).collect()
    assert all(r.est_count == r.exact_count for r in out)


def test_stratified_kfold_balance(spark):
    """Every (fold, label) cell is within ±1 of every other cell of the
    same label — the by-construction balance randomSplit can't give."""
    from us_accidents_bigdata_pipeline_spark.operators.sample import (
        stratified_kfold,
    )

    o = spark.read.parquet(f"{SF_ORACLE}/orders.parquet").select(
        "o_orderkey", F.col("o_orderpriority").alias("label")
    )
    cells = (
        stratified_kfold(o, "label", "o_orderkey", k=5)
        .groupBy("label", "fold")
        .count()
        .collect()
    )
    by_label: dict = {}
    for r in cells:
        by_label.setdefault(r.label, []).append(r["count"])
    for label, counts in by_label.items():
        assert len(counts) == 5, label
        assert max(counts) - min(counts) <= 1, (label, counts)


def test_stratified_kfold_layout_independent(spark):
    """Fold membership is a pure function of (key, label, seed):
    repartitioning the input changes nothing."""
    from us_accidents_bigdata_pipeline_spark.operators.sample import (
        stratified_kfold,
    )

    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").select(
        "o_orderkey", F.col("o_orderpriority").alias("label")
    )
    a = {
        r.o_orderkey: r.fold
        for r in stratified_kfold(o, "label", "o_orderkey").collect()
    }
    b = {
        r.o_orderkey: r.fold
        for r in stratified_kfold(
            o.repartition(7), "label", "o_orderkey"
        ).collect()
    }
    assert a == b


def test_gopher_rules_empty_doc_fails_all(spark):
    """Token-less documents fail every rule (no NULL leaks into the
    boolean panel)."""
    from us_accidents_bigdata_pipeline_spark.operators.textstats import (
        gopher_rules,
    )

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "the a of and to in is it " * 20)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in gopher_rules(df).collect()}
    for d in (1, 2):
        r = rows[d]
        assert r.n_words == 0
        assert not r.pass_gopher
        assert not (
            r.word_count_ok or r.word_len_ok or r.alpha_ok or r.stopword_ok
        )
    # doc 3: 160 stopword tokens — passes count/alpha/stopword, word
    # length 2.44 fails the [3, 10] band, so the gate rejects it
    assert rows[3].word_count_ok and rows[3].stopword_ok
    assert not rows[3].word_len_ok
    assert not rows[3].pass_gopher


def test_centroid_distance_prototype_recovers_tight_cluster(spark):
    """A vector equal to its label's centroid scores cos 1.0; an
    anti-correlated one is flagged."""
    from us_accidents_bigdata_pipeline_spark.operators.similarity import (
        label_centroid_distances,
    )

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0], 0),
        (2, [1.0, 0.0, 0.0, 0.0], 0),
        (3, [-1.0, 0.0, 0.0, 0.0], 1),
        (4, [-1.0, 0.1, 0.0, 0.0], 1),
        (5, [1.0, -0.1, 0.0, 0.0], 1),  # anti-correlated with label 1
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {r.vec_id: r for r in label_centroid_distances(df).collect()}
    assert out[1].cos_centroid == 1.0 and not out[1].is_outlier
    assert out[5].cos_centroid < 0 and out[5].is_outlier


def test_truncated_overlap_perfect_when_prefix_is_whole_vector(spark):
    """prefix_dims = full dim ⇒ both rankings identical ⇒ recall 1.0."""
    from us_accidents_bigdata_pipeline_spark.operators.similarity import (
        truncated_topk_overlap,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    out = truncated_topk_overlap(
        emb, n_queries=3, k=5, prefix_dims=64
    ).collect()
    assert len(out) == 3
    assert all(r.recall_at_k == 1.0 and r.n_overlap == 5 for r in out)


def test_token_pmi_positive_pair_construction(spark):
    """Two tokens that ALWAYS co-occur get pmi = ln(N/df) > 0 and rank
    first; unrelated fillers dilute the vocabulary."""
    import math

    from us_accidents_bigdata_pipeline_spark.operators.textstats import (
        token_pmi,
    )

    rows = [(i, "alpha beta filler%d" % (i % 7)) for i in range(20)]
    rows += [(100 + i, "gamma filler%d" % (i % 7)) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = token_pmi(df, min_doc_freq=5, top_k=5).collect()
    top = out[0]
    assert {top.token_a, top.token_b} == {"alpha", "beta"}
    assert abs(top.pmi - round(math.log(40 * 20 / (20 * 20)), 4)) < 1e-9


def test_bootstrap_ci_contains_point_and_orders(spark):
    """CI brackets the point estimate; repartitioning the aggregate
    changes nothing (md5 resampler is layout-independent)."""
    from us_accidents_bigdata_pipeline_spark.operators.profile import (
        bootstrap_ci_mean,
    )

    d = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
        )
    )
    r1 = bootstrap_ci_mean(d, "day", "rev", n_boot=50).first()
    assert r1.ci_lo <= r1.point_mean <= r1.ci_hi
    assert r1.ci_lo < r1.ci_hi
    r2 = bootstrap_ci_mean(d.repartition(9), "day", "rev", n_boot=50).first()
    assert (r1.ci_lo, r1.ci_hi, r1.point_mean) == (
        r2.ci_lo,
        r2.ci_hi,
        r2.point_mean,
    )


def test_seasonal_naive_perfect_on_periodic_series(spark):
    """A perfectly 7-periodic series has zero error everywhere."""
    import datetime

    from us_accidents_bigdata_pipeline_spark.operators.profile import (
        seasonal_naive_backtest,
    )

    base = datetime.date(2024, 1, 1)
    rows = [
        (base + datetime.timedelta(days=i), float(100 + (i % 7) * 10))
        for i in range(35)
    ]
    df = spark.createDataFrame(rows, "day date, v double")
    out = seasonal_naive_backtest(df, "day", "v", season=7).collect()
    assert out and all(r.mape == 0.0 and r.smape == 0.0 for r in out)


def test_dup_ngram_char_fraction_bounds(spark):
    """Full repetition → fraction 1.0; all-distinct text → 0.0; short
    docs (< n tokens) report 0.0, not NULL."""
    from us_accidents_bigdata_pipeline_spark.operators.textstats import (
        dup_ngram_char_fraction,
    )

    df = spark.createDataFrame(
        [
            (1, "a b a b a b a b"),          # every bigram repeats
            (2, "one two three four five"),  # all bigrams distinct
            (3, "single"),                   # too short for a bigram
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in dup_ngram_char_fraction(df, n=2, flag_threshold=0.1)
        .collect()
    }
    assert out[1].dup_char_frac == 1.0 and out[1].is_repetitive
    assert out[2].dup_char_frac == 0.0 and not out[2].is_repetitive
    assert out[3].dup_char_frac == 0.0 and not out[3].is_repetitive


def test_prefix_ndcg_perfect_when_prefix_is_whole_vector(spark):
    """prefix_dims = full dim ⇒ identical rankings ⇒ NDCG exactly 1."""
    from us_accidents_bigdata_pipeline_spark.operators.similarity import (
        prefix_ndcg,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    out = prefix_ndcg(emb, n_queries=3, k=5, prefix_dims=64).collect()
    assert len(out) == 3
    assert all(r.ndcg_at_k == 1.0 for r in out)
