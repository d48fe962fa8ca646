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
        [
            (1, ""),
            (2, "   "),
            (3, "the a of and to in is it " * 20),
            (4, None),
        ],
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
    # NULL text: every flag must be a real FALSE (not NULL) — the
    # coalesce discipline matching the oracle's coalesce(..., FALSE)
    r4 = rows[4]
    for flag in (
        r4.word_count_ok,
        r4.word_len_ok,
        r4.alpha_ok,
        r4.stopword_ok,
        r4.pass_gopher,
    ):
        assert flag is False
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


def test_rrf_fusion_agrees_with_manual_score(spark):
    """RRF score of the top fused hit equals 1/(60+rf) + 1/(60+rp)
    recomputed from the two standalone rankings."""
    from us_accidents_bigdata_pipeline_spark.operators.similarity import (
        rrf_fuse_rankings,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    out = rrf_fuse_rankings(emb, n_queries=2, k=3).collect()
    assert len(out) == 6
    for r in out:
        assert 2.0 / (60 + 499) <= r.rrf_score <= 2.0 / 61
    # ranks are 1..3 per query, scores non-increasing within a query
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r.fused_rank)
        assert [r.fused_rank for r in rows] == [1, 2, 3]
        assert all(
            rows[i].rrf_score >= rows[i + 1].rrf_score for i in range(2)
        )


def test_mann_whitney_matches_scipy_formula(spark):
    """U statistics equal the closed-form on a tiny hand sample with
    ties; identical samples give z = 0 and p = 1 (A&S polynomial at 0
    is 2·φ(0)·Σb·t at t=1 ≈ 0.9999+)."""
    from us_accidents_bigdata_pipeline_spark.operators.profile import (
        mann_whitney_u,
    )

    rows = [("a", 1.0), ("a", 2.0), ("a", 2.0), ("b", 2.0), ("b", 3.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = mann_whitney_u(df, "v", "g", "a", "b").first()
    # pooled midranks: 1.0→1, 2.0→(2+3+4)/3=3, 3.0→5
    # R_a = 1 + 3 + 3 = 7; U_a = 7 − 3·4/2 = 1; U_b = 6 − 1 = 5
    assert (r.n_a, r.n_b) == (3, 2)
    assert r.u_a == 1.0 and r.u_b == 5.0
    same = spark.createDataFrame(
        [("a", float(i % 5)) for i in range(50)]
        + [("b", float(i % 5)) for i in range(50)],
        "g string, v double",
    )
    r2 = mann_whitney_u(same, "v", "g", "a", "b").first()
    assert r2.z == 0.0
    assert r2.p_two_sided > 0.999


def test_theil_sen_exact_on_linear_series(spark):
    """A perfectly linear series returns exactly its slope; one wild
    outlier doesn't move it (robustness OLS lacks)."""
    from us_accidents_bigdata_pipeline_spark.operators.profile import (
        theil_sen_slope,
    )

    rows = [(float(i), 3.0 * i + 7.0) for i in range(30)]
    df = spark.createDataFrame(rows, "x double, y double")
    assert theil_sen_slope(df, "x", "y").first().slope == 3.0
    rows[15] = (15.0, 1e6)
    df2 = spark.createDataFrame(rows, "x double, y double")
    assert theil_sen_slope(df2, "x", "y").first().slope == 3.0


def test_compaction_reduces_file_count(spark, tmp_path):
    """32 small files compact to the target count; rows survive and
    maxRecordsPerFile caps every output file."""
    from us_accidents_bigdata_pipeline_spark.operators.layout import (
        compact_parquet,
        small_file_report,
    )

    src = str(tmp_path / "small")
    dst = str(tmp_path / "compacted")
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    n = docs.count()
    docs.repartition(32).write.parquet(src)
    before = small_file_report(spark, src).first()
    assert before.n_files == 32 and before.n_rows == n
    n_out = compact_parquet(spark, src, dst, target_rows_per_file=300)
    after = small_file_report(spark, dst).first()
    assert after.n_rows == n
    assert after.n_files == n_out < 32
    assert after.max_rows_per_file <= 300


def test_compaction_with_sort_clusters_footers(spark, tmp_path):
    """sort_cols compaction clusters doc_id: per-file [min,max] ranges
    must not overlap across files (range exchange + within-sort)."""
    from pyspark.sql import functions as SF

    from us_accidents_bigdata_pipeline_spark.operators.layout import (
        compact_parquet,
    )

    src = str(tmp_path / "s2")
    dst = str(tmp_path / "c2")
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    docs.repartition(16).write.parquet(src)
    n_out = compact_parquet(
        spark, src, dst, target_rows_per_file=200, sort_cols=["doc_id"]
    )
    assert n_out >= 3
    ranges = (
        spark.read.parquet(dst)
        .groupBy(SF.input_file_name().alias("f"))
        .agg(SF.min("doc_id").alias("lo"), SF.max("doc_id").alias("hi"))
        .collect()
    )
    spans = sorted((r.lo, r.hi) for r in ranges)
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2, spans


def test_mann_whitney_randomized_vs_reference(spark):
    """Randomized equivalence: U statistics match a pure-Python midrank
    computation on seeded samples with heavy ties."""
    import random

    from us_accidents_bigdata_pipeline_spark.operators.profile import (
        mann_whitney_u,
    )

    rng = random.Random(2024)
    for trial in range(3):
        rows = [
            ("a", float(rng.randint(0, 8))) for _ in range(rng.randint(5, 40))
        ] + [
            ("b", float(rng.randint(2, 10))) for _ in range(rng.randint(5, 40))
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        got = mann_whitney_u(df, "v", "g", "a", "b").first()
        pooled = sorted(v for _, v in rows)
        midrank = {}
        i = 0
        while i < len(pooled):
            j = i
            while j < len(pooled) and pooled[j] == pooled[i]:
                j += 1
            midrank[pooled[i]] = (i + 1 + j) / 2.0
            i = j
        r_a = sum(midrank[v] for g, v in rows if g == "a")
        n_a = sum(1 for g, _ in rows if g == "a")
        n_b = len(rows) - n_a
        u_a = r_a - n_a * (n_a + 1) / 2.0
        assert (got.n_a, got.n_b) == (n_a, n_b), trial
        assert got.u_a == u_a and got.u_b == n_a * n_b - u_a, trial


def test_stratified_kfold_property(spark):
    """Property check: for ANY label multiset and any k, every
    (label) stratum's fold counts are balanced ±1, every row keeps its
    original label, and fold ids cover exactly 0..k-1 (for strata with
    ≥ k rows)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from us_accidents_bigdata_pipeline_spark.operators.sample import (
        stratified_kfold,
    )

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        labels=st.lists(
            st.sampled_from(["a", "b", "c"]), min_size=1, max_size=60
        ),
        k=st.sampled_from([2, 3, 5]),
    )
    def run(labels, k):
        df = spark.createDataFrame(
            [(i, lab) for i, lab in enumerate(labels)],
            "key long, label string",
        ).repartition(3)
        out = stratified_kfold(df, "label", "key", k=k).collect()
        assert len(out) == len(labels)
        per: dict = {}
        for r in out:
            assert 0 <= r.fold < k
            assert labels[r.key] == r.label
            per.setdefault(r.label, []).append(r.fold)
        for lab, folds in per.items():
            counts = [folds.count(f) for f in range(k)]
            nz = [c for c in counts if c > 0]
            assert max(counts) - min(counts) <= 1 or (
                len(folds) < k and max(nz) - min(nz) <= 1
            ), (lab, counts)
            if len(folds) >= k:
                assert all(c > 0 for c in counts), (lab, counts)

    run()
