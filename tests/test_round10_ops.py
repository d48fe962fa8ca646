"""Round-10 operator unit tests: mSPRT sequential guardrail semantics
(always-valid p behavior under null and real effects) and isotonic
calibration (minimax form equals hand-run PAVA, monotone output)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _two_arm_days(spark, deltas, n_per_day=40):
    """Daily two-arm fixture: arm 'a' values 100+delta_d, arm 'b'
    values 100, n_per_day each — exact .5-free decimals."""
    rows = []
    base = dt.datetime(2024, 1, 1)
    eid = 0
    for d, delta in enumerate(deltas):
        ts = base + dt.timedelta(days=d)
        for i in range(n_per_day):
            rows.append((eid, ts, "a", 100.0 + delta))
            eid += 1
            rows.append((eid, ts, "b", 100.0))
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, grp string, value double"
    )


def test_msprt_p_monotone_and_rejects_real_effect(spark):
    """A persistent 30-unit effect must drive the always-valid p to
    rejection; the p sequence must be non-increasing (the running-max
    construction) and start at <= 1."""
    from us_accidents_bigdata_pipeline_spark.operators.profile import (
        msprt_sequential_readout,
    )

    df = _two_arm_days(spark, [30.0] * 20)
    out = (
        msprt_sequential_readout(
            df, "ts", "value", "grp", "a", "b",
            sigma2=100.0, tau2=25.0, alpha=0.05,
        )
        .orderBy("day")
        .collect()
    )
    assert len(out) == 20
    ps = [r.p_always_valid for r in out]
    assert all(0.0 <= p <= 1.0 for p in ps)
    assert all(a >= b for a, b in zip(ps, ps[1:])), ps
    assert out[-1].reject
    # theta estimates the true effect
    assert abs(out[-1].theta - 30.0) < 1e-9


def test_msprt_null_does_not_reject(spark):
    """No effect: log Lambda stays at its n-driven floor (negative —
    the mixture prior penalizes sample size without signal), so p
    stays 1 and nothing rejects. The anti-peeking property in
    miniature: 20 daily looks, zero false alarms."""
    from us_accidents_bigdata_pipeline_spark.operators.profile import (
        msprt_sequential_readout,
    )

    df = _two_arm_days(spark, [0.0] * 20)
    out = msprt_sequential_readout(
        df, "ts", "value", "grp", "a", "b",
        sigma2=100.0, tau2=25.0, alpha=0.05,
    ).collect()
    assert all(not r.reject for r in out)
    assert all(r.p_always_valid == 1.0 for r in out)


def test_isotonic_matches_hand_pava_and_is_monotone(spark):
    """Violator bins pool to their weighted mean (the PAVA fixed
    point): rates [0.2, 0.6, 0.4, 0.8] with equal weights must pool
    bins 1-2 to 0.5; output must be non-decreasing."""
    from us_accidents_bigdata_pipeline_spark.operators.profile import (
        isotonic_calibration_bins,
    )

    rows = []
    # bin width 25 over [0, 100): scores 10, 35, 60, 85
    rates = {10.0: 0.2, 35.0: 0.6, 60.0: 0.4, 85.0: 0.8}
    for score, rate in rates.items():
        npos = int(rate * 10)
        for i in range(10):
            rows.append((score, i < npos))
    df = spark.createDataFrame(rows, "score double, label boolean")
    out = {
        r.bin: r
        for r in isotonic_calibration_bins(
            df, "score", F.col("label"), n_bins=4, lo=0.0, hi=100.0
        ).collect()
    }
    assert [out[b].raw_rate for b in range(4)] == [0.2, 0.6, 0.4, 0.8]
    cal = [out[b].calibrated_rate for b in range(4)]
    assert cal == [0.2, 0.5, 0.5, 0.8]
    assert all(a <= b for a, b in zip(cal, cal[1:]))


def test_isotonic_already_monotone_is_identity(spark):
    """A non-decreasing raw curve must pass through unchanged."""
    from us_accidents_bigdata_pipeline_spark.operators.profile import (
        isotonic_calibration_bins,
    )

    rows = []
    for score, rate in ((10.0, 0.1), (35.0, 0.4), (60.0, 0.9)):
        npos = int(rate * 10)
        for i in range(10):
            rows.append((score, i < npos))
    df = spark.createDataFrame(rows, "score double, label boolean")
    out = {
        r.bin: r.calibrated_rate
        for r in isotonic_calibration_bins(
            df, "score", F.col("label"), n_bins=4, lo=0.0, hi=100.0
        ).collect()
    }
    assert out == {0: 0.1, 1: 0.4, 2: 0.9}


def test_cohens_kappa_perfect_and_independent(spark):
    """kappa = 1 for identical raters; ~0 for independent ones; NULL
    when both raters are constant (chance correction undefined)."""
    from us_accidents_bigdata_pipeline_spark.operators.profile import (
        cohens_kappa,
    )

    df = spark.createDataFrame(
        [(i, i % 2 == 0, i % 2 == 0, i % 3 == 0) for i in range(120)],
        "i long, a boolean, b boolean, c boolean",
    )
    perfect = cohens_kappa(df, "a", "b").head()
    assert perfect.kappa == 1.0 and perfect.p_observed == 1.0
    # a (period 2) vs c (period 3) over 120 rows are exactly
    # independent: kappa is 0 by construction
    indep = cohens_kappa(df, "a", "c").head()
    assert indep.kappa == 0.0
    const = df.select("i", F.lit(True).alias("x"), F.lit(True).alias("y"))
    degenerate = cohens_kappa(const, "x", "y").head()
    assert degenerate.kappa is None
    assert degenerate.p_observed == 1.0


def test_ece_perfectly_calibrated_score_is_zero(spark):
    """A score equal to the bin's true rate (by construction) gives
    ECE 0; a maximally wrong score gives ECE near 1."""
    from us_accidents_bigdata_pipeline_spark.operators.profile import (
        expected_calibration_error,
    )

    rows = []
    # bin [0.2, 0.25): score 0.2, rate 0.2 exactly (1 of 5)
    for i in range(20):
        rows.append((0.2, i % 5 == 0))
    # bin [0.8, 0.85): score 0.8, rate 0.8 exactly (4 of 5)
    for i in range(20):
        rows.append((0.8, i % 5 != 0))
    df = spark.createDataFrame(rows, "score double, label boolean")
    r = expected_calibration_error(df, "score", F.col("label")).head()
    assert r.ece == 0.0 and r.mce == 0.0 and r.n == 40
    wrong = spark.createDataFrame(
        [(0.95, False)] * 30, "score double, label boolean"
    )
    r2 = expected_calibration_error(wrong, "score", F.col("label")).head()
    assert r2.ece == 0.95


def test_mde_shrinks_with_sample_size(spark):
    """MDE must scale as 1/sqrt(n): a segment with 4x the rows at the
    same variance has exactly half the MDE."""
    from us_accidents_bigdata_pipeline_spark.operators.profile import (
        mde_readout,
    )

    rows = [("small", float(v)) for v in (10, 20) * 50]
    rows += [("big", float(v)) for v in (10, 20) * 200]
    df = spark.createDataFrame(rows, "seg string, v double")
    out = {r.seg: r for r in mde_readout(df, "seg", "v").collect()}
    assert out["small"].sd == out["big"].sd == 5.0
    assert abs(out["small"].mde_abs - 2 * out["big"].mde_abs) < 1e-3


def test_split_leakage_entity_split_is_clean_row_split_leaks(spark):
    """Hash-splitting on the ENTITY key leaks nothing; hash-splitting
    on the ROW key leaks every multi-row entity whose rows straddle
    the cut."""
    from us_accidents_bigdata_pipeline_spark.operators.shard import (
        split_leakage_report,
    )

    rows = [(i, i // 4) for i in range(400)]  # 4 rows per entity
    df = spark.createDataFrame(rows, "row_id long, entity long")
    by_entity = F.when(
        F.col("entity") % 5 == 0, F.lit("eval")
    ).otherwise(F.lit("train"))
    clean = split_leakage_report(df, "entity", by_entity).collect()
    assert all(not r.leaked for r in clean)
    assert {r.splits for r in clean} == {"eval", "train"}
    by_row = F.when(
        F.col("row_id") % 5 == 0, F.lit("eval")
    ).otherwise(F.lit("train"))
    leaky = {
        r.splits: r for r in split_leakage_report(df, "entity", by_row).collect()
    }
    assert "eval+train" in leaky and leaky["eval+train"].leaked
    # row_id%5 hits every entity of 4 consecutive ids at least... not
    # all: entities whose 4 rows all miss %5==0 stay train-only
    assert "train" in leaky and not leaky["train"].leaked


def test_token_coverage_monotone_and_bounded(spark):
    """Coverage must be non-decreasing in K and end at <= 1; a corpus
    of one repeated token covers 1.0 at K=10 (only k<=vocab rows
    emitted)."""
    from us_accidents_bigdata_pipeline_spark.operators.textstats import (
        token_coverage_curve,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    out = token_coverage_curve(docs).collect()
    cov = [r.coverage for r in sorted(out, key=lambda r: r.k)]
    assert all(a <= b for a, b in zip(cov, cov[1:]))
    assert 0 < cov[0] <= cov[-1] <= 1.0


def test_class_balanced_weights_normalized_and_ordered(spark):
    """Rarer classes get strictly larger weights; the weighted row
    count equals N (the loss-scale-preserving normalization)."""
    from us_accidents_bigdata_pipeline_spark.operators.curation import (
        class_balanced_weights,
    )

    rows = [("common",)] * 900 + [("rare",)] * 100
    df = spark.createDataFrame(rows, "cls string")
    out = {r.cls: r for r in class_balanced_weights(df, "cls").collect()}
    assert out["rare"].weight > out["common"].weight
    total = sum(r.weight * r.n for r in out.values())
    assert abs(total - 1000) < 0.01


def test_l_diversity_flags_homogeneous_class_only(spark):
    """A class where every member shares the sensitive value is
    flagged; a mixed class is not — regardless of class SIZE (the
    leak k-anonymity cannot see)."""
    from us_accidents_bigdata_pipeline_spark.operators.dq import (
        l_diversity_audit,
    )

    rows = [("q1", "all_same")] * 10 + [
        ("q2", "x"),
        ("q2", "y"),
        ("q2", "x"),
    ]
    df = spark.createDataFrame(rows, "qi string, sens string")
    out = l_diversity_audit(df, ["qi"], "sens", l=2).collect()
    assert len(out) == 1
    assert out[0].qi == "q1" and out[0].class_size == 10
    assert out[0].n_sensitive_values == 1


def test_source_overlap_identical_sources_jaccard_one(spark):
    """Two sources with identical text share every shingle (jaccard
    1.0); a disjoint source pairs with neither (no row — zero-overlap
    pairs are absent by construction)."""
    from us_accidents_bigdata_pipeline_spark.operators.dedup import (
        source_overlap_jaccard,
    )

    text = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, "mirror_a", text),
        (2, "mirror_b", text),
        (3, "unique_c", "one two three four five six"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = source_overlap_jaccard(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.source_a, r.source_b) == ("mirror_a", "mirror_b")
    assert r.jaccard == 1.0 and r.n_a == r.n_b == r.n_common == 4


def test_energy_distance_zero_iff_identical_and_detects_shift(spark):
    """Identical samples give D = 0 exactly; a pure location shift and
    a pure VARIANCE change (equal means) both give D > 0 — the
    tail/variance sensitivity KS's sup-gap lacks is the point."""
    from us_accidents_bigdata_pipeline_spark.operators.profile import (
        energy_distance_two_sample,
    )

    same = [("a", float(v)) for v in range(100)] + [
        ("b", float(v)) for v in range(100)
    ]
    df = spark.createDataFrame(same, "g string, v double")
    r = energy_distance_two_sample(df, "v", "g", "a", "b").head()
    assert r.energy_distance == 0.0 and r.n_a == r.n_b == 100
    shift = [("a", float(v)) for v in range(100)] + [
        ("b", float(v) + 50.0) for v in range(100)
    ]
    r2 = energy_distance_two_sample(
        spark.createDataFrame(shift, "g string, v double"), "v", "g", "a", "b"
    ).head()
    assert r2.energy_distance > 1.0
    # equal means (49.5), different spread: b concentrated at the mean
    spread = [("a", float(v)) for v in range(100)] + [
        ("b", 49.5)
    ] * 100
    r3 = energy_distance_two_sample(
        spark.createDataFrame(spread, "g string, v double"), "v", "g", "a", "b"
    ).head()
    assert r3.energy_distance > 0.0


def test_embedding_dim_moments_detects_dead_dim(spark):
    """A constant-zero dimension reports std 0 and zero_frac 1; a live
    dimension reports its exact moments."""
    from us_accidents_bigdata_pipeline_spark.operators.profile import (
        embedding_dim_moments,
    )

    rows = [(i, [float(i), 0.0]) for i in range(1, 5)]  # dim0: 1..4
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.dim: r for r in embedding_dim_moments(df).collect()}
    assert out[1].std == 0.0 and out[1].zero_frac == 1.0
    assert out[0].mean == 2.5 and out[0].zero_frac == 0.0
    # population std of 1..4 = sqrt(1.25)
    assert abs(out[0].std - 1.118034) < 1e-6


def test_cmh_recovers_common_odds_ratio(spark):
    """Two strata engineered with the SAME within-stratum odds ratio
    (4.0) but opposite marginals: the crude pooled OR is confounded,
    CMH recovers ~4."""
    from us_accidents_bigdata_pipeline_spark.operators.profile import (
        cmh_odds_ratio,
    )

    rows = []
    # stratum s1: a=40 b=10 c=20 d=20 -> OR = (40*20)/(10*20) = 4
    rows += [("s1", True, True)] * 40 + [("s1", True, False)] * 10
    rows += [("s1", False, True)] * 20 + [("s1", False, False)] * 20
    # stratum s2: a=8 b=20 c=10 d=100 -> OR = (8*100)/(20*10) = 4
    rows += [("s2", True, True)] * 8 + [("s2", True, False)] * 20
    rows += [("s2", False, True)] * 10 + [("s2", False, False)] * 100
    df = spark.createDataFrame(rows, "k string, e boolean, o boolean")
    r = cmh_odds_ratio(df, "k", F.col("e"), F.col("o")).head()
    assert r.n_strata == 2 and r.n == 228
    assert abs(r.or_mh - 4.0) < 0.35  # MH pools toward the common OR


def test_overdispersion_flags_bursty_counts(spark):
    """Constant daily counts give dispersion 0 (under-dispersed);
    bursty counts (0 or 100) give dispersion >> 1.5."""
    from us_accidents_bigdata_pipeline_spark.operators.profile import (
        overdispersion_check,
    )

    rows = []
    base = dt.datetime(2024, 3, 1)
    for d in range(10):
        ts = base + dt.timedelta(days=d)
        rows += [("steady", ts)] * 10
        if d % 2 == 0:
            rows += [("bursty", ts)] * 100
        else:
            rows += [("bursty", ts)] * 1
    df = spark.createDataFrame(rows, "seg string, ts timestamp")
    out = {r.seg: r for r in overdispersion_check(df, "seg").collect()}
    assert out["steady"].dispersion == 0.0
    assert not out["steady"].overdispersed
    assert out["bursty"].dispersion > 10
    assert out["bursty"].overdispersed


def test_conformal_coverage_guarantee_on_exchangeable_series(spark):
    """On an exchangeable (seasonal, trendless) series the held-out
    coverage must be >= 1 - alpha (the split-conformal guarantee);
    q_hat equals the calibration |residual| order statistic."""
    from us_accidents_bigdata_pipeline_spark.operators.profile import (
        split_conformal_interval,
    )

    rows = []
    base = dt.datetime(2024, 1, 1)
    # 84 days: exact weekly pattern + deterministic small wiggle
    for d in range(84):
        ts = base + dt.timedelta(days=d)
        wiggle = (d * 13 % 7) - 3.0
        v = 100.0 + 10.0 * (d % 7) + wiggle
        rows.append((ts, v))
    df = spark.createDataFrame(rows, "dt timestamp, v double")
    r = split_conformal_interval(
        df, "dt", "v", season=7, calib_frac=0.5, alpha=0.1
    ).head()
    assert r.n_calib + r.n_test == 84 - 7
    assert r.coverage >= 0.9
    assert r.q_hat >= 0


def test_wasserstein_matches_closed_forms(spark):
    """W1 of identical samples is 0; W1 of a pure +c location shift is
    exactly c; W1 between uniform{0..9} and the constant 4.5 is the
    mean absolute deviation 2.5."""
    from us_accidents_bigdata_pipeline_spark.operators.profile import (
        wasserstein_1d,
    )

    def w1(rows):
        df = spark.createDataFrame(rows, "g string, v double")
        return wasserstein_1d(df, "v", "g", "a", "b").head()

    same = [("a", float(v)) for v in range(10)] + [
        ("b", float(v)) for v in range(10)
    ]
    assert w1(same).wasserstein_1 == 0.0
    shift = [("a", float(v)) for v in range(10)] + [
        ("b", float(v) + 3.0) for v in range(10)
    ]
    assert w1(shift).wasserstein_1 == 3.0
    const = [("a", float(v)) for v in range(10)] + [("b", 4.5)] * 10
    assert w1(const).wasserstein_1 == 2.5


def test_spearman_exact_on_monotone_and_antitone(spark):
    """rho = 1 for any monotone-increasing relation (even nonlinear),
    -1 for decreasing, and ~0 for an exactly balanced zig-zag; ties
    use midranks."""
    from us_accidents_bigdata_pipeline_spark.operators.profile import (
        spearman_correlation,
    )

    inc = [(float(i), float(i * i)) for i in range(20)]
    df = spark.createDataFrame(inc, "x double, y double")
    assert spearman_correlation(df, "x", "y").head().spearman_rho == 1.0
    dec = [(float(i), float(-i * i * i)) for i in range(20)]
    df2 = spark.createDataFrame(dec, "x double, y double")
    assert spearman_correlation(df2, "x", "y").head().spearman_rho == -1.0


def test_cramers_v_bounds(spark):
    """V = 1 when the second category is a function of the first
    (square table); V = 0 under exact independence."""
    from us_accidents_bigdata_pipeline_spark.operators.profile import (
        cramers_v,
    )

    perfect = [(str(i % 3), str((i % 3) * 10)) for i in range(90)]
    df = spark.createDataFrame(perfect, "a string, b string")
    r = cramers_v(df, "a", "b").head()
    assert r.cramers_v == 1.0 and r.n_rows_cat == r.n_cols_cat == 3
    indep = [(str(i % 3), str(i % 5)) for i in range(90)]
    df2 = spark.createDataFrame(indep, "a string, b string")
    r2 = cramers_v(df2, "a", "b").head()
    assert r2.cramers_v == 0.0


def test_k_center_greedy_radius_sequence_and_coverage(spark):
    """On three well-separated clusters, the first three picks land
    in three DIFFERENT clusters (that is the 2-approximation's whole
    point) and the winning distances never increase."""
    from us_accidents_bigdata_pipeline_spark.operators.similarity import (
        k_center_greedy,
    )

    rows = []
    vid = 0
    for cx, cluster in ((0.0, "a"), (100.0, "b"), (200.0, "c")):
        for i in range(10):
            rows.append((vid, [cx + i * 0.1, 0.0]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = sorted(
        k_center_greedy(df, k=4, start_id=0).collect(),
        key=lambda r: r.sel_order,
    )
    cluster_of = lambda v: v // 10
    first_three = {cluster_of(r.vec_id) for r in out[:3]}
    assert first_three == {0, 1, 2}
    dms = [r.d_min for r in out[1:]]
    assert all(a >= b for a, b in zip(dms, dms[1:]))
    # the 4th pick's distance collapses to within-cluster scale
    assert out[3].d_min < 1.0 and out[1].d_min > 100.0


def test_two_sample_stats_null_on_missing_group(spark):
    """Energy distance and Wasserstein emit NULL (not NaN/inf) when
    one group is absent — the ANSI guard discipline."""
    from us_accidents_bigdata_pipeline_spark.operators.profile import (
        energy_distance_two_sample,
        wasserstein_1d,
    )

    df = spark.createDataFrame(
        [("a", float(v)) for v in range(5)], "g string, v double"
    )
    e = energy_distance_two_sample(df, "v", "g", "a", "b").head()
    assert e.n_b == 0 and e.e_xy is None and e.energy_distance is None
    w = wasserstein_1d(df, "v", "g", "a", "b").head()
    assert w.n_b == 0 and w.wasserstein_1 is None


def test_isotonic_properties_random(spark):
    """Property sweep: for random bin data the calibrated curve is
    non-decreasing and preserves the total positive mass
    (Σ n_b·iso_b = Σ pos_b — isotonic regression is a projection
    that conserves the weighted sum)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from us_accidents_bigdata_pipeline_spark.operators.profile import (
        isotonic_calibration_bins,
    )

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        rates=st.lists(
            st.integers(min_value=0, max_value=8),
            min_size=3,
            max_size=6,
        )
    )
    def run(rates):
        rows = []
        width = 100.0 / len(rates)
        for b, npos in enumerate(rates):
            score = b * width + 1.0
            for i in range(8):
                rows.append((score, i < npos))
        df = spark.createDataFrame(rows, "score double, label boolean")
        out = sorted(
            isotonic_calibration_bins(
                df, "score", F.col("label"), n_bins=len(rates),
                lo=0.0, hi=100.0,
            ).collect(),
            key=lambda r: r.bin,
        )
        cal = [r.calibrated_rate for r in out]
        assert all(a <= b + 1e-9 for a, b in zip(cal, cal[1:])), cal
        mass = sum(r.n * r.calibrated_rate for r in out)
        assert abs(mass - sum(rates)) < 1e-2

    run()


def test_wasserstein_energy_properties_random(spark):
    """Property sweep: both two-sample distances are symmetric in the
    groups, nonnegative, and zero on identical multisets."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from us_accidents_bigdata_pipeline_spark.operators.profile import (
        energy_distance_two_sample,
        wasserstein_1d,
    )

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        xs=st.lists(
            st.integers(min_value=0, max_value=50),
            min_size=3,
            max_size=12,
        ),
        ys=st.lists(
            st.integers(min_value=0, max_value=50),
            min_size=3,
            max_size=12,
        ),
    )
    def run(xs, ys):
        rows = [("a", float(v)) for v in xs] + [
            ("b", float(v)) for v in ys
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        w_ab = wasserstein_1d(df, "v", "g", "a", "b").head().wasserstein_1
        w_ba = wasserstein_1d(df, "v", "g", "b", "a").head().wasserstein_1
        assert w_ab == w_ba >= 0.0
        e_ab = energy_distance_two_sample(
            df, "v", "g", "a", "b"
        ).head().energy_distance
        e_ba = energy_distance_two_sample(
            df, "v", "g", "b", "a"
        ).head().energy_distance
        assert e_ab == e_ba >= 0.0
        if sorted(xs) == sorted(ys):
            assert w_ab == 0.0 and e_ab == 0.0

    run()
