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
