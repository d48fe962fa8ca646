"""Round-11 operator unit tests: the cardinality contract of the
per-distinct-value window family (continuous inputs must trip the
guard, quantized/whitelisted inputs must pass through unchanged)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from us_accidents_bigdata_pipeline_spark.operators.profile import (
    energy_distance_two_sample,
    mann_whitney_u,
    spearman_correlation,
    wasserstein_1d,
)


def _continuous_two_group(spark, n=4000):
    """A genuinely continuous value column: n distinct doubles that no
    decimal(18,2) cast collapses (each value has a unique 2-decimal
    image too, so the cast inside energy/wasserstein does not save
    it)."""
    return spark.range(n).select(
        (F.col("id") % 2 == 0).cast("string").alias("grp"),
        (F.col("id") * 1.37 + 0.003).alias("value"),
    )


def test_guard_trips_on_continuous_input(spark):
    df = _continuous_two_group(spark)
    for fn in (mann_whitney_u, energy_distance_two_sample, wasserstein_1d):
        with pytest.raises(ValueError, match="distinct values"):
            fn(df, "value", "grp", "true", "false", max_distinct=1000)


def test_guard_trips_on_continuous_spearman(spark):
    df = _continuous_two_group(spark).select(
        "value", (F.col("value") * 2).alias("value2")
    )
    with pytest.raises(ValueError, match="distinct values"):
        spearman_correlation(df, "value", "value2", max_distinct=1000)


def test_guard_passthrough_quantized_and_none(spark):
    """Quantized domains pass under the default bound; max_distinct=None
    skips the pre-check even on continuous data (caller's contract)."""
    df = _continuous_two_group(spark, n=400).select(
        "grp", F.round("value", 0).alias("value")
    )
    row = mann_whitney_u(df, "value", "grp", "true", "false").first()
    assert row["n_a"] == 200 and row["n_b"] == 200

    cont = _continuous_two_group(spark, n=3000)
    out = wasserstein_1d(
        cont, "value", "grp", "true", "false", max_distinct=None
    ).first()
    assert out is not None
