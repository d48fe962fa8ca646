"""Unit tests for the binned interval join: half-open boundaries,
overlapping-interval fanout, and left-join null preservation."""

from __future__ import annotations

from pyspark.sql import functions as F

from us_accidents_bigdata_pipeline_spark.operators.rangejoin import range_join_binned


def _fixtures(spark):
    points = spark.createDataFrame(
        [(1, 0.0), (2, 10.0), (3, 15.0), (4, 20.0), (5, 99.0)],
        "pid long, v double",
    )
    intervals = spark.createDataFrame(
        [("a", 0.0, 20.0), ("b", 10.0, 30.0)], "name string, lo double, hi double"
    )
    return points, intervals


def test_range_join_half_open_and_overlap(spark):
    points, intervals = _fixtures(spark)
    got = {
        (r.pid, r.name)
        for r in range_join_binned(points, intervals, "v", "lo", "hi", 8.0).collect()
    }
    # v=0 at lo of a (included); v=10 in a and at lo of b; v=15 in both;
    # v=20 at hi of a (EXCLUDED) but inside b; v=99 unmatched
    assert got == {(1, "a"), (2, "a"), (2, "b"), (3, "a"), (3, "b"), (4, "b")}


def test_range_join_bin_width_invariance(spark):
    points, intervals = _fixtures(spark)
    for bw in (1.0, 7.0, 100.0):
        got = {
            (r.pid, r.name)
            for r in range_join_binned(
                points, intervals, "v", "lo", "hi", bw
            ).collect()
        }
        assert got == {(1, "a"), (2, "a"), (2, "b"), (3, "a"), (3, "b"), (4, "b")}, bw


def test_range_join_left_keeps_unmatched(spark):
    points, intervals = _fixtures(spark)
    rows = range_join_binned(
        points, intervals, "v", "lo", "hi", 8.0, how="left"
    ).collect()
    unmatched = [r for r in rows if r.name is None]
    assert [r.pid for r in unmatched] == [5]
    assert len(rows) == 7
    # matched rows carry interval columns
    assert all(r.lo is not None for r in rows if r.name is not None)


def test_range_join_left_null_in_point_column(spark):
    """A MATCHED point row carrying a NULL must be emitted exactly once:
    the anti-join uses null-safe equality, so the null row equates with
    its copy in the matched set (name-list joins compile to null-unsafe
    equality and would emit it twice — once matched, once null-padded)."""
    points = spark.createDataFrame(
        [(1, 5.0, "x"), (2, 15.0, None), (3, 99.0, None)],
        "pid long, v double, tag string",
    )
    intervals = spark.createDataFrame(
        [("a", 0.0, 20.0)], "name string, lo double, hi double"
    )
    rows = range_join_binned(
        points, intervals, "v", "lo", "hi", 8.0, how="left"
    ).collect()
    assert len(rows) == 3
    by_pid = {r.pid: r for r in rows}
    assert by_pid[1].name == "a"
    assert by_pid[2].name == "a"  # matched despite NULL tag, not doubled
    assert by_pid[3].name is None  # genuinely unmatched, null-padded


def test_range_join_equivalence_property(spark):
    """Property check vs the naive non-equi join on generated inputs:
    the binning rewrite must be result-identical for any point set,
    interval set (including empty, touching, nested, negative-valued,
    zero-width) and any bin width."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    values = st.integers(min_value=-50, max_value=50).map(float)

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        pts=st.lists(values, min_size=0, max_size=12),
        ivs=st.lists(st.tuples(values, values), min_size=0, max_size=6),
        bw=st.sampled_from([1.0, 3.0, 17.0]),
    )
    def run(pts, ivs, bw):
        points = spark.createDataFrame(
            [(i, v) for i, v in enumerate(pts)] or [(None, None)],
            "pid long, v double",
        ).filter(F.col("pid").isNotNull())
        intervals = spark.createDataFrame(
            [(i, min(a, b), max(a, b)) for i, (a, b) in enumerate(ivs)]
            or [(None, None, None)],
            "iid long, lo double, hi double",
        ).filter(F.col("iid").isNotNull())
        got = {
            (r.pid, r.iid)
            for r in range_join_binned(
                points, intervals, "v", "lo", "hi", bw
            ).collect()
        }
        naive = {
            (r.pid, r.iid)
            for r in points.join(
                intervals,
                (F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi")),
            ).collect()
        }
        assert got == naive

    run()


def test_grid_join_2d_matches_brute_force(spark):
    """Grid binning is exact: pairs and distances must equal the brute
    force O(n^2) join, including points exactly radius apart (boundary)
    and pairs crossing cell borders."""
    import itertools
    import math
    import random

    from us_accidents_bigdata_pipeline_spark.operators.rangejoin import (
        grid_join_2d,
    )

    rng = random.Random(7)
    pts = [(i, rng.uniform(0, 1), rng.uniform(0, 1)) for i in range(150)]
    # boundary pair exactly radius apart, straddling a cell border
    pts.append((900, 0.0999, 0.5))
    pts.append((901, 0.1999, 0.5))  # dx = 0.1 == radius exactly
    df = spark.createDataFrame(pts, "id long, x double, y double")
    out = {
        (r.id_a, r.id_b): r.dist
        for r in grid_join_2d(df, "id", "x", "y", radius=0.1).collect()
    }
    brute = {}
    for (i1, x1, y1), (i2, x2, y2) in itertools.combinations(pts, 2):
        a, b = min(i1, i2), max(i1, i2)
        d = math.sqrt((x1 - x2) ** 2 + (y1 - y2) ** 2)
        if d <= 0.1:
            brute[(a, b)] = round(d, 6)
    assert out == brute
    assert (900, 901) in out  # the exact-radius boundary pair survived


def test_interval_overlap_binned_equals_quadratic(spark):
    """Binned overlap join must equal the quadratic reference on
    adversarial intervals: bin-boundary endpoints, zero-length,
    nested, disjoint, and multi-bin spans — including pairs whose
    overlap starts exactly on a bin edge (the ownership rule's edge)."""
    import pyspark.sql.functions as F

    from us_accidents_bigdata_pipeline_spark.operators.rangejoin import (
        interval_overlap_join_binned,
    )

    W_BIN = 10
    ivals = [
        (0, 0, 5),     # id, lo, hi
        (1, 5, 5),     # zero-length at interior point
        (2, 5, 15),    # spans a bin edge
        (3, 10, 10),   # zero-length ON a bin edge
        (4, 10, 20),   # starts on a bin edge
        (5, 0, 100),   # spans many bins (nested over everything)
        (6, 21, 29),   # interior
        (7, 30, 40),   # touches 29? no; touches 40/41 edges
        (8, 40, 41),   # starts where 7 ends (closed ends: overlap)
        (9, 55, 56),   # disjoint from most
    ]
    a = spark.createDataFrame(
        [(i, lo, hi) for i, lo, hi in ivals], "ia int, lo_a long, hi_a long"
    )
    b = spark.createDataFrame(
        [(i, lo, hi) for i, lo, hi in ivals], "ib int, lo_b long, hi_b long"
    )
    got = {
        (r["ia"], r["ib"])
        for r in interval_overlap_join_binned(
            a, b, "lo_a", "hi_a", "lo_b", "hi_b", bin_width=W_BIN
        ).collect()
    }
    expect = {
        (x[0], y[0])
        for x in ivals
        for y in ivals
        if x[1] <= y[2] and y[1] <= x[2]
    }
    assert got == expect
    # exactly-once: the join emits no duplicate pairs
    rows = interval_overlap_join_binned(
        a, b, "lo_a", "hi_a", "lo_b", "hi_b", bin_width=W_BIN
    ).groupBy("ia", "ib").count().filter(F.col("count") > 1).collect()
    assert not rows, rows
