"""Interval (range) joins: points matched to [lo, hi) intervals.

Spark's optimizer plans a raw non-equi join (``p >= lo AND p < hi``)
as BroadcastNestedLoopJoin — O(|points|·|intervals|) comparisons, fine
only when one side broadcasts. ``range_join_binned`` is the scale
form: both sides are keyed by a bin index (``floor(x / bin_width)``),
intervals EXPLODED across every bin they overlap, and the join becomes
an equi-join on bin plus a residual filter — the standard binning
rewrite databases use for interval joins.

Cost model: each point lands in exactly ONE bin, so the equi-join
emits no duplicate (point, interval) candidates; each interval is
replicated ⌈span/bin_width⌉+1 times. Pick ``bin_width`` near the
typical interval span: shuffle volume is |points| + |intervals|·spans,
and per-bin fanout stays bounded instead of the nested-loop's full
cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join every point row to every interval row with
    ``lo <= point < hi`` (half-open, the SQL BETWEEN-exclusive-end
    convention) via the binning rewrite. Output: point columns +
    interval columns; column names must not collide.

    ``how="inner"`` drops unmatched points; ``"left"`` keeps them with
    null interval columns (implemented as the inner form plus an
    anti-join union so the residual filter can't silently turn a left
    join into an inner one — the anti-join keys on the full point row
    with NULL-SAFE equality, so a matched point row containing NULLs
    still equates with its copy in the matched set; left mode requires
    point rows to be distinct)."""
    if how not in ("inner", "left"):
        raise ValueError(f"range_join_binned: unsupported how={how!r}")
    p = points.withColumn("_bin", F.floor(F.col(point_col) / F.lit(bin_width)))
    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bin_width)),
                F.floor(F.col(hi_col) / F.lit(bin_width)),
            )
        ),
    )
    matched = (
        p.join(iv, "_bin")
        .filter((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col)))
        .drop("_bin")
    )
    if how == "inner":
        return matched
    # anti-join must use eqNullSafe: a name-list join compiles to
    # null-unsafe equality, so a matched point row carrying a NULL in
    # any column would never equate with itself and be emitted twice
    # (once matched, once null-padded). The right side derives from
    # ``points`` (shared expression ids — the classic ambiguous
    # self-join shape), so rename its columns first and resolve the
    # condition purely by name.
    matched_keys = matched.select(
        *[F.col(c).alias(f"_mk_{c}") for c in points.columns]
    )
    cond = None
    for c in points.columns:
        eq = F.col(c).eqNullSafe(F.col(f"_mk_{c}"))
        cond = eq if cond is None else (cond & eq)
    unmatched = points.join(matched_keys, cond, "left_anti")
    for c in intervals.columns:
        unmatched = unmatched.withColumn(c, F.lit(None))
    return matched.unionByName(unmatched)


def interval_overlap_join_binned(
    left: DataFrame,
    right: DataFrame,
    lo_a: str,
    hi_a: str,
    lo_b: str,
    hi_b: str,
    bin_width: int,
) -> DataFrame:
    """Interval × interval OVERLAP join (``a.lo <= b.hi AND b.lo <=
    a.hi``, closed ends) via the binning rewrite — the interval-
    interval sibling of ``range_join_binned``. Column names must not
    collide (rename before calling).

    Each interval explodes into the fixed-width bins it covers; pairs
    meet on the bin equi-key and are emitted EXACTLY ONCE by the
    ownership rule: only in the bin containing the overlap's START
    (``greatest(lo_a, lo_b)``) — that bin lies inside both intervals'
    bin ranges whenever they overlap, so no dropDuplicates shuffle is
    needed.

    Scale: turns the quadratic overlap condition into an equi-join
    whose cost is bin co-occupancy; pick ``bin_width`` near the
    typical interval length (too small multiplies the explode, too
    large multiplies per-bin candidates)."""
    a = left.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_a) / F.lit(bin_width)),
                F.floor(F.col(hi_a) / F.lit(bin_width)),
            )
        ),
    )
    b = right.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_b) / F.lit(bin_width)),
                F.floor(F.col(hi_b) / F.lit(bin_width)),
            )
        ),
    )
    start = F.greatest(F.col(lo_a), F.col(lo_b))
    return (
        a.join(b, "_bin")
        .filter(
            (F.col(lo_a) <= F.col(hi_b))
            & (F.col(lo_b) <= F.col(hi_a))
            & (F.col("_bin") == F.floor(start / F.lit(bin_width)))
        )
        .drop("_bin")
    )


def grid_join_2d(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: float,
) -> DataFrame:
    """All point pairs within euclidean ``radius`` via 2-D grid
    binning — the spatial generalization of ``range_join_binned`` (and
    the scale-correct form of the reference's geographic neighborhood
    analyses over lat/lng).

    Cell side = radius, so any qualifying pair lies in the same or an
    adjacent cell. Side A is replicated to its 3×3 cell neighborhood
    (explode over dx, dy ∈ {-1,0,1}); side B keys by its exact cell;
    the equi-join on the composite cell key yields each candidate pair
    exactly once (B's cell is unique, A's neighborhood visits it once).
    Exact distance then filters candidates. Shuffle volume: 9·|points|
    + |points| rows keyed by cell — never the all-pairs product; cell
    occupancy bounds per-key fanout (pick radius ≪ data extent; for
    heavily clustered data sub-split hot cells like the salted join).
    Output: (id_a, id_b, dist) with id_a < id_b, dist rounded to 6.
    """
    cx = F.floor(F.col(x_col) / F.lit(radius))
    cy = F.floor(F.col(y_col) / F.lit(radius))
    a = points.select(
        F.col(id_col).alias("id_a"),
        F.col(x_col).alias("_xa"),
        F.col(y_col).alias("_ya"),
        F.explode(
            F.array(*[F.lit(d) for d in (-1, 0, 1)])
        ).alias("_dx"),
        cx.alias("_cxa"),
        cy.alias("_cya"),
    ).select(
        "id_a",
        "_xa",
        "_ya",
        (F.col("_cxa") + F.col("_dx")).alias("_cx"),
        F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("_dy"),
        "_cya",
    ).select(
        "id_a",
        "_xa",
        "_ya",
        "_cx",
        (F.col("_cya") + F.col("_dy")).alias("_cy"),
    )
    b = points.select(
        F.col(id_col).alias("id_b"),
        F.col(x_col).alias("_xb"),
        F.col(y_col).alias("_yb"),
        cx.alias("_cx"),
        cy.alias("_cy"),
    )
    dist = F.sqrt(
        F.pow(F.col("_xa") - F.col("_xb"), 2)
        + F.pow(F.col("_ya") - F.col("_yb"), 2)
    )
    return (
        a.join(b, ["_cx", "_cy"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("_dist", dist)
        .filter(F.col("_dist") <= radius)
        .select("id_a", "id_b", F.round("_dist", 6).alias("dist"))
    )
