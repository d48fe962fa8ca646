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
