"""Multi-dimensional data layout (z-order clustering) for scan pruning.

Parquet scans skip row groups / files whose min-max footer stats exclude
the predicate. Sorting by ONE column gives perfect skipping on that
column and none on any other; interleaving the bits of several columns
(a Morton / z-order curve) makes file boundaries axis-aligned boxes in
the multi-column space, so point/range predicates on ANY of the curve
columns prune most files — the layout trick behind Delta/Iceberg
OPTIMIZE ZORDER, built here from plain Spark expressions:

1. min-max scale each column to a ``bits``-wide integer grid (one
   1-row aggregate, broadcast back — no collect),
2. interleave the grid bits with shift/mask expressions (pure JVM,
   whole-stage codegen; no UDF),
3. ``repartitionByRange`` on the z-key (range exchange = contiguous
   curve segments per file) + ``sortWithinPartitions`` and write.

Effectiveness is pinned in tests/test_layout.py by reading the parquet
footers back: per-file min-max ranges must shrink on BOTH dimensions,
vs a single-column sort where only that column's ranges shrink.

Scale notes: the range exchange samples the z-key to pick boundaries —
one pass + one shuffle, same cost class as any repartition; the curve
computation itself is a map-only projection. Low-cardinality or heavily
skewed columns get fewer effective bits (ties share a grid cell), which
matches how production z-ordering degrades.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scaled_to_grid(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Min-max scale a numeric column onto [0, 2^bits) as a long.
    Constant columns (max == min) map to 0."""
    width = cmax.cast("double") - cmin.cast("double")
    frac = F.when(
        width > 0, (col.cast("double") - cmin.cast("double")) / width
    ).otherwise(F.lit(0.0))
    top = float((1 << bits) - 1)
    return F.least(
        F.floor(frac * F.lit(top + 1.0)).cast("long"), F.lit(int(top)).cast("long")
    )


def _interleave(grids: list[Column], bits: int) -> Column:
    """Bit-interleave n grid coordinates into one z-key: output bit
    (i*n + j) is bit i of column j. Pure shift/mask expression tree —
    n*bits terms, all inside whole-stage codegen."""
    n = len(grids)
    terms = []
    for j, g in enumerate(grids):
        for i in range(bits):
            src = F.shiftright(g, i).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(src, i * n + j))
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 12
) -> DataFrame:
    """Attach a ``_zkey`` column: the Morton interleave of the min-max
    scaled ``cols``. The min/max aggregate is a 1-row broadcast join
    (no driver collect)."""
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"_min_{c}"))
        aggs.append(F.max(c).alias(f"_max_{c}"))
    bounds = df.agg(*aggs)
    with_bounds = df.join(F.broadcast(bounds))
    grids = [
        _scaled_to_grid(
            F.col(c), F.col(f"_min_{c}"), F.col(f"_max_{c}"), bits
        )
        for c in cols
    ]
    return with_bounds.withColumn("_zkey", _interleave(grids, bits)).drop(
        *[f"_min_{c}" for c in cols], *[f"_max_{c}" for c in cols]
    )


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = 12,
) -> None:
    """Write ``df`` as parquet clustered along the z-order curve of
    ``cols``: range-partition on the z-key (contiguous curve segments
    per output file), sort within each file, drop the key."""
    keyed = zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
