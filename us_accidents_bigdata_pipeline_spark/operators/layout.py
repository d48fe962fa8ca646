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

from pyspark.sql import Column, DataFrame, Window as W
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


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "rn",
    n_partitions: int = 32,
) -> DataFrame:
    """Total-order row number WITHOUT a single-partition window.

    ``row_number() OVER (ORDER BY ...)`` forces every row through one
    task — the classic scale-killer for sorted-neighborhood blocking,
    pagination, and export numbering at 100 TB. Instead:

    1. ``repartitionByRange`` on the order columns (sampled range
       exchange — the same primitive ``ORDER BY`` writes use),
    2. per-partition ``row_number`` windowed on ``spark_partition_id()``
       (each task numbers only its own slice),
    3. one tiny aggregate of per-partition counts (``n_partitions``
       rows to the driver) turned into cumulative offsets and joined
       back via broadcast.

    The result equals the rank of each row in the total order by
    ``order_cols`` (which must be a unique key for determinism),
    independent of partitioning. Cost: one range shuffle + one
    ``n_partitions``-row aggregate — no serial stage.

    The ranged frame is ``localCheckpoint``-ed (eager) before the
    counts pass: the range exchange picks its boundaries by SAMPLING,
    and each action would otherwise re-execute that sampling — the
    counts job and the numbering job MUST see the identical
    partitioning or the offsets are wrong. Checkpointing materializes
    one partitioning that both jobs (and the caller's downstream
    actions) reuse.
    """
    ranged = (
        df.repartitionByRange(n_partitions, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # Per-partition counts are tiny (one row per partition); collect and
    # turn into exclusive prefix offsets. repartitionByRange assigns
    # contiguous key ranges to ascending partition ids, so offsets in
    # pid order reconstruct the global order.
    counts = {
        r["_pid"]: r["n"]
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    w = W.partitionBy("_pid").orderBy(*order_cols)
    return (
        ranged.withColumn(out_col, F.row_number().over(w) + off[F.col("_pid")])
        .drop("_pid")
    )


def _prefix_offset_map(totals: dict, sum_type) -> "F.Column":
    """Exclusive prefix offsets over per-partition SUM totals, as a
    literal map column — with SQL window NULL semantics.

    The offset for a partition is the running sum of all EARLIER
    partitions' non-null totals; it is NULL while no earlier partition
    has contributed a non-null value. Combined with
    ``_serial_running_sum``, rows before the first global non-null
    value stay NULL (matching ``SUM(v) OVER (ORDER BY ... ROWS
    UNBOUNDED PRECEDING)``), while all-NULL prefixes inside later
    partitions inherit the prior partitions' running total instead of
    nullifying it.
    """
    entries: list = []
    acc, seen = 0, False
    for pid in sorted(totals):
        entries.append(F.lit(pid))
        entries.append(
            F.lit(acc).cast(sum_type) if seen else F.lit(None).cast(sum_type)
        )
        if totals[pid] is not None:
            acc += totals[pid]
            seen = True
    return F.create_map(*entries)


def _serial_running_sum(persum: "F.Column", off_map: "F.Column") -> "F.Column":
    """Combine a per-partition prefix sum with its exclusive offset so
    the result equals the serial ``SUM() OVER`` window: NULL prefix +
    NULL offset → NULL (nothing non-null seen yet); NULL prefix +
    non-null offset → the offset (earlier partitions' total); else
    prefix + offset (offset coalesced to 0 for the first contributing
    partition)."""
    off = off_map[F.col("_pid")]
    return F.when(persum.isNull(), off).otherwise(
        persum + F.coalesce(off, F.lit(0))
    )


def global_running_sums(
    df: DataFrame,
    order_cols: list[str],
    value_cols: list[str],
    out_cols: list[str],
    n_partitions: int = 32,
) -> DataFrame:
    """Multi-column form of ``global_running_sum``: one range exchange
    and ONE checkpointed partitioning serving prefix sums for several
    value columns at once (separate calls would each shuffle and
    checkpoint, and joining their outputs back would add another
    shuffle)."""
    ranged = (
        df.repartitionByRange(n_partitions, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    agg = ranged.groupBy("_pid").agg(
        *[F.sum(c).alias(f"_s{i}") for i, c in enumerate(value_cols)]
    )
    sum_types = [agg.schema[f"_s{i}"].dataType for i in range(len(value_cols))]
    totals = {
        r["_pid"]: [r[f"_s{i}"] for i in range(len(value_cols))]
        for r in agg.collect()
    }
    out = ranged
    w = W.partitionBy("_pid").orderBy(*order_cols).rowsBetween(
        W.unboundedPreceding, 0
    )
    for i, (vc, oc) in enumerate(zip(value_cols, out_cols)):
        off = _prefix_offset_map(
            {pid: totals[pid][i] for pid in totals}, sum_types[i]
        )
        persum = F.sum(vc).over(w)
        out = out.withColumn(oc, _serial_running_sum(persum, off))
    return out.drop("_pid")


def global_running_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "running_sum",
    n_partitions: int = 32,
) -> DataFrame:
    """Global prefix sum WITHOUT a single-partition window — the
    running-total twin of ``global_row_number`` (same two-phase
    scan-sum shape every parallel-prefix algorithm uses):

    1. range-partition on the order columns and ``localCheckpoint``
       (one materialized partitioning for every downstream job — the
       range exchange samples its boundaries, see global_row_number),
    2. per-partition prefix sum windowed on ``spark_partition_id()``,
    3. per-partition TOTALS (``n_partitions`` rows) collected and
       turned into exclusive prefix offsets, broadcast back as a
       literal map.

    Equals ``sum(value) OVER (ORDER BY order_cols ROWS UNBOUNDED
    PRECEDING)`` for any total order (make ``order_cols`` unique for a
    deterministic per-row result). Cost: one range shuffle + one
    ``n_partitions``-row aggregate; no stage ever serializes.
    """
    ranged = (
        df.repartitionByRange(n_partitions, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    agg = ranged.groupBy("_pid").agg(F.sum(value_col).alias("s"))
    sum_type = agg.schema["s"].dataType
    totals = {r["_pid"]: r["s"] for r in agg.collect()}
    off = _prefix_offset_map(totals, sum_type)
    w = W.partitionBy("_pid").orderBy(*order_cols).rowsBetween(
        W.unboundedPreceding, 0
    )
    persum = F.sum(value_col).over(w)
    return ranged.withColumn(
        out_col, _serial_running_sum(persum, off)
    ).drop("_pid")


def small_file_report(spark, path: str) -> "DataFrame":
    """Small-file audit for a parquet table: rows per physical file via
    ``input_file_name()`` — fully distributed (no driver filesystem
    walk, works on any Hadoop-compatible FS), the diagnostic that
    decides whether a table needs compaction. Returns one summary row:
    (n_files, n_rows, min_rows_per_file, max_rows_per_file,
    avg_rows_per_file).

    At 100 TB the killer is not data size but FILE COUNT: a table
    written by 10k tasks × 1k partitions makes 10M files — listing
    alone stalls the scan, and every file under a few MB wastes a
    task. This report is one scan + a file-keyed agg (|files| rows
    after map-side combine).
    """
    per_file = (
        spark.read.parquet(path)
        .select(F.input_file_name().alias("_f"))
        .groupBy("_f")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    return per_file.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("_n").alias("n_rows"),
        F.min("_n").alias("min_rows_per_file"),
        F.max("_n").alias("max_rows_per_file"),
        F.round(F.avg("_n"), 1).alias("avg_rows_per_file"),
    )


def compact_parquet(
    spark,
    src: str,
    dst: str,
    target_rows_per_file: int,
    sort_cols: list[str] | None = None,
) -> int:
    """Compact a small-file parquet table: read → coalesce the row set
    into ``ceil(n / target_rows_per_file)`` output tasks → write with
    ``maxRecordsPerFile`` as the hard per-file cap. Returns the number
    of files written.

    With ``sort_cols`` the rewrite uses ``repartitionByRange`` +
    ``sortWithinPartitions`` — compaction doubles as a clustering pass
    (min/max footer stats become selective, the zorder_write sibling
    for simple prefixes). Without, a plain ``repartition`` balances
    bytes evenly.

    Scale notes: the rewrite is one shuffle of the table — schedule it
    off-peak and partition-by-partition on a partitioned table (pass
    the partition directory as ``src``). maxRecordsPerFile bounds the
    tail: a skewed range partition splits into several capped files
    rather than one huge one.
    """
    import math

    df = spark.read.parquet(src)
    n = df.count()
    n_out = max(1, math.ceil(n / target_rows_per_file))
    if sort_cols:
        df = df.repartitionByRange(n_out, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        df = df.repartition(n_out)
    (
        df.write.mode("overwrite")
        .option("maxRecordsPerFile", target_rows_per_file)
        .parquet(dst)
    )
    return spark.read.parquet(dst).select(
        F.input_file_name()
    ).distinct().count()


def range_checkpoint_bucket(
    df: DataFrame, id_col: str, n_checkpoints: int
) -> tuple:
    """Equal-width id-range checkpoint scaffolding shared by the
    growth-curve operators (``textstats.heaps_law_fit``,
    ``dedup.dedup_growth_curve``): a 1-row (min, max) bounds frame
    and the bucket expression ((id − min)·K) intdiv span + 1 ∈ [1, K]
    — pure integer arithmetic, identical in DuckDB as
    ``((id - min_id) * K) // (max_id - min_id + 1) + 1``. One
    definition so a bucketing tweak cannot desynchronize the two
    curves and their oracles.

    Returns (bounds_df, bucket_column); callers cross-join the
    broadcast bounds frame and select the bucket column.
    """
    k = int(n_checkpoints)
    bounds = df.agg(
        F.min(id_col).alias("_min_id"), F.max(id_col).alias("_max_id")
    )
    # `div` is Spark SQL's exact integral division on longs — the same
    # operation as DuckDB's `//`. The earlier double-division-then-cast
    # form was oracle-identical at tested scales but could round onto an
    # integer boundary for id spans ~1e15+, off-by-one-bucket vs the
    # oracle's floor division; `div` removes the IEEE step entirely.
    bucket = F.expr(
        f"((`{id_col}` - _min_id) * {k}) div (_max_id - _min_id + 1)"
    ) + F.lit(1)
    return bounds, bucket
