"""Physical tuning operators (SURVEY §2.12 X1-X6) + the driver-collect
size guards (SURVEY §7.4.7).

The reference sprinkles cache()/persist()/repartition() ad hoc; these
helpers make the same knobs explicit and add the one policy the
reference lacked: a hard row-count guard before anything crosses the
executor→driver boundary (its v2:cell35 pulled 7.7M rows through a
non-Arrow toPandas — the engine refuses that by default).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel


def cache_memory_disk(df: DataFrame) -> DataFrame:
    """X1/X2: MEMORY_AND_DISK persist (explicit spill, never OOM)."""
    return df.persist(StorageLevel.MEMORY_AND_DISK)


def repartition_for_parallelism(df: DataFrame, multiplier: int = 2) -> DataFrame:
    """X3 (v2:cell25): max(200, defaultParallelism * multiplier)
    partitions before a wide training stage."""
    sc = df.sparkSession.sparkContext
    return df.repartition(max(200, sc.defaultParallelism * multiplier))


def repartition_by_key(df: DataFrame, *cols: str, n: int | None = None) -> DataFrame:
    """Hash-partition on join/agg keys so a later wide op reuses the
    exchange (co-located join without bucketing)."""
    return df.repartition(n, *cols) if n else df.repartition(*cols)


class DriverCollectGuard(RuntimeError):
    pass


def safe_collect(df: DataFrame, max_rows: int = 1_000_000) -> list:
    """S13 with a guard: refuse collects beyond ``max_rows`` (counted
    first — one cheap job vs an OOM'd driver)."""
    n = df.count()
    if n > max_rows:
        raise DriverCollectGuard(
            f"collect() of {n} rows exceeds guard ({max_rows}); "
            "aggregate or sample first"
        )
    return df.collect()


def safe_to_pandas(df: DataFrame, max_rows: int = 5_000_000) -> pd.DataFrame:
    """Arrow-batched toPandas behind the same guard (SURVEY §7.4.7)."""
    n = df.count()
    if n > max_rows:
        raise DriverCollectGuard(
            f"toPandas() of {n} rows exceeds guard ({max_rows}); "
            "sample or aggregate first"
        )
    spark = df.sparkSession
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    return df.toPandas()


def right_size_partitions(
    df: DataFrame,
    n_rows: int | None = None,
    rows_per_partition: int = 20_000,
    min_parts: int = 2,
    max_parts: int | None = None,
) -> DataFrame:
    """Size partitions by data volume before an iterative ML stage.

    MLlib tree/center aggregations pay a fixed per-task cost every
    iteration (stats arrays built and merged per partition); with tiny
    per-partition row counts that overhead dominates — measured 7.7x
    slower RF training at 32 partitions vs 8 on 48k rows. AQE fixes
    this for SQL shuffles but not for MLlib training inputs, so ML
    stages right-size explicitly: ~rows_per_partition rows per task,
    capped at the cluster's parallelism (at real scale the cap wins and
    this is a no-op). Uses coalesce (no shuffle) when shrinking.
    """
    n = n_rows if n_rows is not None else df.count()
    sc = df.sparkSession.sparkContext
    cap = max_parts or sc.defaultParallelism
    target = max(min_parts, min(cap, (n + rows_per_partition - 1) // rows_per_partition))
    current = df.rdd.getNumPartitions()
    if target < current:
        return df.coalesce(int(target))
    return df
