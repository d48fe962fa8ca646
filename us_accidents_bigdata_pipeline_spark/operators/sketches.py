"""Mergeable-sketch aggregation operators (100 TB reaggregation path).

At warehouse scale the expensive aggregate is COUNT(DISTINCT …): exact
distinct needs a shuffle of every distinct value per group. Sketches
replace that with fixed-size mergeable state (Apache DataSketches HLL,
bundled in Spark's ``hll_sketch_agg`` family — public API since 3.5):

- build per-group sketches in ONE scan (map-side partial aggregation,
  a few KB per group, never a distinct-value shuffle);
- roll sketches UP without rescanning the data (``hll_union_agg`` —
  the register-wise max merge is exact over sketches, so a
  region-level estimate derived from nation-level sketches is
  IDENTICAL to a region-level sketch built from scratch — pinned in
  tests/test_sketches.py);
- persist sketch bytes in summary tables so daily partials compose
  into monthly/yearly rollups — reaggregation becomes metadata-sized.

``count_min_totals`` covers the frequency side: a Count-Min sketch
built distributed (JVM, one pass, merged tree-wise across partitions)
but small enough (w·d longs) to hold on the driver and probe at will —
the canonical heavy-hitter estimator with one-sided error
(estimate ≥ true count, ≤ true + eps·N with prob ≥ confidence).

Estimates are engine-specific (DuckDB's approx_count_distinct is a
different HLL variant), so catalog entries over these are rows-only;
the accuracy and mergeability contracts are pinned in pytest against
exact counts instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_group_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_k: int = 14,
) -> DataFrame:
    """One HLL sketch of ``value_col``'s distinct set per group.

    Output: group_cols + ``hll_sketch`` (binary). lgConfigK=14 → 16384
    registers ≈ 1.6 % relative standard error at ~12 KB per group —
    the size/accuracy trade is per-GROUP, independent of row count,
    which is the whole point at 100 TB. The aggregation is partial-agg
    friendly: each task folds its rows into a local sketch and the
    shuffle carries one sketch per (task, group), never raw values.
    """
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("hll_sketch")
    )


def hll_estimate(sketches: DataFrame) -> DataFrame:
    """Attach the cardinality estimate to a sketch frame (map-only)."""
    return sketches.withColumn(
        "est_distinct", F.hll_sketch_estimate("hll_sketch")
    )


def hll_rollup(
    sketches: DataFrame,
    rollup_cols: list[str],
) -> DataFrame:
    """Merge fine-grained sketches up to ``rollup_cols`` WITHOUT
    rescanning the base data — the union is register-wise max, exact
    over sketches. Output: rollup_cols + hll_sketch + est_distinct."""
    merged = sketches.groupBy(*rollup_cols).agg(
        F.hll_union_agg("hll_sketch").alias("hll_sketch")
    )
    return hll_estimate(merged)


def hll_distinct_by(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_k: int = 14,
) -> DataFrame:
    """Per-group approximate distinct counts via HLL, one pass.

    Output: group_cols + ``est_distinct`` (double). The estimate is
    deterministic for a given input set (HLL registers depend only on
    the hashed value set, not on row order or partitioning), so
    repeated runs agree exactly even though the value is approximate.
    """
    return hll_estimate(
        hll_group_sketches(df, group_cols, value_col, lg_k)
    ).select(*group_cols, "est_distinct")


def count_min_totals(
    df: DataFrame,
    col: str,
    candidates: list[str],
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
):
    """Count-Min frequency estimates for ``candidates`` of ``col``.

    The sketch builds distributed (one JVM pass, partition sketches
    merged tree-wise) and lands on the driver at w×d longs
    (w=ceil(2/eps), d=ceil(-ln(1-confidence)/ln2)) — ~2 KB per row of
    depth at eps=1e-3, constant in input size. Guarantees (pinned in
    tests): estimate ≥ true count always (collisions only ADD), and
    estimate ≤ true + eps·N with probability ≥ confidence.

    Returns ``{candidate: estimated_count}``.
    """
    blob = df.agg(
        F.count_min_sketch(
            col, F.lit(eps), F.lit(confidence), F.lit(seed)
        ).alias("_cms")
    ).collect()[0]._cms
    # org.apache.spark.util.sketch is public Spark API; PySpark has no
    # wrapper for the probe side, so deserialize the aggregated blob in
    # the JVM and query it driver-side (the sketch is w×d longs —
    # constant-size no matter the input).
    jvm = df.sparkSession._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bytes(blob))
    return {c: cms.estimateCount(c) for c in candidates}


# --- exact mergeable distinct counts (bitmap index aggregation) --------
# The EXACT sibling of the HLL tier: Spark's bitmap functions shard a
# long key space into 32K-bit buckets (bitmap_bucket_number /
# bitmap_bit_position), build one bitmap per (group, bucket) with
# bitmap_construct_agg, and count/merge with bitmap_count /
# bitmap_or_agg. Distinct counting becomes a SUM of per-bucket popcounts
# — and, like sketches, the bitmaps are MERGEABLE state: persisted
# per-partition bitmaps roll up to any coarser grain with bitmap_or_agg
# and stay exact (bitwise OR loses nothing), at ~4 KB per occupied
# bucket. Dense key spaces → bitmap exact tier; sparse/huge key spaces
# (or string keys) → HLL tier above. Both are one-scan, shuffle-slim.


def bitmap_distinct_by(
    df: DataFrame, group_cols: list[str], key_col: str
) -> DataFrame:
    """EXACT per-group distinct count of a long key via bucketed
    bitmaps: group_cols + ``n_distinct``. Shuffle rows are (group,
    bucket, 4KB bitmap) — bounded by occupied buckets, not by rows."""
    per_bucket = df.groupBy(
        *group_cols, F.bitmap_bucket_number(key_col).alias("_bucket")
    ).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position(key_col)).alias("_bm")
    )
    return per_bucket.groupBy(*group_cols).agg(
        F.sum(F.bitmap_count("_bm")).alias("n_distinct")
    )


def bitmap_rollup_distinct(
    df: DataFrame,
    fine_cols: list[str],
    rollup_cols: list[str],
    key_col: str,
) -> DataFrame:
    """Build (fine grain, bucket) bitmaps once, then OR-merge to the
    coarse grain WITHOUT rescanning base data — exact at every level
    (bitwise OR is lossless, unlike re-summing per-group counts, which
    would double-count keys spanning fine groups)."""
    fine = df.groupBy(
        *fine_cols, F.bitmap_bucket_number(key_col).alias("_bucket")
    ).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position(key_col)).alias("_bm")
    )
    merged = fine.groupBy(*rollup_cols, "_bucket").agg(
        F.bitmap_or_agg("_bm").alias("_bm")
    )
    return merged.groupBy(*rollup_cols).agg(
        F.sum(F.bitmap_count("_bm")).alias("n_distinct")
    )


def exact_heavy_hitters(
    df: DataFrame,
    key_col: str,
    phi: float = 0.01,
) -> DataFrame:
    """EXACT frequent items above frequency ``phi·N`` via the
    Misra–Gries candidate + exact-verify two-pass.

    The naive exact plan shuffles EVERY distinct key to count it — at
    100 TB with billions of distinct keys that shuffle dwarfs the
    answer (a handful of heavy keys). Instead:

    1. **Candidate pass** (map-only, ``mapInPandas``): each partition
       runs batched Misra–Gries with capacity ``k = ceil(1/phi)`` — a
       k-entry dict maintained across the partition's Arrow batches;
       each batch merges its ``value_counts`` then applies the
       uniform-decrement trim (subtract the (k+1)-th largest count
       from all, drop non-positives). MG guarantees any item with
       partition frequency > n_p/(k+1) survives, and n_p/(k+1) <
       φ·n_p, so every item with partition frequency ≥ φ·n_p is
       retained; a global item with frequency ≥ φ·N has frequency
       ≥ φ·n_p in at least one partition (pigeonhole over N = Σ n_p),
       so the UNION of partition summaries is a superset of every
       true heavy hitter. ≤ k·P candidate rows leave the mappers —
       no full shuffle.
    2. **Verify pass**: broadcast-semi-join the raw rows to the
       candidate set and count exactly, filtering to
       ``count ≥ ceil(phi·N)``. Only candidate-key rows participate
       in the aggregation.

    Output: ``key_col`` (original type), ``freq`` (exact long). The
    result is EXACT — MG only prunes the candidate space, the
    pigeonhole superset guarantee means no true heavy hitter is lost
    (pinned by the DuckDB plain GROUP BY/HAVING oracle).

    NULL convention: NULL keys are excluded from BOTH the candidate
    space and the population N (the threshold denominator) — i.e. the
    operator answers "heavy hitters among non-null keys", matching an
    oracle written ``WHERE key IS NOT NULL GROUP BY key HAVING
    count(*) >= ceil(phi * (SELECT count(key) ...))``. Without the
    pre-filter, NULL rows would inflate N (raising the threshold)
    while never being able to surface as a group (dropna + semi-join),
    a silent asymmetry; filtering first also keeps a nullable integer
    key from degrading to float64 in the Arrow→pandas hop.
    """
    import math

    from pyspark.sql.types import StructField, StructType

    df = df.filter(F.col(key_col).isNotNull())
    k = max(int(math.ceil(1.0 / phi)), 1)
    field = df.schema[key_col]
    cand_schema = StructType([StructField("cand", field.dataType, True)])

    def mg_partition(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for v, c in pdf[key_col].dropna().value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > k:
                # uniform-decrement trim: subtracting the (k+1)-th
                # largest count from every counter performs that many
                # simultaneous MG decrement rounds at once
                delta = sorted(counters.values(), reverse=True)[k]
                counters = {
                    key: c - delta
                    for key, c in counters.items()
                    if c - delta > 0
                }
        yield pd.DataFrame({"cand": list(counters.keys())})

    cands = (
        df.select(key_col)
        .mapInPandas(mg_partition, schema=cand_schema)
        .distinct()
    )
    n_total = df.count()
    threshold = int(math.ceil(phi * n_total))
    return (
        df.join(
            F.broadcast(cands),
            df[key_col] == cands["cand"],
            "left_semi",
        )
        .groupBy(key_col)
        .agg(F.count("*").alias("freq"))
        .filter(F.col("freq") >= threshold)
    )


def count_min_heavy_hitters(
    df: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 256,
    top_k: int = 20,
    seed: int = 42,
) -> DataFrame:
    """Count-Min sketch heavy hitters with an ENGINE-PORTABLE hash —
    the oracled sibling of ``count_min_totals`` (whose JVM sketch uses
    Spark-private hashing and is therefore rows-only-checkable).

    Token stream → ``depth`` md5-derived bucket rows (bucket_i =
    first 6 hex digits of md5("{seed}-{i}-" ∥ token) mod ``width``) →
    per (row, bucket) counts = the d×w sketch table. A token's
    estimate is min over rows of its bucket's count — the classic CMS
    guarantee (estimate ≥ true; collisions only ADD) holds per row and
    survives the min. Emits the ``top_k`` tokens by estimate with the
    exact count alongside so the one-sided error is visible.

    Determinism: counts are integers and md5 is bit-identical across
    engines, so the full table, every estimate, and the (est DESC,
    token ASC) top-k cut are engine-exact — a DuckDB oracle recomputes
    the whole sketch.

    Plan shape at 100 TB: the sketch table is d·w rows — built by ONE
    explode + map-side-combined hash agg, then BROADCAST back onto the
    distinct-token stream; the only corpus-wide shuffle is the slim
    (token) agg. No driver state, unlike the JVM-sketch path.
    """
    toks = df.select(
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("token")
    ).filter(F.col("token") != "")

    def bucket(i: int) -> F.Column:
        h = F.md5(F.concat(F.lit(f"{seed}-{i}-"), F.col("token")))
        return (F.conv(F.substring(h, 1, 6), 16, 10).cast("long") % width).cast(
            "int"
        )

    rows = toks.select(
        F.col("token"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_i"), bucket(i).alias("bucket")
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rb"),
    ).select("token", F.col("rb.row_i"), F.col("rb.bucket"))
    sketch = rows.groupBy("row_i", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("exact_count"))
    probes = exact.select(
        "token",
        "exact_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_i"), bucket(i).alias("bucket")
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rb"),
    ).select("token", "exact_count", F.col("rb.row_i"), F.col("rb.bucket"))
    return (
        probes.join(F.broadcast(sketch), ["row_i", "bucket"])
        .groupBy("token", "exact_count")
        .agg(F.min("c").alias("est_count"))
        .orderBy(F.col("est_count").desc(), F.col("token"))
        .limit(top_k)
        .select("token", "est_count", "exact_count")
    )
