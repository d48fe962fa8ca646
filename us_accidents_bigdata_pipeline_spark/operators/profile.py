"""Profiling operators: single-pass null audit, describe, distributions
(SURVEY §2.4 A5/A7/A1). Each profile is ONE aggregate job over all
columns (the reference's v2:cell17 batching idiom, never v2:cell19's
per-column driver round-trips)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (T.IntegerType, T.LongType, T.DoubleType, T.FloatType, T.ShortType)


def null_audit(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One row: null count per column, single pass (v2:cell17)."""
    cols = cols or df.columns
    aggs = [
        F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"n_null_{c}")
        for c in cols
    ]
    return df.agg(*aggs, F.count(F.lit(1)).alias("n_rows"))


def describe_numeric(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """count/mean/stddev/min/max per numeric column in one agg, long form:
    (column, n, mean, std, min, max)."""
    if cols is None:
        cols = [
            f.name for f in df.schema.fields if isinstance(f.dataType, _NUMERIC)
        ]
    aggs = []
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}__n"),
            F.avg(c).alias(f"{c}__mean"),
            F.stddev(c).alias(f"{c}__std"),
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
        ]
    row = df.agg(*aggs).head()
    out = [
        (
            c,
            row[f"{c}__n"],
            float(row[f"{c}__mean"]) if row[f"{c}__mean"] is not None else None,
            float(row[f"{c}__std"]) if row[f"{c}__std"] is not None else None,
            float(row[f"{c}__min"]) if row[f"{c}__min"] is not None else None,
            float(row[f"{c}__max"]) if row[f"{c}__max"] is not None else None,
        )
        for c in cols
    ]
    schema = "column string, n long, mean double, std double, min double, max double"
    return df.sparkSession.createDataFrame(out, schema)


def value_distribution(df: DataFrame, col: str) -> DataFrame:
    """Distinct-value histogram (severity-distribution idiom,
    data_cleaning.py:144)."""
    return df.groupBy(col).agg(F.count(F.lit(1)).alias("n")).orderBy(col)


def approx_distinct_counts(df: DataFrame, cols: list[str]) -> DataFrame:
    """HLL++ distinct counts per column, one pass — the 100 TB
    cardinality profile (exact countDistinct shuffles per column)."""
    return df.agg(
        *[F.approx_count_distinct(c).alias(f"n_distinct_{c}") for c in cols]
    )


def histogram(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_buckets: int = 10,
) -> DataFrame:
    """Equi-width histogram via ``width_bucket`` (bucket 0 = below lo,
    n_buckets+1 = at/above hi, SQL-standard semantics). One partial+
    final aggregation; the bucket expression stays in codegen — the
    distributed form of the reference's pandas value_counts plots."""
    return (
        df.select(
            F.width_bucket(F.col(col), F.lit(lo), F.lit(hi), F.lit(n_buckets))
            .cast("int")
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket")
    )


def robust_outliers(
    df: DataFrame,
    col: str,
    id_cols: list[str],
    z_threshold: float = 3.0,
) -> DataFrame:
    """Median/MAD robust outlier detection: rows whose robust z-score
    ``(x − median) / (1.4826 · MAD)`` exceeds the threshold. Unlike
    mean/stddev z-scores, the median and MAD are themselves immune to
    the outliers being hunted (50% breakdown point).

    Two exact-median passes (median, then median of absolute
    deviations) — each a single aggregation; the candidate filter is a
    map-only comparison against two broadcast scalars folded into the
    plan as a literal-free cross join of 1-row frames (Catalyst turns
    it into a broadcast nested loop over ONE row, effectively free)."""
    med_df = df.select(F.median(F.col(col)).alias("_med"))
    dev = df.join(F.broadcast(med_df)).withColumn(
        "_dev", F.abs(F.col(col) - F.col("_med"))
    )
    mad_df = dev.select(F.median("_dev").alias("_mad")).select(
        (F.lit(1.4826) * F.col("_mad")).alias("_smad")
    )
    return (
        dev.join(F.broadcast(mad_df))
        .filter(F.col("_dev") > z_threshold * F.col("_smad"))
        .select(
            *id_cols,
            F.round((F.col(col) - F.col("_med")) / F.col("_smad"), 4).alias(
                "robust_z"
            ),
        )
    )


def grouped_ols(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group simple linear regression y = a + b·x via
    ``groupBy().applyInPandas`` — the grouped-map Arrow surface
    (SURVEY §2.11: the U-family policy is "vectorized kernels only";
    this is the batch grouped-map member, streaming's
    ``applyInPandasWithState`` being the stateful one).

    Closed-form fit (b = cov/var, a = ȳ − b·x̄, r² = corr²) keeps the
    kernel one NumPy pass per group AND makes the operator
    SQL-oracle-checkable against ``covar_pop/var_pop/corr`` — a
    grouped-map UDF whose numerics an independent engine can verify,
    not just a rows-only shape check.

    Scale: one shuffle on the group key; each group fits in one Arrow
    batch stream (groups here are low-cardinality categories — for
    billion-row groups the closed-form aggregates themselves are the
    scalable formulation and this operator IS that fallback, one
    ``groupBy().agg`` away).
    """
    import numpy as np
    import pandas as pd

    gtype = dict(df.dtypes)[group_col]
    schema = (
        f"{group_col} {gtype}, n bigint, slope double, "
        "intercept double, r2 double"
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[x_col].to_numpy(dtype=np.float64)
        y = pdf[y_col].to_numpy(dtype=np.float64)
        n = len(x)
        xm, ym = x.mean(), y.mean()
        cov = float(((x - xm) * (y - ym)).sum()) / n
        var = float(((x - xm) ** 2) .sum()) / n
        vary = float(((y - ym) ** 2).sum()) / n
        slope = cov / var if var > 0 else 0.0
        intercept = ym - slope * xm
        r2 = (cov * cov) / (var * vary) if var > 0 and vary > 0 else 0.0
        return pd.DataFrame(
            [
                [
                    pdf[group_col].iloc[0],
                    n,
                    round(slope, 6),
                    round(intercept, 6),
                    round(r2, 6),
                ]
            ],
            columns=[group_col, "n", "slope", "intercept", "r2"],
        )

    return df.select(group_col, x_col, y_col).groupBy(group_col).applyInPandas(
        fit, schema
    )


def table_fingerprint(
    df: DataFrame, cols: list[str] | None = None
) -> DataFrame:
    """Order-insensitive whole-table checksum for replica/migration
    verification: two tables are (almost surely) row-identical iff
    fingerprints match, compared with ONE number per side instead of a
    row-by-row diff — the anti-entropy check for cross-cluster copies.

    Per row: md5 over a null-tagged concatenation of the columns
    (the tag keeps (NULL,'x') distinct from ('x',NULL)); the leading
    60 bits parse as a long. Rows combine with bit_xor — commutative,
    associative, overflow-free — so the result is independent of row
    order, partitioning, and engine (md5 + xor agree everywhere;
    DuckDB-oracled in the catalog). XOR cancels DUPLICATE PAIRS, so
    the row count rides along to catch even-multiplicity edits.

    Plan shape: map-only projection + single scalar aggregate; no
    shuffle of data, just partial-agg combining.
    """
    if cols is None:
        cols = df.columns
    tagged = F.concat_ws(
        "\x1f",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL"))
            for c in cols
        ],
    )
    row_hash = F.conv(F.substring(F.md5(tagged), 1, 15), 16, 10).cast("long")
    return df.agg(
        F.bit_xor(row_hash).alias("xor_fingerprint"),
        F.count(F.lit(1)).alias("n_rows"),
    )
