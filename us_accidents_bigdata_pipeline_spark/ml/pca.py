"""PCA over embedding columns — two tiers.

``pca2_exact``: closed-form 2-feature PCA built for cross-engine
verification. The covariance sufficient statistics are EXACT decimal
sums (partition-order independent → bit-reproducible across cluster
layouts), the 2×2 eigen-solve is the quadratic closed form written in
a fixed IEEE operation order, and the eigenvector sign follows a
deterministic convention — so an independent engine (the DuckDB
oracle) can recompute the entire pipeline, sums → solve → per-row
projection, and hash-match it. Same discipline as
``operators/profile.py::ols_fit2`` (exact-decimal normal equations).

``pca_projection_signed``: MLlib PCA (any d, any k — the exact
one-pass Gramian + driver-side d×d eigensolve) with the sign
ambiguity removed by the same convention. Still rows-only in the
catalog (no SQL engine eigensolves 64×64), but deterministic.

Scale: both are one distributed pass producing O(d²) numbers plus a
map-only projection — the tall-skinny PCA shape; driver cost is
independent of row count.

Reference parity: the reference has no PCA; this extends its ML tier
(BigDataPipeline/spark/kmeans_clustering.py trains on raw features)
with the whitening/visualization step an embedding pipeline needs.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sign_fix(vx: float, vy: float) -> tuple[float, float]:
    """Deterministic eigenvector sign: first component positive; if it
    is exactly zero, second component positive. MUST textually match
    the oracle's CASE expression."""
    if vx < 0.0 or (vx == 0.0 and vy < 0.0):
        return -vx, -vy
    return vx, vy


def pca2_suffstats(
    df: DataFrame, x_idx: int = 0, y_idx: int = 1, vec_col: str = "embedding"
) -> dict[str, float]:
    """One distributed pass: n and exact-decimal Σx, Σy, Σx², Σxy, Σy²
    over two fixed embedding coordinates.

    DECIMAL(13,10) inputs (|value| < 100 contract — embeddings are
    unit-norm) keep products at DECIMAL(27,20), inside both Spark's
    38-digit cap and DuckDB's int128. The exact sums cross to float
    via one correctly-rounded conversion (Python ``float(Decimal)``;
    the oracle uses VARCHAR→DOUBLE for the same guarantee), so both
    engines start the eigen-solve from identical doubles.
    """
    x = F.col(vec_col).getItem(x_idx).cast("double").cast("decimal(13,10)")
    y = F.col(vec_col).getItem(y_idx).cast("double").cast("decimal(13,10)")
    row = (
        df.select(x.alias("x"), y.alias("y"))
        .na.drop()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum((F.col("x") * F.col("x")).cast("decimal(38,20)")).alias("sxx"),
            F.sum((F.col("x") * F.col("y")).cast("decimal(38,20)")).alias("sxy"),
            F.sum((F.col("y") * F.col("y")).cast("decimal(38,20)")).alias("syy"),
        )
        .collect()[0]
    )
    return {k: float(v) for k, v in row.asDict().items()}


def pca2_exact(
    df: DataFrame,
    x_idx: int = 0,
    y_idx: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ndigits: int = 4,
) -> DataFrame:
    """Closed-form 2-feature PCA projection: (id, pc1, pc2).

    Population covariance from the exact sufficient statistics, the
    2×2 quadratic eigen-solve, sign-fixed eigenvectors, then a
    map-only projection with the solved constants riding the plan as
    literals. EVERY float operation below is written in the same
    order as the DuckDB oracle SQL — keep them in sync or the
    hash-match breaks (see ``plans/queries.py::pca_2d_exact``).
    """
    s = pca2_suffstats(df, x_idx, y_idx, vec_col)
    n = s["n"]
    mx = s["sx"] / n
    my = s["sy"] / n
    cxx = s["sxx"] / n - mx * mx
    cxy = s["sxy"] / n - mx * my
    cyy = s["syy"] / n - my * my
    tr = cxx + cyy
    disc = math.sqrt((cxx - cyy) * (cxx - cyy) + 4.0 * (cxy * cxy))
    l1 = (tr + disc) / 2.0
    if cxy != 0.0:
        v1x, v1y = cxy, l1 - cxx
    elif cxx >= cyy:
        v1x, v1y = 1.0, 0.0
    else:
        v1x, v1y = 0.0, 1.0
    nrm = math.sqrt(v1x * v1x + v1y * v1y)
    v1x, v1y = _sign_fix(v1x / nrm, v1y / nrm)
    # the 2nd PC is the 90° rotation of the 1st, sign-fixed the same way
    v2x, v2y = _sign_fix(-v1y, v1x)
    x = F.col(vec_col).getItem(x_idx).cast("double")
    y = F.col(vec_col).getItem(y_idx).cast("double")
    # + 0.0 normalizes IEEE signed zero: DuckDB's round(-1e-5, 4) is
    # -0.0 while Spark's BigDecimal round has no signed zero — the
    # values compare equal but stringify differently in hash checks.
    return df.select(
        F.col(id_col),
        (
            F.round(
                (x - F.lit(mx)) * F.lit(v1x) + (y - F.lit(my)) * F.lit(v1y),
                ndigits,
            )
            + F.lit(0.0)
        ).alias("pc1"),
        (
            F.round(
                (x - F.lit(mx)) * F.lit(v2x) + (y - F.lit(my)) * F.lit(v2y),
                ndigits,
            )
            + F.lit(0.0)
        ).alias("pc2"),
    )


def pca_projection_signed(
    df: DataFrame,
    k: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ndigits: int = 4,
) -> DataFrame:
    """MLlib PCA projection with the basis-sign ambiguity removed:
    each principal-axis column is flipped so its largest-|loading|
    entry (ties → lowest index) is positive. Output (id, pc1..pck) is
    then a deterministic function of the input — reproducible across
    runs and cluster layouts, unlike raw MLlib output whose signs are
    an implementation accident of the eigensolver."""
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feat = df.select(
        F.col(id_col),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias(
            "_features"
        ),
    )
    model = PCA(k=k, inputCol="_features", outputCol="_pc").fit(feat)
    mat = model.pc.toArray()  # d × k loading matrix
    signs = []
    for j in range(k):
        col = mat[:, j]
        i_max = max(range(len(col)), key=lambda i: (abs(col[i]), -i))
        signs.append(1.0 if col[i_max] >= 0 else -1.0)
    out = model.transform(feat).select(
        id_col, vector_to_array("_pc").alias("_arr")
    )
    return out.select(
        id_col,
        *[
            (
                F.round(
                    F.col("_arr").getItem(j) * F.lit(signs[j]), ndigits
                )
                + F.lit(0.0)  # normalize IEEE signed zero for hashing
            ).alias(f"pc{j + 1}")
            for j in range(k)
        ],
    )
