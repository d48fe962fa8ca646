"""Column-level helper functions (SURVEY §2.7 + LLM-pipeline extensions).

Everything here is built from ``pyspark.sql.functions`` so expressions
stay JVM-side inside whole-stage codegen — no Python UDFs in the hot
path (the reference's row-at-a-time kNN UDF,
``BigDataPipeline/spark/knn_classification.py:135-162``, is the
anti-pattern these replace).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


# --- temporal (reference: hour/dayofweek/month feature extraction,
#     BigDataPipeline/spark/data_cleaning.py:89-93) -----------------------


def temporal_features(ts: Column | str) -> dict[str, Column]:
    """hour / day-of-week (1=Sunday, Spark convention) / month columns."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return {
        "hour_of_day": F.hour(c),
        "day_of_week": F.dayofweek(c),
        "month": F.month(c),
    }


# --- imputation / normalization (data_cleaning.py:69-86) ----------------


def impute_value(c: Column | str, fill: Column | float | str) -> Column:
    """NaN-aware null imputation: ``when(isNull|isnan, fill)`` (P7/P8)."""
    col = F.col(c) if isinstance(c, str) else c
    fill_col = fill if isinstance(fill, Column) else F.lit(fill)
    return F.when(col.isNull() | F.isnan(col), fill_col).otherwise(col)


def normalize_empty_string(c: Column | str, fill: str = "Unknown") -> Column:
    """Null or empty string → sentinel category (P13, data_cleaning.py:76-78)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.when(col.isNull() | (col == ""), F.lit(fill)).otherwise(col)


def bool_to_int(c: Column | str) -> Column:
    """Boolean flag → 0/1 int, null → 0 (data_cleaning.py:81-86)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.when(col == True, 1).otherwise(0)  # noqa: E712


# --- text analysis (LLM-pipeline extension) -----------------------------


def word_tokens(text: Column | str) -> Column:
    """Whitespace tokenization as an array<string> column."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def token_count(text: Column | str) -> Column:
    """Whitespace token count. Stays JVM-side (split + size)."""
    return F.size(word_tokens(text))


def nonempty_token_count(text: Column | str) -> Column:
    """Count of NON-EMPTY whitespace tokens, NULL-safe (NULL → 0 words
    via coalesce to ''). THE shared word-count expression: its DuckDB
    twin is len(list_filter(string_split_regex(trim(coalesce(text,
    '')), '\\s+'), x -> x <> '')) — engine-side users must route
    through this one definition so a tokenization tweak cannot
    desynchronize the value oracles site-by-site."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(
        F.filter(
            word_tokens(F.coalesce(c, F.lit(""))), lambda x: x != ""
        )
    )


# --- vector math over array<T> columns (LLM-pipeline extension) ---------
# Higher-order functions (zip_with/aggregate) run in codegen'd JVM
# expressions — this is the scalable form of a dot product over an
# embedding column; no Arrow round-trip per row.


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array<numeric> columns, accumulated in double.

    Inputs are cast element-wise to double first so the accumulation is
    bit-identical regardless of the stored element type (float32
    embeddings vs double oracles).
    """
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def sq_dist(a: Column | str, b: Column | str) -> Column:
    """Squared L2 distance of two array<numeric> columns — THE shared
    sequential (x−y)² left fold. Every IVF/k-center/kNN-exact oracle
    replays this exact fold as DuckDB ``list_sum(list_transform(...))``,
    so all engine-side users must route through this one definition:
    a cast or fold-order tweak in a private copy silently breaks
    value-oracle parity."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    diffs = F.zip_with(
        ca,
        cb,
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    """Euclidean norm of an array<numeric> column."""
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity of two array<numeric> columns (double)."""
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


# --- geospatial (reference domain: Start_Lat/Start_Lng clustering,
#     BigDataPipeline/spark/kmeans_clustering.py geo features) ----------


def haversine_km(
    lat1: Column | str,
    lng1: Column | str,
    lat2: Column | str,
    lng2: Column | str,
) -> Column:
    """Great-circle distance in kilometers (haversine, R=6371.0088 —
    IUGG mean earth radius), entirely JVM-side trig inside codegen.
    The distance the reference's geographic cluster analyses imply but
    compute nowhere; pairs with any NULL coordinate yield NULL."""
    la1, lo1, la2, lo2 = (
        F.radians(F.col(c) if isinstance(c, str) else c)
        for c in (lat1, lng1, lat2, lng2)
    )
    a = (
        F.pow(F.sin((la2 - la1) / 2), 2)
        + F.cos(la1) * F.cos(la2) * F.pow(F.sin((lo2 - lo1) / 2), 2)
    )
    return 2 * F.lit(6371.0088) * F.asin(F.sqrt(a))
