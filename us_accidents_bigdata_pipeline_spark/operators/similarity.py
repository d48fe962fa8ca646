"""Similarity search over embedding columns (LLM-pipeline extension).

Three tiers:

- **Brute-force cosine top-k** (`cosine_topk`, `cosine_topk_batch`):
  exact; the query side is broadcast, every partition scores its slice
  of the corpus, per-query top-k via ranking window (or
  TakeOrderedAndProject for a single query). The correctness baseline.
  Dot products run as JVM higher-order functions — no Python in the
  scan loop.
- **LSH-bucketed** (`lsh_topk_candidates`): BucketedRandomProjectionLSH;
  candidates come from same-bucket joins — the at-scale path where
  brute force would be O(|queries|·|corpus|).
- **IVF-style** (`ivf_assign`): KMeans coarse quantizer; search only
  the nearest `nprobe` cells. Model fit is a sampled batch job; the
  assignment is one broadcast-join of centroids.

This generalizes the reference's one custom operator — the broadcast
kNN over tabular features (knn_classification.py:124-164) — to
embedding space; ml/knn.py holds the tabular version.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions import cosine_similarity, dot_product


def cosine_topk(
    df: DataFrame,
    query_id: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of one corpus vector.

    One-row query side is crossJoin(broadcast(...)) — at any corpus
    size this is a map-only scan followed by TakeOrderedAndProject
    (per-partition heap, driver merge); no shuffle of the corpus.
    """
    q = df.filter(F.col(id_col) == query_id).select(F.col(vec_col).alias("_qv"))
    return (
        df.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != query_id)
        .select(
            F.col(id_col),
            F.round(cosine_similarity(vec_col, "_qv"), 4).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def cosine_topk_batch(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for a batch of query vectors.

    ``queries`` (query_id, query vec) is broadcast; the corpus scan
    scores |queries| dots per row; a ranking window partitioned by
    query_id takes the top-k. Shuffle is |corpus|·|queries| scored
    rows — fine for broadcast-sized query batches; beyond that, use
    the LSH/IVF tiers.
    """
    qs = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    scored = (
        df.crossJoin(F.broadcast(qs))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine_similarity(vec_col, "_qv"), 4).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def _to_ml_vector(df: DataFrame, vec_col: str, out_col: str) -> DataFrame:
    """array<float> → ml Vector column (required by MLlib LSH/KMeans)."""
    from pyspark.ml.functions import array_to_vector

    return df.withColumn(out_col, array_to_vector(F.col(vec_col).cast("array<double>")))


def lsh_topk_candidates(
    df: DataFrame,
    query_id: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_hash_tables: int = 8,
) -> DataFrame:
    """Approximate top-k via BucketedRandomProjectionLSH (Euclidean).

    Returns (vec_id, dist) for the k nearest candidates. Bucketed
    candidate generation keeps the at-scale cost ~O(corpus) instead of
    O(corpus·queries). Approximate → rows-only check; `cosine_topk`
    is the exact reference.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH

    feat = _to_ml_vector(df, vec_col, "_features")
    lsh = BucketedRandomProjectionLSH(
        inputCol="_features",
        outputCol="_hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=42,
    )
    model = lsh.fit(feat)
    key = feat.filter(F.col(id_col) == query_id).head()
    if key is None:
        return df.select(F.col(id_col), F.lit(0.0).alias("dist")).limit(0)
    res = model.approxNearestNeighbors(
        feat.filter(F.col(id_col) != query_id), key["_features"], k, distCol="dist"
    )
    return res.select(F.col(id_col), F.round("dist", 4).alias("dist"))


def ivf_assign(
    df: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: KMeans over embeddings, each vector
    assigned to its nearest centroid cell. Search then probes only the
    query's nearest cells. Returns (vec_id, cell)."""
    from pyspark.ml.clustering import KMeans

    feat = _to_ml_vector(df, vec_col, "_features")
    km = KMeans(k=n_cells, seed=42, featuresCol="_features", predictionCol="cell")
    model = km.fit(feat)
    return model.transform(feat).select(F.col(id_col), F.col("cell"))


def knn_label_vote(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """kNN classification over embeddings: top-k cosine neighbors vote on
    the label (majority; ties → smaller label — deterministic).

    The embedding-space analog of the reference's tabular kNN
    (knn_classification.py:124-164), expressed as relational ops.
    """
    neigh = cosine_topk_batch(df, queries, k, id_col, vec_col)
    labels = df.select(
        F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("neighbor_label")
    )
    votes = (
        neigh.join(labels, "neighbor_id")
        .groupBy("query_id", "neighbor_label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("neighbor_label")
    )
    return (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("neighbor_label").alias("predicted_label"), "n_votes")
    )
