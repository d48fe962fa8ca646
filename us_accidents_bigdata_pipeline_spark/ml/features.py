"""Feature pipelines (SURVEY §2.8 M1-M4): assemble → scale → index.

Reference parity:
- VectorAssembler with explicit null handling. The reference uses
  ``handleInvalid="skip"`` which silently drops rows
  (random_forest.py:85, SURVEY §7.4.3); here the default is an explicit
  not-null pre-filter so row counts stay auditable, with ``skip``
  available for parity.
- StandardScaler withMean/withStd matching knn_classification.py:80-85.
- StringIndexer handleInvalid="keep" (v2:cell20); note frequency-desc
  ordering determinism (SURVEY §7.4.4).
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.feature import StandardScaler, StringIndexer, VectorAssembler
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assemble_and_scale(
    df: DataFrame,
    feature_cols: list[str],
    output_col: str = "features",
    with_mean: bool = True,
    with_std: bool = True,
    drop_invalid: bool = True,
) -> tuple[DataFrame, PipelineModel]:
    """Pipeline([VectorAssembler, StandardScaler]) fit+transform
    (knn_classification.py:88-91). Returns (transformed, fitted model).
    """
    if drop_invalid:
        cond = F.lit(True)
        for c in feature_cols:
            cond = cond & F.col(c).isNotNull() & ~F.isnan(F.col(c))
        df = df.filter(cond)
    assembler = VectorAssembler(
        inputCols=feature_cols, outputCol="_features_raw", handleInvalid="error"
    )
    scaler = StandardScaler(
        inputCol="_features_raw",
        outputCol=output_col,
        withMean=with_mean,
        withStd=with_std,
    )
    model = Pipeline(stages=[assembler, scaler]).fit(df)
    return model.transform(df).drop("_features_raw"), model


def index_categoricals(
    df: DataFrame, cols: list[str], handle_invalid: str = "keep"
) -> tuple[DataFrame, PipelineModel]:
    """StringIndexer per column, frequency-desc ordering (v2:cell20).
    Output columns are ``{col}_idx``."""
    stages = [
        StringIndexer(
            inputCol=c,
            outputCol=f"{c}_idx",
            handleInvalid=handle_invalid,
            stringOrderType="frequencyDesc",
        )
        for c in cols
    ]
    model = Pipeline(stages=stages).fit(df)
    return model.transform(df), model


def array_to_features(
    df: DataFrame, array_col: str, output_col: str = "features"
) -> DataFrame:
    """array<numeric> (e.g. an embedding column) → MLlib Vector column."""
    from pyspark.ml.functions import array_to_vector

    return df.withColumn(
        output_col, array_to_vector(F.col(array_col).cast("array<double>"))
    )
