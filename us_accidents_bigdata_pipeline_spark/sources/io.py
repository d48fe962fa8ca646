"""Readers and writers (SURVEY §2.1 S1-S13).

The reference reads a 3 GB CSV with ``inferSchema=true`` (an extra full
pass; ``BigDataPipeline/spark/data_cleaning.py:27-30``) and writes
snappy parquet (``data_cleaning.py:133``). At 100 TB, schema inference
is a non-starter: every reader here takes an explicit schema, and the
parquet writer supports ``partitionBy`` so downstream scans get
partition pruning (SURVEY §4 "partition pruning" improvement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_parquet(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    """Parquet scan (S2). Column pruning is explicit when ``columns``
    given so the scan's ReadSchema only carries what is needed."""
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV scan with explicit schema (S1) — never ``inferSchema`` at scale.

    Quote/escape handling defaults match Spark's RFC-4180-ish parser, the
    source of truth for quoted-comma fields (SURVEY §7.4.9: the
    reference's Hive TEXTFILE serde would mis-split them).
    """
    reader = spark.read.option("header", str(header).lower())
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.schema(schema).csv(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str = "snappy",
) -> None:
    """Parquet sink (S3), optionally hive-partitioned for pruning."""
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Distributed JSON sink (S4, v2:cell62-64)."""
    df.write.mode(mode).json(path)


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    """Load the driver testdata tables and register them as temp views so
    both the DataFrame API and ``spark.sql`` can address them (the
    reference's Hive-catalog path, SURVEY §3.4, minus the metastore)."""
    out = {}
    for name in names:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
