"""Catalog registration (SURVEY §3.4 / §2.1 S9-S10).

The reference declares its Hive surface as DDL over storage it does not
manage (``BigDataPipeline/hive/create_tables.hql:15-138``: EXTERNAL
tables + LOAD DATA). Idiomatic Spark parity is ``CREATE TABLE ... USING
parquet LOCATION ...``: an UNMANAGED catalog entry over existing
parquet — dropping the table never touches the data, the schema comes
from the parquet footers, and every registered table is addressable by
pure ``spark.sql`` (the HiveServer2-style access path) as well as the
DataFrame API. Unlike the Hive TEXTFILE serde the reference loads CSV
through, the parquet datasource gets predicate pushdown and column
pruning in the same catalog path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .io import TESTDATA_TABLES


def register_external_tables(
    spark: SparkSession,
    sf_dir: str,
    names: tuple[str, ...] = TESTDATA_TABLES,
    database: str = "uabp",
) -> None:
    """Register each ``{sf_dir}/{name}.parquet`` as an unmanaged catalog
    table ``{database}.{name}``. Re-registration points the table at the
    (possibly new) location; the underlying parquet is never modified
    or deleted (EXTERNAL-table semantics)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    for name in names:
        spark.sql(f"DROP TABLE IF EXISTS {database}.{name}")
        spark.sql(
            f"CREATE TABLE {database}.{name} USING parquet "
            f"LOCATION '{sf_dir}/{name}.parquet'"
        )


def sql_on_catalog(
    spark: SparkSession, sf_dir: str, query: str, database: str = "uabp"
) -> DataFrame:
    """Run a pure-SQL query against the registered catalog tables —
    the engine's HiveServer2-analog entry point. Registers (or
    refreshes) the catalog for ``sf_dir`` first so the query text can
    reference bare table names inside ``database``."""
    register_external_tables(spark, sf_dir, database=database)
    spark.catalog.setCurrentDatabase(database)
    try:
        return spark.sql(query)
    finally:
        spark.catalog.setCurrentDatabase("default")
