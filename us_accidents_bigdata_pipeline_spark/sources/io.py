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


def write_csv(
    df: DataFrame, path: str, mode: str = "overwrite", header: bool = True
) -> None:
    """Distributed CSV sink (S7 done right: the reference funnels samples
    through ``limit(n).toPandas().to_csv`` — driver-bound; this writes
    part-files from executors)."""
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_table(
    df: DataFrame, name: str, format: str = "parquet", mode: str = "overwrite"
) -> None:
    """Catalog-managed table (S10 — the Hive ORC tables of the
    reference, ``hive/create_tables.hql:99-100,116-117`` ORC+SNAPPY,
    re-expressed as ``saveAsTable``). Default format is parquet per
    SURVEY §1.1; pass ``format="orc"`` for byte-for-byte parity with
    the reference's managed-table layout (Spark's native ORC writer,
    snappy-compressed by default)."""
    df.write.mode(mode).format(format).saveAsTable(name)


def kafka_sink_options(bootstrap_servers: str, topic: str) -> dict[str, str]:
    """The exact writer options ``kafka_batch_sink`` sets — factored out
    so tests can assert the plumbing without a broker."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "topic": topic,
    }


def kafka_batch_sink(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    key_col: str,
    sink_format: str = "kafka",
) -> None:
    """Kafka batch sink (S11): replaces the reference's driver-side
    kafka-python producer loop (scripts/kafka_producer.py:40-88 — one
    process, row-at-a-time) with the distributed
    ``to_json(struct(*))`` writer: every executor publishes its
    partitions in parallel. Requires the spark-sql-kafka package on the
    classpath. ``sink_format`` is a test seam: brokerless environments
    pass ``"noop"`` (Spark's built-in discard sink) to execute the
    identical payload + writer path end-to-end."""
    writer = kafka_payload(df, key_col).write.format(sink_format).mode("append")
    for k, v in kafka_sink_options(bootstrap_servers, topic).items():
        writer = writer.option(k, v)
    writer.save()


def kafka_payload(df: DataFrame, key_col: str) -> DataFrame:
    """The (key, value) frame the Kafka sink publishes: key = key_col,
    value = whole-row JSON (the producer's message shape,
    kafka_producer.py:49-65)."""
    from pyspark.sql import functions as F

    return df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("value"),
    )


def mongodb_sink_options(uri: str, database: str, collection: str) -> dict[str, str]:
    """The exact writer options ``mongodb_sink`` sets (mongo-spark-
    connector v10 naming) — factored out so tests can assert the
    plumbing without a running MongoDB."""
    return {
        "spark.mongodb.write.connection.uri": uri,
        "spark.mongodb.write.database": database,
        "spark.mongodb.write.collection": collection,
    }


def mongodb_sink(
    df: DataFrame,
    uri: str,
    database: str,
    collection: str,
    mode: str = "append",
    sink_format: str = "mongodb",
) -> None:
    """MongoDB sink (S6, knn_classification.py:267-271). Requires the
    mongo-spark-connector on the classpath; callers without it should
    catch the AnalysisException and fall back to ``write_json`` (the
    reference keeps the same dual-sink pattern). ``sink_format`` is a
    test seam: brokerless environments pass ``"noop"`` to execute the
    identical writer path end-to-end."""
    writer = df.write.format(sink_format).mode(mode)
    for k, v in mongodb_sink_options(uri, database, collection).items():
        writer = writer.option(k, v)
    writer.save()


def read_csv_audited(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    corrupt_col: str = "_corrupt_record",
    **options: str,
) -> DataFrame:
    """CSV scan with malformed-row CAPTURE instead of silent nulls
    (S1 hardened). PERMISSIVE mode + an explicit corrupt-record column:
    rows that fail to parse land whole in ``corrupt_col`` (typed
    columns null), so ingest can quarantine them —
    ``df.filter(col(corrupt_col).isNotNull())`` — rather than losing
    them (DROPMALFORMED) or failing the 100 TB job on one bad line
    (FAILFAST). The schema passed in must NOT contain the corrupt
    column; it is appended here. Spark caveat handled: referencing only
    the corrupt column of a raw-parse frame is disallowed, so always
    select it alongside at least one data column (or cache first)."""
    full = T.StructType(
        schema.fields + [T.StructField(corrupt_col, T.StringType())]
    )
    reader = (
        spark.read.option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.schema(full).csv(path)


def read_parquet_evolving(
    spark: SparkSession, path: str, **options: str
) -> DataFrame:
    """Parquet scan across files with EVOLVED schemas (``mergeSchema``):
    the union schema is reconciled from all footers; files missing a
    column yield nulls for it. The pattern for long-lived datasets
    whose writers add columns over time. mergeSchema costs a
    footer-read per file at planning — at 100 TB pin the merged schema
    in a catalog table once it stabilizes instead of re-merging every
    read."""
    return spark.read.option("mergeSchema", "true").options(**options).parquet(
        path
    )


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_mb: int = 256,
) -> dict[str, int]:
    """Small-file compaction: rewrite a parquet directory into files
    sized for scan efficiency.

    The 100 TB failure mode this fixes: streaming sinks and
    fine-grained partition writes leave thousands of KB-sized files;
    every query then pays per-file open/footer/scheduling overhead
    that dwarfs the data read (a 10,000-file listing can cost more
    than the scan). Compaction is the standard maintenance pass
    (Delta/Iceberg OPTIMIZE; `spark.sql.files.maxPartitionBytes`
    only groups at READ time, it cannot fix the files on disk).

    Target file count derives from the SOURCE'S ON-DISK BYTES (file
    metadata, no data scan), then one job re-reads and rewrites via
    ``repartition(n)`` — round-robin, so output files are uniformly
    sized regardless of input skew. Returns counts for audit.

    Writes to ``dst`` rather than in place: an in-place rewrite that
    dies mid-job loses data; swap-after-success is the caller's
    atomic-rename step (same discipline as ``streaming_upsert``'s
    versioned snapshot pointer).
    """
    import glob as _glob
    import os as _os

    files = [
        f
        for f in _glob.glob(f"{src}/**/*.parquet", recursive=True)
        if _os.path.isfile(f)
    ]
    total_bytes = sum(_os.path.getsize(f) for f in files)
    n_out = max(1, -(-total_bytes // (target_file_mb << 20)))  # ceil
    df = spark.read.parquet(src)
    df.repartition(n_out).write.mode("overwrite").parquet(dst)
    out_files = [
        f
        for f in _glob.glob(f"{dst}/**/*.parquet", recursive=True)
        if _os.path.isfile(f)
    ]
    return {
        "in_files": len(files),
        "out_files": len(out_files),
        "in_bytes": total_bytes,
        "out_bytes": sum(_os.path.getsize(f) for f in out_files),
    }


def write_audit_publish(
    df: DataFrame,
    table_dir: str,
    checks,
) -> dict:
    """Write-Audit-Publish: stage the data, run quality checks against
    the STAGED copy, and only then atomically flip the live pointer —
    readers never observe data that failed its checks, and a failed
    audit leaves the previous version live and the bad data inspectable.

    The Iceberg/Delta WAP branch pattern on plain parquet:
      1. WRITE  → ``<dir>/staging-<n>`` (never the live path),
      2. AUDIT  → each check is ``(name, fn: DataFrame -> bool)`` run
         on a re-READ of the staged files (what readers would see —
         catches writer-side truncation/corruption, not just logical
         errors in the in-memory frame),
      3. PUBLISH → write ``_LIVE`` pointer via atomic rename, same
         commit discipline as ``streaming_upsert``'s snapshot log.

    Returns {"published": bool, "version": n, "audit": {name: ok}}.
    Read the live table with ``read_published``.
    """
    import json as _json
    import os as _os

    _os.makedirs(table_dir, exist_ok=True)
    existing = [
        d
        for d in _os.listdir(table_dir)
        if d.startswith("staging-") or d.startswith("v-")
    ]
    n = 1 + max(
        [int(d.split("-")[1]) for d in existing] or [0]
    )
    spark = df.sparkSession
    staged = f"{table_dir}/staging-{n}"
    df.write.mode("errorifexists").parquet(staged)

    staged_df = spark.read.parquet(staged)
    audit = {name: bool(fn(staged_df)) for name, fn in checks}
    if not all(audit.values()):
        return {"published": False, "version": n, "audit": audit}

    final = f"{table_dir}/v-{n}"
    _os.rename(staged, final)
    tmp = f"{table_dir}/_LIVE.tmp.{n}"
    with open(tmp, "w") as f:
        _json.dump({"version": n, "path": final}, f)
    _os.replace(tmp, f"{table_dir}/_LIVE")  # atomic on POSIX
    return {"published": True, "version": n, "audit": audit}


def read_published(spark: SparkSession, table_dir: str) -> DataFrame:
    """Read the live version of a write-audit-publish table."""
    import json as _json

    with open(f"{table_dir}/_LIVE") as f:
        return spark.read.parquet(_json.load(f)["path"])


def schema_diff(before, after) -> dict:
    """Schema contract check between two StructTypes (or DataFrames):
    added / removed / type-changed / nullability-tightened columns.

    The review gate for schema evolution at scale: `mergeSchema`
    silently widens, so upstream contract breaks (a column vanishing,
    a double becoming a string) surface first as wrong results — this
    makes them a diffable artifact instead. Nullability TIGHTENING
    (nullable → required) is called out separately: it breaks writers
    that used to emit nulls, while loosening is compatible.
    """
    bs = before.schema if hasattr(before, "schema") else before
    as_ = after.schema if hasattr(after, "schema") else after
    b = {f.name: f for f in bs.fields}
    a = {f.name: f for f in as_.fields}
    return {
        "added": sorted(set(a) - set(b)),
        "removed": sorted(set(b) - set(a)),
        "type_changed": sorted(
            n
            for n in set(a) & set(b)
            if a[n].dataType != b[n].dataType
        ),
        "nullability_tightened": sorted(
            n
            for n in set(a) & set(b)
            if b[n].nullable and not a[n].nullable
        ),
    }


def delete_rows(
    spark: SparkSession,
    table_dir: str,
    tombstones,
    key_col: str,
    checks=(),
):
    """Right-to-be-forgotten deletion over a write-audit-publish table:
    anti-join the LIVE version against a tombstone key set and publish
    the survivor rows as a new version (the old version stays on disk
    for the retention window — physical erasure is the vacuum step).

    Composes the existing primitives — read_published → broadcast
    anti-join → write_audit_publish — so the delete inherits the WAP
    guarantees: a failed audit (e.g. a tombstoned key still present)
    leaves the previous version live.
    """
    from pyspark.sql import functions as F

    live = read_published(spark, table_dir)
    tomb = tombstones.select(F.col(key_col).alias("_tomb_key")).distinct()
    survivors = live.join(
        F.broadcast(tomb),
        live[key_col] == F.col("_tomb_key"),
        "left_anti",
    )
    tomb_keys = {r._tomb_key for r in tomb.collect()}
    audit_checks = [
        (
            "tombstones_absent",
            lambda df: df.filter(df[key_col].isin(tomb_keys)).count() == 0,
        ),
        *checks,
    ]
    return write_audit_publish(survivors, table_dir, audit_checks)
