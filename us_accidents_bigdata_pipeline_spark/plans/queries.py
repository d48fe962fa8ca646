"""Driver-facing query catalog: one entry per operator from SURVEY.md §2,
each with a DuckDB oracle SQL (or None for non-SQL-expressible ops).

Conventions for Spark↔DuckDB hash agreement (driver compares row count +
schema + order-insensitive value hash, columns sorted by name):

- Every computed column is aliased identically on both sides.
- Float aggregates are ``round()``ed (2 decimals for sums, 4 for
  means/ratios) on BOTH sides: summation order is engine/partition
  dependent at the ulp level, rounding absorbs it. Raw column values
  (parquet-exact) are never rounded.
- DuckDB ``SUM(int)`` returns HUGEINT and ``EXTRACT``/``row_number``
  return BIGINT — oracles CAST to match Spark's LONG/INT output types.
- Spark ``dayofweek`` is 1=Sunday; DuckDB ``dow`` is 0=Sunday → +1.
- Session timezone pinned UTC (session.py) so timestamp extraction
  agrees.
- Top-k queries break ties with a unique key so the selected SET is
  identical across engines.

Scale notes: every query is written for the 100 TB plan shape, not the
60k-row test shape — dimension joins carry ``F.broadcast`` hints,
aggregations are expressed so Catalyst plans partial (map-side) aggs,
filters/projections sit directly on the scan so parquet pushdown and
column pruning apply. See docstrings per query.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions import (
    cosine_similarity,
    impute_value,
    normalize_empty_string,
    word_tokens,
)


@dataclass(frozen=True)
class QuerySpec:
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → driver runs rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def _register(name: str, oracle: str | None, doc: str = ""):
    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(builder=fn, oracle=oracle, doc=doc)
        return fn

    return wrap


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a testdata table.

    ``events.parquet`` stores ``ts`` as parquet TIMESTAMP(NANOS), which
    Spark's vectorized reader rejects; read it as long nanos
    (``spark.sql.legacy.parquet.nanosAsLong``) and rebuild the
    microsecond timestamp with integer division (double division would
    lose precision at 1e18 magnitudes — 53-bit mantissa). DuckDB's
    microsecond TIMESTAMP truncates the same way, so oracles agree.
    """
    if name == "events":
        # Set defensively at read time: the driver owns its SparkSession,
        # so session.py's defaults may not be present there. Timestamp
        # extraction must agree with DuckDB's UTC-naive semantics.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name in _SPLIT_TABLES:
        return _adaptive_input_split(spark, df)
    return df


# Tables whose map stages are CPU-heavy per byte (tokenize / shingle /
# hash / HOF folds / Arrow kernels over text and vector payloads) —
# the only ones where parallelizing an unsplittable scan beats the
# one-time round-robin shuffle. Relational tables (lineitem, orders,
# events, ...) have scan-bound map stages where the extra exchange
# LOSES: measured pricing_summary 0.59 -> 1.31 s and median_exact
# 1.31 -> 2.44 s with the split applied to lineitem, vs
# substring_dup_runs 8.2 -> 1.6 s and corpus_curation_funnel ~2x with
# it applied to documents.
_SPLIT_TABLES = frozenset({"documents", "embeddings"})

# tables below this size stay single-task: a dimension read feeds a
# broadcast or a trivial scan, and 32 micro-tasks cost more scheduler
# time than one
_SPLIT_MIN_BYTES = 256 << 10


def _adaptive_input_split(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Guide §2.5 "one huge unsplittable file": this testdata writes
    each table as ONE parquet file with ONE row group, and a row group
    is Spark's minimum scan-split unit — so every map-side stage
    (tokenize/shingle/hash/partial-aggregate) over the table runs as a
    SINGLE task no matter how many cores the session has. Measured on
    the 10x replica tier (round 13, SCALING_CORES.json): the
    shuffle-heavy headliners read 0.84-0.93x going 8 -> 32 cores with
    healthy CPU probes — flat, because stage one is serial — and
    2x faster at BOTH core counts once the read is repartitioned.

    Rule (scale-adaptive, not a local[32] constant): when the scan
    exposes fewer input files than the session's parallelism AND the
    table is big enough for one round-robin shuffle of it to be noise
    (> _SPLIT_MIN_BYTES of local file bytes), repartition to
    ``defaultParallelism`` right after the read. On production data
    (many files / multi-row-group files >= parallelism) or non-local
    storage this returns the frame untouched. Predicate pushdown and
    column pruning pass through Repartition, so PushedFilters /
    ReadSchema pins are unaffected; results are partition-layout
    independent by the driver's own layout sweep.
    """
    try:
        par = spark.sparkContext.defaultParallelism
        files = df.inputFiles()
        if not files or len(files) >= par:
            return df
        total = 0
        for uri in files:
            if not uri.startswith("file:"):
                # remote storage: sizes unknown locally — leave the
                # scan alone (production layouts bring their own
                # parallelism)
                return df
            from urllib.parse import unquote, urlparse

            total += os.path.getsize(unquote(urlparse(uri).path))
        if total < _SPLIT_MIN_BYTES:
            return df
        return df.repartition(par)
    except Exception:
        return df


# ---------------------------------------------------------------------
# Driver sampling order. The correctness driver checks the FIRST 50
# entries of queries() against their oracles each round; entries past
# that window get no recorded evidence that round, and rows-only
# entries inside it waste checked slots. The export order is
# self-rotating:
#   1. oracled queries with NO recorded driver row yet (registration
#      order — SURVEY §2 section order), so each round certifies 50
#      previously-unchecked names;
#   2. the already-certified oracled core (stays green in pytest's
#      per-registry oracle sweep, tests/test_oracle.py);
#   3. rows-only entries last (the driver records only a weaker
#      rows-only check for them — they never belong in the window
#      while oracled work remains unrecorded).
# _driver_certified() is DERIVED from the committed
# CORRECTNESS_r*.json artifacts next to __spark_entry__.py, so the
# rotation advances itself each round with no manual step: a name is
# certified once any round recorded a row for it, EXCEPT when its
# latest record is a genuine error (not the weak-check "no_oracle"
# marker) — those re-enter the front so the driver re-checks them.
# _DRIVER_CERTIFIED_FALLBACK (the r1–r5 union, 155 names) covers
# checkouts without the artifacts.
# priority_distribution is entry()'s flagship and is smoke-checked by
# the driver every round regardless of window position.
# ---------------------------------------------------------------------
_DRIVER_CERTIFIED_FALLBACK: frozenset = frozenset(
    {
        "above_nation_avg_balance", "array_agg_sorted", "asof_last_purchase",
        "audio_frame_features_docs", "cast_arithmetic", "catalog_sql_region_orders",
        "cdc_apply_orders", "char_entropy_docs", "chunk_documents",
        "cohort_retention", "conditional_impute", "contamination_fraction_docs",
        "corpus_curation_funnel", "corpus_report", "correlation_stats",
        "cube_agg", "daily_revenue_change", "decontaminate_docs",
        "dedup_provenance_docs", "dedup_savings_report", "describe_stats",
        "distinct_count", "dq_constraint_report", "dsir_importance_weights",
        "dup_cluster_size_histogram", "embedding_near_dup_pairs", "embedding_near_dup_pairs_blas",
        "embedding_near_dup_resolve", "embedding_norm_stats", "embedding_quantize_error",
        "event_type_distribution", "exact_dedup_docs", "filter_in_list",
        "filter_not_null_range", "fingerprint_dedup", "fingerprint_dedup_md5",
        "fk_containment_profile", "funnel_conversion", "global_mean",
        "grouped_ols_value_on_hour", "grouping_sets_agg", "hashed_features_docs",
        "having_filter", "histogram_quantity", "hourly_event_stats",
        "image_patch_stats_synthetic", "image_resize_patch_stats", "incremental_dedup_new_batch",
        "ivf_cell_assignment", "join_anti", "join_left_outer",
        "join_region_stats", "join_revenue_topk", "join_semi",
        "json_extract_props", "json_schema_parse", "k_anonymity_audit_customers",
        "knn_cosine_batch", "knn_cosine_topk", "knn_label_vote",
        "langid_confusion_matrix", "language_id_docs", "leakage_safe_split_docs",
        "line_dedup_docs", "local_supplier_volume", "loo_target_encoding_orders",
        "lsh_ann_candidates", "lsh_ann_verified_topk", "median_exact",
        "merge_upsert_orders", "minhash_banded_pairs", "minhash_lsh_verified_pairs",
        "minhash_near_dup_pairs", "mixture_sample_docs", "ml_kmeans_customer_clusters",
        "ml_knn_embedding_predictions", "ml_rf_lineitem_metrics", "multi_agg_group",
        "multi_format_union_orders", "multimodal_byte_stats", "multimodal_frame_sample",
        "multimodal_resize", "near_dup_keep_best", "near_dup_resolve",
        "near_dup_resolve_banded", "ngram_jaccard_pairs", "normalized_exact_dedup_docs",
        "null_audit", "ols_normal_equations_lineitem", "order_priority_check",
        "param_sql_top_customers", "pii_redact_docs", "pivot_linestatus",
        "pricing_summary", "priority_distribution", "projection_select",
        "promo_revenue_share", "python_datasource_squares", "quantile_normalize_events",
        "range_join_bands", "recursive_date_spine", "rename_columns",
        "repetition_quality_docs", "returned_revenue_topk", "revenue_forecast_filter",
        "robust_outliers_price", "rolling_30d_revenue", "rollup_agg",
        "salted_agg_returnflag", "sequence_pack_assignment", "sessionize_events",
        "setop_except", "setop_intersect", "setop_union_distinct",
        "shipping_priority_topk", "simhash_near_dup_pairs", "simhash_near_dup_pairs_md5",
        "snapshot_diff_orders", "sole_late_supplier_ranking", "streaming_cdc_orders",
        "streaming_dedup_events", "streaming_python_source_squares", "streaming_running_totals",
        "streaming_session_windows", "streaming_sliding_counts", "streaming_static_join_counts",
        "streaming_windowed_counts", "string_agg_sorted", "string_indexer_mapping",
        "substring_dup_runs", "temperature_mixture_sample_docs", "temporal_extract",
        "text_quality_scores", "text_stats_docs", "tfidf_top_terms",
        "token_kl_by_source", "token_length_histogram_by_source", "tokenizer_fertility_by_source",
        "topk_orders", "total_count", "training_shard_assignment",
        "udtf_trigrams_docs", "unpivot_order_measures", "variant_extract_props",
        "video_frame_diff_energy", "vocab_top_tokens", "weighted_sample_parts",
        "window_first_last", "window_ntile_quartiles", "window_percentile_ranks",
        "window_running_sum", "window_topk_per_group", "winnow_fingerprints_md5",
        "xml_roundtrip_orders", "zorder_keys_events",
    }
)


def _load_driver_records() -> dict:
    """Latest recorded driver CORRECTNESS row per name, read from the
    committed ``CORRECTNESS_r*.json`` files at the repo root (three
    levels above this module, next to ``__spark_entry__.py``). Later
    rounds override earlier ones. Falls back to synthetic green rows
    for the frozen r1–r5 union when no artifacts are present."""
    import glob as _glob
    import json as _json
    import os as _os

    # queries.py lives at <repo>/us_accidents_bigdata_pipeline_spark/plans/
    # so the repo root (where the driver writes CORRECTNESS_r*.json, next to
    # __spark_entry__.py) is exactly THREE dirname hops up, not four.
    root = _os.path.dirname(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    )
    latest: dict = {}
    for path in sorted(_glob.glob(_os.path.join(root, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                rows = _json.load(fh)
        except (OSError, ValueError):
            continue
        if isinstance(rows, dict):
            latest.update(rows)
    if not latest:
        latest = {n: {"hash_match": True} for n in _DRIVER_CERTIFIED_FALLBACK}
    return latest


_DRIVER_RECORDS: dict = _load_driver_records()


def _driver_certified() -> frozenset:
    """Names whose recorded driver evidence is still the strongest the
    registry can offer. A name re-enters the front window when:
    - its latest record is a genuine error (not the "no_oracle"
      weak-check marker) — re-check it; or
    - it was recorded rows-only ("no_oracle") but has SINCE gained an
      oracle — the driver should record the stronger oracle row.
    Evaluated lazily because oracles are attached after this module's
    helpers are defined (registration happens at import bottom)."""
    out = set()
    for n, rec in _DRIVER_RECORDS.items():
        if not isinstance(rec, dict):
            out.add(n)
            continue
        err = rec.get("err")
        if err and err != "no_oracle":
            continue
        if err == "no_oracle" and n in REGISTRY and REGISTRY[n].oracle:
            continue
        out.add(n)
    return frozenset(out)


def _export_order() -> list[str]:
    certified_set = _driver_certified()
    uncertified = [
        n for n, s in REGISTRY.items() if s.oracle and n not in certified_set
    ]
    certified = [
        n for n, s in REGISTRY.items() if s.oracle and n in certified_set
    ]
    rows_only = [n for n, s in REGISTRY.items() if not s.oracle]
    return uncertified + certified + rows_only


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: REGISTRY[name].builder for name in _export_order()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in _export_order()
        if REGISTRY[name].oracle
    }


# =====================================================================
# §2.4 A1 / §2.5 O1 — group-by count + order (the reference's signature
# severity-distribution query, data_cleaning.py:144, mapped onto
# o_orderpriority per FIXTURES §6).
# Plan shape: scan(1 col) → partial hash agg → shuffle(key) → final agg.
# Scales: map-side combine reduces shuffle to |distinct keys| rows/task.
# =====================================================================


@_register(
    "priority_distribution",
    """SELECT o_orderpriority, count(*) AS n
       FROM orders GROUP BY o_orderpriority""",
    doc="A1/O1: severity-distribution analog (data_cleaning.py:144)",
)
def q_priority_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderpriority")
    )


@_register(
    "event_type_distribution",
    """SELECT event_type, count(*) AS n FROM events GROUP BY event_type""",
    doc="A1: prediction-distribution analog (v2:cell22,51)",
)
def q_event_type_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# =====================================================================
# §2.2 P1/P2/P11 — projection / rename / drop
# Plan: pure scan-project; ReadSchema must carry only selected columns.
# =====================================================================


@_register(
    "projection_select",
    """SELECT c_custkey, c_name, c_mktsegment FROM customer""",
    doc="P1/P11: explicit column projection (data_cleaning.py:34-46)",
)
def q_projection_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")


@_register(
    "rename_columns",
    """SELECT c_custkey AS cust_id, c_acctbal AS balance FROM customer""",
    doc="P2: unsafe→safe identifier rename (data_cleaning.py:52-60)",
)
def q_rename_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust_id"), F.col("c_acctbal").alias("balance")
    )


# =====================================================================
# §2.2 P3/P4/P5 — predicates. Pushed to the parquet scan
# (PushedFilters in explain).
# =====================================================================


@_register(
    "filter_not_null_range",
    """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
       WHERE l_quantity IS NOT NULL AND l_quantity BETWEEN 10 AND 40""",
    doc="P3/P4: null + range predicates (data_cleaning.py:96-97)",
)
def q_filter_not_null_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").isNotNull()
        & (F.col("l_quantity") >= 10)
        & (F.col("l_quantity") <= 40)
    ).select("l_orderkey", "l_linenumber", "l_quantity")


@_register(
    "filter_in_list",
    """SELECT o_orderkey, o_orderpriority FROM orders
       WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')""",
    doc="P5: IN-list predicate (v2:cell19 isin)",
)
def q_filter_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_orderpriority")
    )


# =====================================================================
# §2.2 P7/P8/P12/P13 — conditional imputation (median/0/'Unknown'),
# NaN-aware null tests, empty-string normalization
# (data_cleaning.py:69-86). All whole-stage-codegen expressions.
# =====================================================================


@_register(
    "conditional_impute",
    """SELECT event_id,
              CASE WHEN value IS NULL OR isnan(value) THEN 0.0 ELSE value END
                  AS value_filled,
              CASE WHEN props IS NULL OR props = '' THEN 'Unknown' ELSE props END
                  AS props_norm
       FROM events""",
    doc="P7/P8/P12/P13: when/otherwise imputation (data_cleaning.py:69-86)",
)
def q_conditional_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        impute_value("value", 0.0).alias("value_filled"),
        normalize_empty_string("props").alias("props_norm"),
    )


@_register(
    "cast_arithmetic",
    """SELECT p_partkey, CAST(p_size AS DOUBLE) AS size_d, p_size - 1 AS size_label
       FROM part""",
    doc="P9/P10: cast + label-shift arithmetic (random_forest.py:76-79)",
)
def q_cast_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size_d"),
        (F.col("p_size") - F.lit(1)).alias("size_label"),
    )


# =====================================================================
# §2.7 — temporal extraction (hour/dayofweek/month on Start_Time,
# data_cleaning.py:89-93, mapped onto events.ts).
# =====================================================================


@_register(
    "temporal_extract",
    """SELECT event_id,
              CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour_of_day,
              CAST(EXTRACT(dow FROM ts) AS INTEGER) + 1 AS day_of_week,
              CAST(EXTRACT(month FROM ts) AS INTEGER) AS month
       FROM events""",
    doc="scalar date funcs (data_cleaning.py:89-93); Spark dayofweek 1=Sunday",
)
def q_temporal_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.hour("ts").alias("hour_of_day"),
        F.dayofweek("ts").alias("day_of_week"),
        F.month("ts").alias("month"),
    )


@_register(
    "hourly_event_stats",
    """SELECT CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour_of_day,
              count(*) AS n,
              round(avg(value), 4) AS avg_value
       FROM events GROUP BY 1""",
    doc="temporal feature + agg: accidents-by-hour analog",
)
def q_hourly_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.hour("ts").alias("hour_of_day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
    )


# =====================================================================
# §2.4 A2/A3 — multi-agg group-by (per-cluster stats,
# kmeans_clustering.py:202-208). Partial aggregation (map-side) keeps
# the shuffle at |groups|×|aggs| — scale-safe for low-cardinality keys.
# =====================================================================


@_register(
    "multi_agg_group",
    """SELECT l_returnflag,
              count(*) AS n,
              round(avg(l_quantity), 4) AS avg_qty,
              round(stddev_samp(l_quantity), 4) AS std_qty,
              round(sum(l_extendedprice), 2) AS sum_price,
              min(l_quantity) AS min_qty,
              max(l_quantity) AS max_qty
       FROM lineitem GROUP BY l_returnflag""",
    doc="A2: count/avg/stddev multi-agg (kmeans_clustering.py:202-208)",
)
def q_multi_agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.stddev("l_quantity"), 4).alias("std_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


@_register(
    "global_mean",
    """SELECT round(avg(c_acctbal), 4) AS avg_balance FROM customer""",
    doc="A4: global scalar agg for imputation (v1/v2:cell19)",
)
def q_global_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "customer").agg(
        F.round(F.avg("c_acctbal"), 4).alias("avg_balance")
    )


@_register(
    "null_audit",
    """SELECT CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_null_value,
              CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_null_props,
              CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_null_user,
              count(*) AS n_rows
       FROM events""",
    doc="A5: single-pass multi-column null audit (v2:cell17) — one job, "
    "not one per column",
)
def q_null_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")

    def nulls(c: str) -> F.Column:
        return F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"n_null_{c}")

    return ev.agg(
        nulls("value").alias("n_null_value"),
        nulls("props").alias("n_null_props"),
        nulls("user_id").alias("n_null_user"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@_register(
    "median_exact",
    """SELECT l_returnflag,
              round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
              round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price
       FROM lineitem GROUP BY l_returnflag""",
    doc="A6: exact median per group (reference uses approxQuantile, "
    "data_cleaning.py:67 — exact variant is the oracle-checkable one; "
    "percentile_approx kept as the scale path in operators/profile.py)",
)
def q_median_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("median_qty"),
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("median_price"),
    )


@_register(
    "describe_stats",
    """SELECT count(o_totalprice) AS n,
              round(avg(o_totalprice), 4) AS mean_price,
              round(stddev_samp(o_totalprice), 4) AS std_price,
              round(min(o_totalprice), 2) AS min_price,
              round(max(o_totalprice), 2) AS max_price
       FROM orders""",
    doc="A7: describe()/summary() equivalent in one agg (v2:cell15)",
)
def q_describe_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        F.count("o_totalprice").alias("n"),
        F.round(F.avg("o_totalprice"), 4).alias("mean_price"),
        F.round(F.stddev("o_totalprice"), 4).alias("std_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


@_register(
    "total_count",
    """SELECT count(*) AS n FROM lineitem""",
    doc="A8: materialization checkpoint count (data_cleaning.py:31)",
)
def q_total_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n"))


@_register(
    "distinct_count",
    """SELECT count(DISTINCT l_partkey) AS n_parts,
              count(DISTINCT l_suppkey) AS n_supps
       FROM lineitem""",
    doc="A9: distinct counts kept in Spark (vs driver-side np.unique); "
    "approx_count_distinct is the 100TB path (operators/profile.py)",
)
def q_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


# =====================================================================
# §2.5 O1/O2 — order-by + limit / top-k. Spark plans TakeOrderedAndProject
# (per-partition heap + driver merge) — no full sort at scale.
# Tie-break on the unique key so the selected set is deterministic.
# =====================================================================


@_register(
    "topk_orders",
    """SELECT o_orderkey, o_totalprice FROM orders
       ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    doc="O2: top-k via orderBy+limit → TakeOrderedAndProject",
)
def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


# =====================================================================
# §2.6 — joins. The reference has zero relational joins (its only
# join-like op is the broadcast kNN, ml/knn.py); these expose the full
# join surface the engine must have. Dimension tables get broadcast
# hints — at 100 TB, region/nation/supplier remain KB-MB-scale, so the
# fact-side scan never shuffles for these joins.
# =====================================================================


@_register(
    "join_region_stats",
    """SELECT r.r_name,
              count(*) AS n_customers,
              round(avg(c.c_acctbal), 4) AS avg_balance
       FROM customer c
       JOIN nation n ON c.c_nationkey = n.n_nationkey
       JOIN region r ON n.n_regionkey = r.r_regionkey
       GROUP BY r.r_name""",
    doc="equi-join chain over broadcast dims, then agg",
)
def q_join_region_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_balance"),
        )
    )


@_register(
    "join_revenue_topk",
    """SELECT l.l_orderkey,
              round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
              o.o_orderpriority
       FROM lineitem l
       JOIN orders o ON l.l_orderkey = o.o_orderkey
       WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
         AND l.l_shipdate > TIMESTAMP '1996-06-01'
       GROUP BY l.l_orderkey, o.o_orderpriority
       ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    doc="TPC-H Q3-shaped: filtered fact-fact equi-join + agg + top-k. "
    "At scale both sides shuffle on orderkey (sort-merge); filters push "
    "to both scans first.",
)
def q_join_revenue_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1996-06-01"))
    )
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@_register(
    "join_left_outer",
    """SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
       FROM customer c
       LEFT JOIN orders o
         ON c.c_custkey = o.o_custkey AND o.o_orderpriority = '1-URGENT'
       GROUP BY c.c_custkey""",
    doc="left outer join preserving zero-order customers",
)
def q_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_orderpriority == "1-URGENT")
    return (
        c.join(o, cond, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@_register(
    "join_semi",
    """SELECT c_custkey, c_name FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey
                       AND o.o_totalprice > 400000)""",
    doc="left-semi join ≡ EXISTS",
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@_register(
    "join_anti",
    """SELECT c_custkey, c_name FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey
                           AND o.o_orderpriority = '1-URGENT')""",
    doc="left-anti join ≡ NOT EXISTS (null-safe, unlike NOT IN)",
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# =====================================================================
# TPC-H Q1 — the canonical pricing-summary scan-heavy aggregate.
# =====================================================================


@_register(
    "pricing_summary",
    """SELECT l_returnflag, l_linestatus,
              round(sum(l_quantity), 2) AS sum_qty,
              round(sum(l_extendedprice), 2) AS sum_base_price,
              round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
              round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
                  AS sum_charge,
              round(avg(l_quantity), 4) AS avg_qty,
              round(avg(l_extendedprice), 4) AS avg_price,
              round(avg(l_discount), 4) AS avg_disc,
              count(*) AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '2001-09-02'
       GROUP BY l_returnflag, l_linestatus""",
    doc="TPC-H Q1 shape: scan-dominant multi-agg; partial agg keeps "
    "shuffle tiny regardless of input size",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.to_timestamp(F.lit("2001-09-02"))
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
        F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# =====================================================================
# Window functions — rank-based top-k per group and running aggregates.
# (Absent in the reference; required engine surface, SURVEY §2.5 note.)
# =====================================================================


@_register(
    "window_topk_per_group",
    """SELECT * FROM (
         SELECT o_orderpriority, o_orderkey, o_totalprice,
                CAST(row_number() OVER (
                    PARTITION BY o_orderpriority
                    ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
         FROM orders) t
       WHERE rn <= 3""",
    doc="top-k per group via ranking window; tie-broken on unique key",
)
def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@_register(
    "window_running_sum",
    """SELECT event_id, user_id,
              round(sum(value) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                  AS running_value
       FROM events""",
    doc="running aggregate window per user (sessionization building block)",
)
def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "event_id", "user_id", F.round(F.sum("value").over(w), 2).alias("running_value")
    )


@_register(
    "window_ntile_quartiles",
    """SELECT o_orderpriority, o_orderkey,
              CAST(ntile(4) OVER (
                  PARTITION BY o_orderpriority
                  ORDER BY o_totalprice, o_orderkey) AS INTEGER) AS quartile
       FROM orders""",
    doc="equi-depth bucketing per group via ntile (quantile cohorting)",
)
def q_window_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderpriority",
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
    )


@_register(
    "window_first_last",
    """SELECT o_custkey, o_orderkey,
              round(first_value(o_totalprice) OVER w, 2) AS first_price,
              round(last_value(o_totalprice) OVER w, 2) AS last_price
       FROM orders
       WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""",
    doc="first/last value per partition with an explicit full frame "
    "(the default frame would make last_value = current row)",
)
def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
        F.round(F.last("o_totalprice").over(w), 2).alias("last_price"),
    )


@_register(
    "array_agg_sorted",
    """SELECT r_regionkey,
              array_to_string(list_sort(list(n_name)), ',') AS nations
       FROM region JOIN nation ON r_regionkey = n_regionkey
       GROUP BY r_regionkey""",
    doc="deterministic array aggregation: collect_list's order is "
    "partition-dependent, so sort_array wraps it. Emitted in canonical "
    "joined-string form: the sorted ARRAY itself is the operator "
    "(sort_array(collect_list(..))), but an array-typed result cell "
    "is unhashable for the driver's canonicalizer (r2: TypeError "
    "'unhashable type: list'), so the contract surface serializes it "
    "— semantics identical, hashable everywhere",
)
def q_array_agg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    return (
        r.join(n, F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy("r_regionkey")
        .agg(
            F.array_join(
                F.sort_array(F.collect_list("n_name")), ","
            ).alias("nations")
        )
    )


@_register(
    "string_agg_sorted",
    """SELECT o_orderpriority,
              string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
                  AS statuses
       FROM orders GROUP BY o_orderpriority""",
    doc="deterministic string aggregation: distinct values sorted then "
    "joined (concat_ws over sort_array(collect_set))",
)
def q_string_agg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.concat_ws(
            ",", F.sort_array(F.collect_set("o_orderstatus"))
        ).alias("statuses")
    )


@_register(
    "grouping_sets_agg",
    """SELECT l_returnflag, l_linestatus,
              count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
       FROM lineitem
       GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""",
    doc="explicit GROUPING SETS (neither rollup nor cube): per-flag and "
    "per-status subtotals only, no grand total, no cross terms",
)
def q_grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_gs_lineitem")
    return li.sparkSession.sql(
        """SELECT l_returnflag, l_linestatus,
                  count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
           FROM _gs_lineitem
           GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))"""
    )


# =====================================================================
# Set operations (engine surface; absent in reference).
# =====================================================================


@_register(
    "setop_union_distinct",
    """SELECT c_custkey FROM customer WHERE c_acctbal > 5000
       UNION
       SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'""",
    doc="UNION (distinct) of two predicate sets",
)
def q_setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    a = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    b = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return a.union(b).distinct()


@_register(
    "setop_intersect",
    """SELECT c_custkey FROM customer WHERE c_acctbal > 5000
       INTERSECT
       SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'""",
    doc="INTERSECT (distinct)",
)
def q_setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000).select(
        "c_custkey"
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "5-LOW")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.intersect(o)


@_register(
    "setop_except",
    """SELECT c_custkey FROM customer
       EXCEPT
       SELECT o_custkey FROM orders WHERE o_totalprice > 200000""",
    doc="EXCEPT (distinct)",
)
def q_setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 200000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    # subtract == EXCEPT DISTINCT: removes every distinct left row that
    # appears on the right. (exceptAll would only subtract one
    # occurrence per right row — wrong when the left side has dupes.)
    return c.subtract(o)


# =====================================================================
# Rollup / cube / pivot (engine surface).
# =====================================================================


@_register(
    "rollup_agg",
    """SELECT l_returnflag, l_linestatus,
              count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
       FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",
    doc="hierarchical subtotals via ROLLUP",
)
def q_rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty")
    )


@_register(
    "cube_agg",
    """SELECT l_returnflag, l_linestatus,
              count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
       FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""",
    doc="all grouping-set combinations via CUBE",
)
def q_cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty")
    )


@_register(
    "pivot_linestatus",
    """SELECT l_returnflag,
              round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS "O",
              round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS "F"
       FROM lineitem GROUP BY l_returnflag""",
    doc="pivot with explicit value list (unbounded pivot would need a "
    "distinct-values job first — anti-pattern at scale)",
)
def q_pivot_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )


# =====================================================================
# LLM-data-pipeline operators (driver extension scope): deduplication,
# text analysis, similarity search over the documents/embeddings tables.
# Implementations live in operators/{dedup,textstats,similarity}.py;
# these entries bind them to the oracle harness.
# =====================================================================


@_register(
    "exact_dedup_docs",
    """SELECT text, min(doc_id) AS doc_id, count(*) AS n_copies
       FROM documents GROUP BY text""",
    doc="exact dedup: hash-groupBy on content, deterministic keeper "
    "(operators/dedup.py::exact_dedup)",
)
def q_exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import exact_dedup

    return exact_dedup(_t(spark, sf_dir, "documents"), ["text"], "doc_id")


@_register(
    "normalized_exact_dedup_docs",
    # DuckDB regexp_replace needs the 'g' flag to match Spark's
    # replace-all semantics; [^a-z0-9 ] and ' +' mean the same in RE2
    # and Java regex.
    """SELECT md5(trim(regexp_replace(
                  regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                  ' +', ' ', 'g'))) AS content_key,
              min(doc_id) AS doc_id,
              count(*) AS n_copies
       FROM documents
       GROUP BY 1""",
    doc="normalization-robust exact dedup: canonicalize (lowercase, "
    "strip punctuation, collapse whitespace) then group by md5 of the "
    "canonical form — document payloads never shuffle, only 32-char "
    "keys (operators/dedup.py::normalized_exact_dedup)",
)
def q_normalized_exact_dedup_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.dedup import normalized_exact_dedup

    return normalized_exact_dedup(_t(spark, sf_dir, "documents"))


@_register(
    "incremental_dedup_new_batch",
    # text IS NOT NULL on both sides mirrors the operator's explicit
    # NULL contract (content-less rows excluded from output and from
    # the fingerprint set) — without it, one NULL in the corpus would
    # make NOT IN drop every row while the Spark anti-join kept
    # NULL-text rows.
    """SELECT d.doc_id, d.n_chars
       FROM documents d
       WHERE d.doc_id % 10 = 0 AND d.text IS NOT NULL
         AND md5(d.text) NOT IN (SELECT md5(text) FROM documents
                                 WHERE doc_id % 10 <> 0
                                   AND text IS NOT NULL)""",
    doc="incremental-ingest dedup: today's batch (doc_id%10=0) "
    "anti-joined on content md5 against the standing corpus — the "
    "every-snapshot crawl-pipeline shape; corpus side reduces to a "
    "hash-only fingerprint frame; NULL-text rows excluded by contract "
    "(operators/dedup.py::incremental_dedup)",
)
def q_incremental_dedup_new_batch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.dedup import incremental_dedup

    docs = _t(spark, sf_dir, "documents")
    new_batch = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    return incremental_dedup(new_batch, corpus).select("doc_id", "n_chars")


@_register(
    "text_stats_docs",
    r"""SELECT doc_id,
              length(text) AS n_chars,
              CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER)
                  AS n_tokens,
              CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
                  AS INTEGER) AS n_tokens_bpe,
              round(length(regexp_replace(text, '\s+', '', 'g'))
                    / len(string_split_regex(trim(text), '\s+')), 4)
                  AS avg_token_len,
              round(len(list_filter(string_split_regex(trim(text), '\s+'),
                        t -> t IN ('the','a','of','and','to','in','is','it')))
                    / len(string_split_regex(trim(text), '\s+')), 4)
                  AS stopword_ratio
       FROM documents""",
    doc="per-doc token counts / quality inputs, all JVM-side "
    "(operators/textstats.py::text_stats)",
)
def q_text_stats_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textstats import text_stats

    return text_stats(_t(spark, sf_dir, "documents"))


@_register(
    "text_quality_scores",
    r"""WITH s AS (
         SELECT doc_id,
                CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE)
                    AS toks,
                CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                         t -> t IN ('the','a','of','and','to','in','is','it')))
                    AS DOUBLE) AS sw,
                CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
                    AS chars
         FROM documents)
       SELECT doc_id,
              round(0.4 * least(toks / 50.0, 1.0)
                  + 0.3 * least((sw / toks) / 0.05, 1.0)
                  + 0.3 * (CASE WHEN chars / toks BETWEEN 2.0 AND 12.0
                                THEN 1.0 ELSE 0.3 END), 4) AS quality
       FROM s""",
    doc="rule-based quality score (operators/textstats.py::quality_score)",
)
def q_text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import word_tokens
    from ..operators.textstats import quality_score

    d = _t(spark, sf_dir, "documents")
    # let-bound token array (see quality_score): one regex split per
    # doc instead of four
    base = d.select("doc_id", "text", word_tokens("text").alias("_toks"))
    return base.select(
        "doc_id", quality_score("text", toks=F.col("_toks")).alias("quality")
    )


@_register(
    "language_id_docs",
    r"""SELECT doc_id,
              CASE WHEN len(list_filter(string_split_regex(trim(text), '\s+'),
                            t -> t IN ('the','a','of','and','to','in','is','it')))
                        / len(string_split_regex(trim(text), '\s+')) >= 0.02
                   THEN 'en' ELSE 'unknown' END AS lang_pred
       FROM documents""",
    doc="stopword-ratio language-ID heuristic "
    "(operators/textstats.py::language_id)",
)
def q_language_id_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textstats import language_id

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", language_id("text").alias("lang_pred"))


@_register(
    "langid_confusion_matrix",
    # Evaluates the heuristic against the labeled lang column — the
    # confusion counts a classifier readout needs (per labeled
    # language, how the stopword heuristic routes it).
    r"""WITH pred AS (
         SELECT doc_id, lang,
                CASE WHEN len(list_filter(
                              string_split_regex(trim(text), '\s+'),
                              t -> t IN ('the','a','of','and','to',
                                         'in','is','it')))
                          / len(string_split_regex(trim(text), '\s+'))
                          >= 0.02
                     THEN 'en' ELSE 'unknown' END AS lang_pred
         FROM documents)
       SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
       FROM pred GROUP BY lang, lang_pred""",
    doc="language-ID evaluation: confusion matrix of the stopword "
    "heuristic vs the labeled lang column — the per-class readout "
    "that tells which languages the cheap filter misroutes before "
    "you trust it to gate a corpus "
    "(operators/textstats.py::language_id)",
)
def q_langid_confusion_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.textstats import language_id

    d = _t(spark, sf_dir, "documents")
    return (
        d.select("lang", language_id("text").alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@_register(
    "repetition_quality_docs",
    r"""WITH toks AS (
         SELECT doc_id,
                unnest(list_filter(string_split_regex(trim(text), '\s+'),
                                   t -> t <> '')) AS token
         FROM documents),
       tc AS (SELECT doc_id, token, count(*) AS c
              FROM toks GROUP BY doc_id, token)
       SELECT doc_id,
              CAST(sum(c) AS BIGINT) AS n_tokens,
              round(count(*) / CAST(sum(c) AS DOUBLE), 4) AS distinct_ratio,
              round(max(c) / CAST(sum(c) AS DOUBLE), 4) AS top_token_frac,
              (max(c) / CAST(sum(c) AS DOUBLE) > 0.2
               OR count(*) / CAST(sum(c) AS DOUBLE) < 0.3) AS is_repetitive
       FROM tc GROUP BY doc_id""",
    doc="Gopher-style repetition filter: distinct-token ratio + "
    "top-token mass fraction + repetitive flag "
    "(operators/textstats.py::repetition_stats)",
)
def q_repetition_quality_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textstats import repetition_stats

    return repetition_stats(_t(spark, sf_dir, "documents"))


@_register(
    "ngram_jaccard_pairs",
    r"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                  FROM documents),
       sh AS (SELECT DISTINCT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
              FROM t, UNNEST(generate_series(1, greatest(len(toks) - 2, 0)))
                   AS u(i)),
       sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                        count(*) AS n_common
                 FROM sh a JOIN sh b
                   ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                 GROUP BY 1, 2)
       SELECT p.doc_a, p.doc_b,
              round(CAST(p.n_common AS DOUBLE)
                    / (sa.n_sh + sb.n_sh - p.n_common), 4) AS jaccard
       FROM pairs p
       JOIN sizes sa ON p.doc_a = sa.doc_id
       JOIN sizes sb ON p.doc_b = sb.doc_id
       WHERE round(CAST(p.n_common AS DOUBLE)
                   / (sa.n_sh + sb.n_sh - p.n_common), 4) >= 0.5""",
    doc="exact 3-gram Jaccard near-dup pairs — the correctness reference "
    "for MinHash (operators/dedup.py::ngram_jaccard_pairs)",
)
def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), threshold=0.5)


@_register(
    "near_dup_resolve",
    r"""WITH RECURSIVE
       t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
             FROM documents),
       sh AS (SELECT DISTINCT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
              FROM t, UNNEST(generate_series(1, greatest(len(toks) - 2, 0)))
                   AS u(i)),
       sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       p0 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
              FROM sh a JOIN sh b
                ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
       pairs AS (SELECT p.doc_a, p.doc_b FROM p0 p
                 JOIN sizes sa ON p.doc_a = sa.doc_id
                 JOIN sizes sb ON p.doc_b = sb.doc_id
                 WHERE round(CAST(p.n_common AS DOUBLE)
                             / (sa.n_sh + sb.n_sh - p.n_common), 4) >= 0.5),
       edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
                 UNION SELECT doc_b, doc_a FROM pairs),
       reach(node, r) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT e.d, reach.r FROM reach JOIN edges e ON e.s = reach.node)
       SELECT node AS doc_id, min(r) AS canonical_id,
              node = min(r) AS keep
       FROM reach GROUP BY node""",
    doc="near-dup RESOLUTION: connected components over exact-Jaccard "
    "pairs -> deterministic min-id survivor per cluster "
    "(operators/dedup.py::near_dup_resolve, resolve_components); the "
    "oracle walks the same graph with a recursive CTE",
)
def q_near_dup_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import near_dup_resolve

    return near_dup_resolve(
        _t(spark, sf_dir, "documents"), threshold=0.5, method="exact"
    )


@_register(
    "leakage_safe_split_docs",
    # Whole near-dup CLUSTERS route to one split (md5 of the
    # canonical id, 80/20): a random row split leaks near-duplicate
    # content across train/test and inflates eval — the split unit
    # must be the duplicate cluster, not the document.
    r"""WITH RECURSIVE
       t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
             FROM documents),
       sh AS (SELECT DISTINCT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
              FROM t, UNNEST(generate_series(1, greatest(len(toks) - 2, 0)))
                   AS u(i)),
       sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       p0 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
              FROM sh a JOIN sh b
                ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
       pairs AS (SELECT p.doc_a, p.doc_b FROM p0 p
                 JOIN sizes sa ON p.doc_a = sa.doc_id
                 JOIN sizes sb ON p.doc_b = sb.doc_id
                 WHERE round(CAST(p.n_common AS DOUBLE)
                             / (sa.n_sh + sb.n_sh - p.n_common), 4) >= 0.5),
       edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
                 UNION SELECT doc_b, doc_a FROM pairs),
       reach(node, r) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT e.d, reach.r FROM reach JOIN edges e ON e.s = reach.node),
       comp AS (SELECT node AS doc_id, min(r) AS canonical_id
                FROM reach GROUP BY node)
       SELECT doc_id, canonical_id,
              CASE WHEN CAST('0x' || substr(md5('42-'
                        || CAST(canonical_id AS VARCHAR)), 9, 4)
                        AS BIGINT) < 0.8 * 65536
                   THEN 'train' ELSE 'test' END AS split
       FROM comp""",
    doc="leakage-safe train/test split: the split unit is the NEAR-DUP "
    "CLUSTER (md5 of the canonical id, 80/20), so near-duplicate "
    "content can never straddle train and test — the contamination a "
    "random row split silently creates; composition of "
    "near_dup_resolve + the deterministic md5 splitter "
    "(operators/dedup.py::near_dup_resolve, sample.deterministic "
    "threshold recipe)",
)
def q_leakage_safe_split_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import near_dup_resolve
    from ..operators.shard import _shuffle_key

    resolved = near_dup_resolve(
        _t(spark, sf_dir, "documents"), threshold=0.5, method="exact"
    ).select("doc_id", "canonical_id")
    u16 = F.conv(
        F.substring(_shuffle_key("canonical_id", 42), 9, 4), 16, 10
    ).cast("long")
    return resolved.select(
        "doc_id",
        "canonical_id",
        F.when(u16 < 0.8 * 65536, F.lit("train"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


@_register(
    "near_dup_keep_best",
    # Same recursive-CTE component walk as near_dup_resolve, then the
    # keep-best policy: highest n_chars per cluster, ties to min id.
    r"""WITH RECURSIVE
       t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
             FROM documents),
       sh AS (SELECT DISTINCT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
              FROM t, UNNEST(generate_series(1, greatest(len(toks) - 2, 0)))
                   AS u(i)),
       sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       p0 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
              FROM sh a JOIN sh b
                ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
       pairs AS (SELECT p.doc_a, p.doc_b FROM p0 p
                 JOIN sizes sa ON p.doc_a = sa.doc_id
                 JOIN sizes sb ON p.doc_b = sb.doc_id
                 WHERE round(CAST(p.n_common AS DOUBLE)
                             / (sa.n_sh + sb.n_sh - p.n_common), 4) >= 0.5),
       edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
                 UNION SELECT doc_b, doc_a FROM pairs),
       reach(node, r) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT e.d, reach.r FROM reach JOIN edges e ON e.s = reach.node),
       m AS (SELECT node AS doc_id, min(r) AS canonical_id
             FROM reach GROUP BY node),
       sel AS (SELECT m.canonical_id, d.doc_id, d.n_chars,
                      row_number() OVER (PARTITION BY m.canonical_id
                                         ORDER BY d.n_chars DESC, d.doc_id)
                          AS rn,
                      count(*) OVER (PARTITION BY m.canonical_id)
                          AS n_members
               FROM m JOIN documents d ON d.doc_id = m.doc_id)
       SELECT canonical_id, doc_id AS kept_doc_id,
              CAST(n_members AS BIGINT) AS n_members
       FROM sel WHERE rn = 1""",
    doc="canonical-doc selection after near-dup resolution: keep the "
    "LONGEST member of each duplicate cluster (ties to min id) — the "
    "keep-best-quality policy of production dedup (CCNet/SemDeDup), "
    "computed as one struct-max hash agg, no window sort "
    "(operators/dedup.py::keep_best_per_cluster)",
)
def q_near_dup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import keep_best_per_cluster, near_dup_resolve

    docs = _t(spark, sf_dir, "documents")
    resolved = near_dup_resolve(docs, threshold=0.5, method="exact")
    return keep_best_per_cluster(docs, resolved, "n_chars")


@_register(
    "near_dup_resolve_banded",
    # Same exact recursive-CTE oracle as near_dup_resolve: the banded
    # candidate stage is oracle-verified equal to the exact pair set
    # every round (minhash_banded_pairs passes the all-pairs Jaccard
    # oracle — 16-band/8-row recall at the corpus's planted s>=0.5
    # near-dups is ~1), so the resolution over banded pairs must equal
    # the exact resolution; a banding recall failure now surfaces as
    # an oracle mismatch instead of being assumed away.
    r"""WITH RECURSIVE
       t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
             FROM documents),
       sh AS (SELECT DISTINCT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
              FROM t, UNNEST(generate_series(1, greatest(len(toks) - 2, 0)))
                   AS u(i)),
       sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       p0 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
              FROM sh a JOIN sh b
                ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
       pairs AS (SELECT p.doc_a, p.doc_b FROM p0 p
                 JOIN sizes sa ON p.doc_a = sa.doc_id
                 JOIN sizes sb ON p.doc_b = sb.doc_id
                 WHERE round(CAST(p.n_common AS DOUBLE)
                             / (sa.n_sh + sb.n_sh - p.n_common), 4) >= 0.5),
       edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
                 UNION SELECT doc_b, doc_a FROM pairs),
       reach(node, r) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT e.d, reach.r FROM reach JOIN edges e ON e.s = reach.node)
       SELECT node AS doc_id, min(r) AS canonical_id,
              node = min(r) AS keep
       FROM reach GROUP BY node""",
    doc="near-dup resolution over banded-MinHash pairs — the 100 TB "
    "path; oracled against the EXACT-pair resolution because the "
    "banded candidate set is itself oracle-equal to the exact pair "
    "set (operators/dedup.py::near_dup_resolve method='banded')",
)
def q_near_dup_resolve_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import near_dup_resolve

    return near_dup_resolve(
        _t(spark, sf_dir, "documents"), threshold=0.5, method="banded"
    )


@_register(
    "minhash_estimate_calibration",
    # Fully portable estimator check: md5-salted slot hashes, string
    # min — the oracle recomputes signature, estimate AND exact
    # Jaccard end-to-end, certifying the MinHash estimator math
    # cross-engine (the xxhash64 production path trades that for
    # speed). Estimates are exact multiples of 1/16 (dyadic — display
    # rounding is representation-exact in both engines).
    r"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                  FROM documents),
       sh AS (SELECT DISTINCT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
              FROM t, UNNEST(generate_series(1, greatest(len(toks) - 2, 0)))
                   AS u(i)),
       sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       sig AS (SELECT doc_id, s.i,
                      min(md5(CAST(s.i AS VARCHAR) || '-' || shingle)) AS mh
               FROM sh CROSS JOIN UNNEST(generate_series(0, 15)) AS s(i)
               GROUP BY doc_id, s.i),
       p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                    count(*) AS n_common
             FROM sh a JOIN sh b
               ON a.shingle = b.shingle AND a.doc_id < b.doc_id
             GROUP BY 1, 2),
       jac AS (SELECT p.doc_a, p.doc_b,
                      CAST(p.n_common AS DOUBLE)
                          / (sa.n_sh + sb.n_sh - p.n_common) AS j
               FROM p JOIN sizes sa ON p.doc_a = sa.doc_id
                      JOIN sizes sb ON p.doc_b = sb.doc_id
               WHERE CAST(p.n_common AS DOUBLE)
                     / (sa.n_sh + sb.n_sh - p.n_common) >= 0.3),
       est AS (SELECT j.doc_a, j.doc_b, j.j,
                      sum(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) / 16.0
                          AS e
               FROM jac j JOIN sig x ON x.doc_id = j.doc_a
                          JOIN sig y ON y.doc_id = j.doc_b AND y.i = x.i
               GROUP BY 1, 2, 3)
       SELECT doc_a, doc_b, round(j, 4) AS jaccard,
              round(e, 4) AS estimate
       FROM est""",
    doc="MinHash estimator calibration: per near-dup pair (exact "
    "Jaccard >= 0.3), the 16-slot md5-MinHash estimate next to the "
    "exact value — the signature-width adequacy readout "
    "(sd = sqrt(J(1-J)/16)); estimator math certified cross-engine "
    "(operators/dedup.py::minhash_estimate_calibration)",
)
def q_minhash_estimate_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.dedup import minhash_estimate_calibration

    return minhash_estimate_calibration(
        _t(spark, sf_dir, "documents"), threshold=0.3, n_hashes=16
    )


@_register(
    "simhash_near_dup_pairs",
    None,  # engine-specific xxhash64 simhashes → rows-only; pigeonhole
    # exactness (recall 1 vs brute-force hamming) tested in
    # tests/test_dedup_ann.py
    doc="SimHash near-dup pairs: block-decomposition candidates "
    "(recall 1 by pigeonhole) + bit_count(xor) verify "
    "(operators/dedup.py::simhash_near_dup_pairs)",
)
def q_simhash_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import simhash_near_dup_pairs

    return simhash_near_dup_pairs(_t(spark, sf_dir, "documents"), max_hamming=5)


@_register(
    "minhash_near_dup_pairs",
    None,  # approximate (LSH) → rows-only; exact reference above
    doc="MinHash LSH near-dup candidates at scale "
    "(operators/dedup.py::minhash_near_dup_pairs)",
)
def q_minhash_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_near_dup_pairs

    return minhash_near_dup_pairs(_t(spark, sf_dir, "documents"), threshold=0.5)


@_register(
    "minhash_lsh_verified_pairs",
    # Exact all-pairs Jaccard oracle (same SQL as minhash_banded_pairs):
    # the LSH stage only GENERATES candidates at a slackened threshold;
    # exact-Jaccard verification makes the output false-positive-free,
    # and the 8-table OR-amplified recall at the corpus's planted
    # s>=0.9 near-dups is 1-(1-s)^8 ~ 1-1e-8 — a hash mismatch here IS
    # a recall failure, surfaced by the oracle instead of assumed.
    r"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                  FROM documents),
       sh AS (SELECT DISTINCT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
              FROM t, UNNEST(generate_series(1, greatest(len(toks) - 2, 0)))
                   AS u(i)),
       sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                        count(*) AS n_common
                 FROM sh a JOIN sh b
                   ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                 GROUP BY 1, 2)
       SELECT p.doc_a, p.doc_b,
              round(CAST(p.n_common AS DOUBLE)
                    / (sa.n_sh + sb.n_sh - p.n_common), 4) AS jaccard
       FROM pairs p
       JOIN sizes sa ON p.doc_a = sa.doc_id
       JOIN sizes sb ON p.doc_b = sb.doc_id
       WHERE round(CAST(p.n_common AS DOUBLE)
                   / (sa.n_sh + sb.n_sh - p.n_common), 4) >= 0.5""",
    doc="MLlib MinHashLSH candidates + exact-Jaccard verify — the "
    "LSH-then-verify production dedup shape, oracle-checkable "
    "(operators/dedup.py::minhash_lsh_verified_pairs). Measured 13.3s "
    "vs 1.9s for minhash_banded_pairs at sf0.1: MLlib's "
    "approxSimilarityJoin explodes per-table hash buckets where the "
    "banded path joins on one band key — this entry exists to cover "
    "(and price) the MLlib surface; banded is the scale path",
)
def q_minhash_lsh_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_lsh_verified_pairs

    return minhash_lsh_verified_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.5
    )


@_register(
    "fingerprint_dedup",
    r"""SELECT CAST(min(doc_id) AS BIGINT) AS doc_id,
              CAST(count(*) AS BIGINT) AS n_copies
       FROM documents
       GROUP BY md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))""",
    doc="64-bit normalized-content fingerprints "
    "(operators/textstats.py::fingerprint64). The GROUPING runs on the "
    "production xxhash64 fingerprint; the ORACLED output is the "
    "hash-agnostic dedup structure (keeper doc_id, multiplicity) — "
    "identical under any collision-free fingerprint, so DuckDB "
    "reproduces it by grouping on an md5 of the same normalization "
    "(fp values themselves stay engine-internal; fingerprint_dedup_md5 "
    "is the twin that exposes them)",
)
def q_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textstats import fingerprint64

    d = _t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", fingerprint64("text").alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("doc_id", "n_copies")
    )


@_register(
    "knn_cosine_topk",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
       q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
       SELECT e.vec_id,
              round(list_dot_product(e.v, q.qv)
                    / (sqrt(list_dot_product(e.v, e.v))
                       * sqrt(list_dot_product(q.qv, q.qv))), 4) AS cosine
       FROM e, q WHERE e.vec_id <> 0
       ORDER BY cosine DESC, e.vec_id LIMIT 5""",
    doc="brute-force cosine top-k, single query "
    "(operators/similarity.py::cosine_topk)",
)
def q_knn_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import cosine_topk

    return cosine_topk(_t(spark, sf_dir, "embeddings"), query_id=0, k=5)


@_register(
    "knn_cosine_batch",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
       q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
       scored AS (
         SELECT q.query_id, e.vec_id AS neighbor_id,
                round(list_dot_product(e.v, q.qv)
                      / (sqrt(list_dot_product(e.v, e.v))
                         * sqrt(list_dot_product(q.qv, q.qv))), 4) AS cosine
         FROM e, q WHERE e.vec_id <> q.query_id)
       SELECT query_id, neighbor_id, cosine FROM scored
       QUALIFY row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, neighbor_id) <= 5""",
    doc="batched brute-force ANN baseline: broadcast queries + ranking "
    "window (operators/similarity.py::cosine_topk_batch)",
)
def q_knn_cosine_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import cosine_topk_batch

    e = _t(spark, sf_dir, "embeddings")
    return cosine_topk_batch(e, e.filter(F.col("vec_id") < 10), k=5)


@_register(
    "knn_label_vote",
    """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
       q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
       scored AS (
         SELECT q.query_id, e.vec_id AS neighbor_id, e.label AS neighbor_label,
                round(list_dot_product(e.v, q.qv)
                      / (sqrt(list_dot_product(e.v, e.v))
                         * sqrt(list_dot_product(q.qv, q.qv))), 4) AS cosine
         FROM e, q WHERE e.vec_id <> q.query_id),
       top5 AS (SELECT * FROM scored
                QUALIFY row_number() OVER (PARTITION BY query_id
                                           ORDER BY cosine DESC, neighbor_id)
                        <= 5),
       votes AS (SELECT query_id, neighbor_label, count(*) AS n_votes
                 FROM top5 GROUP BY 1, 2)
       SELECT query_id, neighbor_label AS predicted_label, n_votes FROM votes
       QUALIFY row_number() OVER (PARTITION BY query_id
                                  ORDER BY n_votes DESC, neighbor_label) = 1""",
    doc="kNN classification by neighbor majority vote — relational "
    "re-expression of the reference's custom kNN "
    "(knn_classification.py:124-164; operators/similarity.py::knn_label_vote)",
)
def q_knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import knn_label_vote

    e = _t(spark, sf_dir, "embeddings")
    return knn_label_vote(e, e.filter(F.col("vec_id") < 10), k=5)


@_register(
    "embedding_norm_stats",
    """SELECT label, count(*) AS n,
              round(avg(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                              CAST(embedding AS DOUBLE[])))), 4)
                  AS avg_norm
       FROM embeddings GROUP BY label""",
    doc="per-label embedding norm profile (functions/columns.py::l2_norm)",
)
def q_embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import l2_norm

    e = _t(spark, sf_dir, "embeddings")
    return e.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(l2_norm("embedding")), 4).alias("avg_norm"),
    )


@_register(
    "k_anonymity_audit_customers",
    # QI = (nation, mktsegment, acctbal rounded to hundreds): the
    # bucketed balance keeps classes realistic — fine enough that some
    # fall below k=5, the violating set the audit must surface.
    """WITH q AS (SELECT c_nationkey,
                         c_mktsegment,
                         CAST(floor(c_acctbal / 100.0) AS BIGINT)
                             AS acctbal_100
                  FROM customer),
       cls AS (SELECT c_nationkey, c_mktsegment, acctbal_100,
                      CAST(count(*) AS BIGINT) AS class_size
               FROM q GROUP BY 1, 2, 3)
       SELECT c_nationkey, c_mktsegment, acctbal_100, class_size,
              class_size AS n_below_k
       FROM cls WHERE class_size < 5""",
    doc="k-anonymity privacy audit (k=5): quasi-identifier equivalence "
    "classes (nation x segment x balance-bucket) small enough to "
    "re-identify — the pre-release check; one hash aggregation, "
    "output bounded by the violating classes "
    "(operators/dq.py::k_anonymity_audit)",
)
def q_k_anonymity_audit_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.dq import k_anonymity_audit

    c = _t(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 100.0)
        .cast("bigint")
        .alias("acctbal_100"),
    )
    return k_anonymity_audit(
        c, ["c_nationkey", "c_mktsegment", "acctbal_100"], k=5
    )


@_register(
    "quantile_normalize_events",
    """WITH pooled AS (
         SELECT value AS norm_value,
                row_number() OVER (ORDER BY value, event_id) AS idx
         FROM events),
       ranked AS (
         SELECT event_id, event_type, value,
                row_number() OVER (PARTITION BY event_type
                                   ORDER BY value, event_id) AS r,
                count(*) OVER (PARTITION BY event_type) AS ng,
                (SELECT count(*) FROM events) AS n
         FROM events)
       SELECT rk.event_id, rk.event_type, rk.value, p.norm_value
       FROM ranked rk
       JOIN pooled p
         ON p.idx = CAST(ceil((rk.r - 0.5) * rk.n / rk.ng) AS BIGINT)""",
    doc="quantile normalization across event types: each value mapped "
    "to the pooled distribution's value at its within-group relative "
    "rank (discrete, no interpolation) — the batch-effect correction "
    "for sources that disagree in scale but should agree in shape; "
    "pooled ranks via layout.global_row_number (range exchange, no "
    "SinglePartition sort), final lookup an integer-rank equi-join "
    "(operators/profile.py::quantile_normalize)",
)
def q_quantile_normalize_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.profile import quantile_normalize

    return quantile_normalize(
        _t(spark, sf_dir, "events"), "event_type", "value", "event_id"
    )


@_register(
    "loo_target_encoding_orders",
    # exact-decimal numerator: float window sums differ in the last
    # ulps across engines, which /n exposes at round-6.
    """SELECT o_orderkey,
              round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                             OVER (PARTITION BY o_orderpriority)
                         - CAST(o_totalprice AS DECIMAL(18,6))
                         AS DOUBLE)
                    / (count(*) OVER (PARTITION BY o_orderpriority) - 1),
                    6) AS te
       FROM orders""",
    doc="leave-one-out target encoding: each order's priority encoded "
    "as the mean totalprice of the OTHER orders in its priority — the "
    "leakage-safe mean encoding tabular ML ships (plain mean encoding "
    "leaks the row's own label); one category shuffle, closed-form "
    "windows (ml/features.py::loo_target_encoding)",
)
def q_loo_target_encoding_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..ml.features import loo_target_encoding

    return loo_target_encoding(
        _t(spark, sf_dir, "orders"), "o_orderpriority", "o_totalprice"
    ).select("o_orderkey", "te")


@_register(
    "hashed_features_docs",
    r"""WITH tok AS (
         SELECT doc_id, t AS token
         FROM (SELECT doc_id,
                      unnest(string_split_regex(trim(text), '\s+')) AS t
               FROM documents)
         WHERE t <> ''),
       h AS (SELECT doc_id,
                    CAST(CAST('0x' || substr(md5('42-' || token), 1, 4)
                              AS BIGINT) % 16 AS INT) AS dim,
                    CASE WHEN CAST('0x' || substr(md5('42-' || token), 5, 1)
                              AS BIGINT) % 2 = 0
                         THEN 1 ELSE -1 END AS s
             FROM tok)
       SELECT doc_id, dim, CAST(sum(s) AS BIGINT) AS value
       FROM h GROUP BY doc_id, dim
       HAVING sum(s) <> 0""",
    doc="hashing-trick featurizer (HashingVectorizer analog): signed "
    "md5 bucket per token, summed per (doc, bucket) — fixed-width "
    "bag-of-words with NO vocabulary pass, engine-exact sparse "
    "output (ml/features.py::hashed_features)",
)
def q_hashed_features_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ml.features import hashed_features

    return hashed_features(
        _t(spark, sf_dir, "documents"), "doc_id", "text", dim=16
    )


@_register(
    "video_frame_diff_energy",
    # mean |frame_t − frame_{t−1}| per clip: integer pixel diffs are
    # exact and the mean divides by 16*16*3 = 768 — deterministic on
    # both engines; the oracle recomputes from the pixel formula.
    # S/768 is DYADIC, so means land exactly on .xxxxxx5 half-points
    # (caught live: 15.6953125) — the kernels round with numpy
    # (banker's), so the oracles use DuckDB round_even, not round.
    """WITH px AS (
         SELECT d.doc_id, t.i AS t, r.i AS r, c.i AS c, ch.i AS ch,
                CAST((d.doc_id * 7 + t.i * 13 + r.i * 3 + c.i * 5
                      + ch.i * 11) % 256 AS DOUBLE) AS v
         FROM documents d,
              UNNEST(generate_series(0, 3)) AS t(i),
              UNNEST(generate_series(0, 15)) AS r(i),
              UNNEST(generate_series(0, 15)) AS c(i),
              UNNEST(generate_series(0, 2)) AS ch(i)
         WHERE d.doc_id < 200),
       d2 AS (SELECT a.doc_id, a.t AS frame_id, abs(a.v - b.v) AS dv
              FROM px a JOIN px b
                ON a.doc_id = b.doc_id AND b.t = a.t - 1
               AND a.r = b.r AND a.c = b.c AND a.ch = b.ch)
       SELECT doc_id, CAST(frame_id AS INT) AS frame_id,
              round_even(avg(dv), 6) AS diff_energy
       FROM d2 GROUP BY doc_id, frame_id""",
    doc="codec-free video analytics: temporal frame-difference energy "
    "(the scene-change detector core) over raw concatenated RGB "
    "frames, map-only mapInPandas; byte layout, temporal indexing and "
    "the |diff| reduction value-verified from the pixel formula "
    "(operators/multimodal.py::frame_diff_energy, synth_rgb_frames)",
)
def q_video_frame_diff_energy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.multimodal import frame_diff_energy, synth_rgb_frames

    clips = synth_rgb_frames(
        _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200),
        "doc_id",
        n_frames=4,
        width=16,
        height=16,
    )
    return frame_diff_energy(
        clips, n_frames=4, width=16, height=16, id_col="doc_id"
    )


@_register(
    "image_resize_patch_stats",
    # Nearest-neighbor resize 32x32 -> 16x16 then one 16x16 patch:
    # resized pixel (r, c) = source (2r, 2c), so the oracle evaluates
    # the pixel formula AT THE MAPPED coordinates — index math, byte
    # re-pack and the downstream reductions all verified.
    """WITH px AS (
         SELECT d.doc_id, r.i AS r, c.i AS c,
                CAST((d.doc_id * 7 + (r.i * 2) * 3 + (c.i * 2) * 5
                      + ch.i * 11) % 256 AS DOUBLE) AS v
         FROM documents d,
              UNNEST(generate_series(0, 15)) AS r(i),
              UNNEST(generate_series(0, 15)) AS c(i),
              UNNEST(generate_series(0, 2)) AS ch(i)
         WHERE d.doc_id < 200)
       SELECT doc_id, CAST(0 AS INT) AS patch_id,
              round_even(avg(v), 6) AS mean,
              round_even(sqrt(avg(v * v) - avg(v) * avg(v)), 6) AS std
       FROM px GROUP BY doc_id""",
    doc="decode-free image resize: nearest-neighbor on raw RGB buffers "
    "(pure index math, no codec) composed with the patch reducer; the "
    "oracle evaluates the pixel formula at the mapped source "
    "coordinates (operators/multimodal.py::resize_raw_rgb)",
)
def q_image_resize_patch_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.multimodal import (
        extract_patches,
        resize_raw_rgb,
        synth_rgb,
    )

    imgs = synth_rgb(
        _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200),
        "doc_id",
        width=32,
        height=32,
    )
    small = resize_raw_rgb(imgs, 32, 32, 16, 16, id_col="doc_id")
    return extract_patches(
        small, width=16, height=16, patch=16, id_col="doc_id"
    )


@_register(
    "image_patch_stats_synthetic",
    # Upgrades the ViT patch path from rows-only to a full value
    # oracle: pixels come from a SQL-reproducible formula, so DuckDB
    # recomputes every patch mean/std from first principles — any
    # byte-pack, strided-reshape or reduction error on the Spark side
    # mismatches. Integer pixels sum exactly in doubles; the std
    # formulations (numpy two-pass vs avg(v²)−avg(v)²) agree far
    # inside round-6.
    """WITH px AS (
         SELECT d.doc_id, r.i AS r, c.i AS c,
                CAST((d.doc_id * 7 + r.i * 3 + c.i * 5 + ch.i * 11) % 256
                     AS DOUBLE) AS v
         FROM documents d,
              UNNEST(generate_series(0, 31)) AS r(i),
              UNNEST(generate_series(0, 31)) AS c(i),
              UNNEST(generate_series(0, 2)) AS ch(i)
         WHERE d.doc_id < 200),
       p AS (SELECT doc_id,
                    CAST((r // 16) * 2 + (c // 16) AS INT) AS patch_id, v
             FROM px)
       SELECT doc_id, patch_id,
              round_even(avg(v), 6) AS mean,
              round_even(sqrt(avg(v * v) - avg(v) * avg(v)), 6) AS std
       FROM p GROUP BY doc_id, patch_id""",
    doc="ViT patch-embedding prep with a FULL value oracle: raw-RGB "
    "payloads synthesized from a pixel formula (numpy uint8 pack), "
    "then extract_patches' strided block reshape + per-patch mean/std "
    "— byte layout, patch grid order and reductions all cross-engine "
    "verified (operators/multimodal.py::extract_patches, synth_rgb)",
)
def q_image_patch_stats_synthetic(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.multimodal import extract_patches, synth_rgb

    imgs = synth_rgb(
        _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200),
        "doc_id",
        width=32,
        height=32,
    )
    return extract_patches(imgs, width=32, height=32, patch=16, id_col="doc_id")


@_register(
    "audio_frame_features_docs",
    # The oracle recomputes the features from the SAMPLE FORMULA
    # (no byte decoding in SQL): sample i of clip k is
    # ((k*31 + i*17) % 65536) - 32768. Integers are exact in doubles,
    # frame mean divides by 2^8 (exact), sqrt is IEEE-correct — so any
    # byte-pack/decode/framing error on the Spark side mismatches.
    """WITH s AS (SELECT d.doc_id, u.i AS i,
                         CAST(((d.doc_id * 31 + u.i * 17) % 65536) - 32768
                              AS DOUBLE) AS v
                  FROM documents d,
                       UNNEST(generate_series(0, 1023)) AS u(i)
                  WHERE d.doc_id < 200),
       fr AS (SELECT doc_id, CAST(i // 256 AS INT) AS frame_id, i, v,
                     lag(v) OVER (PARTITION BY doc_id, i // 256
                                  ORDER BY i) AS pv
              FROM s)
       SELECT doc_id, frame_id,
              round(sqrt(avg(v * v)), 6) AS rms,
              round(sum(CASE WHEN pv IS NOT NULL
                             AND ((v < 0) <> (pv < 0))
                        THEN 1 ELSE 0 END) / 255.0, 6) AS zcr
       FROM fr GROUP BY doc_id, frame_id""",
    doc="REAL audio DSP over opaque binary payloads: deterministic "
    "PCM16LE synthesis (numpy int16 -> little-endian bytes), then "
    "frame-level RMS + zero-crossing rate via a map-only mapInPandas "
    "kernel (bytes -> int16 dtype view -> reshape -> vectorized "
    "reductions); the oracle recomputes both features from the sample "
    "formula, verifying byte pack, decode, framing and math "
    "end-to-end (operators/multimodal.py::audio_frame_features, "
    "synth_pcm16)",
)
def q_audio_frame_features_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.multimodal import audio_frame_features, synth_pcm16

    clips = synth_pcm16(
        _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200),
        "doc_id",
        n_samples=1024,
    )
    return audio_frame_features(clips, id_col="doc_id", frame=256)


@_register(
    "multimodal_byte_stats",
    """SELECT doc_id, octet_length(encode(text)) AS n_bytes
       FROM documents""",
    doc="opaque-binary plumbing check: byte length of the encoded "
    "payload (operators/multimodal.py treats media as binary columns)",
)
def q_multimodal_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", F.octet_length("text").alias("n_bytes"))


@_register(
    "lsh_ann_candidates",
    # Candidate-SUPERSET certification: the output is the exact top-5
    # (oracle below computes it from scratch) annotated with whether
    # each true neighbor appeared in the LSH candidate set — the
    # oracle asserts in_candidates=TRUE for all five, so a bucket miss
    # (recall failure of the approximate stage) surfaces as a driver
    # hash mismatch instead of living behind a rows-only check.
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
       q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
       SELECT e.vec_id,
              round(list_dot_product(e.v, q.qv)
                    / (sqrt(list_dot_product(e.v, e.v))
                       * sqrt(list_dot_product(q.qv, q.qv))), 4) AS cosine,
              TRUE AS in_candidates
       FROM e, q WHERE e.vec_id <> 0
       ORDER BY cosine DESC, e.vec_id LIMIT 5""",
    doc="BucketedRandomProjectionLSH candidate stage, certified as a "
    "SUPERSET of the exact top-5: LSH prunes the unit-normalized "
    "corpus to 50 candidates, the exact top-5 is computed "
    "independently (Catalyst brute force), and each true neighbor is "
    "flagged in/out of the candidate set "
    "(operators/similarity.py::lsh_topk_candidates)",
)
def q_lsh_ann_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import (
        _unit_normalized,
        cosine_topk,
        lsh_topk_candidates,
    )

    e = _t(spark, sf_dir, "embeddings")
    unit = _unit_normalized(e, "embedding")
    cand = lsh_topk_candidates(
        unit,
        query_id=0,
        k=50,
        vec_col="_unit",
        bucket_length=1.0,
        num_hash_tables=16,
    ).select("vec_id", F.lit(True).alias("_hit"))
    exact = cosine_topk(e, query_id=0, k=5)
    return exact.join(F.broadcast(cand), "vec_id", "left").select(
        "vec_id",
        "cosine",
        F.coalesce(F.col("_hit"), F.lit(False)).alias("in_candidates"),
    )


@_register(
    "lsh_ann_batch",
    # Exact batch top-5 oracle (the knn_cosine_batch shape): the LSH
    # stage only generates same-bucket candidate PAIRS; the exact
    # cosine re-rank makes the output identical to brute force
    # whenever every true neighbor collides in ≥1 of 16 hash tables
    # (miss ~1e-6 on the unit sphere at w=1.0) — so the oracle is a
    # standing batch-recall assertion, verified at sf0.001/0.01/0.1.
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
       q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
       scored AS (
         SELECT q.query_id, e.vec_id AS neighbor_id,
                round(list_dot_product(e.v, q.qv)
                      / (sqrt(list_dot_product(e.v, e.v))
                         * sqrt(list_dot_product(q.qv, q.qv))), 4) AS cosine
         FROM e, q WHERE e.vec_id <> q.query_id)
       SELECT query_id, neighbor_id, cosine FROM scored
       QUALIFY row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, neighbor_id) <= 5""",
    doc="batch ANN with exact re-rank: approxSimilarityJoin between a "
    "query SET and the corpus (unit-normalized, 16 hash tables) "
    "generates candidate pairs, exact cosine re-ranks per query "
    "(operators/similarity.py::lsh_ann_batch_verified); the raw "
    "candidate join without verify is lsh_ann_batch in the same "
    "module, recall-pinned in tests/test_similarity_ann.py",
)
def q_lsh_ann_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import lsh_ann_batch_verified

    e = _t(spark, sf_dir, "embeddings")
    return lsh_ann_batch_verified(e, e.filter(F.col("vec_id") < 10), k=5)


@_register(
    "lsh_ann_verified_topk",
    # Exact top-k oracle (same SQL as knn_cosine_topk): LSH only
    # PRUNES the corpus to k*overfetch candidates; the exact cosine
    # re-rank makes the output identical to brute force whenever the
    # true top-k survive pruning — so the oracle doubles as a standing
    # recall@5 assertion on the approximate stage.
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
       q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
       SELECT e.vec_id,
              round(list_dot_product(e.v, q.qv)
                    / (sqrt(list_dot_product(e.v, e.v))
                       * sqrt(list_dot_product(q.qv, q.qv))), 4) AS cosine
       FROM e, q WHERE e.vec_id <> 0
       ORDER BY cosine DESC, e.vec_id LIMIT 5""",
    doc="ANN serving pattern: LSH candidate prune + exact cosine "
    "re-rank, top-5 for query 0 "
    "(operators/similarity.py::lsh_ann_verified_topk)",
)
def q_lsh_ann_verified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import lsh_ann_verified_topk

    return lsh_ann_verified_topk(
        _t(spark, sf_dir, "embeddings"), query_id=0, k=5
    )


@_register(
    "pq_ann_verified_topk",
    # Exact top-k oracle for query 1: PQ-ADC only PRUNES the corpus
    # to k*overfetch candidates; the exact cosine re-rank makes the
    # output identical to brute force whenever the true top-k survive
    # the prune — a quantization recall failure surfaces as a hash
    # mismatch (verified exact-equal at sf0.001/0.01/0.1; this
    # near-uniform corpus is the worst case for PQ, hence the high
    # overfetch).
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
       q AS (SELECT v AS qv FROM e WHERE vec_id = 1)
       SELECT e.vec_id,
              round(list_dot_product(e.v, q.qv)
                    / (sqrt(list_dot_product(e.v, e.v))
                       * sqrt(list_dot_product(q.qv, q.qv))), 4) AS cosine
       FROM e, q WHERE e.vec_id <> 1
       ORDER BY cosine DESC, e.vec_id LIMIT 5""",
    doc="product-quantization ANN with exact re-rank: per-subspace "
    "k-means++ codebooks fit on the count-capped driver-sized sample "
    "(FAISS idiom; concurrent-MLlib fit_mode kept for larger samples), "
    "map-only Arrow-batched BLAS encode to m-code words (einsum argmin "
    "per batch; JVM struct-min expression twin pinned code-identical "
    "in tests), asymmetric-distance "
    "prune via a query LUT riding the plan as literals, exact cosine "
    "re-rank on the k*overfetch survivors — the memory-bounded ANN "
    "tier: a 100 TB float corpus becomes an m-bytes/vector code table "
    "(operators/similarity.py::pq_ann_verified_topk, pq_train, "
    "pq_encode)",
)
def q_pq_ann_verified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import pq_ann_verified_topk

    return pq_ann_verified_topk(
        _t(spark, sf_dir, "embeddings"), query_id=1, k=5
    )


@_register(
    "embedding_near_dup_pairs",
    """SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
              round(list_cosine_similarity(a.embedding, b.embedding), 4)
                  AS cosine
       FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.42""",
    doc="embedding-cosine near-dup pairs, exact upper-triangle form "
    "(operators/similarity.py::embedding_near_dup_pairs); the LSH "
    "variant below is the at-scale candidate generator",
)
def q_embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import embedding_near_dup_pairs

    return embedding_near_dup_pairs(
        _t(spark, sf_dir, "embeddings"), threshold=0.42, method="exact"
    )


@_register(
    "embedding_near_dup_pairs_lsh",
    # Same exact all-pairs oracle as the exact twin: the LSH stage
    # only generates candidates within the cosine↔L2 radius on the
    # unit-norm corpus, and the exact-cosine filter on candidates
    # admits no false positives — so the output equals the exact pair
    # set unless a bucket miss drops a true pair, which now surfaces
    # as an oracle mismatch instead of being assumed away (verified
    # set-equal at sf0.001/0.01/0.1).
    """SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
              round(list_cosine_similarity(a.embedding, b.embedding), 4)
                  AS cosine
       FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.42""",
    doc="embedding-cosine near-dup pairs via approxSimilarityJoin "
    "candidates + exact-cosine verify (no false positives); oracled "
    "against the exact all-pairs set — a recall failure of the LSH "
    "stage is a surfaced mismatch, not an assumption. The degenerate "
    "bucket regime is guarded: a linear-cost fanout probe runs before "
    "the candidate join, and at this registered threshold (0.42, "
    "fanout ~250 > cap 64) it redirects to the exact BLAS tier with a "
    "RuntimeWarning instead of executing an ~all-pairs join "
    "(operators/similarity.py::embedding_near_dup_pairs method='lsh')",
)
def q_embedding_near_dup_pairs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import embedding_near_dup_pairs

    return embedding_near_dup_pairs(
        _t(spark, sf_dir, "embeddings"), threshold=0.42, method="lsh"
    )


@_register(
    "embedding_near_dup_pairs_blas",
    """SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
              round(list_cosine_similarity(a.embedding, b.embedding), 4)
                  AS cosine
       FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.42""",
    doc="exact all-pairs cosine as a broadcast matrix product: "
    "mapInPandas chunk @ corpus.T, one BLAS call per batch, map-only "
    "(operators/similarity.py::_embedding_pairs_blas) — same oracle "
    "as the expression form, ~50x faster at sf0.1",
)
def q_embedding_near_dup_pairs_blas(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import embedding_near_dup_pairs

    return embedding_near_dup_pairs(
        _t(spark, sf_dir, "embeddings"), threshold=0.42, method="blas"
    )


@_register(
    "embedding_near_dup_resolve",
    """WITH RECURSIVE
       pairs AS (
         SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
         FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.42),
       edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
                 UNION SELECT doc_b, doc_a FROM pairs),
       reach(node, r) AS (
           SELECT vec_id, vec_id FROM embeddings
           UNION
           SELECT e.d, reach.r FROM reach JOIN edges e ON e.s = reach.node)
       SELECT node AS vec_id, min(r) AS canonical_id,
              node = min(r) AS keep
       FROM reach GROUP BY node""",
    doc="embedding near-dup RESOLUTION: connected components over "
    "cosine pairs -> deterministic min-id survivor "
    "(operators/similarity.py::embedding_near_dup_resolve)",
)
def q_embedding_near_dup_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import embedding_near_dup_resolve

    # blas pair generation: exact semantics (parity-tested), so the
    # recursive-CTE oracle over exact pairs still applies
    return embedding_near_dup_resolve(
        _t(spark, sf_dir, "embeddings"), threshold=0.42, method="blas"
    )


@_register(
    "ivf_cell_assignment",
    None,  # KMeans-dependent → rows-only
    doc="IVF coarse quantizer cell assignment; fit runs on a seeded "
    "capped sample (operators/similarity.py::ivf_assign)",
)
def q_ivf_cell_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf_assign

    return ivf_assign(_t(spark, sf_dir, "embeddings"), n_cells=8)


@_register(
    "ivf_search",
    # Containment certificate as a VALUE oracle (promoted from
    # rows-only in r10): the output is the exact top-5 computed by an
    # INDEPENDENT brute-force scan, annotated with membership in the
    # triangle-inequality-certified probe set. The certificate proves
    # every true neighbor is inside that set — fit-INdependent — so
    # the oracle asserts TRUE constants (the lsh_ann_candidates
    # pattern, backed by a proof instead of a collision probability);
    # a certificate bug shows up as a FALSE flag = hash mismatch. The
    # raw fixed-nprobe approximate search stays available as
    # operators/similarity.py::ivf_search with its recall pins in
    # tests/test_dedup_ann.py (un-oracle-able by nature: a miss is
    # silent and the corpus is near-uniform).
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
       q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
       SELECT e.vec_id,
              round(sqrt(list_sum(list_transform(
                        generate_series(1, len(e.v)),
                        i -> (e.v[i] - q.qv[i]) ^ 2))), 4) AS dist,
              TRUE AS in_certified_probe
       FROM e, q WHERE e.vec_id <> 0
       ORDER BY dist, e.vec_id LIMIT 5""",
    doc="IVF probe containment certificate: independent exact top-5 "
    "(brute scan, same (a-b)^2 fold both engines) flagged with "
    "membership in the certified probe set — provably all TRUE by "
    "the triangle-inequality bound, so the flag is a standing "
    "certificate check, not a recall gamble "
    "(operators/similarity.py::ivf_probe_containment_check)",
)
def q_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf_probe_containment_check

    return ivf_probe_containment_check(
        _t(spark, sf_dir, "embeddings"),
        query_id=0,
        k=5,
        nprobe_initial=2,
        n_cells=8,
    )


# =====================================================================
# ML operators (SURVEY §2.8-2.9) bound to the driver tables. Training
# happens inside the builder (eager fit, lazy transform); metrics are
# returned as DataFrames. Model-dependent outputs are rows-only — the
# golden-tolerance ML tests live in tests/test_ml.py (SURVEY §5.2).
# =====================================================================


@_register(
    "ml_rf_lineitem_metrics",
    None,  # model-dependent → rows-only; metric parity tested in tests/test_ml.py
    doc="RandomForest M5/M9/E1/E2: predict l_returnflag from quantity/"
    "price/discount/ship-year; one-row metrics frame (ml/rf.py). NOTE: "
    "testdata l_returnflag is uniformly random (verified independent "
    "of all features) so ~0.33 accuracy is the correct result here; "
    "learnability goldens run on the seeded accidents fixture "
    "(tests/test_ml.py::test_rf_severity_pipeline, acc > 0.70)",
)
def q_ml_rf_lineitem_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ml.features import assemble_and_scale
    from ..ml.metrics import evaluate_classifier
    from ..ml.rf import RFParams, train_rf
    from ..operators.sample import deterministic_split

    li = _t(spark, sf_dir, "lineitem").select(
        F.concat_ws("-", "l_orderkey", "l_linenumber").alias("id"),
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        F.year("l_shipdate").cast("double").alias("ship_year"),
        F.when(F.col("l_returnflag") == "N", 0.0)
        .when(F.col("l_returnflag") == "A", 1.0)
        .otherwise(2.0)
        .alias("label"),
    )
    feats = ["l_quantity", "l_extendedprice", "l_discount", "l_tax", "ship_year"]
    feat, _ = assemble_and_scale(li, feats, with_mean=False)
    train, test = deterministic_split(feat, "id", 0.25)
    model = train_rf(train, RFParams(num_trees=20, max_depth=6))
    m = evaluate_classifier(model.transform(test))
    return spark.createDataFrame(
        [
            (
                round(m["accuracy"], 4),
                round(m["precision"], 4),
                round(m["recall"], 4),
                round(m["f1"], 4),
            )
        ],
        "accuracy double, precision double, recall double, f1 double",
    )


@_register(
    "ml_kmeans_customer_clusters",
    None,  # model-dependent → rows-only
    doc="KMeans M7/M10/A2: cluster customers on scaled (acctbal, "
    "nationkey); per-cluster stats frame (ml/kmeans.py)",
)
def q_ml_kmeans_customer_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ml.features import assemble_and_scale
    from ..ml.kmeans import cluster_stats, fit_kmeans

    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_acctbal").cast("double").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    )
    feat, _ = assemble_and_scale(c, ["acctbal", "nationkey"])
    model = fit_kmeans(feat, k=4, max_iter=20)
    pred = model.transform(feat)
    return cluster_stats(pred, stat_cols=["acctbal"]).orderBy("cluster")


@_register(
    "ml_knn_embedding_predictions",
    None,  # pandas_udf model path → rows-only; exact-formulation parity
    # is tested in tests/test_ml.py::test_knn_pandas_udf_matches_exact
    doc="vectorized broadcast-kNN J1/M8: pandas_udf BLAS distance "
    "matrix, the reference's custom operator done right (ml/knn.py)",
)
def q_ml_knn_embedding_predictions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ml.knn import knn_predict

    e = _t(spark, sf_dir, "embeddings")
    train = e.filter(F.col("vec_id") >= 100)
    test = e.filter(F.col("vec_id") < 100)
    return knn_predict(
        test, train, k=5, features_col="embedding", label_col="label"
    ).select("vec_id", "prediction")


# =====================================================================
# Structured Streaming (SURVEY §2.10 extension): the windowed
# aggregation runs as a REAL streaming query (file source → watermark →
# tumbling window → memory sink, driven to completion) and, because the
# bounded input arrives in one micro-batch, its result equals the batch
# time-bucket aggregate — which is the DuckDB oracle.
# =====================================================================


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table as a file STREAM — dtype-adaptive exactly like
    ``_t``: the ``ts`` encoding (nanos-as-long vs native timestamp) is
    probed from a batch read, never assumed (streaming/windows.py::
    adaptive_ts_stream)."""
    from ..streaming import adaptive_ts_stream

    return adaptive_ts_stream(spark, sf_dir, glob_filter="events.parquet")


@_register(
    "streaming_windowed_counts",
    """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
              time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour'
                  AS window_end,
              event_type, count(*) AS n, round(sum(value), 2) AS sum_value
       FROM events GROUP BY 1, 2, 3""",
    doc="real streaming query: readStream → withWatermark → tumbling "
    "window agg → memory sink (streaming/windows.py)",
)
def q_streaming_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming import run_windowed_batch, windowed_counts

    events = _events_stream(spark, sf_dir)
    agg = windowed_counts(events, window_duration="1 hour", watermark="2 hours")
    out = run_windowed_batch(agg, query_name="windowed_counts_oracle")
    # window bounds are INSTANT timestamps; cast to NTZ under the
    # UTC-pinned session so collect() renders UTC wall-clock on any
    # driver host timezone (instant collect uses the PROCESS-local tz)
    return out.select(
        F.col("window_start").cast("timestamp_ntz").alias("window_start"),
        F.col("window_end").cast("timestamp_ntz").alias("window_end"),
        "event_type",
        "n",
        F.round("sum_value", 2).alias("sum_value"),
    )


@_register(
    "streaming_sliding_counts",
    """SELECT time_bucket(INTERVAL '30 minutes', ts)
                  - i.i * INTERVAL '30 minutes' AS window_start,
              time_bucket(INTERVAL '30 minutes', ts)
                  - i.i * INTERVAL '30 minutes' + INTERVAL '1 hour'
                  AS window_end,
              event_type, count(*) AS n, round(sum(value), 2) AS sum_value
       FROM events CROSS JOIN (SELECT unnest([0, 1]) AS i) i
       GROUP BY 1, 2, 3""",
    doc="real SLIDING-window streaming query (window=1h, slide=30m): "
    "every event lands in exactly window/slide = 2 overlapping "
    "windows, so the batch oracle replicates each row into its two "
    "slide-aligned window starts (time_bucket minus 0/1 slide) and "
    "aggregates (streaming/windows.py::windowed_counts slide path)",
)
def q_streaming_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming import run_windowed_batch, windowed_counts

    events = _events_stream(spark, sf_dir)
    agg = windowed_counts(
        events,
        window_duration="1 hour",
        slide="30 minutes",
        watermark="2 hours",
    )
    out = run_windowed_batch(agg, query_name="sliding_counts_oracle")
    return out.select(
        F.col("window_start").cast("timestamp_ntz").alias("window_start"),
        F.col("window_end").cast("timestamp_ntz").alias("window_end"),
        "event_type",
        "n",
        F.round("sum_value", 2).alias("sum_value"),
    )


@_register(
    "streaming_session_windows",
    """WITH x AS (
         SELECT user_id, event_id, ts,
                CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)
                          > INTERVAL '30 minutes'
                     THEN 1 ELSE 0 END AS brk
         FROM events),
       s AS (
         SELECT user_id, ts,
                sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
         FROM x)
       SELECT min(ts) AS session_start,
              max(ts) + INTERVAL '30 minutes' AS session_end,
              user_id, count(*) AS n_events
       FROM s GROUP BY user_id, sid""",
    doc="streaming session windows: readStream → withWatermark → "
    "F.session_window(gap=30m) → memory sink "
    "(streaming/windows.py::session_window_counts); oracle is the "
    "batch lag/running-sum sessionization — on bounded input the two "
    "formulations must agree exactly",
)
def q_streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming import run_windowed_batch, session_window_counts

    events = _events_stream(spark, sf_dir)
    agg = session_window_counts(events, gap="30 minutes", watermark="2 hours")
    out = run_windowed_batch(agg, query_name="session_windows_oracle")
    ntz = [
        F.col(c).cast("timestamp_ntz").alias(c)
        if c in ("session_start", "session_end")
        else F.col(c)
        for c in out.columns
    ]
    return out.select(*ntz)


@_register(
    "streaming_running_totals",
    """SELECT user_id AS key, CAST(count(*) AS BIGINT) AS n_events,
              round(sum(value), 4) AS total_value
       FROM events GROUP BY user_id""",
    doc="custom stateful streaming operator: applyInPandasWithState "
    "per-key (count, sum) state across micro-batches "
    "(streaming/stateful.py::running_totals_stateful); finals "
    "recovered per key from the emission with the highest n_events "
    "(count is strictly monotone), so the batch groupBy is an exact "
    "oracle on bounded input",
)
def q_streaming_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming import run_windowed_batch, running_totals_stateful

    events = _events_stream(spark, sf_dir)
    totals = running_totals_stateful(events, key_col="user_id", value_col="value")
    emitted = run_windowed_batch(
        totals, query_name="running_totals_oracle", output_mode="update"
    )
    # final state per key = the emission with the highest n_events
    # (strictly monotone — a key only emits when new rows arrived).
    # max(struct) selects total_value from THAT row; a bare
    # max(total_value) would be wrong if values could be negative.
    final = F.max(F.struct("n_events", "total_value")).alias("_f")
    return (
        emitted.groupBy("key")
        .agg(final)
        .select(
            "key",
            F.col("_f.n_events").alias("n_events"),
            F.round("_f.total_value", 4).alias("total_value"),
        )
    )


@_register(
    "streaming_dedup_events",
    """SELECT event_id, event_type, round(value, 4) AS value
       FROM events""",
    doc="streaming exact dedup with bounded state: the event stream is "
    "fed TWICE and dropDuplicatesWithinWatermark collapses it back to "
    "one row per event_id (streaming/stateful.py::dedup_stream); "
    "oracle = the original table",
)
def q_streaming_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..streaming import dedup_stream, parquet_stream_reader, run_windowed_batch

    events = _t(spark, sf_dir, "events").select(
        "event_id",
        # watermark (EVENT_TIME) accepts only TIMESTAMP, not the
        # TIMESTAMP_NTZ some fixtures store; UTC session tz → identical
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
        "value",
    )
    dup_dir = tempfile.mkdtemp(prefix="stream_dedup_")
    try:
        # two copies of every event in the stream source
        events.union(events).write.mode("overwrite").parquet(dup_dir)
        stream = parquet_stream_reader(
            spark, dup_dir, events.schema, glob_filter="*.parquet"
        )
        deduped = dedup_stream(stream, ["event_id"], ts_col="ts", delay="1 hour")
        out = run_windowed_batch(
            deduped.select(
                "event_id", "event_type", F.round("value", 4).alias("value")
            ),
            query_name="stream_dedup_oracle",
            output_mode="append",
        )
        # memory sink holds the rows; materialize before dropping
        # files — via the guarded collect (uniform S13 policy; the
        # frame is windowed-aggregate-sized, the guard makes that a
        # checked invariant instead of an assumption)
        from ..tuning import safe_collect

        out = spark.createDataFrame(safe_collect(out, 200_000), out.schema)
    finally:
        shutil.rmtree(dup_dir, ignore_errors=True)
    return out


@_register(
    "streaming_incremental_dedup",
    # Same contract (and NULL semantics) as incremental_dedup_new_batch,
    # delivered as a STREAM: today's batch arrives through the file
    # stream source and is anti-joined per micro-batch against the
    # STATIC corpus fingerprint frame — the continuous-ingest shape of
    # a crawl pipeline (stream-static joins are stateless: each batch
    # probes the static side, no streaming state to bound).
    """SELECT d.doc_id, d.n_chars
       FROM documents d
       WHERE d.doc_id % 10 = 0 AND d.text IS NOT NULL
         AND md5(d.text) NOT IN (SELECT md5(text) FROM documents
                                 WHERE doc_id % 10 <> 0
                                   AND text IS NOT NULL)""",
    doc="streaming incremental-ingest dedup: the new batch streams in "
    "(file source, two micro-batches) and anti-joins on content md5 "
    "against the static corpus fingerprint frame — "
    "operators/dedup.py::incremental_dedup's logic applied through "
    "readStream; stream-static anti-join, stateless, append mode",
)
def q_streaming_incremental_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import shutil
    import tempfile

    from ..streaming import parquet_stream_reader, run_windowed_batch
    from ..tuning import safe_collect

    docs = _t(spark, sf_dir, "documents")
    corpus_keys = (
        docs.filter(
            (F.col("doc_id") % 10 != 0) & F.col("text").isNotNull()
        )
        .select(F.md5("text").alias("_ck"))
        .dropDuplicates()
    )
    batch = docs.filter(F.col("doc_id") % 10 == 0).select(
        "doc_id", "text", "n_chars"
    )
    in_dir = tempfile.mkdtemp(prefix="stream_incdedup_")
    try:
        batch.write.mode("overwrite").parquet(in_dir)
        stream = parquet_stream_reader(
            spark,
            in_dir,
            batch.schema,
            glob_filter="*.parquet",
            max_files_per_trigger=1,  # force real multi-batch execution
        )
        fresh = (
            stream.filter(F.col("text").isNotNull())
            .withColumn("_ck", F.md5("text"))
            .join(corpus_keys, "_ck", "left_anti")
            .select("doc_id", "n_chars")
        )
        out = run_windowed_batch(
            fresh,
            query_name="stream_incremental_dedup",
            output_mode="append",
        )
        # memory-sink lifetime: materialize via the guarded collect
        out = spark.createDataFrame(safe_collect(out, 200_000), out.schema)
    finally:
        shutil.rmtree(in_dir, ignore_errors=True)
    return out


@_register(
    "streaming_cdc_orders",
    # Same deterministic changelog (and oracle) as cdc_apply_orders,
    # but delivered as THREE mtime-ordered micro-batches through the
    # tombstone-aware foreachBatch CDC sink — the final materialized
    # snapshot must equal the batch fold. In-order delivery matters:
    # snapshot folding resets surviving rows to seq 0, so a
    # lower-seq change arriving AFTER a higher-seq one would win;
    # Debezium topics are per-key ordered, which this models.
    """WITH base AS (SELECT o_orderkey,
                            CAST(0 AS BIGINT) AS seq, 'I' AS op,
                            o_totalprice
                     FROM orders),
       chg AS (
         SELECT o_orderkey, CAST(1 AS BIGINT) AS seq, 'U' AS op,
                round(o_totalprice + 100.0, 2) AS o_totalprice
         FROM orders WHERE o_orderkey % 7 = 1
         UNION ALL
         SELECT o_orderkey, CAST(2 AS BIGINT), 'U',
                round(o_totalprice + 200.0, 2)
         FROM orders WHERE o_orderkey % 7 = 1
         UNION ALL
         SELECT o_orderkey, CAST(1 AS BIGINT), 'D', NULL
         FROM orders WHERE o_orderkey % 7 = 2
         UNION ALL
         SELECT o_orderkey + 10000000, CAST(1 AS BIGINT), 'I',
                round(o_totalprice, 2)
         FROM orders WHERE o_orderkey % 300 = 3),
       lg AS (SELECT * FROM base UNION ALL SELECT * FROM chg),
       latest AS (SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                               ORDER BY seq DESC) AS rn
                  FROM lg)
       SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
       FROM latest WHERE rn = 1 AND op <> 'D'""",
    doc="streaming CDC end-to-end: a change stream (inserts, two "
    "sequenced updates, delete tombstones) folded through the "
    "versioned-snapshot foreachBatch sink across three micro-batches; "
    "the materialized table is value-checked against the batch "
    "QUALIFY-fold oracle (streaming/foreach_batch.py::streaming_cdc)",
)
def q_streaming_cdc_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile
    import time as _time

    from ..streaming import parquet_stream_reader, read_current, streaming_cdc

    raw = _t(spark, sf_dir, "orders")
    sel = lambda df, seq, op, price: df.select(  # noqa: E731
        "o_orderkey",
        price.alias("o_totalprice"),
        F.lit(seq).cast("long").alias("seq"),
        F.lit(op).alias("op"),
    )
    batch0 = sel(raw, 0, "I", F.round("o_totalprice", 2))
    b1u = sel(
        raw.filter(F.col("o_orderkey") % 7 == 1),
        1, "U", F.round(F.col("o_totalprice") + 100.0, 2),
    )
    b1d = sel(
        raw.filter(F.col("o_orderkey") % 7 == 2),
        1, "D", F.lit(None).cast("double"),
    )
    b1i = raw.filter(F.col("o_orderkey") % 300 == 3).select(
        (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
        F.round("o_totalprice", 2).alias("o_totalprice"),
        F.lit(1).cast("long").alias("seq"),
        F.lit("I").alias("op"),
    )
    batch1 = b1u.unionByName(b1d).unionByName(b1i)
    batch2 = sel(
        raw.filter(F.col("o_orderkey") % 7 == 1),
        2, "U", F.round(F.col("o_totalprice") + 200.0, 2),
    )
    src = tempfile.mkdtemp(prefix="cdc_src_")
    root = tempfile.mkdtemp(prefix="cdc_tbl_")
    ckpt = tempfile.mkdtemp(prefix="cdc_ckpt_")
    try:
        for b in (batch0, batch1, batch2):
            b.coalesce(1).write.mode("append").parquet(src)
            _time.sleep(1.1)  # distinct mtimes -> ordered micro-batches
        stream = parquet_stream_reader(
            spark, src, batch0.schema, glob_filter="*.parquet",
            max_files_per_trigger=1,
        )
        streaming_cdc(stream, root, ["o_orderkey"], ckpt)
        out = read_current(spark, root).select(
            "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice")
        )
        from ..tuning import safe_collect

        # memory-sink lifetime: materialize via the guarded collect
        out = spark.createDataFrame(safe_collect(out, 200_000), out.schema)
    finally:
        for d in (src, root, ckpt):
            shutil.rmtree(d, ignore_errors=True)
    return out


@_register(
    "range_join_bands",
    """WITH bands(band, lo, hi) AS (VALUES
         (0, 0.0, 80.0), (1, 50.0, 130.0), (2, 100.0, 180.0),
         (3, 150.0, 230.0), (4, 200.0, 280.0), (5, 250.0, 330.0),
         (6, 300.0, 380.0), (7, 350.0, 430.0), (8, 400.0, 480.0),
         (9, 450.0, 530.0))
       SELECT band, CAST(count(*) AS BIGINT) AS n_events,
              round(avg(e.value), 4) AS avg_value
       FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
       GROUP BY band""",
    doc="interval (range) join via the binning rewrite: OVERLAPPING "
    "value bands joined to events as an equi-join on bin + residual "
    "filter instead of a nested-loop non-equi join "
    "(operators/rangejoin.py::range_join_binned)",
)
def q_range_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rangejoin import range_join_binned

    bands = spark.createDataFrame(
        [(i, i * 50.0, i * 50.0 + 80.0) for i in range(10)],
        "band int, lo double, hi double",
    )
    events = _t(spark, sf_dir, "events").select("event_id", "value")
    joined = range_join_binned(events, bands, "value", "lo", "hi", bin_width=50.0)
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.avg("value"), 4).alias("avg_value"),
    )


# =====================================================================
# Multimodal plumbing (LLM-pipeline extension): binary payloads +
# mapInPandas decode/frame-sample. The byte-offset frame sampler is
# deterministic → oracle-able; the digest-feature decode is rows-only.
# =====================================================================


@_register(
    "multimodal_frame_sample",
    """SELECT doc_id, CAST(i AS INTEGER) AS frame_no,
              CAST(i * 1024 AS BIGINT) AS frame_offset
       FROM (SELECT doc_id,
                    least(8, greatest(octet_length(encode(text)) // 1024, 1))
                        AS nf
             FROM documents) d,
            UNNEST(generate_series(0, nf - 1)) AS u(i)""",
    doc="mapInPandas frame-sampling plumbing over binary payloads "
    "(operators/multimodal.py::sample_frames)",
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import sample_frames

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    return sample_frames(d, id_col="doc_id")


@_register(
    "multimodal_decode_features",
    r"""WITH d AS (SELECT doc_id,
                         sha256(coalesce(text, '')) AS h,
                         CAST(coalesce(octet_length(encode(text)), 0)
                              AS INTEGER) AS n_bytes
                  FROM documents)
       SELECT doc_id, n_bytes, CAST(i AS INTEGER) AS dim_i,
              CAST(CAST(concat('0x', substr(h, 2 * i + 1, 2)) AS INTEGER)
                   AS DOUBLE) / 256.0 AS feature
       FROM d, UNNEST(range(0, 16)) AS u(i)""",
    doc="mapInPandas decode plumbing: binary → feature vector "
    "(operators/multimodal.py::decode_image_features, fake codec). "
    "The digest-fake features are deterministic byte math "
    "(sha256 byte i / 256 — exact dyadic doubles), so posexploding "
    "the vector makes the whole plumbing value-oracle-able: DuckDB "
    "recomputes each lane from its sha256 hex",
)
def q_multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import decode_image_features

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    feats = decode_image_features(d, id_col="doc_id", dim=16, fake=True)
    return feats.select(
        "doc_id",
        "n_bytes",
        F.posexplode("features").alias("dim_i", "feature"),
    )


@_register(
    "multimodal_resize",
    """SELECT doc_id, CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
              CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes_in,
              CAST(192 AS INTEGER) AS n_bytes_out
       FROM documents""",
    doc="mapInPandas resize plumbing: blob in → size-w*h*3 blob out "
    "(operators/multimodal.py::resize_images, fake codec); the oracle "
    "checks the size arithmetic, the payload itself is digest-fake",
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import resize_images

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    resized = resize_images(d, width=8, height=8, id_col="doc_id", fake=True)
    return resized.select(
        "doc_id",
        "width",
        "height",
        "n_bytes_in",
        F.octet_length("payload").alias("n_bytes_out"),
    )


@_register(
    "winnow_fingerprints",
    None,  # xxhash64 fingerprints are engine-specific → rows-only; the
    # shared-substring guarantee is pinned in tests/test_dedup_ann.py
    doc="winnowing (MOSS rolling-hash) document fingerprints: min hash "
    "per sliding window of k-gram hashes "
    "(operators/dedup.py::winnow_fingerprints)",
)
def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import winnow_fingerprints

    return winnow_fingerprints(_t(spark, sf_dir, "documents"))


@_register(
    "minhash_banded_pairs",
    # Same oracle as the exact operator: banded candidates are verified
    # with exact Jaccard (no false positives), and on this corpus every
    # >=0.5 pair has jaccard >= 0.9, where the banding miss probability
    # is (1-0.81)^8 ~ 2e-6 - deterministic in practice.
    r"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                  FROM documents),
       sh AS (SELECT DISTINCT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
              FROM t, UNNEST(generate_series(1, greatest(len(toks) - 2, 0)))
                   AS u(i)),
       sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                        count(*) AS n_common
                 FROM sh a JOIN sh b
                   ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                 GROUP BY 1, 2)
       SELECT p.doc_a, p.doc_b,
              round(CAST(p.n_common AS DOUBLE)
                    / (sa.n_sh + sb.n_sh - p.n_common), 4) AS jaccard
       FROM pairs p
       JOIN sizes sa ON p.doc_a = sa.doc_id
       JOIN sizes sb ON p.doc_b = sb.doc_id
       WHERE round(CAST(p.n_common AS DOUBLE)
                   / (sa.n_sh + sb.n_sh - p.n_common), 4) >= 0.5""",
    doc="banded MinHash near-dup detection as pure DataFrame ops: "
    "grouped min(xxhash64) signatures -> band-key join -> exact-Jaccard "
    "verify on candidates only (operators/dedup.py::minhash_banded_pairs)",
)
def q_minhash_banded_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_banded_pairs

    return minhash_banded_pairs(_t(spark, sf_dir, "documents"), threshold=0.5)


# =====================================================================
# Advanced relational patterns the reference lacks but a complete
# engine provides: sessionization, as-of join, frequency indexing.
# =====================================================================


@_register(
    "sessionize_events",
    """WITH x AS (
         SELECT event_id, user_id, ts,
                CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)
                          > INTERVAL '30 minutes'
                     THEN 1 ELSE 0 END AS brk
         FROM events)
       SELECT event_id, user_id,
              CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS INTEGER)
                  AS session_id
       FROM x""",
    doc="sessionization via lag + running sum of gap breaks (the "
    "batch counterpart of streaming session windows)",
)
def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # unix_micros requires TIMESTAMP; the fixture may store TIMESTAMP_NTZ.
    # Session tz is UTC (set by _t), so the cast is wall-clock-preserving.
    ts = F.col("ts").cast("timestamp")
    gap_us = F.unix_micros(ts) - F.unix_micros(F.lag(ts).over(w))
    brk = F.when(gap_us > 30 * 60 * 1_000_000, 1).otherwise(0)
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        F.sum(brk).over(wrun).cast("int").alias("session_id"),
    )


@_register(
    "asof_last_purchase",
    """SELECT event_id, user_id,
              last_value(CASE WHEN event_type = 'purchase' THEN ts END
                         IGNORE NULLS)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  AS last_purchase_ts
       FROM events""",
    doc="as-of join (an operator Spark lacks natively) expressed as an "
    "ignore-nulls last_value window: each event matched to the user's "
    "most recent strictly-earlier purchase",
)
def q_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    purchase_ts = F.when(F.col("event_type") == "purchase", F.col("ts"))
    return ev.select(
        "event_id",
        "user_id",
        F.last(purchase_ts, ignorenulls=True).over(w).alias("last_purchase_ts"),
    )


@_register(
    "string_indexer_mapping",
    """SELECT event_type,
              CAST(dense_rank() OVER (ORDER BY n DESC, event_type) - 1
                   AS DOUBLE) AS idx
       FROM (SELECT event_type, count(*) AS n FROM events GROUP BY 1)""",
    doc="M3 StringIndexer semantics as SQL: frequency-desc index with "
    "alphabetical tie-break (verified against pyspark.ml StringIndexer; "
    "ml/features.index_categoricals is the Pipeline form)",
)
def q_string_indexer_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.feature import StringIndexer

    ev = _t(spark, sf_dir, "events")
    model = StringIndexer(
        inputCol="event_type", outputCol="idx", stringOrderType="frequencyDesc"
    ).fit(ev)
    labels = [(v, float(i)) for i, v in enumerate(model.labels)]
    return spark.createDataFrame(labels, "event_type string, idx double")


@_register(
    "decontaminate_docs",
    r"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                  FROM documents),
       sh AS (SELECT DISTINCT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
                     || toks[i+3] || ' ' || toks[i+4] AS g
              FROM t, UNNEST(generate_series(1, greatest(len(toks) - 4, 0)))
                   AS u(i)),
       bench AS (SELECT DISTINCT g FROM sh WHERE doc_id < 10),
       hits AS (SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_hits
                FROM sh JOIN bench USING (g) GROUP BY sh.doc_id)
       SELECT d.doc_id, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
              coalesce(h.n_hits, 0) > 0 AS contaminated
       FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id""",
    doc="benchmark decontamination: corpus docs sharing any word 5-gram "
    "with the eval set (docs 0-9 as a stand-in benchmark) are flagged; "
    "benchmark grams broadcast, corpus text never shuffles "
    "(operators/dedup.py::benchmark_decontaminate)",
)
def q_decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import benchmark_decontaminate

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") < 10)
    return benchmark_decontaminate(docs, bench, n=5)


@_register(
    "dedup_provenance_docs",
    # Provenance over NEAR-dup clusters (the corpus's duplication is
    # near-, not byte-exact): which sources mirror each other.
    r"""WITH RECURSIVE
       t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
             FROM documents),
       sh AS (SELECT DISTINCT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
              FROM t, UNNEST(generate_series(1, greatest(len(toks) - 2, 0)))
                   AS u(i)),
       sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       p0 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
              FROM sh a JOIN sh b
                ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
       pairs AS (SELECT p.doc_a, p.doc_b FROM p0 p
                 JOIN sizes sa ON p.doc_a = sa.doc_id
                 JOIN sizes sb ON p.doc_b = sb.doc_id
                 WHERE round(CAST(p.n_common AS DOUBLE)
                             / (sa.n_sh + sb.n_sh - p.n_common), 4) >= 0.5),
       edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
                 UNION SELECT doc_b, doc_a FROM pairs),
       reach(node, r) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT e.d, reach.r FROM reach JOIN edges e ON e.s = reach.node),
       comp AS (SELECT node AS doc_id, min(r) AS canonical_id
                FROM reach GROUP BY node)
       SELECT c.canonical_id,
              CAST(count(*) AS BIGINT) AS n_members,
              array_to_string(list_sort(list(DISTINCT d.source)), ',')
                  AS sources
       FROM comp c JOIN documents d ON d.doc_id = c.doc_id
       GROUP BY c.canonical_id
       HAVING count(*) > 1""",
    doc="dedup with provenance: for every near-dup cluster, the member "
    "count and the SORTED distinct sources that carried the content "
    "(comma-joined for engine-stable comparison) — the mirror-lineage "
    "record a curated corpus keeps when collapsing duplicates (which "
    "crawls/domains duplicate each other)",
)
def q_dedup_provenance_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import near_dup_resolve

    docs = _t(spark, sf_dir, "documents")
    resolved = near_dup_resolve(docs, threshold=0.5, method="exact")
    return (
        resolved.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("canonical_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.array_join(
                F.array_sort(F.collect_set("source")), ","
            ).alias("sources"),
        )
        .filter(F.col("n_members") > 1)
    )


@_register(
    "temperature_mixture_sample_docs",
    # T=2 → sqrt weights: IEEE-exact on every engine (pow() for
    # arbitrary T can differ in the last ulp across libm builds).
    # Identical expression order keeps the rate doubles identical, and
    # the u16-vs-rate*65536 comparison has measure-zero boundary risk.
    """WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n
                  FROM documents GROUP BY source),
       w AS (SELECT source, n, sqrt(CAST(n AS DOUBLE)) AS wt FROM c),
       r AS (SELECT source,
                    least(200.0 * wt / (SELECT sum(wt) FROM w) / n, 1.0)
                        AS rate
             FROM w)
       SELECT d.doc_id, d.source
       FROM documents d JOIN r USING (source)
       WHERE CAST('0x' || substr(md5('42-' || CAST(d.doc_id AS VARCHAR)),
                                 9, 4) AS BIGINT)
             < r.rate * 65536""",
    doc="temperature-flattened mixture sampling (T=2): per-source keep "
    "rates derived from the data as sqrt(n)/Σsqrt(n) — the "
    "multilingual/source-balancing recipe — applied with the "
    "deterministic md5 threshold sampler; rates ride a broadcast join "
    "of the count aggregate, corpus filtered map-side "
    "(operators/sample.py::temperature_mixture_sample)",
)
def q_temperature_mixture_sample_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.sample import temperature_mixture_sample

    return temperature_mixture_sample(
        _t(spark, sf_dir, "documents"), target_rows=200
    ).select("doc_id", "source")


@_register(
    "contamination_fraction_docs",
    r"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                  FROM documents),
       sh AS (SELECT DISTINCT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
                     || toks[i+3] || ' ' || toks[i+4] AS g
              FROM t, UNNEST(generate_series(1, greatest(len(toks) - 4, 0)))
                   AS u(i)),
       bench AS (SELECT DISTINCT g FROM sh WHERE doc_id < 10),
       per AS (SELECT sh.doc_id,
                      CAST(count(*) AS BIGINT) AS n_grams,
                      CAST(sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END)
                           AS BIGINT) AS n_hits
               FROM sh LEFT JOIN bench b USING (g)
               GROUP BY sh.doc_id)
       SELECT doc_id, n_grams, n_hits,
              round(CAST(n_hits AS DOUBLE) / n_grams, 4) AS frac
       FROM per""",
    doc="graded decontamination: per-doc FRACTION of distinct 5-grams "
    "present in the benchmark — the threshold-tunable signal the "
    "boolean flag can't give (one quoted sentence vs a verbatim "
    "test-set copy differ 100x); one gram stream, benchmark broadcast "
    "(operators/dedup.py::contamination_fraction)",
)
def q_contamination_fraction_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.dedup import contamination_fraction

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") < 10)
    return contamination_fraction(docs, bench, n=5)


@_register(
    "dedup_savings_report",
    # One-row ROI readout of the near-dup stage: how many documents
    # and characters a keep-min-id policy removes.
    r"""WITH RECURSIVE
       t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
             FROM documents),
       sh AS (SELECT DISTINCT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
              FROM t, UNNEST(generate_series(1, greatest(len(toks) - 2, 0)))
                   AS u(i)),
       sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       p0 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
              FROM sh a JOIN sh b
                ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
       pairs AS (SELECT p.doc_a, p.doc_b FROM p0 p
                 JOIN sizes sa ON p.doc_a = sa.doc_id
                 JOIN sizes sb ON p.doc_b = sb.doc_id
                 WHERE round(CAST(p.n_common AS DOUBLE)
                             / (sa.n_sh + sb.n_sh - p.n_common), 4) >= 0.5),
       edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
                 UNION SELECT doc_b, doc_a FROM pairs),
       reach(node, r) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT e.d, reach.r FROM reach JOIN edges e ON e.s = reach.node),
       comp AS (SELECT node AS doc_id, min(r) AS canonical_id
                FROM reach GROUP BY node)
       SELECT CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(d.n_chars) AS BIGINT) AS total_chars,
              CAST(sum(CASE WHEN c.doc_id <> c.canonical_id
                       THEN 1 ELSE 0 END) AS BIGINT) AS redundant_docs,
              CAST(sum(CASE WHEN c.doc_id <> c.canonical_id
                       THEN d.n_chars ELSE 0 END) AS BIGINT)
                  AS redundant_chars,
              round(sum(CASE WHEN c.doc_id <> c.canonical_id
                        THEN d.n_chars ELSE 0 END)
                    / CAST(sum(d.n_chars) AS DOUBLE), 4)
                  AS savings_share
       FROM comp c JOIN documents d ON d.doc_id = c.doc_id""",
    doc="dedup ROI report: documents and characters a keep-min-id "
    "near-dup policy removes, plus the corpus share saved — the "
    "one-row readout that justifies (or kills) the dedup stage's "
    "compute; one join of the resolution frame against doc sizes "
    "(operators/dedup.py::near_dup_resolve)",
)
def q_dedup_savings_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import near_dup_resolve

    docs = _t(spark, sf_dir, "documents")
    resolved = near_dup_resolve(docs, threshold=0.5, method="exact")
    redundant = F.when(
        F.col("doc_id") != F.col("canonical_id"), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        resolved.join(docs.select("doc_id", "n_chars"), "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(redundant).alias("redundant_docs"),
            F.sum(redundant * F.col("n_chars")).alias("redundant_chars"),
            F.round(
                F.sum(redundant * F.col("n_chars"))
                / F.sum("n_chars").cast("double"),
                4,
            ).alias("savings_share"),
        )
    )


@_register(
    "dup_cluster_size_histogram",
    # Reuses the exact components oracle, then histograms cluster
    # sizes — the over-dedup risk readout (a corpus where most mass
    # sits in giant clusters loses diversity when deduped to one doc
    # per cluster).
    r"""WITH RECURSIVE
       t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
             FROM documents),
       sh AS (SELECT DISTINCT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
              FROM t, UNNEST(generate_series(1, greatest(len(toks) - 2, 0)))
                   AS u(i)),
       sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       p0 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
              FROM sh a JOIN sh b
                ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
       pairs AS (SELECT p.doc_a, p.doc_b FROM p0 p
                 JOIN sizes sa ON p.doc_a = sa.doc_id
                 JOIN sizes sb ON p.doc_b = sb.doc_id
                 WHERE round(CAST(p.n_common AS DOUBLE)
                             / (sa.n_sh + sb.n_sh - p.n_common), 4) >= 0.5),
       edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
                 UNION SELECT doc_b, doc_a FROM pairs),
       reach(node, r) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT e.d, reach.r FROM reach JOIN edges e ON e.s = reach.node),
       comp AS (SELECT node, min(r) AS canonical_id FROM reach GROUP BY node),
       cs AS (SELECT canonical_id, CAST(count(*) AS BIGINT) AS cluster_size
              FROM comp GROUP BY canonical_id)
       SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
              CAST(cluster_size * count(*) AS BIGINT) AS n_docs
       FROM cs GROUP BY cluster_size""",
    doc="over-dedup risk readout: histogram of near-dup cluster sizes "
    "(how much corpus mass collapses per keep-one policy) — two tiny "
    "aggregates over the resolution frame "
    "(operators/dedup.py::near_dup_resolve)",
)
def q_dup_cluster_size_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.dedup import near_dup_resolve

    resolved = near_dup_resolve(
        _t(spark, sf_dir, "documents"), threshold=0.5, method="exact"
    )
    cs = resolved.groupBy("canonical_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return cs.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        (F.col("cluster_size") * F.count(F.lit(1)))
        .cast("bigint")
        .alias("n_docs"),
    )


@_register(
    "token_length_histogram_by_source",
    # log2 buckets via length(bin(n)) - 1: integer-exact on both
    # engines (float log2 of exact powers of two is libm-dependent).
    r"""WITH s AS (SELECT source,
                          CAST(len(string_split_regex(trim(text), '\s+'))
                               AS BIGINT) AS n_toks
                   FROM documents)
       SELECT source,
              CAST(length(bin(n_toks)) - 1 AS INT) AS log2_bucket,
              CAST(count(*) AS BIGINT) AS n_docs
       FROM s WHERE n_toks > 0
       GROUP BY source, log2_bucket""",
    doc="sequence-length distribution per source in power-of-two "
    "buckets — what a trainer reads to set context budgets and "
    "packing strategy; the bucket is an integer bit-length, never a "
    "float log (functions/columns.py::token_count)",
)
def q_token_length_histogram_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..functions import token_count

    d = _t(spark, sf_dir, "documents")
    n = token_count("text").cast("long")
    return (
        d.select("source", n.alias("n_toks"))
        .filter(F.col("n_toks") > 0)
        .select(
            "source",
            (F.length(F.bin("n_toks")) - 1).cast("int").alias("log2_bucket"),
        )
        .groupBy("source", "log2_bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@_register(
    "tokenizer_fertility_by_source",
    r"""WITH s AS (
         SELECT source,
                CAST(length(regexp_replace(text, '\s+', '', 'g'))
                     AS BIGINT) AS chars,
                CAST(len(string_split_regex(trim(text), '\s+'))
                     AS BIGINT) AS words,
                CAST(len(regexp_extract_all(text,
                         '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
                     AS BIGINT) AS bpe_toks
         FROM documents)
       SELECT source,
              CAST(sum(bpe_toks) AS BIGINT) AS n_tokens,
              round(CAST(sum(chars) AS DOUBLE) / sum(bpe_toks), 4)
                  AS chars_per_token,
              round(CAST(sum(bpe_toks) AS DOUBLE) / sum(words), 4)
                  AS fertility
       FROM s GROUP BY source""",
    doc="tokenizer-fit diagnostic per source: chars-per-token and "
    "fertility (subword tokens per word) — the readout that flags "
    "sources a tokenizer fragments (high fertility = wasted context "
    "budget); exact integer count sums, one pass "
    "(functions/columns.py token counters)",
)
def q_tokenizer_fertility_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..functions import token_count

    d = _t(spark, sf_dir, "documents")
    chars = F.length(F.regexp_replace("text", r"\s+", "")).cast("long")
    bpe = F.size(
        F.expr(r"regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]', 0)")
    ).cast("long")
    agg = d.select(
        "source",
        chars.alias("chars"),
        token_count("text").cast("long").alias("words"),
        bpe.alias("bpe_toks"),
    ).groupBy("source").agg(
        F.sum("bpe_toks").alias("n_tokens"),
        F.round(
            F.sum("chars").cast("double") / F.sum("bpe_toks"), 4
        ).alias("chars_per_token"),
        F.round(
            F.sum("bpe_toks").cast("double") / F.sum("words"), 4
        ).alias("fertility"),
    )
    return agg


@_register(
    "vocab_top_tokens",
    r"""SELECT token, CAST(count(*) AS BIGINT) AS n
       FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
             FROM documents)
       WHERE token <> ''
       GROUP BY token ORDER BY n DESC, token LIMIT 50""",
    doc="corpus vocabulary induction: top-k tokens by frequency with "
    "deterministic alphabetical tie-break "
    "(operators/textstats.py::vocab_top_tokens)",
)
def q_vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textstats import vocab_top_tokens

    return vocab_top_tokens(_t(spark, sf_dir, "documents"), k=50)


@_register(
    "training_shard_assignment",
    """WITH k AS (SELECT doc_id,
                         md5('42-' || CAST(doc_id AS VARCHAR)) AS key
                  FROM documents)
       SELECT doc_id,
              CAST(strpos('0123456789abcdef', substr(key, 8, 1)) - 1
                   AS INT) AS shard,
              CAST(row_number() OVER (PARTITION BY substr(key, 8, 1)
                                      ORDER BY key, doc_id)
                   AS BIGINT) AS pos
       FROM k""",
    doc="deterministic training-export shuffle: shard + intra-shard "
    "position derived from md5(seed-id), reproducible on any cluster "
    "layout; at n_shards=16 the shard equals the 8th hex digit, which "
    "is what makes the oracle engine-exact "
    "(operators/shard.py::shard_assignment)",
)
def q_training_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.shard import shard_assignment

    return shard_assignment(
        _t(spark, sf_dir, "documents"), n_shards=16, seed=42
    )


@_register(
    "sequence_pack_assignment",
    r"""WITH k AS (SELECT doc_id,
                         CAST(len(string_split_regex(trim(text), '\s+'))
                              AS BIGINT) AS n_tokens,
                         md5('42-' || CAST(doc_id AS VARCHAR)) AS key,
                         strpos('0123456789abcdef',
                                substr(md5('42-' || CAST(doc_id AS VARCHAR)),
                                       8, 1)) - 1 AS shard
                  FROM documents),
       c AS (SELECT doc_id, shard, n_tokens,
                    sum(n_tokens) OVER (PARTITION BY shard
                                        ORDER BY key, doc_id
                                        ROWS UNBOUNDED PRECEDING)
                        - n_tokens AS start
             FROM k)
       SELECT doc_id, CAST(shard AS INT) AS shard,
              CAST(floor(start / 512.0) AS BIGINT) AS pack,
              CAST(start % 512 AS BIGINT) AS tok_offset
       FROM c""",
    doc="concat-then-chunk sequence packing over the deterministic "
    "shuffle order: exclusive prefix-sum of token counts -> 512-token "
    "window index + offset (operators/shard.py::pack_assignment)",
)
def q_sequence_pack_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.shard import pack_assignment

    return pack_assignment(
        _t(spark, sf_dir, "documents"), budget=512, n_shards=16, seed=42
    )


@_register(
    "mixture_sample_docs",
    """WITH k AS (SELECT doc_id, source,
                         md5('42-' || CAST(doc_id AS VARCHAR)) AS key
                  FROM documents),
       u AS (SELECT doc_id, source,
                    (strpos('0123456789abcdef', substr(key, 9, 1)) - 1) * 4096
                  + (strpos('0123456789abcdef', substr(key, 10, 1)) - 1) * 256
                  + (strpos('0123456789abcdef', substr(key, 11, 1)) - 1) * 16
                  + (strpos('0123456789abcdef', substr(key, 12, 1)) - 1)
                      AS u16
             FROM k)
       SELECT doc_id, source FROM u
       WHERE u16 < (CASE source WHEN 'src0' THEN 1.0
                                WHEN 'src1' THEN 0.5
                                WHEN 'src2' THEN 0.25
                                ELSE 0.1 END) * 65536""",
    doc="deterministic dataset-mixing sampler: per-source keep rates "
    "realized by thresholding a 16-bit uniform from md5(seed-id) — "
    "reproducible row membership, unlike RNG sampleBy "
    "(operators/sample.py::mixture_sample)",
)
def q_mixture_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sample import mixture_sample

    docs = _t(spark, sf_dir, "documents")
    return mixture_sample(
        docs,
        rates={"src0": 1.0, "src1": 0.5, "src2": 0.25},
        stratum_col="source",
        id_col="doc_id",
        seed=42,
        default_rate=0.1,
    ).select("doc_id", "source")


@_register(
    "histogram_quantity",
    """SELECT CAST(CASE WHEN l_quantity < 1.0 THEN 0
                        WHEN l_quantity >= 51.0 THEN 11
                        ELSE floor((l_quantity - 1.0) / 5.0) + 1 END
                   AS INT) AS bucket,
              CAST(count(*) AS BIGINT) AS n
       FROM lineitem GROUP BY bucket""",
    doc="equi-width histogram via SQL-standard width_bucket (DuckDB "
    "lacks the function, so the oracle spells out its definition) "
    "(operators/profile.py::histogram)",
)
def q_histogram_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import histogram

    return histogram(
        _t(spark, sf_dir, "lineitem"), "l_quantity", 1.0, 51.0, 10
    )


@_register(
    "robust_outliers_price",
    """WITH m AS (SELECT median(l_extendedprice) AS med FROM lineitem),
       d AS (SELECT l_orderkey, l_linenumber,
                    l_extendedprice, med,
                    abs(l_extendedprice - med) AS dev
             FROM lineitem, m),
       s AS (SELECT 1.4826 * median(dev) AS smad FROM d)
       SELECT l_orderkey, l_linenumber,
              round((l_extendedprice - med) / smad, 4) AS robust_z
       FROM d, s WHERE dev > 3.0 * smad""",
    doc="median/MAD robust z-score outliers (50% breakdown point, "
    "immune to the outliers being hunted) "
    "(operators/profile.py::robust_outliers)",
)
def q_robust_outliers_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import robust_outliers

    return robust_outliers(
        _t(spark, sf_dir, "lineitem"),
        "l_extendedprice",
        ["l_orderkey", "l_linenumber"],
        z_threshold=3.0,
    )


@_register(
    "funnel_conversion",
    """WITH firsts AS (
         SELECT user_id,
                min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
                min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
                min(CASE WHEN event_type = 'purchase' THEN ts END)
                    AS t_purchase
         FROM events GROUP BY user_id)
       SELECT CAST(count(*) FILTER (t_view IS NOT NULL) AS BIGINT)
                  AS n_view,
              CAST(count(*) FILTER (t_click > t_view) AS BIGINT)
                  AS n_view_click,
              CAST(count(*) FILTER (t_click > t_view
                                    AND t_purchase > t_click) AS BIGINT)
                  AS n_view_click_purchase
       FROM firsts""",
    doc="ordered funnel conversion (view -> click -> purchase): one "
    "conditional-min aggregation per user, then stage counts — no "
    "joins, no self-joins, single shuffle on user_id",
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")

    def first_ts(etype: str):
        return F.min(F.when(F.col("event_type") == etype, F.col("ts")))

    firsts = ev.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    did_view = F.col("t_view").isNotNull()
    did_click = F.col("t_click") > F.col("t_view")
    did_purchase = did_click & (F.col("t_purchase") > F.col("t_click"))
    return firsts.agg(
        F.count(F.when(did_view, 1)).alias("n_view"),
        F.count(F.when(did_click, 1)).alias("n_view_click"),
        F.count(F.when(did_purchase, 1)).alias("n_view_click_purchase"),
    )


@_register(
    "fingerprint_dedup_md5",
    r"""SELECT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp,
              CAST(min(doc_id) AS BIGINT) AS doc_id,
              CAST(count(*) AS BIGINT) AS n_copies
       FROM documents GROUP BY fp""",
    doc="normalized-content fingerprint dedup with an engine-agnostic "
    "md5 fingerprint (whitespace-collapsed, lowercased) — the oracled "
    "twin of fingerprint_dedup's compact xxhash64 form",
)
def q_fingerprint_dedup_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")))
    return (
        d.select("doc_id", fp.alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


@_register(
    "winnow_fingerprints_md5",
    r"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                  FROM documents),
       g AS (SELECT doc_id, i AS pos,
                    md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS gh
             FROM t, UNNEST(generate_series(1, greatest(len(toks) - 2, 0)))
                  AS u(i)),
       w AS (SELECT doc_id,
                    min(gh) OVER (PARTITION BY doc_id ORDER BY pos
                                  ROWS BETWEEN CURRENT ROW
                                  AND 3 FOLLOWING) AS fingerprint
             FROM g)
       SELECT DISTINCT doc_id, fingerprint FROM w""",
    doc="winnowing (MOSS) with md5 as the pseudo-random gram order — "
    "engine-agnostic, so the rolling-min selection is exactly "
    "reproducible in SQL (operators/dedup.py::winnow_fingerprints; "
    "the xxhash64 default stays the compact production form)",
)
def q_winnow_fingerprints_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import winnow_fingerprints

    return winnow_fingerprints(
        _t(spark, sf_dir, "documents"), k=3, window=4, hash_fn="md5"
    )


@_register(
    "merge_upsert_orders",
    """WITH updates AS (SELECT o_orderkey, o_custkey,
                               round(o_totalprice + 1000.0, 2) AS o_totalprice
                        FROM orders WHERE o_orderkey % 100 = 0)
       SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
       FROM orders WHERE o_orderkey % 100 <> 0
       UNION ALL SELECT * FROM updates""",
    doc="batch MERGE INTO shape without a table format: updates replace "
    "base rows by key (broadcast anti-join), inserts append "
    "(operators/merge.py::merge_upsert)",
)
def q_merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.merge import merge_upsert

    base = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice")
    )
    updates = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 100 == 0)
        .select(
            "o_orderkey",
            "o_custkey",
            F.round(F.col("o_totalprice") + 1000.0, 2).alias("o_totalprice"),
        )
    )
    return merge_upsert(base, updates, ["o_orderkey"])


@_register(
    "weighted_median_price_by_brand",
    # Exact QUANTITY-weighted median price per brand: sort each
    # brand's line items by price (unique tie-break), take the first
    # price where twice the running weight reaches the total. All
    # comparisons are INTEGER (quantities are integral) — no float
    # thresholds — and the output is a raw parquet double rounded for
    # display, so both engines agree exactly.
    """WITH l AS (SELECT p.p_brand, li.l_extendedprice AS price,
                         CAST(li.l_quantity AS BIGINT) AS w,
                         li.l_orderkey, li.l_linenumber
                  FROM lineitem li JOIN part p
                    ON li.l_partkey = p.p_partkey),
       c AS (SELECT p_brand, price,
                    sum(w) OVER (PARTITION BY p_brand
                                 ORDER BY price, l_orderkey, l_linenumber
                                 ROWS UNBOUNDED PRECEDING) AS cum,
                    sum(w) OVER (PARTITION BY p_brand) AS tot
             FROM l)
       SELECT p_brand, round(min(price), 2) AS weighted_median_price
       FROM c WHERE 2 * cum >= tot
       GROUP BY p_brand""",
    doc="exact weighted median (quantity-weighted price) per brand: "
    "keyed cumulative-weight window + integer crossing rule "
    "(2*cum >= tot) — no float thresholds, deterministic tie-break. "
    "Scales: both windows partition by the brand key (no "
    "SinglePartition), the part join broadcasts the dimension",
)
def q_weighted_median_price_by_brand(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    l = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"]).select(
        "p_brand",
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").cast("bigint").alias("w"),
        "l_orderkey",
        "l_linenumber",
    )
    w_cum = W.partitionBy("p_brand").orderBy(
        "price", "l_orderkey", "l_linenumber"
    ).rowsBetween(W.unboundedPreceding, W.currentRow)
    w_tot = W.partitionBy("p_brand")
    c = l.select(
        "p_brand",
        "price",
        F.sum("w").over(w_cum).alias("cum"),
        F.sum("w").over(w_tot).alias("tot"),
    )
    return (
        c.filter(2 * F.col("cum") >= F.col("tot"))
        .groupBy("p_brand")
        .agg(F.round(F.min("price"), 2).alias("weighted_median_price"))
    )


@_register(
    "merkle_bucket_diff_orders",
    # Digest-first table reconciliation — the 100 TB diff shape: two
    # table versions reduce to 64 bucket digests each (order-
    # independent exact-decimal sums of a row hash keyed by a hash
    # bucket), and only DIFFERING buckets would ever be drilled into.
    # Same deterministic synthetic mutation as snapshot_diff_orders
    # (keys %5==0 repriced, keys %7==0 deleted), md5-based so both
    # engines compute identical digests.
    """WITH old AS (SELECT o_orderkey, o_totalprice FROM orders),
       new AS (SELECT o_orderkey,
                      CASE WHEN o_orderkey % 5 = 0
                           THEN round(o_totalprice + 1.0, 2)
                           ELSE o_totalprice END AS o_totalprice
               FROM orders WHERE o_orderkey % 7 <> 0),
       oh AS (SELECT o_orderkey % 64 AS bucket,
                     CAST(CAST(concat('0x', substring(md5(
                          CAST(o_orderkey AS VARCHAR) || '|' ||
                          CAST(o_totalprice AS VARCHAR)), 1, 15))
                          AS BIGINT) AS DECIMAL(38,0)) AS h
              FROM old),
       nh AS (SELECT o_orderkey % 64 AS bucket,
                     CAST(CAST(concat('0x', substring(md5(
                          CAST(o_orderkey AS VARCHAR) || '|' ||
                          CAST(o_totalprice AS VARCHAR)), 1, 15))
                          AS BIGINT) AS DECIMAL(38,0)) AS h
              FROM new),
       od AS (SELECT bucket, sum(h) AS digest,
                     CAST(count(*) AS BIGINT) AS n
              FROM oh GROUP BY bucket),
       nd AS (SELECT bucket, sum(h) AS digest,
                     CAST(count(*) AS BIGINT) AS n
              FROM nh GROUP BY bucket)
       SELECT coalesce(od.bucket, nd.bucket) AS bucket,
              od.n AS base_rows, nd.n AS new_rows,
              CAST(coalesce(od.digest, 0) <> coalesce(nd.digest, 0)
                   AS BOOLEAN) AS differs
       FROM od FULL OUTER JOIN nd ON od.bucket = nd.bucket""",
    doc="Merkle-style bucket-digest reconciliation between two table "
    "versions: per-bucket order-independent digests (exact DECIMAL "
    "sum of a 60-bit md5 row hash, bucketed by key) compared via one "
    "full-outer join of two 64-row digest frames — at 100 TB the "
    "cross-site comparison ships 64 digests, not rows, and only "
    "differing buckets are drilled (snapshot_diff_orders is the "
    "drill-down). Fully engine-portable: md5 hex -> 60-bit int on "
    "both sides; double->string hashing relies on shortest-roundtrip "
    "formatting, identical here for |x| < 1e7 (TPC-H price domain) — "
    "hash DECIMAL/string columns directly at larger magnitudes",
)
def q_merkle_bucket_diff_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    old = o.select("o_orderkey", "o_totalprice")
    new = o.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 5 == 0,
            F.round(F.col("o_totalprice") + 1.0, 2),
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )

    def digests(df: DataFrame) -> DataFrame:
        # 60-bit slice of md5 over "key|price": order-independent
        # exact-decimal sum -> partition-layout-reproducible digest
        row_hash = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("o_orderkey").cast("string"),
                        F.col("o_totalprice").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("decimal(38,0)")
        return df.groupBy(
            (F.col("o_orderkey") % 64).alias("bucket")
        ).agg(
            F.sum(row_hash).alias("digest"),
            F.count(F.lit(1)).alias("n"),
        )

    od = digests(old).select(
        "bucket", F.col("digest").alias("od"), F.col("n").alias("base_rows")
    )
    nd = digests(new).select(
        "bucket", F.col("digest").alias("nd"), F.col("n").alias("new_rows")
    )
    return od.join(nd, "bucket", "full_outer").select(
        "bucket",
        "base_rows",
        "new_rows",
        (
            F.coalesce(F.col("od"), F.lit(0))
            != F.coalesce(F.col("nd"), F.lit(0))
        ).alias("differs"),
    )


@_register(
    "snapshot_diff_orders",
    """WITH old AS (SELECT o_orderkey, o_totalprice FROM orders),
       new AS (SELECT o_orderkey,
                      CASE WHEN o_orderkey % 5 = 0
                           THEN o_totalprice + 1.0
                           ELSE o_totalprice END AS o_totalprice
               FROM orders WHERE o_orderkey % 7 <> 0)
       SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
              CASE WHEN o.o_orderkey IS NULL THEN 'added'
                   WHEN n.o_orderkey IS NULL THEN 'removed'
                   WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
                        THEN 'changed'
                   ELSE 'unchanged' END AS change_type
       FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
       WHERE NOT (o.o_orderkey IS NOT NULL AND n.o_orderkey IS NOT NULL
                  AND o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice)""",
    doc="snapshot change capture: added/removed/changed keys between "
    "two table versions via one full-outer join with null-safe compare "
    "(operators/merge.py::snapshot_diff)",
)
def q_snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.merge import snapshot_diff

    old = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    new = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 7 != 0)
        .select(
            "o_orderkey",
            F.when(
                F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 1.0
            )
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
        )
    )
    return snapshot_diff(old, new, ["o_orderkey"], ["o_totalprice"])


@_register(
    "xml_roundtrip_orders",
    # Self-validating roundtrip: the XML is BUILT from the base
    # columns, parsed back with from_xml, and aggregated on the parsed
    # fields — the oracle computes the same aggregate straight from
    # the base columns, so any parse loss or type mangling mismatches.
    """SELECT o_orderpriority AS priority,
              CAST(count(*) AS BIGINT) AS n,
              round(sum(round(o_totalprice, 2)), 2) AS total
       FROM orders GROUP BY o_orderpriority""",
    doc="Spark 4 native XML surface: format_string builds an XML "
    "payload per order, from_xml parses it against an explicit "
    "schema, and the aggregate runs on the PARSED struct fields — "
    "roundtrip-checked against the raw columns by the oracle "
    "(ingesting XML feeds without external packages)",
)
def q_xml_roundtrip_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import from_xml

    o = _t(spark, sf_dir, "orders")
    xml = F.format_string(
        "<order><k>%d</k><p>%s</p><tp>%.2f</tp></order>",
        F.col("o_orderkey"),
        F.col("o_orderpriority"),
        F.col("o_totalprice"),
    )
    parsed = o.select(
        from_xml(xml, "k BIGINT, p STRING, tp DOUBLE").alias("x")
    )
    return (
        parsed.groupBy(F.col("x.p").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("x.tp"), 2).alias("total"),
        )
    )


@_register(
    "multi_format_union_orders",
    # Federation roundtrip: three deterministic slices of orders are
    # exported to parquet, CSV and JSON, read back through the three
    # format readers, and unioned — the oracle aggregates the same
    # slices straight from the base table, so any format-specific
    # type/precision loss (CSV re-inference, JSON numeric widening)
    # surfaces as a mismatch.
    """SELECT o_orderpriority AS priority,
              CAST(count(*) AS BIGINT) AS n,
              round(sum(round(o_totalprice, 2)), 2) AS total
       FROM orders WHERE o_orderkey % 3 IN (0, 1, 2)
       GROUP BY o_orderpriority""",
    doc="multi-format federation: one logical table assembled from "
    "parquet + CSV + JSON slices via unionByName over the three "
    "readers with ONE explicit schema (never inferSchema) — the "
    "mixed-lake ingestion shape; roundtrip-checked against the base "
    "table (sources/io.py::read_csv/read_json readers)",
)
def q_multi_format_union_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import shutil
    import tempfile

    base = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )
    root = tempfile.mkdtemp(prefix="multifmt_")
    try:
        base.filter(F.col("o_orderkey") % 3 == 0).write.mode(
            "overwrite"
        ).parquet(f"{root}/p")
        base.filter(F.col("o_orderkey") % 3 == 1).write.mode(
            "overwrite"
        ).option("header", "true").csv(f"{root}/c")
        base.filter(F.col("o_orderkey") % 3 == 2).write.mode(
            "overwrite"
        ).json(f"{root}/j")
        schema = base.schema
        p = spark.read.parquet(f"{root}/p")
        c = spark.read.schema(schema).option("header", "true").csv(
            f"{root}/c"
        )
        j = spark.read.schema(schema).json(f"{root}/j")
        out = (
            p.unionByName(c)
            .unionByName(j)
            .groupBy(F.col("o_orderpriority").alias("priority"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("o_totalprice"), 2).alias("total"),
            )
        )
        from ..tuning import safe_collect

        # memory-sink lifetime: materialize via the guarded collect
        return spark.createDataFrame(safe_collect(out, 200_000), out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@_register(
    "param_sql_top_customers",
    """SELECT c_custkey, c_acctbal
       FROM customer WHERE c_acctbal > 9000.0
       ORDER BY c_acctbal DESC, c_custkey LIMIT 25""",
    doc="parameterized SQL surface (Spark 4): spark.sql with NAMED "
    "parameter markers (:min_bal, :k — injection-safe, plan-cacheable "
    "across literal changes) and a DataFrame passed as a template "
    "argument ({cust}) instead of a registered temp view — the modern "
    "programmatic-SQL composition path",
)
def q_param_sql_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    return spark.sql(
        """SELECT c_custkey, c_acctbal FROM {cust}
           WHERE c_acctbal > :min_bal
           ORDER BY c_acctbal DESC, c_custkey LIMIT :k""",
        args={"min_bal": 9000.0, "k": 25},
        cust=cust,
    )


@_register(
    "catalog_sql_region_orders",
    """SELECT r_name, CAST(count(*) AS BIGINT) AS n_orders,
              round(sum(o_totalprice), 2) AS total_price
       FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       JOIN nation n ON c.c_nationkey = n.n_nationkey
       JOIN region r ON n.n_regionkey = r.r_regionkey
       GROUP BY r_name""",
    doc="S9/S10 catalog path: tables registered via CREATE TABLE ... "
    "USING parquet LOCATION (the Hive create_tables.hql analog, "
    "sources/catalog.py) and the query issued as PURE spark.sql "
    "against the catalog — identical text to the DuckDB oracle",
)
def q_catalog_sql_region_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.catalog import sql_on_catalog

    return sql_on_catalog(
        spark,
        sf_dir,
        """SELECT r_name, CAST(count(*) AS BIGINT) AS n_orders,
                  round(sum(o_totalprice), 2) AS total_price
           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
           JOIN nation n ON c.c_nationkey = n.n_nationkey
           JOIN region r ON n.n_regionkey = r.r_regionkey
           GROUP BY r_name""",
    )


@_register(
    "approx_profile",
    None,  # approximate sketches (KLL/HLL) → rows-only by design
    doc="A6/A9 approximate tier: percentile_approx + HLL distinct in "
    "one pass (operators/profile.approx_distinct_counts; the exact "
    "variants are oracle-checked by median_exact / distinct_count)",
)
def q_approx_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", F.lit(0.5), F.lit(10000)).alias(
            "approx_median_qty"
        ),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
    )


# =====================================================================
# Multi-way join (TPC-H Q5 shape), correlated subquery via the
# spark.sql path, HAVING — the remaining classic engine surface.
# =====================================================================


@_register(
    "local_supplier_volume",
    """SELECT n.n_name,
              round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
       FROM customer c
       JOIN orders o   ON c.c_custkey = o.o_custkey
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       JOIN supplier s ON l.l_suppkey = s.s_suppkey
                      AND c.c_nationkey = s.s_nationkey
       JOIN nation n   ON c.c_nationkey = n.n_nationkey
       JOIN region r   ON n.n_regionkey = r.r_regionkey
       WHERE r.r_name IN ('ASIA', 'EUROPE')
         AND o.o_orderdate >= TIMESTAMP '1996-01-01'
       GROUP BY n.n_name""",
    doc="TPC-H Q5 shape: 6-way join with a non-equi companion predicate "
    "(local supplier), broadcast dims + fact-fact shuffle joins; "
    "Catalyst/CBO pick the order",
)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(
        F.col("r_name").isin("ASIA", "EUROPE")
    )
    joined = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.groupBy("n_name").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )


@_register(
    "above_nation_avg_balance",
    """SELECT c_custkey, c_name FROM customer c
       WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                          WHERE c2.c_nationkey = c.c_nationkey)""",
    doc="correlated scalar subquery, expressed through the spark.sql "
    "API over registered views (SURVEY §3.4 catalog path) — Catalyst "
    "decorrelates it into an aggregate + join",
)
def q_above_nation_avg_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "customer").createOrReplaceTempView("_q_customer")
    return spark.sql(
        """SELECT c_custkey, c_name FROM _q_customer c
           WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM _q_customer c2
                              WHERE c2.c_nationkey = c.c_nationkey)"""
    )


@_register(
    "having_filter",
    """SELECT o_custkey, count(*) AS n_orders,
              round(sum(o_totalprice), 2) AS total_spent
       FROM orders GROUP BY o_custkey
       HAVING count(*) >= 15""",
    doc="post-aggregation HAVING filter",
)
def q_having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
        )
        .filter(F.col("n_orders") >= 15)
    )


# =====================================================================
# Semi-structured (JSON) access and unpivot — engine surface for the
# events.props payloads and wide→long reshaping.
# =====================================================================


@_register(
    "json_extract_props",
    """SELECT event_id,
              CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value
       FROM events""",
    doc="JSON payload access: get_json_object / from_json over the "
    "events.props column (the Kafka message body shape, FIXTURES §5)",
)
def q_json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_value"),
    )


@_register(
    "json_schema_parse",
    """SELECT CAST(min(CAST(json_extract_string(props, '$.k') AS INTEGER))
                   AS INTEGER) AS min_k,
              CAST(max(CAST(json_extract_string(props, '$.k') AS INTEGER))
                   AS INTEGER) AS max_k,
              count(*) AS n_parsed
       FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL""",
    doc="typed from_json parse with schema + aggregate over the parsed "
    "struct (the streaming consumer's parse stage, streaming/windows.py)",
)
def q_json_schema_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.types as T

    ev = _t(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.IntegerType())])
    parsed = ev.select(F.from_json("props", schema).alias("p")).filter(
        F.col("p.k").isNotNull()
    )
    return parsed.agg(
        F.min("p.k").alias("min_k"),
        F.max("p.k").alias("max_k"),
        F.count(F.lit(1)).alias("n_parsed"),
    )


@_register(
    "unpivot_order_measures",
    """SELECT o_orderkey, measure, round(value, 2) AS value
       FROM (SELECT o_orderkey, o_totalprice AS total_price,
                    CAST(o_custkey AS DOUBLE) AS cust_key
             FROM orders WHERE o_orderkey < 100)
       UNPIVOT (value FOR measure IN (total_price, cust_key))""",
    doc="wide→long unpivot via stack() (melt); DuckDB UNPIVOT oracle",
)
def q_unpivot_order_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 100)
    return o.select(
        "o_orderkey",
        F.expr(
            "stack(2, 'total_price', o_totalprice, "
            "'cust_key', CAST(o_custkey AS DOUBLE)) AS (measure, value)"
        ),
    ).select("o_orderkey", "measure", F.round("value", 2).alias("value"))


# =====================================================================
# Round-4 LLM-pipeline additions: keyword extraction, chunking, PII
# scrubbing, mixture diagnostics, embedding quantization.
# =====================================================================


@_register(
    "tfidf_top_terms",
    r"""WITH toks AS (
         SELECT doc_id,
                unnest(string_split_regex(trim(text), '\s+')) AS token
         FROM documents),
       tf AS (
         SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
         FROM toks WHERE token <> '' GROUP BY doc_id, token),
       dfq AS (
         SELECT token, CAST(count(*) AS BIGINT) AS df_docs
         FROM tf GROUP BY token),
       n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
       ranked AS (
         SELECT tf.doc_id, tf.token, tf.tf, dfq.df_docs,
                row_number() OVER (
                    PARTITION BY tf.doc_id
                    ORDER BY tf.tf DESC, dfq.df_docs ASC, tf.token ASC
                ) AS rank
         FROM tf JOIN dfq USING (token))
       SELECT doc_id, CAST(rank AS INT) AS rank, token, tf, df_docs,
              round(tf * ln((n.n_docs + 1.0) / (df_docs + 1.0)), 6) AS tfidf
       FROM ranked, n WHERE rank <= 3""",
    doc="per-document top-3 salient terms by TF-IDF with an "
    "engine-exact integer-lexicographic rank cut "
    "(operators/textstats.py::tfidf_top_terms)",
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textstats import tfidf_top_terms

    return tfidf_top_terms(_t(spark, sf_dir, "documents"), k=3)


@_register(
    "chunk_documents",
    r"""WITH base AS (
         SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
         FROM documents),
       s AS (
         SELECT doc_id, toks, len(toks) AS n,
                unnest(generate_series(0, greatest(len(toks) - 1, 0), 16))
                    AS start
         FROM base)
       SELECT doc_id,
              CAST(start // 16 AS INT) AS chunk_id,
              CAST(least(n - start, 32) AS INT) AS n_tokens,
              array_to_string(list_slice(toks, start + 1, start + 32), ' ')
                  AS chunk_text
       FROM s""",
    doc="overlapping token-window chunking (chunk=32, stride=16) — "
    "map-only, shuffle-free training-input splitter "
    "(operators/textstats.py::chunk_documents)",
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textstats import chunk_documents

    return chunk_documents(
        _t(spark, sf_dir, "documents"), chunk_tokens=32, stride=16
    )


@_register(
    "pii_redact_docs",
    r"""WITH t AS (
         SELECT doc_id,
                text || ' contact: user' || CAST(doc_id AS VARCHAR)
                     || '@example.com' AS t2
         FROM documents)
       SELECT doc_id,
              regexp_replace(
                  t2,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                  '[REDACTED]', 'g') AS redacted_text,
              CAST(len(regexp_extract_all(
                  t2,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                  AS INT) AS n_redacted
       FROM t""",
    doc="PII (email) scrub with per-doc redaction count over text "
    "seeded with one synthetic address per doc so the redaction path "
    "is provably exercised; RE2/Java-compatible pattern "
    "(operators/textstats.py::pii_redact)",
)
def q_pii_redact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textstats import pii_redact

    docs = _t(spark, sf_dir, "documents").withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" contact: user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com"),
        ),
    )
    return pii_redact(docs)


@_register(
    "token_kl_by_source",
    r"""WITH raw AS (
         SELECT source,
                unnest(string_split_regex(trim(text), '\s+')) AS token
         FROM documents),
       t AS (SELECT source, token FROM raw WHERE token <> ''),
       pg AS (SELECT source, token, CAST(count(*) AS BIGINT) AS c
              FROM t GROUP BY source, token),
       gt AS (SELECT source, token, c,
                     sum(c) OVER (PARTITION BY source) AS g_total
              FROM pg),
       corpus AS (SELECT token, sum(c) AS cc FROM pg GROUP BY token),
       tot AS (SELECT count(*) AS ct FROM t)
       SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
              round(sum((CAST(c AS DOUBLE) / CAST(g_total AS DOUBLE))
                        * ln((CAST(c AS DOUBLE) / CAST(g_total AS DOUBLE))
                             / (CAST(cc AS DOUBLE) / CAST(tot.ct AS DOUBLE)))),
                    6) AS kl_vs_corpus
       FROM gt JOIN corpus USING (token), tot
       GROUP BY source""",
    doc="per-source token-distribution KL divergence vs the corpus "
    "blend — dataset-mixture drift diagnostic "
    "(operators/textstats.py::token_kl_by_source)",
)
def q_token_kl_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textstats import token_kl_by_source

    return token_kl_by_source(_t(spark, sf_dir, "documents"))


@_register(
    "embedding_quantize_error",
    r"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
       s AS (SELECT vec_id, v,
                    list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
             FROM e),
       u AS (SELECT vec_id, scale, unnest(v) AS x FROM s),
       q AS (SELECT vec_id, scale, x,
                    CASE WHEN scale = 0 THEN 0.0
                         ELSE round(x / scale, 0) END AS qx
             FROM u)
       SELECT vec_id, round(scale, 6) AS scale,
              CAST(sum(CAST(abs(qx) AS BIGINT)) AS BIGINT) AS q_l1,
              round(max(abs(x - qx * scale)), 6) AS max_abs_err
       FROM q GROUP BY vec_id, scale""",
    doc="symmetric int8 embedding quantization with per-vector "
    "reconstruction audit (integer-exact L1 code mass + "
    "order-independent max-abs error) "
    "(operators/similarity.py::quantize_embeddings)",
)
def q_embedding_quantize_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import quantize_embeddings

    return quantize_embeddings(_t(spark, sf_dir, "embeddings"))


@_register(
    "rolling_30d_revenue",
    """SELECT o_orderkey, o_custkey, o_orderdate,
              round(sum(o_totalprice) OVER (
                  PARTITION BY o_custkey
                  ORDER BY date_diff('day', DATE '1992-01-01',
                                     CAST(o_orderdate AS DATE))
                  RANGE BETWEEN 29 PRECEDING AND CURRENT ROW), 2)
                  AS rolling_30d_revenue,
              CAST(count(*) OVER (
                  PARTITION BY o_custkey
                  ORDER BY date_diff('day', DATE '1992-01-01',
                                     CAST(o_orderdate AS DATE))
                  RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS n_orders_30d
       FROM orders""",
    doc="time-RANGE window frame (30-day rolling revenue per customer): "
    "rangeBetween over a day-number orderBy — the range-frame window "
    "family (rows-frame windows are covered by window_running_sum); "
    "day numbers derive from the DATE part of the NTZ timestamp, so "
    "the frame is timezone-independent in both engines; same-day rows "
    "are frame peers in both, keeping the sum deterministic",
)
def q_rolling_30d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    day = F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-29, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 2).alias("rolling_30d_revenue"),
        F.count(F.lit(1)).over(w).alias("n_orders_30d"),
    )


@_register(
    "cohort_retention",
    """WITH act AS (
         SELECT DISTINCT o_custkey,
                         CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
                             AS m
         FROM orders),
       coh AS (SELECT o_custkey, min(m) AS cohort_month
               FROM act GROUP BY o_custkey)
       SELECT cohort_month,
              CAST(date_diff('month', cohort_month, m) AS INT)
                  AS months_since,
              CAST(count(DISTINCT act.o_custkey) AS BIGINT) AS n_active
       FROM act JOIN coh USING (o_custkey)
       GROUP BY cohort_month, months_since""",
    doc="cohort retention matrix: customers bucketed by first-order "
    "month, distinct-active counts at each month offset — two "
    "key-partitioned aggregations plus one equi-join on the customer "
    "key (no broadcast forced: the cohort side is |customers|-sized "
    "and AQE picks the join strategy per tier)",
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    # date_trunc promotes NTZ input to an instant TIMESTAMP via the
    # session tz; the round trip back to NTZ below is tz-consistent,
    # and collect() of an instant renders in the PROCESS-local tz —
    # so the output month must be NTZ to hash identically everywhere
    act = o.select(
        "o_custkey", F.date_trunc("month", "o_orderdate").alias("m")
    ).distinct()
    coh = act.groupBy("o_custkey").agg(F.min("m").alias("cohort_month"))
    return (
        act.join(coh, "o_custkey")
        .select(
            "o_custkey",
            "cohort_month",
            F.months_between(F.col("m"), F.col("cohort_month"))
            .cast("int")
            .alias("months_since"),
        )
        .groupBy(F.col("cohort_month").cast("timestamp_ntz").alias("cohort_month"), "months_since")
        .agg(F.countDistinct("o_custkey").alias("n_active"))
    )


@_register(
    "simhash_near_dup_pairs_md5",
    r"""WITH raw AS (
         SELECT doc_id,
                unnest(string_split_regex(trim(text), '\s+')) AS tok
         FROM documents),
       t AS (SELECT doc_id, md5(tok) AS h FROM raw WHERE tok <> ''),
       hv AS (SELECT doc_id,
                CAST(list_sum(list_transform(generate_series(1, 15),
                    i -> (CAST(strpos('0123456789abcdef', substr(h, i, 1))
                               AS BIGINT) - 1)
                         << (4 * (15 - i)))) AS BIGINT) AS hval
              FROM t),
       bits AS (SELECT doc_id, b,
                       sum(CASE WHEN (hval >> b) & 1 = 1
                                THEN 1 ELSE -1 END) AS s
                FROM hv CROSS JOIN
                     (SELECT unnest(generate_series(0, 59)) AS b) bb
                GROUP BY doc_id, b),
       sig AS (SELECT doc_id,
                      CAST(sum(CASE WHEN s > 0 THEN 1::BIGINT << b
                                    ELSE 0 END) AS BIGINT) AS simhash
               FROM bits GROUP BY doc_id)
       SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
       FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       WHERE bit_count(xor(a.simhash, b.simhash)) <= 5""",
    doc="SQL-oracled SimHash near-dup pairs: 60-bit signatures from an "
    "engine-agnostic md5 token hash, block-and-verify join with "
    "pigeonhole recall 1; the oracle brute-forces all pairs while the "
    "engine's blocked join must return the identical set "
    "(operators/dedup.py::simhash_near_dup_pairs_md5)",
)
def q_simhash_near_dup_pairs_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import simhash_near_dup_pairs_md5

    return simhash_near_dup_pairs_md5(
        _t(spark, sf_dir, "documents"), max_hamming=5
    )


@_register(
    "correlation_stats",
    """SELECT round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
              round(covar_samp(l_quantity, l_extendedprice), 4)
                  AS covar_qty_price,
              round(stddev_samp(l_quantity), 6) AS sd_qty,
              round(stddev_samp(l_extendedprice), 4) AS sd_price,
              round(corr(l_discount, l_tax), 6) AS corr_disc_tax
       FROM lineitem""",
    doc="single-pass correlation / sample-covariance / stddev profile "
    "(DataFrame.stat surface as declarative aggregates — partial "
    "co-moment combine keeps the shuffle at one row per partition)",
)
def q_correlation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "corr_qty_price"
        ),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "covar_qty_price"
        ),
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.round(F.corr("l_discount", "l_tax"), 6).alias("corr_disc_tax"),
    )


@_register(
    "char_entropy_docs",
    """WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS ch
                 FROM documents),
       f AS (SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
             FROM ch WHERE ch <> '' GROUP BY doc_id, ch),
       g AS (SELECT doc_id, ch, c,
                    sum(c) OVER (PARTITION BY doc_id) AS n
             FROM f)
       SELECT doc_id, CAST(max(n) AS BIGINT) AS n_chars,
              round(sum((CAST(c AS DOUBLE) / n)
                        * ln(1.0 / (CAST(c AS DOUBLE) / n))), 6)
                  AS char_entropy
       FROM g GROUP BY doc_id""",
    doc="character-entropy quality proxy per document (compression-"
    "ratio-style repetitiveness signal) "
    "(operators/textstats.py::char_entropy)",
)
def q_char_entropy_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textstats import char_entropy

    return char_entropy(_t(spark, sf_dir, "documents"))


@_register(
    "bpe_merges_learned",
    None,
    doc="BPE tokenizer merge learning (Sennrich 2016) on the "
    "Zipf-bounded word-frequency table — iterative algorithm, not "
    "SQL-expressible (per-round state feeds the next round's count); "
    "correctness is pinned against a textbook pure-Python reference "
    "in tests/test_textops.py (operators/bpe.py::bpe_learn_merges)",
)
def q_bpe_merges_learned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import bpe_learn_merges

    return bpe_learn_merges(_t(spark, sf_dir, "documents"), n_merges=10)


@_register(
    "line_dedup_docs",
    """WITH t AS (
         SELECT doc_id,
                'SUBSCRIBE NOW' || chr(10) || text || chr(10)
                    || 'Copyright 2026' AS t2
         FROM documents),
       a AS (SELECT doc_id, string_split(t2, chr(10)) AS arr FROM t),
       l AS (SELECT doc_id, CAST(g.i AS INT) - 1 AS pos, arr[g.i] AS line
             FROM a CROSS JOIN
                  unnest(generate_series(1, len(arr))) AS g(i)),
       c AS (SELECT line, count(DISTINCT doc_id) AS nd
             FROM l GROUP BY line),
       k AS (SELECT l.doc_id, l.pos, l.line, c.nd > 2 AS dropped
             FROM l JOIN c USING (line))
       SELECT doc_id,
              COALESCE(string_agg(CASE WHEN NOT dropped THEN line END,
                                  chr(10) ORDER BY pos), '')
                  AS text_deduped,
              CAST(count(*) AS BIGINT) AS n_lines,
              CAST(sum(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_dropped
       FROM k GROUP BY doc_id""",
    doc="cross-document line dedup (C4/RefinedWeb boilerplate filter): "
    "lines appearing in >2 documents are dropped, survivors reassemble "
    "in original order; the query seeds two corpus-wide boilerplate "
    "lines around every document so the filter provably fires "
    "(operators/dedup.py::drop_common_lines)",
)
def q_line_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import drop_common_lines

    docs = _t(spark, sf_dir, "documents").withColumn(
        "text",
        F.concat(
            F.lit("SUBSCRIBE NOW\n"),
            F.col("text"),
            F.lit("\nCopyright 2026"),
        ),
    )
    return drop_common_lines(docs, max_line_docs=2)


@_register(
    "corpus_curation_funnel",
    r"""WITH d AS (SELECT doc_id, text FROM documents),
       sq AS (
         SELECT doc_id, text FROM (
           SELECT doc_id, text,
                  round(0.4 * least(CAST(len(string_split_regex(trim(text),
                            '\s+')) AS DOUBLE) / 50.0, 1.0)
                      + 0.3 * least((CAST(len(list_filter(
                            string_split_regex(trim(text), '\s+'),
                            t -> t IN ('the','a','of','and','to','in',
                                       'is','it'))) AS DOUBLE)
                          / CAST(len(string_split_regex(trim(text), '\s+'))
                                AS DOUBLE)) / 0.05, 1.0)
                      + 0.3 * (CASE WHEN
                            CAST(length(regexp_replace(text, '\s+', '', 'g'))
                                 AS DOUBLE)
                            / CAST(len(string_split_regex(trim(text), '\s+'))
                                  AS DOUBLE)
                            BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.3 END),
                        4) AS quality
           FROM d) WHERE quality >= 0.8),
       tc AS (SELECT doc_id, token, count(*) AS c
              FROM (SELECT doc_id,
                           unnest(list_filter(string_split_regex(trim(text),
                               '\s+'), t -> t <> '')) AS token
                    FROM sq)
              GROUP BY doc_id, token),
       nr AS (SELECT doc_id FROM tc GROUP BY doc_id
              HAVING NOT (max(c) / CAST(sum(c) AS DOUBLE) > 0.2
                          OR count(*) / CAST(sum(c) AS DOUBLE) < 0.3)),
       s2 AS (SELECT sq.doc_id, sq.text FROM sq JOIN nr USING (doc_id)),
       s3 AS (SELECT doc_id, text FROM s2
              WHERE doc_id IN (SELECT min(doc_id) FROM s2 GROUP BY text)),
       t3 AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
              FROM s3),
       sh AS (SELECT DISTINCT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g
              FROM t3, UNNEST(generate_series(1, greatest(len(toks) - 2, 0)))
                   AS u(i)),
       sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
                 FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
                 GROUP BY a.doc_id, b.doc_id),
       pairs AS (SELECT da, db FROM inter
                 JOIN sz x ON x.doc_id = da
                 JOIN sz y ON y.doc_id = db
                 WHERE round(CAST(i AS DOUBLE) / (x.n + y.n - i), 4) >= 0.5),
       s4 AS (SELECT doc_id, text FROM s3
              WHERE doc_id NOT IN (SELECT db FROM pairs)),
       t4 AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
              FROM s4),
       g4 AS (SELECT DISTINCT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
                     || toks[i+3] || ' ' || toks[i+4] AS g
              FROM t4, UNNEST(generate_series(1, greatest(len(toks) - 4, 0)))
                   AS u(i)),
       tb AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
              FROM d WHERE doc_id < 10),
       bg AS (SELECT DISTINCT
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
                     || toks[i+3] || ' ' || toks[i+4] AS g
              FROM tb, UNNEST(generate_series(1, greatest(len(toks) - 4, 0)))
                   AS u(i)),
       cont AS (SELECT DISTINCT g4.doc_id FROM g4 JOIN bg USING (g)),
       s5 AS (SELECT doc_id FROM s4
              WHERE doc_id NOT IN (SELECT doc_id FROM cont))
       SELECT CAST(stage_idx AS INT) AS stage_idx, stage,
              CAST(n_docs AS BIGINT) AS n_docs
       FROM (
         SELECT 0 AS stage_idx, 'raw' AS stage, count(*) AS n_docs FROM d
         UNION ALL SELECT 1, 'quality', count(*) FROM sq
         UNION ALL SELECT 2, 'repetition', count(*) FROM s2
         UNION ALL SELECT 3, 'exact_dedup', count(*) FROM s3
         UNION ALL SELECT 4, 'near_dup', count(*) FROM s4
         UNION ALL SELECT 5, 'decontaminated', count(*) FROM s5)""",
    doc="END-TO-END corpus curation funnel (quality -> repetition -> "
    "exact dedup -> near-dup prune -> decontamination) with per-stage "
    "survivor counts; the whole composition is oracle-checked, not "
    "just the stages (operators/curation.py::curate_corpus)",
)
def q_corpus_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import curate_corpus

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") < 10)
    _, funnel = curate_corpus(docs, bench)
    return funnel


@_register(
    "grouped_ols_value_on_hour",
    """SELECT event_type,
              CAST(count(*) AS BIGINT) AS n,
              round(covar_pop(value, CAST(extract(hour FROM ts) AS DOUBLE))
                    / var_pop(CAST(extract(hour FROM ts) AS DOUBLE)), 6)
                  AS slope,
              round(avg(value)
                    - covar_pop(value, CAST(extract(hour FROM ts) AS DOUBLE))
                      / var_pop(CAST(extract(hour FROM ts) AS DOUBLE))
                      * avg(CAST(extract(hour FROM ts) AS DOUBLE)), 6)
                  AS intercept,
              round(pow(corr(value, CAST(extract(hour FROM ts) AS DOUBLE)), 2),
                    6) AS r2
       FROM events GROUP BY event_type""",
    doc="per-group OLS (value ~ hour-of-day) fit by a grouped-map "
    "applyInPandas kernel whose closed-form numerics the SQL oracle "
    "recomputes from covar_pop/var_pop/corr — an Arrow grouped-map "
    "UDF with full value-level verification "
    "(operators/profile.py::grouped_ols)",
)
def q_grouped_ols_value_on_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import grouped_ols

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.hour("ts").cast("double").alias("hour"),
        F.col("value"),
    )
    return grouped_ols(ev, "event_type", "hour", "value")


@_register(
    "ols_normal_equations_lineitem",
    # The oracle recomputes the ENTIRE fit — exact decimal sufficient
    # statistics AND the Cramer solve written in the same IEEE
    # operation order as operators/profile.py::_det3 — so it certifies
    # the coefficient solve, not just the sums. Decimal sums are exact
    # in both engines (partition-order independent), making the
    # matrices identical before the (identically-ordered) float
    # arithmetic. The regressors are CENTERED/SCALED (qty−25,
    # (disc−0.05)·100, price/1000): raw TPC-H scales give the normal
    # matrix a ~1e6 condition number that amplifies last-ulp
    # representation differences into the 6th decimal of the
    # coefficients; centering drops it to O(10) so the rounded solve
    # is engine-stable — the same conditioning practice a real fit at
    # scale needs. (DuckDB operands are DECIMAL(19,6): 18-digit
    # operands multiply in int64 and overflow; 19 forces int128.)
    """WITH li AS (
         SELECT (l_quantity - 25.0) AS x1,
                ((l_discount - 0.05) * 100.0) AS x2,
                (l_extendedprice / 1000.0) AS y
         FROM lineitem
         WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
           AND l_extendedprice IS NOT NULL),
       s AS (
         SELECT CAST(count(*) AS DOUBLE) AS n,
                CAST(sum(CAST(x1 AS DECIMAL(19,6))) AS DOUBLE) AS sx1,
                CAST(sum(CAST(x2 AS DECIMAL(19,6))) AS DOUBLE) AS sx2,
                CAST(sum(CAST(y AS DECIMAL(19,6))) AS DOUBLE) AS sy,
                CAST(sum(CAST(CAST(x1 AS DECIMAL(19,6))
                              * CAST(x1 AS DECIMAL(19,6))
                              AS DECIMAL(38,12))) AS DOUBLE) AS s11,
                CAST(sum(CAST(CAST(x1 AS DECIMAL(19,6))
                              * CAST(x2 AS DECIMAL(19,6))
                              AS DECIMAL(38,12))) AS DOUBLE) AS s12,
                CAST(sum(CAST(CAST(x2 AS DECIMAL(19,6))
                              * CAST(x2 AS DECIMAL(19,6))
                              AS DECIMAL(38,12))) AS DOUBLE) AS s22,
                CAST(sum(CAST(CAST(x1 AS DECIMAL(19,6))
                              * CAST(y AS DECIMAL(19,6))
                              AS DECIMAL(38,12))) AS DOUBLE) AS sx1y,
                CAST(sum(CAST(CAST(x2 AS DECIMAL(19,6))
                              * CAST(y AS DECIMAL(19,6))
                              AS DECIMAL(38,12))) AS DOUBLE) AS sx2y,
                CAST(sum(CAST(CAST(y AS DECIMAL(19,6))
                              * CAST(y AS DECIMAL(19,6))
                              AS DECIMAL(38,12))) AS DOUBLE) AS syy
         FROM li),
       d AS (SELECT *,
               n*(s11*s22 - s12*s12) - sx1*(sx1*s22 - s12*sx2)
                 + sx2*(sx1*s12 - s11*sx2) AS det
             FROM s),
       b AS (SELECT *,
               (sy*(s11*s22 - s12*s12) - sx1*(sx1y*s22 - s12*sx2y)
                  + sx2*(sx1y*s12 - s11*sx2y)) / det AS b0,
               (n*(sx1y*s22 - s12*sx2y) - sy*(sx1*s22 - s12*sx2)
                  + sx2*(sx1*sx2y - sx1y*sx2)) / det AS b1,
               (n*(s11*sx2y - sx1y*s12) - sx1*(sx1*sx2y - sx1y*sx2)
                  + sy*(sx1*s12 - s11*sx2)) / det AS b2
             FROM d),
       r AS (SELECT *, syy - (b0*sy + b1*sx1y + b2*sx2y) AS sse,
                       syy - sy*sy/n AS sst
             FROM b)
       SELECT 'intercept' AS term, round(b0, 6) AS value FROM r
       UNION ALL SELECT 'coef_qty_c', round(b1, 6) FROM r
       UNION ALL SELECT 'coef_disc_c', round(b2, 6) FROM r
       UNION ALL SELECT 'r2', round(1.0 - sse/sst, 6) FROM r
       UNION ALL SELECT 'n', n FROM r""",
    doc="distributed multi-feature OLS via normal equations: ONE pass "
    "computes exact-decimal XᵀX / Xᵀy partials (map-side combine, "
    "O(d²) numbers to the driver), Cramer solve on the driver — the "
    "100 TB linear-regression shape; price(k$) ~ centered quantity + "
    "centered discount "
    "(operators/profile.py::ols_fit2, ols_normal_eq_sums)",
)
def q_ols_normal_equations_lineitem(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.profile import ols_fit2

    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_quantity") - 25.0).alias("qty_c"),
        ((F.col("l_discount") - 0.05) * 100.0).alias("disc_c"),
        (F.col("l_extendedprice") / 1000.0).alias("price_k"),
    )
    return ols_fit2(li, "qty_c", "disc_c", "price_k")


@_register(
    "dq_constraint_report",
    """WITH v AS (
         SELECT 'o_orderkey_not_null' AS constraint_name,
                CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                     AS BIGINT) AS violations
         FROM orders
         UNION ALL
         SELECT 'o_orderkey_unique',
                CAST(count(o_orderkey) - count(DISTINCT o_orderkey)
                     AS BIGINT)
         FROM orders
         UNION ALL
         SELECT 'o_orderstatus_in_set',
                CAST(sum(CASE WHEN o_orderstatus IS NOT NULL
                              AND o_orderstatus NOT IN ('F','O','P')
                         THEN 1 ELSE 0 END) AS BIGINT)
         FROM orders
         UNION ALL
         SELECT 'o_totalprice_range',
                CAST(sum(CASE WHEN o_totalprice IS NOT NULL
                              AND (o_totalprice < 0
                                   OR o_totalprice > 400000)
                         THEN 1 ELSE 0 END) AS BIGINT)
         FROM orders
         UNION ALL
         SELECT 'o_custkey_fk_customer',
                (SELECT CAST(count(*) AS BIGINT) FROM orders o
                 WHERE o.o_custkey IS NOT NULL
                   AND NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)))
       SELECT constraint_name, violations,
              CASE WHEN violations = 0 THEN 'pass' ELSE 'fail' END
                  AS status
       FROM v""",
    doc="Deequ-style declarative data-quality audit over orders: "
    "not-null / uniqueness / set-membership / range checks fused into "
    "ONE aggregate pass + a broadcast anti-join referential check "
    "against customer; the o_totalprice range is deliberately tight "
    "so the report shows a real 'fail' row "
    "(operators/dq.py::constraint_report)",
)
def q_dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dq import constraint_report, in_range, in_set, not_null

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    return constraint_report(
        orders,
        row_checks={
            "o_orderkey_not_null": not_null("o_orderkey"),
            "o_orderstatus_in_set": in_set("o_orderstatus", ["F", "O", "P"]),
            "o_totalprice_range": in_range("o_totalprice", 0, 400000),
        },
        unique_keys={"o_orderkey_unique": ["o_orderkey"]},
        foreign_keys={
            "o_custkey_fk_customer": (customer, ["o_custkey"], ["c_custkey"])
        },
    )


@_register(
    "cdc_apply_orders",
    # Deterministic synthetic changelog over orders: keys %7==1 get a
    # seq-1 update then a seq-2 update (+100 then +200 — latest wins),
    # keys %7==2 get a tombstone, and 50 brand-new keys (orderkey +
    # 10M) arrive as inserts. The oracle replays the same log with
    # QUALIFY row_number.
    """WITH base AS (SELECT o_orderkey,
                            CAST(0 AS BIGINT) AS seq, 'I' AS op,
                            o_totalprice
                     FROM orders),
       chg AS (
         SELECT o_orderkey, CAST(1 AS BIGINT) AS seq, 'U' AS op,
                round(o_totalprice + 100.0, 2) AS o_totalprice
         FROM orders WHERE o_orderkey % 7 = 1
         UNION ALL
         SELECT o_orderkey, CAST(2 AS BIGINT), 'U',
                round(o_totalprice + 200.0, 2)
         FROM orders WHERE o_orderkey % 7 = 1
         UNION ALL
         SELECT o_orderkey, CAST(1 AS BIGINT), 'D', NULL
         FROM orders WHERE o_orderkey % 7 = 2
         UNION ALL
         SELECT o_orderkey + 10000000, CAST(1 AS BIGINT), 'I',
                round(o_totalprice, 2)
         FROM orders WHERE o_orderkey % 300 = 3),
       lg AS (SELECT * FROM base UNION ALL SELECT * FROM chg),
       latest AS (SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                               ORDER BY seq DESC) AS rn
                  FROM lg)
       SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
       FROM latest WHERE rn = 1 AND op <> 'D'""",
    doc="CDC changelog apply (Debezium-feed shape): I/U/D ops with a "
    "monotone sequence folded onto a base snapshot — latest-wins per "
    "key, delete tombstones drop keys, replay-idempotent; ONE hash "
    "shuffle on the key (operators/merge.py::cdc_apply)",
)
def q_cdc_apply_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.merge import cdc_apply

    base = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice")
    )
    raw = _t(spark, sf_dir, "orders")
    u1 = raw.filter(F.col("o_orderkey") % 7 == 1).select(
        "o_orderkey",
        F.lit(1).cast("long").alias("seq"),
        F.lit("U").alias("op"),
        F.round(F.col("o_totalprice") + 100.0, 2).alias("o_totalprice"),
    )
    u2 = raw.filter(F.col("o_orderkey") % 7 == 1).select(
        "o_orderkey",
        F.lit(2).cast("long").alias("seq"),
        F.lit("U").alias("op"),
        F.round(F.col("o_totalprice") + 200.0, 2).alias("o_totalprice"),
    )
    d1 = raw.filter(F.col("o_orderkey") % 7 == 2).select(
        "o_orderkey",
        F.lit(1).cast("long").alias("seq"),
        F.lit("D").alias("op"),
        F.lit(None).cast("double").alias("o_totalprice"),
    )
    i1 = raw.filter(F.col("o_orderkey") % 300 == 3).select(
        (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
        F.lit(1).cast("long").alias("seq"),
        F.lit("I").alias("op"),
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )
    changes = u1.unionByName(u2).unionByName(d1).unionByName(i1).select(
        "o_orderkey", "o_totalprice", "seq", "op"
    )
    return cdc_apply(base, changes, ["o_orderkey"])


@_register(
    "fk_containment_profile",
    """SELECT 'lineitem_part' AS relation,
              CAST(count(*) AS BIGINT) AS n_fact_keys,
              CAST(sum(CASE WHEN p_partkey IS NOT NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_contained,
              round(sum(CASE WHEN p_partkey IS NOT NULL THEN 1 ELSE 0 END)
                    / CAST(count(*) AS DOUBLE), 4) AS containment
       FROM (SELECT DISTINCT l_partkey FROM lineitem
             WHERE l_partkey IS NOT NULL) f
       LEFT JOIN (SELECT DISTINCT p_partkey FROM part) d
         ON f.l_partkey = d.p_partkey
       UNION ALL
       SELECT 'orders_customer',
              CAST(count(*) AS BIGINT),
              CAST(sum(CASE WHEN c_custkey IS NOT NULL THEN 1 ELSE 0 END)
                   AS BIGINT),
              round(sum(CASE WHEN c_custkey IS NOT NULL THEN 1 ELSE 0 END)
                    / CAST(count(*) AS DOUBLE), 4)
       FROM (SELECT DISTINCT o_custkey FROM orders
             WHERE o_custkey IS NOT NULL) f
       LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) d
         ON f.o_custkey = d.c_custkey
       UNION ALL
       SELECT 'lineitem_orderkey_vs_custkey',
              CAST(count(*) AS BIGINT),
              CAST(sum(CASE WHEN c_custkey IS NOT NULL THEN 1 ELSE 0 END)
                   AS BIGINT),
              round(sum(CASE WHEN c_custkey IS NOT NULL THEN 1 ELSE 0 END)
                    / CAST(count(*) AS DOUBLE), 4)
       FROM (SELECT DISTINCT l_orderkey FROM lineitem
             WHERE l_orderkey IS NOT NULL) f
       LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) d
         ON f.l_orderkey = d.c_custkey""",
    doc="join-key discovery: containment coefficient of candidate "
    "foreign-key relationships (lineitem→part and orders→customer are "
    "clean FKs; lineitem.l_orderkey⊆customer.c_custkey is the planted "
    "negative) — distinct key sets join, never fact rows "
    "(operators/dq.py::fk_containment_profile)",
)
def q_fk_containment_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dq import fk_containment_profile

    li = _t(spark, sf_dir, "lineitem")
    return fk_containment_profile(
        {
            "lineitem_part": (li, "l_partkey", _t(spark, sf_dir, "part"), "p_partkey"),
            "orders_customer": (
                _t(spark, sf_dir, "orders"),
                "o_custkey",
                _t(spark, sf_dir, "customer"),
                "c_custkey",
            ),
            "lineitem_orderkey_vs_custkey": (
                li,
                "l_orderkey",
                _t(spark, sf_dir, "customer"),
                "c_custkey",
            ),
        }
    )


@_register(
    "weighted_sample_parts",
    """WITH k AS (
         SELECT p_partkey, p_retailprice,
                ln((CAST('0x' || substr(md5('42-'
                         || CAST(p_partkey AS VARCHAR)), 1, 12)
                         AS BIGINT) + 0.5) / 281474976710656.0)
                  / CAST(p_retailprice AS DOUBLE) AS aes
         FROM part
         WHERE p_retailprice IS NOT NULL AND p_retailprice > 0)
       SELECT p_partkey, p_retailprice
       FROM k ORDER BY aes DESC, p_partkey LIMIT 100""",
    doc="Efraimidis-Spirakis weighted sample without replacement, "
    "k=100 parts with probability ∝ retail price — deterministic "
    "md5-derived uniforms make the selection engine-exact and "
    "layout-independent; top-k via TakeOrderedAndProject, no global "
    "sort (operators/sample.py::weighted_sample)",
)
def q_weighted_sample_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sample import weighted_sample

    return weighted_sample(
        _t(spark, sf_dir, "part"), "p_partkey", "p_retailprice", k=100
    )


@_register(
    "zorder_keys_events",
    # The z-key arithmetic is deterministic IEEE double math (subtract,
    # divide, scale, floor — identical op order on both engines), so
    # the Morton interleave itself is oracle-checkable bit for bit.
    """WITH b AS (SELECT min(user_id) AS mnu, max(user_id) AS mxu,
                         min(value) AS mnv, max(value) AS mxv
                  FROM events),
       g AS (SELECT e.event_id,
                    least(CAST(floor(((CAST(e.user_id AS DOUBLE)
                                       - CAST(b.mnu AS DOUBLE))
                                      / (CAST(b.mxu AS DOUBLE)
                                         - CAST(b.mnu AS DOUBLE)))
                                     * 256.0) AS BIGINT), 255) AS gu,
                    least(CAST(floor(((e.value - b.mnv)
                                      / (b.mxv - b.mnv))
                                     * 256.0) AS BIGINT), 255) AS gv
             FROM events e, b),
       z AS (SELECT event_id,
                    sum(((gu >> i) & 1) * (1 << (2 * i))
                        + ((gv >> i) & 1) * (1 << (2 * i + 1))) AS zkey
             FROM g, UNNEST(generate_series(0, 7)) AS u(i)
             GROUP BY event_id)
       SELECT event_id, CAST(zkey AS BIGINT) AS zkey FROM z""",
    doc="Morton/z-order clustering key over (user_id, value): min-max "
    "grid scale + bit interleave, all shift/mask expressions inside "
    "whole-stage codegen; the key zorder_write range-partitions on so "
    "multi-column predicates prune files on BOTH dimensions — the "
    "Delta/Iceberg OPTIMIZE ZORDER layout primitive "
    "(operators/layout.py::zorder_key)",
)
def q_zorder_keys_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.layout import zorder_key

    ev = _t(spark, sf_dir, "events")
    return zorder_key(ev, ["user_id", "value"], bits=8).select(
        "event_id", F.col("_zkey").alias("zkey")
    )


@_register(
    "substring_dup_runs",
    r"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                  FROM documents),
       g AS (SELECT doc_id, CAST(u.i AS INT) - 1 AS pos,
                    array_to_string(list_slice(toks, u.i, u.i + 7), ' ') AS g
             FROM t, UNNEST(generate_series(1, len(toks) - 7)) AS u(i)
             WHERE len(toks) >= 8),
       m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa,
                    a.pos - b.pos AS diag
             FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id),
       isl AS (SELECT doc_a, doc_b, diag, pa,
                      pa - row_number() OVER (
                          PARTITION BY doc_a, doc_b, diag ORDER BY pa)
                          AS island
               FROM m),
       runs AS (SELECT doc_a, doc_b, diag, island,
                       count(*) + 7 AS run_len
                FROM isl GROUP BY doc_a, doc_b, diag, island)
       SELECT doc_a, doc_b,
              CAST(max(run_len) AS INT) AS max_run,
              CAST(sum(CASE WHEN run_len >= 10 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_runs
       FROM runs GROUP BY doc_a, doc_b
       HAVING max(run_len) >= 10""",
    doc="exact duplicated-substring runs across document pairs "
    "(token-level Lee et al. 2021 substring dedup): positional 8-gram "
    "equi-join -> diagonal gaps-and-islands -> longest shared token "
    "run >= 10 (operators/dedup.py::shared_substring_runs)",
)
def q_substring_dup_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import shared_substring_runs

    return shared_substring_runs(
        _t(spark, sf_dir, "documents"), k=8, min_run=10
    )


@_register(
    "streaming_static_join_counts",
    """SELECT time_bucket(INTERVAL '1 day', ts) AS window_start,
              time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day'
                  AS window_end,
              n_name, count(*) AS n, round(sum(value), 2) AS sum_value
       FROM events e
       JOIN customer c ON e.user_id = c.c_custkey
       JOIN nation nt ON c.c_nationkey = nt.n_nationkey
       GROUP BY 1, 2, 3""",
    doc="STREAM-STATIC join: the streaming events source enriched "
    "against broadcast static dimensions (customer -> nation) before "
    "a watermarked daily tumbling-window aggregation — the standard "
    "streaming-enrichment topology; day windows are epoch-midnight-"
    "aligned in both engines so the batch oracle agrees exactly "
    "(streaming/windows.py::windowed_counts)",
)
def q_streaming_static_join_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..streaming import run_windowed_batch, windowed_counts

    ev = _events_stream(spark, sf_dir)
    dims = (
        _t(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("user_id"), "c_nationkey")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").select(
                    F.col("n_nationkey").alias("c_nationkey"), "n_name"
                )
            ),
            "c_nationkey",
        )
        .select("user_id", "n_name")
    )
    enriched = ev.join(F.broadcast(dims), "user_id")
    agg = windowed_counts(
        enriched,
        key_col="n_name",
        window_duration="1 day",
        watermark="2 hours",
    )
    out = run_windowed_batch(agg, query_name="static_join_counts")
    return out.select(
        F.col("window_start").cast("timestamp_ntz").alias("window_start"),
        F.col("window_end").cast("timestamp_ntz").alias("window_end"),
        "n_name",
        "n",
        F.round("sum_value", 2).alias("sum_value"),
    )


@_register(
    "bfs_copurchase_hops",
    # True BFS distance is deterministic (no floats, no sampling), so
    # the recursive-CTE oracle replays it exactly: enumerate (node,
    # hops) pairs up to depth 3, take min(hops) per node. The Spark
    # side reaches the same set via fixed-depth frontier expansion
    # with anti-join dedup — first-reach depth IS the minimum.
    """WITH RECURSIVE
       op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
              FROM lineitem),
       edges AS (SELECT DISTINCT a.p AS s, b.p AS d
                 FROM op a JOIN op b ON a.o = b.o AND a.p <> b.p),
       bfs(node, hops) AS (
           SELECT (SELECT min(l_partkey) FROM lineitem), 0
           UNION
           SELECT e.d, b.hops + 1
           FROM bfs b JOIN edges e ON e.s = b.node
           WHERE b.hops < 3)
       SELECT node, CAST(min(hops) AS INT) AS hops
       FROM bfs GROUP BY node""",
    doc="bounded-depth BFS distance over the part co-purchase graph "
    "from the minimum part key: every part within 3 hops with its "
    "true BFS distance (operators/graph.py::bfs_hops — fixed-depth "
    "frontier expansion, one node-keyed equi-join + distinct + "
    "anti-join per round; frontiers broadcast in early hops)",
)
def q_bfs_copurchase_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import bfs_hops, copurchase_edges

    li = _t(spark, sf_dir, "lineitem")
    seed = li.agg(F.min("l_partkey")).head()[0]
    edges = copurchase_edges(li)
    return bfs_hops(edges, seed=int(seed), max_hops=3)


@_register(
    "pagerank_copurchase",
    # Fixed-point (integer micro-unit) PageRank is exactly replayable
    # in SQL: the 8 iterations unroll into 8 chained CTEs of identical
    # shape, every step integral (`//` = Spark's `div`), so the BIGINT
    # rank_units match bit-for-bit. The graph is symmetric (both edge
    # directions emitted) => dangling-free, so the uniform base term is
    # the same constant every round.
    r"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                   FROM lineitem WHERE l_orderkey < 2000),
       e AS (SELECT DISTINCT a.pk AS src, b.pk AS dst
             FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk),
       nodes AS (SELECT DISTINCT src AS node FROM e),
       nn AS (SELECT count(*) AS n FROM nodes),
       deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
       r0 AS (SELECT node, CAST(1000000000000 // nn.n AS BIGINT) AS u
              FROM nodes CROSS JOIN nn),
"""
    + ",\n".join(
        f"""       i{k} AS (SELECT x.node,
               CAST((15 * 1000000000000) // (100 * nn.n)
                    + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS u
              FROM nodes x CROSS JOIN nn
              LEFT JOIN (SELECT e.dst AS node, sum(r.u // deg.d) AS s
                         FROM e JOIN {'r0' if k == 1 else f'i{k - 1}'} r
                              ON e.src = r.node
                              JOIN deg ON deg.src = e.src
                         GROUP BY e.dst) c ON x.node = c.node)"""
        for k in range(1, 9)
    )
    + """
       SELECT node, u AS rank_units,
              round(CAST(u AS DOUBLE) / 1000000000000.0, 8) AS rank
       FROM i8 ORDER BY rank DESC, node LIMIT 20""",
    doc="PageRank over the part co-purchase graph (lineitem self-join "
    "on the order key -> symmetric edges), top-20 parts by rank, run "
    "in FIXED-POINT mode (exact_units=10^12): every rank is a BIGINT "
    "unit count and every step integral division, so the iteration is "
    "bit-deterministic — independent of shuffle order, executor "
    "count, and engine — which both makes it value-oracle-able "
    "(8 unrolled integer CTE rounds) and is the reproducibility "
    "property you want for a ranking job on a 1000-executor cluster "
    "(float PageRank differs in final ulps run-to-run). The float "
    "path stays pinned against a NumPy power-iteration reference "
    "incl. dangling-mass handling in tests/test_textops.py "
    "(operators/graph.py::pagerank, ::_pagerank_fixed_point)",
)
def q_pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import copurchase_edges, pagerank

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    ranks = pagerank(copurchase_edges(li), n_iter=8, exact_units=10**12)
    return ranks.select(
        "node", "rank_units", F.round("rank", 8).alias("rank")
    ).orderBy(F.col("rank").desc(), F.col("node")).limit(20)


@_register(
    "corpus_report",
    r"""WITH s AS (
         SELECT doc_id, source, lang,
                CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                    AS toks,
                length(text) AS chars,
                CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                         t -> t IN ('the','a','of','and','to','in','is','it')))
                    AS DOUBLE) AS sw
         FROM documents)
       SELECT CAST(count(*) AS BIGINT) AS n_docs,
              CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
              CAST(sum(toks) AS BIGINT) AS total_tokens,
              CAST(sum(chars) AS BIGINT) AS total_chars,
              round(avg(toks), 4) AS avg_tokens,
              CAST(min(toks) AS BIGINT) AS min_tokens,
              CAST(max(toks) AS BIGINT) AS max_tokens,
              round(CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY toks)
                    AS DOUBLE), 4) AS median_tokens,
              round(avg(sw / toks), 6) AS avg_stopword_ratio,
              round(sum(CASE WHEN sw / toks >= 0.02 THEN 1 ELSE 0 END)
                    / CAST(count(*) AS DOUBLE), 4) AS en_fraction
       FROM s""",
    doc="one-pass corpus datasheet: doc/source/token/char totals, "
    "token-length distribution (exact median), stopword ratio, "
    "language-ID fraction — the dataset-card summary every training "
    "corpus ships with; single aggregate, map-side partials "
    "(operators/textstats.py expressions)",
)
def q_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import token_count
    from ..operators.textstats import stopword_count

    d = _t(spark, sf_dir, "documents")
    toks = token_count("text")
    swr = stopword_count("text") / toks
    base = d.select(
        F.col("source"),
        toks.cast("bigint").alias("toks"),
        F.length("text").alias("chars"),
        swr.alias("swr"),
    )
    return base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum("toks").alias("total_tokens"),
        F.sum("chars").alias("total_chars"),
        F.round(F.avg("toks"), 4).alias("avg_tokens"),
        F.min("toks").alias("min_tokens"),
        F.max("toks").alias("max_tokens"),
        F.round(
            F.expr("percentile(toks, 0.5)"), 4
        ).alias("median_tokens"),
        F.round(F.avg("swr"), 6).alias("avg_stopword_ratio"),
        F.round(
            F.sum((F.col("swr") >= 0.02).cast("int"))
            / F.count(F.lit(1)),
            4,
        ).alias("en_fraction"),
    )


@_register(
    "multimodal_patch_features",
    r"""WITH d AS (SELECT doc_id, sha256(coalesce(text, '')) AS h
                  FROM documents),
       px AS (SELECT doc_id,
                     ((i // 3) // 32) AS r, ((i // 3) % 32) AS c,
                     CAST(concat('0x', substr(h, 2 * (i % 32) + 1, 2))
                          AS INTEGER) AS b
              FROM d, UNNEST(range(0, 3072)) AS u(i)),
       s AS (SELECT doc_id,
                    CAST((r // 16) * 2 + (c // 16) AS INTEGER) AS patch_id,
                    sum(b) AS sx, sum(b * b) AS sx2
             FROM px GROUP BY doc_id, patch_id)
       SELECT doc_id AS media_id, patch_id,
              CAST(sx AS DOUBLE) / 768 AS mean,
              sqrt(CAST(768 * sx2 - sx * sx AS DOUBLE) / 589824) AS std
       FROM s""",
    doc="ViT-style patch-grid features: fake-resize documents' binary "
    "payloads to 32x32 RGB, then 16x16 non-overlapping patches with "
    "per-patch mean/std — real numpy math over raw pixel buffers "
    "(no codec), map-only mapInPandas. Value-oracled: the fake resize "
    "is a cyclic sha256-digest tiling and the patch stats use the "
    "exact integer identity, so DuckDB rebuilds every pixel from the "
    "digest hex and lands on bit-identical doubles "
    "(operators/multimodal.py::extract_patches)",
)
def q_multimodal_patch_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import extract_patches, resize_images

    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    resized = resize_images(docs, width=32, height=32, fake=True)
    return extract_patches(resized, width=32, height=32, patch=16)


@_register(
    "python_datasource_squares",
    """SELECT CAST(g.i AS BIGINT) AS i,
              CAST(g.i * g.i AS BIGINT) AS i_squared
       FROM generate_series(0, 1999) AS g(i)""",
    doc="Spark 4 Python Data Source API: custom partitioned batch "
    "source (sources/pyds.py::SquaresDataSource) read via "
    "spark.read.format('squares') — deterministic rows, so even a "
    "from-thin-air source is value-oracled",
)
def q_python_datasource_squares(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.pyds import register

    register(spark)
    return (
        spark.read.format("squares")
        .option("start", 0)
        .option("n", 2000)
        .option("partitions", 8)
        .load()
    )


@_register(
    "variant_extract_props",
    """SELECT CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) % 10
              AS INTEGER) AS k_mod,
              CAST(count(*) AS BIGINT) AS n,
              CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER))
                   AS BIGINT) AS sum_k
       FROM events WHERE props IS NOT NULL
       GROUP BY 1""",
    doc="Spark 4 VariantType semi-structured path: parse_json -> "
    "VARIANT column -> typed variant_get extraction -> aggregate "
    "(the open-schema alternative to from_json's fixed schema)",
)
def q_variant_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    v = ev.select(F.parse_json("props").alias("v"))
    k = F.variant_get("v", "$.k", "int")
    return (
        v.select((k % 10).alias("k_mod"), k.alias("k"))
        .groupBy("k_mod")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
        )
    )


@_register(
    "streaming_python_source_squares",
    """SELECT CAST(g.i AS BIGINT) AS i,
              CAST(g.i * g.i AS BIGINT) AS i_squared
       FROM generate_series(0, 499) AS g(i)""",
    doc="Spark 4 STREAMING Python data source "
    "(SimpleDataSourceStreamReader): custom offset-tracked source "
    "drained across 100-row micro-batches into a memory sink; "
    "deterministic rows -> full value oracle "
    "(sources/pyds.py::SquaresStreamDataSource)",
)
def q_streaming_python_source_squares(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..sources.pyds import register_stream
    from ..streaming import run_windowed_batch

    # register_stream pins BY-VALUE pickling: the streaming-source
    # runner is a fresh driver-side process that cannot import this
    # package when the driver's cwd isn't the repo root (addPyFile
    # reaches executors, not that runner).
    register_stream(spark)
    stream = (
        spark.readStream.format("squares_stream")
        .option("n", "500")
        .option("batch_rows", "100")
        .load()
    )
    return run_windowed_batch(
        stream, query_name="py_stream_squares", output_mode="append"
    )


@_register(
    "udtf_trigrams_docs",
    r"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                  FROM documents WHERE doc_id < 20)
       SELECT doc_id, CAST(u.i - 1 AS INT) AS pos,
              toks[u.i] || ' ' || toks[u.i+1] || ' ' || toks[u.i+2] AS gram
       FROM t, UNNEST(generate_series(1, len(toks) - 2)) AS u(i)""",
    doc="Spark 4 Python UDTF surface: LATERAL word_trigrams(text) over "
    "documents (functions/udtfs.py::WordNgrams) — the table-valued "
    "member of the U-family; the JVM explode/slice formulation stays "
    "the at-scale path, this checks the lateral-join surface itself",
)
def q_udtf_trigrams_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.udtfs import register_udtfs

    register_udtfs(spark)
    _t(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 20
    ).createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT doc_id, g.pos, g.gram "
        "FROM _udtf_docs, LATERAL word_trigrams(text) g"
    )


@_register(
    "salted_agg_returnflag",
    """SELECT l_returnflag,
              CAST(sum(l_quantity) AS DOUBLE) AS sum_l_quantity,
              CAST(count(*) AS BIGINT) AS count_l_orderkey,
              CAST(max(l_extendedprice) AS DOUBLE) AS max_l_extendedprice
       FROM lineitem GROUP BY l_returnflag""",
    doc="skew-safe two-stage salted aggregation (tuning.py::"
    "salted_aggregate): (key, salt) partial agg -> key merge; "
    "result-identical to the plain groupBy oracle, which is the whole "
    "point — salting changes the shuffle distribution, never the "
    "answer",
)
def q_salted_agg_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..tuning import salted_aggregate

    li = _t(spark, sf_dir, "lineitem")
    out = salted_aggregate(
        li,
        ["l_returnflag"],
        {"l_quantity": "sum", "l_orderkey": "count", "l_extendedprice": "max"},
        n_salts=16,
    )
    return out.select(
        "l_returnflag",
        F.col("sum_l_quantity").cast("double").alias("sum_l_quantity"),
        F.col("count_l_orderkey").cast("bigint").alias("count_l_orderkey"),
        F.col("max_l_extendedprice")
        .cast("double")
        .alias("max_l_extendedprice"),
    )


@_register(
    "returned_revenue_topk",
    """SELECT c_custkey, c_name, n_name,
              round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
       FROM customer
       JOIN orders ON c_custkey = o_custkey
       JOIN lineitem ON l_orderkey = o_orderkey
       JOIN nation ON c_nationkey = n_nationkey
       WHERE l_returnflag = 'R'
       GROUP BY c_custkey, c_name, n_name
       ORDER BY revenue DESC, c_custkey LIMIT 20""",
    doc="TPC-H Q10 shape: returned-item revenue per customer across a "
    "4-way join (fact-fact on the order key, broadcast dims), "
    "deterministic top-20 (rounded-revenue DESC, custkey tie-break)",
)
def q_returned_revenue_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_r")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("c_custkey", "c_name", "n_name", rev)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum("_r"), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@_register(
    "recursive_date_spine",
    """WITH RECURSIVE days(d) AS (
         SELECT DATE '1995-01-01'
         UNION ALL SELECT d + 1 FROM days WHERE d < DATE '1995-01-31'),
       per AS (SELECT CAST(o_orderdate AS DATE) AS d,
                      CAST(count(*) AS BIGINT) AS n
               FROM orders
               WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1995-01-01'
                     AND DATE '1995-01-31'
               GROUP BY 1)
       SELECT days.d AS day, CAST(coalesce(per.n, 0) AS BIGINT) AS n_orders
       FROM days LEFT JOIN per ON days.d = per.d""",
    doc="recursive CTE (Spark 4 WITH RECURSIVE) date spine + gap-fill: "
    "every day of Jan-1995 with its order count, zero-days included — "
    "the calendar-densification pattern reporting layers need; "
    "executed as real recursive SQL in BOTH engines",
)
def q_recursive_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("_orders_spine")
    return spark.sql(
        """
        WITH RECURSIVE days(d) AS (
          SELECT DATE '1995-01-01'
          UNION ALL SELECT date_add(d, 1) FROM days
          WHERE d < DATE '1995-01-31')
        SELECT days.d AS day,
               CAST(coalesce(per.n, 0) AS BIGINT) AS n_orders
        FROM days LEFT JOIN (
          SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n
          FROM _orders_spine
          WHERE CAST(o_orderdate AS DATE)
                BETWEEN DATE '1995-01-01' AND DATE '1995-01-31'
          GROUP BY 1) per
        ON days.d = per.d
        """
    )


@_register(
    "daily_revenue_change",
    """WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
                        round(sum(o_totalprice), 2) AS revenue
               FROM orders
               WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1995-01-01'
                     AND DATE '1995-03-31'
               GROUP BY 1)
       SELECT day, revenue,
              round(revenue - lag(revenue) OVER (ORDER BY day), 2)
                  AS change,
              round((revenue - lag(revenue) OVER (ORDER BY day))
                    / lag(revenue) OVER (ORDER BY day) * 100, 4)
                  AS pct_change
       FROM d""",
    doc="day-over-day revenue deltas via lag over an ordered daily "
    "aggregate (the time-series diff window family; first day yields "
    "NULL change in both engines)",
)
def q_daily_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    day = F.col("o_orderdate").cast("date")
    d = (
        o.filter(day.between(F.lit("1995-01-01"), F.lit("1995-03-31")))
        .groupBy(day.alias("day"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    w = Window.orderBy("day")
    prev = F.lag("revenue").over(w)
    return d.select(
        "day",
        "revenue",
        F.round(F.col("revenue") - prev, 2).alias("change"),
        F.round((F.col("revenue") - prev) / prev * 100, 4).alias(
            "pct_change"
        ),
    )


@_register(
    "window_percentile_ranks",
    """SELECT c_custkey, c_nationkey,
              round(percent_rank() OVER (PARTITION BY c_nationkey
                                         ORDER BY c_acctbal, c_custkey)
                    + 1e-9, 6) AS pct_rank,
              round(cume_dist() OVER (PARTITION BY c_nationkey
                                      ORDER BY c_acctbal, c_custkey)
                    + 1e-9, 6) AS cume
       FROM customer""",
    doc="percent_rank + cume_dist per nation over account balance "
    "(the relative-standing window family; ties broken by custkey so "
    "both engines rank identically). The +1e-9 nudge (identical both "
    "sides) steps off exact round-half boundaries: k/(n-1) lands on "
    "an exact decimal half whenever the partition size divides a "
    "2·10^d, and Spark rounds doubles HALF_UP while DuckDB rounds "
    "HALF_EVEN — caught by the sf0.1 sweep where one nation has a "
    "641-row partition (41/640 = 0.0640625 exactly).",
)
def q_window_percentile_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.round(F.percent_rank().over(w) + 1e-9, 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w) + 1e-9, 6).alias("cume"),
    )


# =====================================================================
# TPC-H query shapes (round 4 widening). The reference has no joins at
# all (SURVEY §2.6), but an engine a reference user switches to must
# run the canonical warehouse shapes; each is written for its 100 TB
# plan: filters on the scan (parquet pushdown), broadcast dims, partial
# aggregation, deterministic tie-breaks for top-k.
# =====================================================================


@_register(
    "revenue_forecast_filter",
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
              CAST(count(*) AS BIGINT) AS n_rows
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         AND l_shipdate < TIMESTAMP '1997-01-01'
         AND l_discount BETWEEN 0.05 AND 0.07
         AND l_quantity < 24""",
    doc="TPC-H Q6 shape: pure scan->filter->global agg, zero shuffle "
    "beyond the single-row final combine; every predicate reaches the "
    "parquet scan (PushedFilters on shipdate/discount/quantity), so at "
    "100 TB this is I/O-bound with row-group skipping — the query "
    "plan-shape tests pin pushdown for",
)
def q_revenue_forecast_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@_register(
    "shipping_priority_topk",
    """SELECT l_orderkey,
              round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
              o_orderdate, o_orderpriority
       FROM customer
       JOIN orders ON c_custkey = o_custkey
       JOIN lineitem ON l_orderkey = o_orderkey
       WHERE c_mktsegment = 'BUILDING'
         AND o_orderdate < TIMESTAMP '1998-01-01'
         AND l_shipdate > TIMESTAMP '1998-01-01'
       GROUP BY l_orderkey, o_orderdate, o_orderpriority
       ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    doc="TPC-H Q3 shape (shipping priority): segment-filtered customer "
    "semi-reduces orders, then the fact-fact join on the order key; "
    "top-10 via TakeOrderedAndProject (no global sort materialization); "
    "rounded-revenue DESC with orderkey tie-break keeps the selected "
    "set engine-identical",
)
def q_shipping_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2,
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@_register(
    "promo_revenue_share",
    """SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                       THEN l_extendedprice * (1 - l_discount)
                       ELSE 0 END)
              / sum(l_extendedprice * (1 - l_discount)), 4)
           AS promo_share_pct
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE l_shipdate >= TIMESTAMP '1996-09-01'
         AND l_shipdate < TIMESTAMP '1996-10-01'""",
    doc="TPC-H Q14 shape (promotion effect): month-filtered fact "
    "broadcast-joined to the part dim, conditional-aggregate ratio in "
    "one pass — numerator and denominator share the scan; the date "
    "range prunes the fact before the join at any scale",
)
def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_share_pct")
        )
    )


@_register(
    "disjunctive_bracket_revenue",
    """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
              CAST(count(*) AS BIGINT) AS n_items
       FROM lineitem JOIN part ON p_partkey = l_partkey
       WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
              AND l_quantity BETWEEN 1 AND 21)
          OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
              AND l_quantity BETWEEN 10 AND 30)
          OR (p_brand = 'Brand#5' AND p_size BETWEEN 1 AND 35
              AND l_quantity BETWEEN 20 AND 40)""",
    doc="TPC-H Q19 shape: OR-of-ANDs predicate mixing both join sides. "
    "Catalyst cannot push a cross-table disjunction through the join, "
    "so the builder adds the per-side IMPLIED predicates explicitly "
    "(brand/size disjunction on part, quantity hull on lineitem) — "
    "semantically redundant, but they reach the scans and shrink both "
    "inputs before the join; the residual OR stays as the post-join "
    "filter. At 100 TB the implied lineitem hull (qty 1..40) is the "
    "difference between scanning the fact once and joining it whole",
)
def q_disjunctive_bracket_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # implied single-side predicates (manual disjunct factoring)
    p = _t(spark, sf_dir, "part").filter(
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25))
        | ((F.col("p_brand") == "Brand#5") & F.col("p_size").between(1, 35))
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").between(1, 40)
    )
    bracket = (
        ((F.col("p_brand") == "Brand#12") & F.col("l_quantity").between(1, 21))
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#5")
            & F.col("l_quantity").between(20, 40)
        )
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(bracket)
        .agg(
            F.round(F.sum(rev), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@_register(
    "idle_customer_balance",
    """WITH ab AS (SELECT avg(c_acctbal) AS a FROM customer)
       SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_cust,
              round(sum(c_acctbal), 2) AS total_bal
       FROM customer c
       WHERE c_acctbal > (SELECT a FROM ab)
         AND NOT EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey
                           AND o.o_orderdate >= TIMESTAMP '2000-01-01')
       GROUP BY c_nationkey""",
    doc="TPC-H Q22 shape (global-avg scalar subquery + NOT EXISTS "
    "anti-join + group agg): well-funded but lapsed customers — "
    "above-average balance, no order since 2000 — per nation. The "
    "scalar avg is a 1-row broadcast cross join (no driver collect); "
    "the anti-join pushes the date filter into the orders scan and "
    "shuffles only its custkey projection",
)
def q_idle_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o_keys = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    avg_bal = c.agg(F.avg("c_acctbal").alias("_avg_bal"))
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(o_keys, c.c_custkey == o_keys.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


@_register(
    "embedding_hof_stats",
    """SELECT vec_id,
              round(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE))), 4) AS vec_sum,
              round(CAST(list_max(embedding) AS DOUBLE), 6) AS vec_max,
              round(CAST(list_min(embedding) AS DOUBLE), 6) AS vec_min,
              CAST(len(list_filter(embedding, x -> x < 0)) AS INT)
                  AS n_negative,
              round(sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4)
                  AS l2_norm
       FROM embeddings""",
    doc="higher-order array functions entirely JVM-side (no UDF): "
    "aggregate/array_max/array_min/filter/transform over the "
    "array<float> embedding column — map-only, zero shuffle, "
    "whole-stage-codegen'd; the idiom every embedding-column pipeline "
    "op builds on (float32 cast to double BEFORE accumulating on both "
    "engines so the sequential fold is bit-identical, then rounded)",
)
def q_embedding_hof_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    acc = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double")),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    sq = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return emb.select(
        "vec_id",
        F.round(acc, 4).alias("vec_sum"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("vec_max"),
        F.round(F.array_min("embedding").cast("double"), 6).alias("vec_min"),
        F.size(F.filter("embedding", lambda x: x < 0)).alias("n_negative"),
        F.round(F.sqrt(sq), 4).alias("l2_norm"),
    )


@_register(
    "streaming_stream_stream_join",
    """SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id
       FROM events v JOIN events p
         ON v.user_id = p.user_id
        AND v.event_type = 'view' AND p.event_type = 'purchase'
        AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL '30 minutes'""",
    doc="STREAM-STREAM inner join with event-time range condition: "
    "views joined to purchases by the same user within 30 minutes, "
    "both sides watermarked so Spark bounds join state (a row is "
    "dropped from state once the other side's watermark passes its "
    "admissible range — the only thing that makes an unbounded "
    "stream-stream join runnable forever). Batch self-join SQL is the "
    "oracle; on bounded input append mode emits exactly the batch "
    "result (streaming/windows.py::adaptive_ts_stream ×2)",
)
def q_streaming_stream_stream_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..streaming import run_windowed_batch

    views = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "2 hours")
    )
    purchases = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    joined = views.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("view_ts") + F.expr("INTERVAL 30 MINUTES")
        ),
    )
    out = run_windowed_batch(
        joined, query_name="stream_stream_join", output_mode="append"
    )
    return out.select("user_id", "view_id", "purchase_id")


@_register(
    "salted_join_brand_revenue",
    """SELECT p_brand, round(sum(l_extendedprice * (1 - l_discount)), 2)
                  AS revenue,
              CAST(count(*) AS BIGINT) AS n_items
       FROM lineitem JOIN part ON l_partkey = p_partkey
       GROUP BY p_brand""",
    doc="skew-safe salted JOIN twin (tuning.py::salted_join): lineitem "
    "salted into 16 sub-keys, part replicated 16x, equi-join on "
    "(partkey, salt) — result-identical to the plain join oracle by "
    "construction; the technique for the pathological hot key that "
    "even AQE's skew split can't break up (one map-side partition). "
    "Broadcast would win here at this dim size — the query pins the "
    "fallback's correctness, not its preference",
)
def q_salted_join_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..tuning import salted_join

    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    p = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    joined = salted_join(li, p, on=["l_partkey"], n_salts=16)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.groupBy("p_brand").agg(
        F.round(F.sum(rev), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@_register(
    "join_full_outer_buckets",
    """WITH cb AS (SELECT CAST(floor(c_acctbal / 1000) AS INT) AS bucket,
                          CAST(count(*) AS BIGINT) AS n_customers
                   FROM customer GROUP BY 1),
            ob AS (SELECT CAST(floor(o_totalprice / 20000) AS INT) AS bucket,
                          CAST(count(*) AS BIGINT) AS n_orders
                   FROM orders GROUP BY 1)
       SELECT coalesce(cb.bucket, ob.bucket) AS bucket,
              cb.n_customers, ob.n_orders
       FROM cb FULL OUTER JOIN ob ON cb.bucket = ob.bucket""",
    doc="FULL OUTER equi-join (the one outer-join variant the catalog "
    "lacked): customer-balance vs order-value histogram buckets, with "
    "unmatched buckets on BOTH sides (negative balances left-only, "
    "high order values right-only) null-padded. Aggregate-then-join: "
    "both inputs reduce to |buckets| rows before the join, so the "
    "full-outer shuffle is trivial at any scale",
)
def q_join_full_outer_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    cb = (
        _t(spark, sf_dir, "customer")
        .groupBy(
            F.floor(F.col("c_acctbal") / 1000).cast("int").alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    ob = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.floor(F.col("o_totalprice") / 20000).cast("int").alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    joined = cb.alias("cb").join(
        ob.alias("ob"), F.col("cb.bucket") == F.col("ob.bucket"), "full_outer"
    )
    return joined.select(
        F.coalesce(F.col("cb.bucket"), F.col("ob.bucket")).alias("bucket"),
        "n_customers",
        "n_orders",
    )


@_register(
    "join_null_safe_props",
    """WITH v AS (SELECT nullif(CAST(json_extract_string(props, '$.k')
                                     AS INT) % 5, 0) AS grp,
                         CAST(count(*) AS BIGINT) AS n_views
                  FROM events WHERE event_type = 'view' GROUP BY 1),
            p AS (SELECT nullif(CAST(json_extract_string(props, '$.k')
                                     AS INT) % 5, 0) AS grp,
                         CAST(count(*) AS BIGINT) AS n_purchases
                  FROM events WHERE event_type = 'purchase' GROUP BY 1)
       SELECT v.grp, v.n_views, p.n_purchases
       FROM v JOIN p ON v.grp IS NOT DISTINCT FROM p.grp""",
    doc="NULL-SAFE equi-join (<=> / IS NOT DISTINCT FROM): event "
    "cohorts keyed by a nullable derived group (nullif bucket of the "
    "JSON props key), where the NULL cohort must match the NULL "
    "cohort — plain equality would silently drop it. eqNullSafe "
    "compiles to a hashable condition, so this stays a hash join, "
    "not a nested loop",
)
def q_join_null_safe_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    grp = F.nullif(
        F.get_json_object("props", "$.k").cast("int") % 5, F.lit(0)
    ).alias("grp")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy(grp)
        .agg(F.count(F.lit(1)).alias("n_views"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(grp)
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )
    return (
        v.alias("v")
        .join(p.alias("p"), F.col("v.grp").eqNullSafe(F.col("p.grp")))
        .select(F.col("v.grp").alias("grp"), "n_views", "n_purchases")
    )


@_register(
    "interp_hourly_values",
    # Linear interpolation between bracketing observations on a dense
    # hourly spine — LOCF's numeric sibling (sensor/time-series
    # resampling). Bracketing via last/first IGNORE NULLS windows;
    # the interpolation formula is written in the identical IEEE op
    # order on both sides, over integer epoch-microsecond gaps and
    # 4-dp-rounded hourly means, so the engines agree bit-for-bit.
    """WITH spine AS (SELECT unnest(generate_series(
                        TIMESTAMP '2024-01-01 00:00:00',
                        TIMESTAMP '2024-01-03 23:00:00',
                        INTERVAL '1 hour')) AS hour),
       hourly AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS hour,
                         round(avg(value), 4) AS v
                  FROM events
                  WHERE event_type = 'purchase'
                    AND ts >= TIMESTAMP '2024-01-01'
                    AND ts < TIMESTAMP '2024-01-04'
                  GROUP BY 1),
       j AS (SELECT spine.hour, epoch_us(spine.hour) AS us, hourly.v
             FROM spine LEFT JOIN hourly ON spine.hour = hourly.hour),
       b AS (SELECT hour, us, v,
                    last_value(v IGNORE NULLS) OVER
                        (ORDER BY hour ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS pv,
                    last_value(CASE WHEN v IS NOT NULL THEN us END
                               IGNORE NULLS) OVER
                        (ORDER BY hour ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS pus,
                    first_value(v IGNORE NULLS) OVER
                        (ORDER BY hour ROWS BETWEEN CURRENT ROW
                         AND UNBOUNDED FOLLOWING) AS nv,
                    first_value(CASE WHEN v IS NOT NULL THEN us END
                                IGNORE NULLS) OVER
                        (ORDER BY hour ROWS BETWEEN CURRENT ROW
                         AND UNBOUNDED FOLLOWING) AS nus
             FROM j)
       SELECT CAST(hour AS TIMESTAMP) AS hour,
              round(CASE WHEN pus IS NULL THEN nv
                         WHEN nus IS NULL THEN pv
                         WHEN nus = pus THEN pv
                         ELSE pv + (nv - pv)
                              * (CAST(us - pus AS DOUBLE)
                                 / CAST(nus - pus AS DOUBLE)) END,
                    4) AS interp_value
       FROM b""",
    doc="linear-interpolation gap-fill: dense hourly spine left-joined "
    "to sparse hourly means, each gap hour interpolated between its "
    "bracketing observations (last/first IGNORE-NULLS windows carry "
    "the bracket value AND its epoch); edges fall back to the "
    "available side — the numeric resampling sibling of "
    "locf_hourly_values. Per-series spines partition the windows by "
    "series key; the global window here rides a 72-row spine",
)
def q_interp_hourly_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hourly = (
        ev.filter(
            (F.col("event_type") == "purchase")
            & (F.col("ts") >= F.lit("2024-01-01").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-04").cast("timestamp"))
        )
        .groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.round(F.avg("value"), 4).alias("v"))
    )
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01 00:00:00").cast("timestamp"),
                F.lit("2024-01-03 23:00:00").cast("timestamp"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("hour")
    )
    j = spine.join(hourly, "hour", "left").select(
        "hour", F.unix_micros(F.col("hour")).alias("us"), "v"
    )
    w_back = W.orderBy("hour").rowsBetween(W.unboundedPreceding, W.currentRow)
    w_fwd = W.orderBy("hour").rowsBetween(W.currentRow, W.unboundedFollowing)
    marked_us = F.when(F.col("v").isNotNull(), F.col("us"))
    b = j.select(
        "hour",
        "us",
        F.last("v", ignorenulls=True).over(w_back).alias("pv"),
        F.last(marked_us, ignorenulls=True).over(w_back).alias("pus"),
        F.first("v", ignorenulls=True).over(w_fwd).alias("nv"),
        F.first(marked_us, ignorenulls=True).over(w_fwd).alias("nus"),
    )
    interp = (
        F.when(F.col("pus").isNull(), F.col("nv"))
        .when(F.col("nus").isNull(), F.col("pv"))
        .when(F.col("nus") == F.col("pus"), F.col("pv"))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (
                (F.col("us") - F.col("pus")).cast("double")
                / (F.col("nus") - F.col("pus")).cast("double")
            )
        )
    )
    return b.select(
        F.col("hour").cast("timestamp_ntz").alias("hour"),
        F.round(interp, 4).alias("interp_value"),
    )


@_register(
    "locf_hourly_values",
    """WITH spine AS (SELECT unnest(generate_series(
                        TIMESTAMP '2024-01-01 00:00:00',
                        TIMESTAMP '2024-01-03 23:00:00',
                        INTERVAL '1 hour')) AS hour),
            hourly AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS hour,
                              round(avg(value), 4) AS avg_value
                       FROM events
                       WHERE event_type = 'purchase'
                         AND ts >= TIMESTAMP '2024-01-01'
                         AND ts < TIMESTAMP '2024-01-04'
                       GROUP BY 1)
       SELECT spine.hour,
              last_value(hourly.avg_value IGNORE NULLS) OVER (
                  ORDER BY spine.hour
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS filled_value
       FROM spine LEFT JOIN hourly ON spine.hour = hourly.hour""",
    doc="LOCF gap-fill (last-observation-carried-forward): dense "
    "hourly spine (explode over sequence — map-only generation) left-"
    "joined to sparse hourly aggregates, forward-filled with "
    "last(ignorenulls) over an ordered window — the time-series "
    "interpolation idiom. Single global window is fine for a 72-row "
    "spine; per-series spines partition the window by series key. "
    "Hour bounds emitted as TIMESTAMP_NTZ so results are host-"
    "timezone-independent",
)
def q_locf_hourly_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hourly = (
        ev.filter(
            (F.col("event_type") == "purchase")
            & (F.col("ts") >= F.lit("2024-01-01").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-04").cast("timestamp"))
        )
        .groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.round(F.avg("value"), 4).alias("avg_value"))
    )
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01 00:00:00").cast("timestamp"),
                F.lit("2024-01-03 23:00:00").cast("timestamp"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("hour")
    )
    w = (
        W.orderBy("hour")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        spine.join(hourly, "hour", "left")
        .select(
            F.col("hour").cast("timestamp_ntz").alias("hour"),
            F.last("avg_value", ignorenulls=True).over(w).alias(
                "filled_value"
            ),
        )
    )


@_register(
    "fuzzy_part_pairs",
    """SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
              CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
       FROM part a JOIN part b
         ON split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
        AND a.p_partkey < b.p_partkey
       WHERE levenshtein(a.p_name, b.p_name) = 1""",
    doc="blocked fuzzy matching: edit-distance-1 part-name pairs, "
    "blocked on the second name token so the comparison is an "
    "equi-join within blocks (|block|² comparisons per block), never "
    "the all-pairs cross product — the standard entity-resolution "
    "blocking shape; levenshtein runs JVM-side (F.levenshtein), "
    "key_a < key_b canonicalizes pair order",
)
def q_fuzzy_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_name")
    a = p.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
        F.split(F.col("p_name"), " ").getItem(1).alias("_blk"),
    )
    b = p.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
        F.split(F.col("p_name"), " ").getItem(1).alias("_blk"),
    )
    return (
        a.join(b, "_blk")
        .filter(F.col("key_a") < F.col("key_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") == 1)
        .select("key_a", "key_b", "dist")
    )


@_register(
    "jaccard_pairs_prefix_filtered",
    REGISTRY["ngram_jaccard_pairs"].oracle,
    doc="AllPairs/PPJoin prefix-filtered EXACT Jaccard join "
    "(operators/dedup.py::prefix_filtered_jaccard_pairs) — same "
    "oracle as ngram_jaccard_pairs because prefix filtering is a "
    "candidate-pruning optimization with a correctness theorem, not "
    "an approximation; the exact-join survivor on stopword-skewed "
    "corpora where the plain inverted-index self-join degenerates "
    "quadratically",
)
def q_jaccard_pairs_prefix_filtered(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.dedup import prefix_filtered_jaccard_pairs

    return prefix_filtered_jaccard_pairs(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.5
    )


@_register(
    "spatial_near_pairs",
    """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              round(sqrt(power(CAST(a.embedding[1] AS DOUBLE)
                               - CAST(b.embedding[1] AS DOUBLE), 2)
                       + power(CAST(a.embedding[2] AS DOUBLE)
                               - CAST(b.embedding[2] AS DOUBLE), 2)), 6)
                  AS dist
       FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       WHERE sqrt(power(CAST(a.embedding[1] AS DOUBLE)
                        - CAST(b.embedding[1] AS DOUBLE), 2)
                + power(CAST(a.embedding[2] AS DOUBLE)
                        - CAST(b.embedding[2] AS DOUBLE), 2)) <= 0.02""",
    doc="2-D spatial radius self-join via grid binning "
    "(operators/rangejoin.py::grid_join_2d): all point pairs within "
    "euclidean 0.02 over the first two embedding dims — 3x3 "
    "neighborhood replication + cell equi-join, never the all-pairs "
    "product the brute-force ORACLE computes; the scale form of the "
    "reference's geographic neighborhood analytics. IEEE double "
    "arithmetic matches the oracle bit-exactly, so the threshold "
    "comparison agrees at the boundary",
)
def q_spatial_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rangejoin import grid_join_2d

    pts = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").getItem(0).cast("double").alias("x"),
        F.col("embedding").getItem(1).cast("double").alias("y"),
    )
    return grid_join_2d(pts, "vec_id", "x", "y", radius=0.02)


@_register(
    "chi2_event_type_bucket",
    """WITH obs AS (SELECT event_type,
                           CAST(user_id % 4 AS INT) AS bucket,
                           CAST(count(*) AS DOUBLE) AS n
                    FROM events GROUP BY 1, 2),
            tot AS (SELECT sum(n) AS total FROM obs),
            rowt AS (SELECT event_type, sum(n) AS rn FROM obs GROUP BY 1),
            colt AS (SELECT bucket, sum(n) AS cn FROM obs GROUP BY 1)
       SELECT round(sum(power(n - rn * cn / total, 2)
                        / (rn * cn / total)), 4) AS chi2,
              CAST((count(DISTINCT obs.event_type) - 1)
                   * (count(DISTINCT obs.bucket) - 1) AS INT) AS dof
       FROM obs
       JOIN rowt USING (event_type)
       JOIN colt USING (bucket)
       CROSS JOIN tot""",
    doc="chi-square independence statistic (event_type x user-id "
    "bucket contingency): observed cell counts vs rank-1 expected "
    "(row_total*col_total/N), statistic + degrees of freedom in one "
    "declarative pass — the contingency table is tiny after the first "
    "groupBy, so the marginal joins broadcast; cells with zero "
    "observations are absent from BOTH engines' sums identically "
    "(all 20 cells are populated on this data)",
)
def q_chi2_event_type_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import _shared

    ev = _t(spark, sf_dir, "events")
    # r12: obs (a ~20-cell contingency table) feeds tot, rowt, colt AND
    # the final join — without sharing each consumer re-scans events
    # and re-runs the big groupBy (8 scans / 36 aggregates in the
    # baseline plan). Checkpoint the tiny table once.
    obs = _shared(
        ev.groupBy(
            "event_type", (F.col("user_id") % 4).cast("int").alias("bucket")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    tot = obs.agg(F.sum("n").alias("total"))
    rowt = obs.groupBy("event_type").agg(F.sum("n").alias("rn"))
    colt = obs.groupBy("bucket").agg(F.sum("n").alias("cn"))
    exp = F.col("rn") * F.col("cn") / F.col("total")
    return (
        obs.join(F.broadcast(rowt), "event_type")
        .join(F.broadcast(colt), "bucket")
        .join(F.broadcast(tot))
        .agg(
            F.round(F.sum(F.pow(F.col("n") - exp, 2) / exp), 4).alias(
                "chi2"
            ),
            (
                (F.count_distinct(F.col("event_type")) - 1)
                * (F.count_distinct(F.col("bucket")) - 1)
            )
            .cast("int")
            .alias("dof"),
        )
    )


@_register(
    "last_touch_attribution",
    """WITH seq AS (SELECT user_id, event_id, event_type, ts FROM events
                    WHERE event_type IN ('click', 'purchase')),
       ann AS (SELECT *,
               last_value(CASE WHEN event_type = 'click'
                               THEN event_id END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS click_id,
               last_value(CASE WHEN event_type = 'click'
                               THEN ts END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS click_ts
               FROM seq)
       SELECT event_id AS purchase_id, user_id, click_id,
              round((epoch_us(ts) - epoch_us(click_ts)) / 60000000.0, 2)
                  AS mins_since_click
       FROM ann
       WHERE event_type = 'purchase' AND click_id IS NOT NULL
         AND ts - click_ts <= INTERVAL 1 DAY""",
    doc="last-touch attribution: each purchase attributed to the same "
    "user's most recent click within 1 day, via last(ignorenulls) over "
    "an ordered per-user window (the event-stream as-of idiom — one "
    "shuffle on user_id, no self-join). Prefiltering to the two event "
    "types reaches the scan; (ts, event_id) ordering makes the window "
    "deterministic under ties",
)
def q_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    click_id = F.last(
        F.when(F.col("event_type") == "click", F.col("event_id")),
        ignorenulls=True,
    ).over(w)
    click_ts = F.last(
        F.when(F.col("event_type") == "click", F.col("ts")),
        ignorenulls=True,
    ).over(w)
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    return (
        ev.select(
            "event_id",
            "user_id",
            "event_type",
            "ts",
            click_id.alias("click_id"),
            click_ts.alias("click_ts"),
        )
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("click_id").isNotNull()
            & (
                us(F.col("ts")) - us(F.col("click_ts"))
                <= 24 * 3600 * 1_000_000
            )
        )
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            "click_id",
            F.round(
                (us(F.col("ts")) - us(F.col("click_ts"))) / 60_000_000.0, 2
            ).alias("mins_since_click"),
        )
    )


_DQ_SQL = """SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM {orders}) AS n_orders,
  (SELECT CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
   FROM {orders}) AS dup_orderkeys,
  (SELECT CAST(count(*) AS BIGINT) FROM {lineitem} l
   WHERE NOT EXISTS (SELECT 1 FROM {orders} o
                     WHERE o.o_orderkey = l.l_orderkey))
      AS orphan_lineitems,
  (SELECT CAST(count(*) AS BIGINT) FROM {orders}
   WHERE o_custkey IS NULL) AS null_custkeys,
  (SELECT CAST(count(*) AS BIGINT) FROM {lineitem}
   WHERE l_quantity <= 0 OR l_discount < 0 OR l_discount > 1)
      AS bad_lineitem_rows"""


@_register(
    "dq_expectations_report",
    _DQ_SQL.format(orders="orders", lineitem="lineitem"),
    doc="data-quality expectations report (dbt-test shape) in ONE "
    "statement: row count, key uniqueness, referential integrity "
    "(orphan fact rows via NOT EXISTS anti-join), null keys, domain "
    "violations — identical SQL text runs on the Spark catalog and "
    "the DuckDB oracle; each scalar subquery is an independent "
    "aggregate the optimizer runs as its own tiny job, fact scans "
    "pruned to the checked columns",
)
def q_dq_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("_dq_orders")
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("_dq_lineitem")
    return spark.sql(
        _DQ_SQL.format(orders="_dq_orders", lineitem="_dq_lineitem")
    )


# =====================================================================
# TPC-H warehouse-shape completion (Q2/Q4/Q7/Q8/Q11/Q12/Q13/Q15/Q17/
# Q18/Q21 adapted to the fixture schema — no partsupp table, no
# commitdate/receiptdate/shipmode columns, so the classic predicates
# are re-expressed over lineitem+orders: "late" means l_shipdate more
# than N days after o_orderdate, and supplier "cost" is the minimum
# observed unit price in lineitem). Together with the existing
# Q1/Q3/Q5/Q6/Q10/Q14/Q19/Q22 shapes this closes the full decision-
# support pattern family: EXISTS/NOT-EXISTS decorrelation, scalar-
# subquery HAVING, conditional-aggregate market share, outer-join
# count distributions, window-min correlated subqueries, and
# double-anti-join "only culprit" semantics.
# =====================================================================


@_register(
    "order_priority_check",
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
       FROM orders o
       WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
         AND o.o_orderdate < TIMESTAMP '1997-01-01'
         AND EXISTS (SELECT 1 FROM lineitem l
                     WHERE l.l_orderkey = o.o_orderkey
                       AND l.l_shipdate > o.o_orderdate
                                          + INTERVAL 60 DAY)
       GROUP BY o_orderpriority""",
    doc="TPC-H Q4 shape (EXISTS → left-semi decorrelation): orders in "
    "one year with at least one lineitem shipped >60 days after the "
    "order date, counted per priority. Catalyst plans the EXISTS as a "
    "shuffled left-semi hash join on orderkey with the non-equi "
    "lateness predicate as a join residual; both scans are pruned to "
    "2-3 columns and the date filter pushes into the orders scan. "
    "Scales: semi-join output ≤ |orders|, no fact-fact multiplication.",
)
def q_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@_register(
    "nation_pair_trade_volume",
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
              CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS ship_year,
              round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
                  AS revenue
       FROM supplier s
       JOIN lineitem l ON s.s_suppkey = l.l_suppkey
       JOIN orders o   ON o.o_orderkey = l.l_orderkey
       JOIN customer c ON c.c_custkey = o.o_custkey
       JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
       JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
       WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
         AND l.l_shipdate >= TIMESTAMP '1996-01-01'
         AND l.l_shipdate < TIMESTAMP '1998-01-01'
       GROUP BY n1.n_name, n2.n_name, ship_year""",
    doc="TPC-H Q7 shape (bilateral trade volume): revenue between a "
    "nation pair in both directions, by ship year. The disjunctive "
    "pair predicate sits above two broadcast nation joins; the "
    "supplier/customer joins stay broadcast (dim-sized) so the only "
    "shuffle is lineitem↔orders on orderkey. Scales: nation filter "
    "cuts the fact stream before the groupBy; the pair disjunction "
    "can't push below the joins but operates on already-slim rows.",
)
def q_nation_pair_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    joined = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_cn_key"))
        .filter(pair)
    )
    return joined.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").alias("ship_year"),
    ).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )


@_register(
    "nation_market_share",
    """SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS order_year,
              round(sum(CASE WHEN n2.n_name = 'NATION_3'
                             THEN l.l_extendedprice * (1 - l.l_discount)
                             ELSE 0 END)
                    / sum(l.l_extendedprice * (1 - l.l_discount)), 4)
                  AS mkt_share
       FROM part p
       JOIN lineitem l ON p.p_partkey = l.l_partkey
       JOIN supplier s ON s.s_suppkey = l.l_suppkey
       JOIN orders o   ON o.o_orderkey = l.l_orderkey
       JOIN customer c ON c.c_custkey = o.o_custkey
       JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
       JOIN region r   ON n1.n_regionkey = r.r_regionkey
       JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
       WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
       GROUP BY order_year""",
    doc="TPC-H Q8 shape (market share): the fraction of ASIA-region "
    "PROMO-part revenue supplied by one nation, per order year — a "
    "conditional aggregate (CASE inside sum) dividing two partial "
    "sums in one pass, NOT two queries joined. All five dims "
    "broadcast; part filter prunes the fact stream at the first join. "
    "Scales: single orderkey shuffle, one final 1-row-per-year agg.",
)
def q_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_cn_key"), F.col("n_regionkey").alias("_rg_key")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_sn_key"), F.col("n_name").alias("supp_nation")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("_cn_key"))
        .join(F.broadcast(r), F.col("_rg_key") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("_sn_key"))
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
                        F.lit(0.0)
                    )
                )
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
    )


@_register(
    "product_profit_by_nation_year",
    # TPC-H Q9 adapted to this schema: no partsupp table exists in the
    # testdata, so supply cost is proxied as 0.6 * p_retailprice *
    # l_quantity (a fixed margin against the part's list price) — the
    # JOIN/AGG SHAPE (part-name filter pruning a 5-way join, profit
    # expression, nation x year rollup) is what Q9 exercises.
    """SELECT n.n_name AS supp_nation,
              CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
              round(sum(l.l_extendedprice * (1 - l.l_discount)
                        - 0.6 * p.p_retailprice * l.l_quantity), 2)
                  AS profit
       FROM part p
       JOIN lineitem l ON p.p_partkey = l.l_partkey
       JOIN supplier s ON s.s_suppkey = l.l_suppkey
       JOIN nation n   ON s.s_nationkey = n.n_nationkey
       JOIN orders o   ON o.o_orderkey = l.l_orderkey
       WHERE p.p_name LIKE '%red%'
       GROUP BY n.n_name, o_year""",
    doc="TPC-H Q9 shape (product-type profit): part-name LIKE filter "
    "prunes the fact stream at the first (broadcast) join, profit is "
    "a per-line expression summed per supplier-nation x order-year. "
    "Scales: filtered part + supplier + nation broadcast; the only "
    "shuffle is fact-to-orders on orderkey, then a low-cardinality "
    "final agg.",
)
def q_product_profit_by_nation_year(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        0.6
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("profit"))
    )


@_register(
    "supplier_cnt_by_part_attrs",
    # TPC-H Q16 adapted: the partsupp relation is reconstructed as the
    # DISTINCT (l_partkey, l_suppkey) pairs observed in lineitem, and
    # the "customer complaints" supplier exclusion becomes s_acctbal<0
    # (this schema carries no comment text). Shape preserved: distinct
    # pair dedup -> dimension-attribute filter -> NOT IN supplier
    # anti-join -> count(DISTINCT supplier) per attribute triple.
    """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
       SELECT p.p_brand, p.p_type, p.p_size,
              CAST(count(DISTINCT ps.l_suppkey) AS BIGINT)
                  AS supplier_cnt
       FROM ps
       JOIN part p ON p.p_partkey = ps.l_partkey
       WHERE p.p_brand <> 'Brand#1'
         AND p.p_type NOT LIKE 'SMALL%'
         AND p.p_size IN (1, 4, 7, 11, 14, 19, 23, 28)
         AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                  WHERE s_acctbal < 0)
       GROUP BY p.p_brand, p.p_type, p.p_size""",
    doc="TPC-H Q16 shape (supplier relationship count): distinct "
    "part-supplier pairs, attribute filters, NOT-IN supplier "
    "exclusion (broadcast anti-join — never a shuffled NOT IN), "
    "count-distinct suppliers per (brand, type, size). Scales: the "
    "pair dedup is the only fact shuffle; part and the excluded "
    "supplier set broadcast.",
)
def q_supplier_cnt_by_part_attrs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").like("SMALL%")
        & F.col("p_size").isin([1, 4, 7, 11, 14, 19, 23, 28])
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    ps = li.select("l_partkey", "l_suppkey").dropDuplicates()
    return (
        ps.join(F.broadcast(bad), "l_suppkey", "left_anti")
        .join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@_register(
    "dominant_part_suppliers",
    # TPC-H Q20 adapted: no partsupp.ps_availqty exists, so "stocks
    # more than half a year's shipments" becomes "SHIPPED more than
    # half of the part's total 1997 volume" — preserving Q20's nested
    # correlated-aggregate comparison (per-pair qty vs a per-part
    # scalar), the part-name IN-subquery, and the nation filter.
    """WITH pair AS (SELECT l_partkey, l_suppkey,
                            sum(l_quantity) AS qty
                     FROM lineitem
                     WHERE EXTRACT(year FROM l_shipdate) = 1997
                     GROUP BY l_partkey, l_suppkey),
       tot AS (SELECT l_partkey, sum(qty) AS total_qty
               FROM pair GROUP BY l_partkey)
       SELECT DISTINCT s.s_suppkey, s.s_name
       FROM pair
       JOIN tot ON pair.l_partkey = tot.l_partkey
       JOIN part p ON p.p_partkey = pair.l_partkey
       JOIN supplier s ON s.s_suppkey = pair.l_suppkey
       JOIN nation n ON n.n_nationkey = s.s_nationkey
       WHERE pair.qty > 0.5 * tot.total_qty
         AND p.p_name LIKE 'red%'
         AND n.n_name = 'NATION_1'""",
    doc="TPC-H Q20 shape (potential part promotion): suppliers who "
    "shipped the MAJORITY of a red part's 1997 volume, restricted to "
    "one nation — the correlated-aggregate threshold computed as a "
    "window-free join of two stacked aggregates over the same slim "
    "pair frame (never re-scanning the fact table). Scales: one "
    "fact shuffle to (part,supp) pairs; everything after operates on "
    "aggregate-sized frames with broadcast dims.",
)
def q_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.year("l_shipdate") == 1997)
    pair = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    tot = pair.groupBy("l_partkey").agg(F.sum("qty").alias("total_qty"))
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    return (
        pair.join(tot, "l_partkey")
        .filter(F.col("qty") > 0.5 * F.col("total_qty"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
        .dropDuplicates()
    )


@_register(
    "part_revenue_concentration",
    """WITH pr AS (SELECT l_partkey,
                          sum(l_extendedprice * (1 - l_discount)) AS val
                   FROM lineitem GROUP BY l_partkey)
       SELECT l_partkey, round(val, 2) AS part_value
       FROM pr
       WHERE val > (SELECT 0.0008 * sum(val) FROM pr)""",
    doc="TPC-H Q11 shape (HAVING against a global scalar subquery): "
    "parts whose revenue exceeds a fixed fraction of TOTAL revenue. "
    "The per-part aggregate is computed once and reused for both the "
    "threshold and the output (self-referencing CTE); the global sum "
    "is a 1-row aggregate broadcast as a nested-loop join — the one "
    "shape where a nested loop IS the right plan. Scales: one "
    "partkey shuffle; threshold side is a second pass over the "
    "already-aggregated |parts|-row frame, not the fact table.",
)
def q_part_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    pr = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("val")
    )
    thresh = pr.agg((F.lit(0.0008) * F.sum("val")).alias("_thresh"))
    return (
        pr.join(F.broadcast(thresh))
        .filter(F.col("val") > F.col("_thresh"))
        .select("l_partkey", F.round("val", 2).alias("part_value"))
    )


@_register(
    "late_shipment_priority_counts",
    """SELECT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                   THEN 'LATE' ELSE 'ONTIME' END AS ship_bucket,
              CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT)
                  AS high_priority_lines,
              CAST(sum(CASE WHEN o.o_orderpriority NOT IN
                                 ('1-URGENT','2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT)
                  AS low_priority_lines
       FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
         AND l.l_shipdate < TIMESTAMP '1997-01-01'
       GROUP BY ship_bucket""",
    doc="TPC-H Q12 shape (conditional counts after a fact-fact join), "
    "shipmode replaced by a lateness bucket derived from the join "
    "itself (l_shipdate vs o_orderdate + 60 days). One orderkey "
    "shuffle; the CASE aggregations are partial-agg friendly (two "
    "longs per group per task). Scales: 2 output rows, map-side "
    "combine collapses everything early.",
)
def q_late_shipment_priority_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    bucket = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
        "LATE",
    ).otherwise("ONTIME")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_priority_lines"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_priority_lines"),
        )
    )


@_register(
    "cust_order_count_distribution",
    """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
       FROM (SELECT c.c_custkey,
                    CAST(count(o.o_orderkey) AS BIGINT) AS c_count
             FROM customer c
             LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                               AND o.o_orderpriority <> '1-URGENT'
             GROUP BY c.c_custkey) cc
       GROUP BY c_count""",
    doc="TPC-H Q13 shape (customer order-count distribution): LEFT "
    "OUTER join with a join-side filter (the filter must live in the "
    "ON clause, not WHERE — a WHERE would silently turn the outer "
    "join inner and drop zero-order customers), then a two-level "
    "aggregation: count per customer, histogram of counts. Scales: "
    "first agg shuffles on custkey (same key as the join → AQE "
    "reuses the partitioning), second agg input is |customers| rows "
    "collapsing to ~tens of groups.",
)
def q_cust_order_count_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@_register(
    "top_revenue_suppliers",
    """WITH rev AS (SELECT l_suppkey,
                           round(sum(l_extendedprice * (1 - l_discount)), 2)
                               AS total_rev
                    FROM lineitem
                    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                      AND l_shipdate < TIMESTAMP '1996-04-01'
                    GROUP BY l_suppkey)
       SELECT s.s_suppkey, s.s_name, rev.total_rev
       FROM supplier s JOIN rev ON s.s_suppkey = rev.l_suppkey
       WHERE rev.total_rev = (SELECT max(total_rev) FROM rev)""",
    doc="TPC-H Q15 shape (top supplier via view + scalar max): quarter "
    "revenue per supplier, keep those equal to the maximum. The max "
    "is a 1-row aggregate over the ALREADY-AGGREGATED |suppliers|-row "
    "frame, broadcast back as a nested-loop join (correct plan for a "
    "scalar). Revenue is rounded identically on both engines BEFORE "
    "the equality so the comparison is well-defined. Scales: fact "
    "scan touched once; everything after is dim-sized.",
)
def q_top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("_max_rev"))
    s = _t(spark, sf_dir, "supplier")
    return (
        s.join(rev, s.s_suppkey == rev.l_suppkey)
        .join(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("_max_rev"))
        .select("s_suppkey", "s_name", "total_rev")
    )


@_register(
    "small_quantity_order_revenue",
    """SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
       FROM lineitem l
       JOIN part p ON p.p_partkey = l.l_partkey
       JOIN (SELECT l_partkey AS _pk,
                    0.5 * avg(l_quantity) AS half_avg_qty
             FROM lineitem GROUP BY l_partkey) a ON a._pk = l.l_partkey
       WHERE p.p_brand = 'Brand#12' AND l.l_quantity < a.half_avg_qty""",
    doc="TPC-H Q17 shape (correlated per-part average, decorrelated): "
    "revenue from small-quantity line items, where 'small' means "
    "below half the part's own average quantity. The correlated "
    "subquery is expressed as an explicit per-part aggregate joined "
    "back on partkey — exactly what Catalyst's decorrelation would "
    "emit, but stated declaratively so the per-part avg is reusable. "
    "Scales: the avg side shuffles slim (partkey, sum, count) rows "
    "with map-side combine; the brand filter broadcasts through the "
    "part dim to prune the fact scan.",
)
def q_small_quantity_order_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#12")
    avg_q = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(avg_q, li.l_partkey == F.col("_pk"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@_register(
    "large_quantity_orders",
    """SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
              o.o_totalprice,
              CAST(sum(l.l_quantity) AS DOUBLE) AS total_qty
       FROM customer c
       JOIN orders o ON c.c_custkey = o.o_custkey
       JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                              GROUP BY l_orderkey
                              HAVING sum(l_quantity) > 300)
       GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
                o.o_totalprice
       ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 20""",
    doc="TPC-H Q18 shape (large-volume orders): IN over a HAVING-"
    "filtered aggregate becomes a left-semi join against the "
    "qualifying orderkey set; the outer aggregation then re-sums "
    "quantity per surviving order. Tie-broken by unique orderkey so "
    "the LIMIT 20 SET is engine-independent. Scales: the HAVING agg "
    "shuffles (orderkey, sum) pairs only; the semi-join prunes the "
    "fact stream before the wide customer join; top-k plans "
    "TakeOrderedAndProject, never a global sort.",
)
def q_large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 300)
        .select("l_orderkey")
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").cast("double").alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@_register(
    "sole_late_supplier_ranking",
    """WITH forder AS (SELECT o_orderkey, o_orderdate FROM orders
                       WHERE o_orderstatus = 'F'),
            lines AS (SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate,
                             f.o_orderdate
                      FROM lineitem l
                      JOIN forder f ON l.l_orderkey = f.o_orderkey),
            late AS (SELECT * FROM lines
                     WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY)
       SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
       FROM late l1
       JOIN supplier s ON s.s_suppkey = l1.l_suppkey
       WHERE EXISTS (SELECT 1 FROM lines l2
                     WHERE l2.l_orderkey = l1.l_orderkey
                       AND l2.l_suppkey <> l1.l_suppkey)
         AND NOT EXISTS (SELECT 1 FROM late l3
                         WHERE l3.l_orderkey = l1.l_orderkey
                           AND l3.l_suppkey <> l1.l_suppkey)
       GROUP BY s.s_name
       ORDER BY numwait DESC, s.s_name LIMIT 25""",
    doc="TPC-H Q21 shape (suppliers who kept orders waiting): late "
    "lines on finished multi-supplier orders where this supplier was "
    "the ONLY late one — an EXISTS (another supplier participated) "
    "plus a NOT EXISTS (no other supplier was late), i.e. a left-semi "
    "then a left-anti join on orderkey with a suppkey-inequality "
    "residual. 'Late' is l_shipdate > o_orderdate + 90 days (the "
    "fixture has no receipt/commit dates). Scales: the lines/late "
    "frames are slim 3-column projections; all three joins share the "
    "orderkey shuffle key so AQE can reuse exchanges; supplier dim "
    "broadcasts; s_name tie-break fixes the LIMIT set.",
)
def q_sole_late_supplier_ranking(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    forder = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lines = li.join(forder, li.l_orderkey == forder.o_orderkey).select(
        "l_orderkey", "l_suppkey", "l_shipdate", "o_orderdate"
    )
    late = lines.filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    l1 = late.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_suppkey").alias("_sk")
    )
    l2 = lines.select("l_orderkey", "l_suppkey")
    l3 = late.select(
        F.col("l_orderkey").alias("_ok3"), F.col("l_suppkey").alias("_sk3")
    )
    others_exist = (F.col("_ok") == l2.l_orderkey) & (
        F.col("_sk") != l2.l_suppkey
    )
    other_late = (F.col("_ok") == F.col("_ok3")) & (
        F.col("_sk") != F.col("_sk3")
    )
    s = _t(spark, sf_dir, "supplier")
    return (
        l1.join(l2, others_exist, "left_semi")
        .join(l3, other_late, "left_anti")
        .join(F.broadcast(s), F.col("_sk") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(25)
    )


@_register(
    "min_cost_supplier_per_part",
    """WITH offers AS (SELECT l_partkey, l_suppkey,
                              min(l_extendedprice / l_quantity) AS unit_cost
                       FROM lineitem GROUP BY l_partkey, l_suppkey)
       SELECT p.p_partkey, p.p_name, s.s_name,
              round(o.unit_cost + 1e-9, 4) AS min_unit_cost
       FROM offers o
       JOIN part p ON p.p_partkey = o.l_partkey AND p.p_size <= 3
       JOIN supplier s ON s.s_suppkey = o.l_suppkey
       WHERE o.unit_cost = (SELECT min(o2.unit_cost) FROM offers o2
                            WHERE o2.l_partkey = o.l_partkey)""",
    doc="TPC-H Q2 shape (cheapest supplier per part): the fixture has "
    "no partsupp, so a (part, supplier) offer table is derived from "
    "observed lineitem unit prices, then the correlated min subquery "
    "selects each small part's cheapest supplier(s). Expressed as a "
    "partition-min window over the offers frame — no second scan, no "
    "self-join — which is exactly the decorrelated form. min() is "
    "order-insensitive (unlike sums) so the equality is exact across "
    "engines; rounding applies to OUTPUT only, with a +1e-9 nudge on "
    "both sides because price/quantity quotients can land on exact "
    "4dp halves where Spark (HALF_UP) and DuckDB (HALF_EVEN) split. Scales: offers is one "
    "(partkey,suppkey) shuffle; the window re-shuffles only the "
    "|offers|-sized frame on partkey.",
)
def q_min_cost_supplier_per_part(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    w = W.partitionBy("l_partkey")
    best = offers.withColumn("_part_min", F.min("unit_cost").over(w)).filter(
        F.col("unit_cost") == F.col("_part_min")
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 3)
    s = _t(spark, sf_dir, "supplier")
    return (
        best.join(F.broadcast(p), best.l_partkey == p.p_partkey)
        .join(F.broadcast(s), best.l_suppkey == s.s_suppkey)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            F.round(F.col("unit_cost") + 1e-9, 4).alias("min_unit_cost"),
        )
    )


@_register(
    "hll_distinct_users_by_type",
    None,  # DataSketches HLL estimates are engine-specific; accuracy,
    # mergeability (union == direct), and layout-independence are
    # pinned in tests/test_sketches.py against exact counts
    doc="mergeable-sketch distinct counting (operators/sketches.py): "
    "per-event-type approximate distinct users via hll_sketch_agg "
    "(DataSketches HLL, lgK=14 ≈ 1.6% RSE). The 100 TB path for "
    "COUNT(DISTINCT): map-side partial sketches, a ~12 KB shuffle row "
    "per (task, group) instead of a distinct-value shuffle, and the "
    "resulting sketch column composes upward via hll_union_agg "
    "without rescanning (union is register-wise max — exact over "
    "sketches). Deterministic for a given value set, so rows-only "
    "re-runs are stable.",
)
def q_hll_distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import hll_distinct_by

    e = _t(spark, sf_dir, "events")
    return hll_distinct_by(e, ["event_type"], "user_id").select(
        "event_type", F.col("est_distinct").cast("long").alias("est_users")
    )


@_register(
    "hll_nation_region_rollup",
    None,  # estimate values engine-specific; union-exactness pinned in
    # tests/test_sketches.py::test_hll_union_equals_direct_sketch
    doc="sketch REAGGREGATION: nation-level customer sketches merged "
    "up to region level with hll_union_agg — the summary-table "
    "pattern where daily/fine partials roll up to coarse grains "
    "without touching base data. The union estimate is IDENTICAL to "
    "a from-scratch region sketch (register-wise max), which the "
    "tests pin; at 100 TB this turns reaggregation into a "
    "metadata-sized job.",
)
def q_hll_nation_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import hll_group_sketches, hll_rollup

    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    cn = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_custkey", "c_nationkey", "n_regionkey"
    )
    fine = hll_group_sketches(cn, ["n_regionkey", "c_nationkey"], "c_custkey")
    return hll_rollup(fine, ["n_regionkey"]).select(
        "n_regionkey", F.col("est_distinct").cast("long").alias("est_customers")
    )


@_register(
    "dsir_importance_weights",
    r"""WITH toks AS (
         SELECT doc_id, lang = 'en' AS is_target,
                unnest(string_split_regex(trim(text), '\s+')) AS token
         FROM documents),
       toks2 AS (SELECT * FROM toks WHERE token <> ''),
       counts AS (
         SELECT token,
                sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS ct,
                count(*) AS cs
         FROM toks2 GROUP BY token),
       vocab AS (
         SELECT token, ct, cs FROM counts
         ORDER BY cs DESC, token ASC LIMIT 200),
       totals AS (SELECT sum(ct) AS Tt, sum(cs) AS Ts FROM vocab),
       ratio AS (
         SELECT token,
                ln((ct + 1.0) / (Tt + 200.0))
                - ln((cs + 1.0) / (Ts + 200.0)) AS logratio
         FROM vocab, totals),
       scored AS (
         SELECT t.doc_id, sum(r.logratio) AS lw
         FROM toks2 t JOIN ratio r ON t.token = r.token
         GROUP BY t.doc_id)
       SELECT d.doc_id,
              round(coalesce(s.lw, 0.0), 4) AS logweight
       FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id""",
    doc="DSIR importance resampling weights (Xie et al. 2023): "
    "per-document log-ratio of add-one-smoothed unigram likelihood "
    "under the TARGET slice (lang='en') vs the full corpus, over a "
    "fixed top-200 vocabulary with an engine-exact (count DESC, token "
    "ASC) cut (operators/textstats.py::dsir_logweights). One "
    "token-keyed agg builds both distributions in a single pass; the "
    "~|V|-row log-ratio table broadcasts; corpus text never shuffles. "
    "The score feeds mixture_sample to up-weight target-like docs "
    "when composing training data.",
)
def q_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textstats import dsir_logweights

    return dsir_logweights(
        _t(spark, sf_dir, "documents"),
        target_filter=F.col("lang") == "en",
        vocab_size=200,
    )


@_register(
    "semantic_dedup_pairs",
    None,  # cluster assignment is KMeans-model-dependent → rows-only;
    # zero-false-positive + recall + exact-cosine-parity contracts are
    # pinned in tests/test_dedup_ann.py::test_semantic_dedup_*
    doc="SemDeDup-style semantic near-dup pairs (similarity.py::"
    "semantic_dedup_pairs): sampled-fit local KMeans (layout-"
    "independent) clusters the embedding space, pairs are exact-"
    "cosine-compared only WITHIN a cell "
    "(m_assign=3 boundary replication, measured recall 0.97). The "
    "learned-bucket member of "
    "the embedding-dedup tier: total flops ≈ n²/k vs the exact "
    "tier's n², scored as one Arrow-batched BLAS product per cell "
    "(the published SemDeDup kernel; 7x the per-pair expression "
    "form), every emitted pair passes the exact-cosine filter so "
    "false positives are impossible.",
)
def q_semantic_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import semantic_dedup_pairs

    return semantic_dedup_pairs(
        _t(spark, sf_dir, "embeddings"), n_cells=8, m_assign=2
    )


@_register(
    "streaming_chained_window_rollup",
    """WITH fine AS (
         SELECT time_bucket(INTERVAL '30 minutes', ts) AS ws,
                event_type, count(*) AS n
         FROM events GROUP BY 1, 2),
       coarse AS (
         SELECT time_bucket(INTERVAL '2 hours', ws) AS window_start,
                event_type, CAST(sum(n) AS BIGINT) AS n_events
         FROM fine GROUP BY 1, 2),
       m AS (SELECT max(ts) AS mt FROM events)
       SELECT window_start, event_type, n_events
       FROM coarse, m
       WHERE window_start + INTERVAL '2 hours' <= mt - INTERVAL '1 hour'
    """,
    doc="CHAINED stateful streaming (Spark 4 multiple-stateful-operator "
    "support): 30-minute tumbling pre-aggregation rolled up into "
    "2-hour windows downstream IN ONE streaming query — the "
    "pre-aggregation pattern that cuts second-stage state by the "
    "fan-in (4 slim rows per key instead of every event). Append "
    "mode is mandatory for chained stateful ops, so only windows the "
    "watermark (1 hour) has closed emit; the batch oracle applies "
    "the same cutoff (window_end <= max(ts) - delay). Watermark "
    "propagates through the first agg via window_time().",
)
def q_streaming_chained_window_rollup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..streaming import run_windowed_batch

    events = _events_stream(spark, sf_dir)
    fine = (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "30 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    coarse = (
        fine.groupBy(
            F.window(F.window_time("window"), "2 hours"), "event_type"
        )
        .agg(F.sum("n").alias("n_events"))
    )
    out = run_windowed_batch(
        coarse, query_name="chained_rollup_oracle", output_mode="append"
    )
    return out.select(
        F.col("window.start").cast("timestamp_ntz").alias("window_start"),
        "event_type",
        "n_events",
    )


@_register(
    "bitmap_distinct_users",
    """SELECT event_type,
              CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
       FROM events GROUP BY event_type""",
    doc="EXACT mergeable distinct counting via bitmap aggregation "
    "(operators/sketches.py::bitmap_distinct_by): the long key space "
    "shards into 32K-bit buckets (bitmap_bucket_number/_bit_position), "
    "one bitmap per (group, bucket) via bitmap_construct_agg, distinct "
    "= sum of popcounts. Unlike COUNT(DISTINCT), the shuffle carries "
    "(group, bucket, ≤4KB bitmap) rows — bounded by occupied buckets, "
    "not by distinct values — and the bitmaps are lossless mergeable "
    "state (bitmap_or_agg) for rollups without rescans. The HLL tier "
    "is the approximate sibling for sparse/string keys.",
)
def q_bitmap_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import bitmap_distinct_by

    e = _t(spark, sf_dir, "events")
    return bitmap_distinct_by(e, ["event_type"], "user_id")


@_register(
    "incremental_agg_orders",
    """WITH agg AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
                           sum(o_totalprice) AS total_spent
                    FROM orders GROUP BY o_custkey)
       SELECT o_custkey, n_orders,
              round(total_spent, 2) AS total_spent
       FROM agg""",
    doc="incremental materialized-aggregate maintenance (operators/"
    "merge.py::incremental_agg_merge): the summary over pre-1998 "
    "orders is refreshed with the 1998+ delta's partial aggregate via "
    "a full-outer coalesce-add merge — and must EQUAL the from-scratch "
    "aggregate (the oracle). Refresh cost scales with the delta, not "
    "history; both inputs are summary-sized, one key shuffle (zero "
    "with bucketed summaries). Rounding happens ONLY at the final "
    "projection — rounding the halves before adding would not "
    "commute.",
)
def q_incremental_agg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.merge import incremental_agg_merge

    o = _t(spark, sf_dir, "orders")
    cut = F.lit("1998-01-01").cast("timestamp")

    def _half(pred):
        return (
            o.filter(pred)
            .groupBy("o_custkey")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum("o_totalprice").alias("total_spent"),
            )
        )

    summary = _half(F.col("o_orderdate") < cut)
    delta = _half(F.col("o_orderdate") >= cut)
    merged = incremental_agg_merge(
        summary, delta, ["o_custkey"], ["n_orders", "total_spent"]
    )
    return merged.select(
        "o_custkey",
        "n_orders",
        F.round("total_spent", 2).alias("total_spent"),
    )


@_register(
    "table_fingerprint_orders",
    """SELECT bit_xor(CAST('0x' || substr(md5(
                concat_ws(chr(31),
                  coalesce(CAST(o_orderkey AS VARCHAR), chr(0) || 'NULL'),
                  coalesce(CAST(o_custkey AS VARCHAR), chr(0) || 'NULL'),
                  coalesce(o_orderstatus, chr(0) || 'NULL'),
                  coalesce(o_orderpriority, chr(0) || 'NULL'))), 1, 15)
              AS BIGINT)) AS xor_fingerprint,
              CAST(count(*) AS BIGINT) AS n_rows
       FROM orders""",
    doc="order-insensitive whole-table checksum (operators/profile.py::"
    "table_fingerprint): md5 over a null-tagged column concat, leading "
    "60 bits as a long, rows combined with bit_xor — commutative/"
    "overflow-free, so the fingerprint is identical across row order, "
    "partitioning, and engines (this oracle IS the cross-engine "
    "replica check). One map-only pass + scalar agg; n_rows rides "
    "along to catch even-multiplicity duplicates XOR would cancel. "
    "String columns only here: float-formatting differs across "
    "engines, so numeric columns should be fingerprinted via their "
    "bit patterns at the caller.",
)
def q_table_fingerprint_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import table_fingerprint

    o = _t(spark, sf_dir, "orders")
    return table_fingerprint(
        o, ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    )


@_register(
    "scd2_order_status_intervals",
    """SELECT o_custkey, o_orderstatus,
              o_orderdate AS valid_from,
              lead(o_orderdate) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey)
                  AS valid_to,
              CAST(lead(o_orderdate) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey)
                   IS NULL AS BOOLEAN) AS is_current
       FROM orders""",
    doc="SCD Type-2 interval construction: a change log (key, ts, "
    "attribute) becomes validity intervals [valid_from, valid_to) via "
    "a single lead() window — each row closes when the key's next "
    "change opens, the last row stays open (is_current). The "
    "warehouse-dimension pattern that pairs with asof_last_purchase "
    "for point-in-time joins. One key-partitioned shuffle; ties "
    "broken by the unique orderkey so intervals are deterministic. "
    "Scales: window state is one row of lookahead per key.",
)
def q_scd2_order_status_intervals(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderstatus",
        F.col("o_orderdate").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@_register(
    "point_in_time_state_join",
    # The consumer of scd2_order_status_intervals' pattern: facts
    # joined to the dimension version VALID AT the fact's timestamp.
    # Change log = each user's non-purchase events (state = the event
    # type); facts = purchases. Zero-length intervals (same-ts
    # changes, tie-broken by event_id) match nothing, so intervals
    # are disjoint and the join is deterministic. No timestamp
    # columns in the output (instant-vs-NTZ collect trap).
    """WITH dim AS (
         SELECT user_id, event_type AS state, ts AS valid_from,
                lead(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS valid_to
         FROM events WHERE event_type <> 'purchase'),
       f AS (SELECT event_id, user_id, ts, value FROM events
             WHERE event_type = 'purchase')
       SELECT f.event_id, f.user_id,
              coalesce(d.state, 'none') AS state_at_purchase,
              f.value
       FROM f LEFT JOIN dim d
         ON f.user_id = d.user_id
        AND f.ts >= d.valid_from
        AND (d.valid_to IS NULL OR f.ts < d.valid_to)""",
    doc="point-in-time (SCD2 interval) join: each purchase event "
    "joined to the user state valid at its timestamp — the "
    "warehouse dimension-versioning consumer of "
    "scd2_order_status_intervals. Plan: one lead() window per key + "
    "an equi-join on the entity key with range residuals (SortMerge, "
    "never a nested loop); per-entity dimension rows are few, so the "
    "shape holds at 100 TB",
)
def q_point_in_time_state_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("valid_from", "event_id")
    dim = (
        e.filter(F.col("event_type") != "purchase")
        .select(
            F.col("user_id"),
            F.col("event_id"),
            F.col("event_type").alias("state"),
            F.col("ts").alias("valid_from"),
        )
        .withColumn("valid_to", F.lead("valid_from").over(w))
        .drop("event_id")
    )
    f = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    joined = f.join(
        dim,
        (f["user_id"] == dim["user_id"])
        & (f["ts"] >= dim["valid_from"])
        & (dim["valid_to"].isNull() | (f["ts"] < dim["valid_to"])),
        "left",
    )
    return joined.select(
        f["event_id"],
        f["user_id"],
        F.coalesce(dim["state"], F.lit("none")).alias("state_at_purchase"),
        f["value"],
    )


@_register(
    "session_overlap_pairs",
    # Sessions = 30-min-gap sessionization per user; pairs of users
    # whose sessions overlap in time (co-presence), with the exact
    # total overlap in integer MICROSECONDS (epoch_us — no float).
    # The oracle runs the quadratic overlap join; the Spark side runs
    # the binned rewrite, so a binning bug (missed or duplicated
    # pair) surfaces as a mismatch.
    """WITH x AS (SELECT user_id, ts, event_id,
              CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id)
                        > INTERVAL '30 minutes'
                   THEN 1 ELSE 0 END AS brk
         FROM events),
       s AS (SELECT user_id,
                    sum(brk) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sid,
                    ts
             FROM x),
       sess AS (SELECT user_id, sid, epoch_us(min(ts)) AS lo,
                       epoch_us(max(ts)) AS hi
                FROM s GROUP BY 1, 2)
       SELECT a.user_id AS user_a, b.user_id AS user_b,
              CAST(count(*) AS BIGINT) AS n_overlaps,
              CAST(sum(least(a.hi, b.hi) - greatest(a.lo, b.lo))
                   AS BIGINT) AS total_overlap_us
       FROM sess a JOIN sess b
         ON a.user_id < b.user_id AND a.lo <= b.hi AND b.lo <= a.hi
       GROUP BY 1, 2""",
    doc="interval x interval overlap join via the binning rewrite "
    "(operators/rangejoin.py::interval_overlap_join_binned): 30-min "
    "sessionization per user, then user pairs with overlapping "
    "sessions and exact total co-presence time. The quadratic overlap "
    "condition becomes a 1-hour-bin equi-join with an ownership rule "
    "(pair emitted only in the overlap-start bin — exactly-once, no "
    "dedup shuffle); the oracle runs the quadratic form, so binning "
    "bugs surface as mismatches",
)
def q_session_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import _shared
    from ..operators.rangejoin import interval_overlap_join_binned

    e = _t(spark, sf_dir, "events")
    # work in integer epoch microseconds throughout: ts may surface as
    # TIMESTAMP or TIMESTAMP_NTZ depending on the reader path, and
    # integer micros sidestep both the cast matrix and float seconds
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    base = e.select("user_id", "event_id", us.alias("_us"))
    w = W.partitionBy("user_id").orderBy("_us", "event_id")
    brk = (
        (F.col("_us") - F.lag("_us").over(w)) > 1_800_000_000
    ).cast("int")
    s = base.select(
        "user_id",
        "_us",
        F.sum(F.coalesce(brk, F.lit(0))).over(
            w.rowsBetween(W.unboundedPreceding, 0)
        ).alias("sid"),
    )
    # both sides of the overlap self-join consume `sess`: without the
    # shared materialization each side re-derives the full sessionize
    # subtree (scan + 2 windows + aggregate) — measured as 2 identical
    # branches in the r12 before-plan. The checkpointed frame is the
    # slim (user_id, sid, lo, hi) session summary, never the events.
    sess = _shared(s.groupBy("user_id", "sid").agg(
        F.min("_us").alias("lo"),
        F.max("_us").alias("hi"),
    ))
    a = sess.select(
        F.col("user_id").alias("user_a"),
        F.col("lo").alias("lo_a"),
        F.col("hi").alias("hi_a"),
    )
    b = sess.select(
        F.col("user_id").alias("user_b"),
        F.col("lo").alias("lo_b"),
        F.col("hi").alias("hi_b"),
    )
    pairs = interval_overlap_join_binned(
        a, b, "lo_a", "hi_a", "lo_b", "hi_b", bin_width=3_600_000_000
    ).filter(F.col("user_a") < F.col("user_b"))
    return pairs.groupBy("user_a", "user_b").agg(
        F.count(F.lit(1)).alias("n_overlaps"),
        F.sum(
            F.least("hi_a", "hi_b") - F.greatest("lo_a", "lo_b")
        ).alias("total_overlap_us"),
    )


@_register(
    "skew_report_lineitem_suppkey",
    """WITH k AS (SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n
                  FROM lineitem GROUP BY l_suppkey),
       t AS (SELECT sum(n) AS total, count(*) AS n_keys FROM k)
       SELECT l_suppkey, n,
              round(n / total, 4) AS share,
              round(n * n_keys / total, 2) AS skew_factor
       FROM k, t
       ORDER BY n DESC, l_suppkey LIMIT 10""",
    doc="join/agg skew DIAGNOSIS: per-key row counts with each key's "
    "share of the table and its skew factor (count / perfectly-even "
    "count). skew_factor >> 1 on a join key predicts a straggler "
    "reducer at scale — the signal for tuning.salted_join / AQE "
    "skew-split (both pinned elsewhere). One slim key agg + a 1-row "
    "totals broadcast; top-k via TakeOrderedAndProject.",
)
def q_skew_report_lineitem_suppkey(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    k = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("n"))
    t = k.agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("n_keys")
    )
    return (
        k.join(F.broadcast(t))
        .select(
            "l_suppkey",
            "n",
            F.round(F.col("n") / F.col("total"), 4).alias("share"),
            F.round(
                F.col("n") * F.col("n_keys") / F.col("total"), 2
            ).alias("skew_factor"),
        )
        .orderBy(F.col("n").desc(), F.col("l_suppkey"))
        .limit(10)
    )


@_register(
    "udtf_dynamic_unpivot_orders",
    """SELECT o_orderkey, 'o_totalprice' AS measure,
              o_totalprice AS value
       FROM orders WHERE o_orderkey <= 200
       UNION ALL
       SELECT o_orderkey, 'o_custkey' AS measure,
              CAST(o_custkey AS DOUBLE) AS value
       FROM orders WHERE o_orderkey <= 200""",
    doc="dynamic-schema Python UDTF (Spark 4 analyze() hook, functions/"
    "udtfs.py::UnpivotColumns): output schema is computed at PLAN time "
    "from the call's literal column names, and unknown names fail "
    "analysis, not execution (pinned in tests/test_textops.py). "
    "Row-evaluated Python by design — the JVM unpivot twin "
    "(unpivot_order_measures) is the at-scale path; this entry checks "
    "the LATERAL dynamic-schema surface on a keyed slice.",
)
def q_udtf_dynamic_unpivot_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..functions.udtfs import UnpivotColumns

    spark.udtf.register("unpivot_columns", UnpivotColumns)
    _t(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") <= 200
    ).createOrReplaceTempView("_udtf_orders")
    return spark.sql(
        """SELECT t.o_orderkey, u.measure, u.value
           FROM _udtf_orders t,
                LATERAL unpivot_columns(
                    struct(t.o_totalprice, t.o_custkey),
                    'o_totalprice', 'o_custkey') u"""
    )


@_register(
    "triangle_count_copurchase",
    """WITH pairs AS (
         SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
                         greatest(a.l_partkey, b.l_partkey) AS v
         FROM lineitem a
         JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                        AND a.l_partkey <> b.l_partkey)
       SELECT CAST(count(*) AS BIGINT) AS n_triangles
       FROM pairs e1
       JOIN pairs e2 ON e1.v = e2.u
       JOIN pairs e3 ON e3.u = e1.u AND e3.v = e2.v""",
    doc="triangle counting on the co-purchase graph via DEGREE "
    "ORIENTATION (operators/graph.py::triangle_count): edges point "
    "low-degree → high-degree, bounding every vertex's out-degree by "
    "O(sqrt(E)) [Chiba–Nishizeki] so the wedge join never fans out "
    "d² rows through a hub — the difference between feasible and "
    "not on scale-free graphs. Each triangle counted exactly once. "
    "The oracle is the canonical u<v three-way join, which is "
    "correct but hub-quadratic — the 100 TB reason the oriented "
    "form exists.",
)
def q_triangle_count_copurchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.graph import copurchase_edges, triangle_count

    li = _t(spark, sf_dir, "lineitem")
    return triangle_count(copurchase_edges(li))


@_register(
    "not_in_inactive_customers",
    """SELECT c_custkey, c_mktsegment FROM customer
       WHERE c_custkey NOT IN
             (SELECT o_custkey FROM orders
              WHERE o_orderdate >= TIMESTAMP '2001-01-01')""",
    doc="NOT IN subquery with its exact three-valued-logic semantics: "
    "if the subquery produced ANY null the whole predicate would be "
    "UNKNOWN for every row (no matches) — which is why Catalyst plans "
    "NOT IN as a NULL-AWARE anti join, distinct from the plain "
    "left-anti NOT EXISTS (join_anti / idle_customer_balance). "
    "o_custkey is non-null in the fixture so results coincide with "
    "anti-join semantics, but the PLAN is the null-aware form — the "
    "semantics trap every SQL surface must get right. Expressed via "
    "spark.sql on temp views (the decorrelator owns the rewrite).",
)
def q_not_in_inactive_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    _t(spark, sf_dir, "customer").createOrReplaceTempView("_ni_customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("_ni_orders")
    return spark.sql(
        """SELECT c_custkey, c_mktsegment FROM _ni_customer
           WHERE c_custkey NOT IN
                 (SELECT o_custkey FROM _ni_orders
                  WHERE o_orderdate >= TIMESTAMP '2001-01-01')"""
    )


@_register(
    "try_arithmetic_safety",
    """SELECT o_orderkey,
              CASE WHEN o_orderkey % 3 = 0 THEN NULL
                   ELSE round(o_totalprice / (o_orderkey % 3), 4)
              END AS safe_ratio,
              TRY_CAST(o_orderpriority AS DOUBLE) AS bad_cast,
              TRY_CAST(substr(o_orderpriority, 1, 1) AS INT) AS prio_digit
       FROM orders WHERE o_orderkey <= 1000""",
    doc="ANSI-mode safety surface (Spark 4 defaults ANSI ON, where "
    "div-by-zero and bad casts THROW): try_divide / try_cast give "
    "per-row NULL-on-error semantics so one poisoned row cannot kill "
    "a 100 TB job — the right default for ingest pipelines. "
    "try_divide(x, 0) → NULL (oracle spells it as the equivalent "
    "CASE; DuckDB's TRY_CAST matches Spark's try_cast exactly).",
)
def q_try_arithmetic_safety(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    return o.select(
        "o_orderkey",
        F.round(
            F.try_divide("o_totalprice", F.col("o_orderkey") % 3), 4
        ).alias("safe_ratio"),
        F.col("o_orderpriority").try_cast("double").alias("bad_cast"),
        F.substring("o_orderpriority", 1, 1).try_cast("int").alias(
            "prio_digit"
        ),
    )


@_register(
    "calendar_functions_orders",
    """SELECT o_orderkey,
              CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
                  AS month_start,
              CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
              CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS qtr,
              CAST(EXTRACT(week FROM o_orderdate) AS INT) AS iso_week,
              CAST(EXTRACT(isodow FROM o_orderdate) AS INT) AS iso_dow,
              round(date_diff('day', o_orderdate,
                              TIMESTAMP '2002-01-01') / 30.4375, 2)
                  AS months_until_2002
       FROM orders WHERE o_orderkey <= 2000""",
    doc="calendar-function family over the order dates: date_trunc / "
    "last_day / quarter / ISO week + ISO day-of-week (Spark weekofyear "
    "and dayofweek differ from ISO — weekofyear IS ISO, dayofweek is "
    "1=Sunday, so the ISO form needs (dayofweek+5)%7+1). All map-only "
    "JVM expressions; month arithmetic spelled as day-diff/30.4375 on "
    "both engines because Spark months_between counts calendar months "
    "while DuckDB date_diff('month') counts boundary crossings — "
    "engine-specific semantics the oracle refuses to paper over.",
)
def q_calendar_functions_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    iso_dow = (F.dayofweek("o_orderdate") + 5) % 7 + 1
    return o.select(
        "o_orderkey",
        # date_trunc/last_day return INSTANT types even over NTZ input;
        # cast back to NTZ so collect() is host-timezone-independent
        # (the convention every derived-timestamp output follows)
        F.date_trunc("month", "o_orderdate")
        .cast("timestamp_ntz")
        .alias("month_start"),
        F.last_day("o_orderdate").cast("timestamp_ntz").alias("month_end"),
        F.quarter("o_orderdate").alias("qtr"),
        F.weekofyear("o_orderdate").alias("iso_week"),
        iso_dow.alias("iso_dow"),
        F.round(
            F.datediff(
                F.lit("2002-01-01").cast("date"), F.col("o_orderdate")
            )
            / 30.4375,
            2,
        ).alias("months_until_2002"),
    )


@_register(
    "string_functions_parts",
    """SELECT p_partkey,
              split_part(p_name, ' ', 1) AS first_word,
              upper(left(p_brand, 5)) AS brand_prefix,
              lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
              replace(p_type, 'PROMO', 'PRM') AS type_short,
              CAST(length(p_name) - length(replace(p_name, ' ', ''))
                   + 1 AS INT) AS n_words,
              reverse(p_brand) AS brand_rev,
              substr(p_name, 2, 5) AS name_mid
       FROM part WHERE p_partkey <= 500""",
    doc="string-function family breadth in one map-only pass: "
    "split_part / left+upper / lpad / replace / the length-delta "
    "word-count idiom / reverse / substr — each spelled with the "
    "portable form both engines implement identically (e.g. Spark "
    "substring and DuckDB substr are both 1-based; initcap is "
    "deliberately absent — Spark title-cases every token while DuckDB "
    "has no initcap at all). Pure projection, pushdown-friendly.",
)
def q_string_functions_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    n_words = (
        F.length("p_name")
        - F.length(F.replace(F.col("p_name"), F.lit(" "), F.lit("")))
        + 1
    ).cast("int")
    return p.select(
        "p_partkey",
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.upper(F.left(F.col("p_brand"), F.lit(5))).alias("brand_prefix"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.replace(F.col("p_type"), F.lit("PROMO"), F.lit("PRM")).alias(
            "type_short"
        ),
        n_words.alias("n_words"),
        F.reverse("p_brand").alias("brand_rev"),
        F.substring("p_name", 2, 5).alias("name_mid"),
    )


@_register(
    "balanced_source_sample",
    """SELECT doc_id, source FROM (
         SELECT doc_id, source,
                row_number() OVER (
                    PARTITION BY source
                    ORDER BY md5('7-' || CAST(doc_id AS VARCHAR)), doc_id
                ) AS rn
         FROM documents) t
       WHERE rn <= 5""",
    doc="deterministic balanced per-group sampling: EXACTLY k docs per "
    "source, chosen by ranking on md5(seed-id) — a seeded permutation "
    "every engine and every cluster layout agrees on (same trick as "
    "training_shard_assignment), unlike rand() which is "
    "partition-order dependent, and unlike sampleBy which is "
    "Bernoulli (k only in expectation — real curation mixes need "
    "exact per-source budgets). One source-keyed shuffle for the "
    "window; rank cut, no sort of the full corpus.",
)
def q_balanced_source_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit("7-"), F.col("doc_id").cast("string")))
    w = W.partitionBy("source").orderBy(key, F.col("doc_id"))
    return (
        d.select("doc_id", "source")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("doc_id", "source")
    )


@_register(
    "sql_udf_net_revenue",
    """SELECT l_returnflag,
              round(sum(l_extendedprice * (1 - l_discount)), 2)
                  AS net_revenue
       FROM lineitem GROUP BY l_returnflag""",
    doc="SQL-defined scalar function (Spark 4 CREATE FUNCTION ... "
    "RETURN expr): the UDF body is a plain SQL expression, so unlike "
    "Python UDFs it INLINES into the plan at analysis time — full "
    "codegen, pushdown, and partial aggregation apply; zero "
    "serialization boundary. The right tool for shared business "
    "formulas at 100 TB (Python UDFs are for logic SQL cannot "
    "express). Oracle inlines the same expression.",
)
def q_sql_udf_net_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION net_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1 - d)"
    )
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("_udf_lineitem")
    return spark.sql(
        """SELECT l_returnflag,
                  round(sum(net_price(l_extendedprice, l_discount)), 2)
                      AS net_revenue
           FROM _udf_lineitem GROUP BY l_returnflag"""
    )


@_register(
    "embedding_dim_profile",
    """SELECT label, CAST(r.i AS INT) AS dim,
              round(avg(CAST(embedding[r.i] AS DOUBLE)), 6) AS dim_mean,
              round(stddev_samp(CAST(embedding[r.i] AS DOUBLE)), 6)
                  AS dim_std
       FROM embeddings, range(1, 9) r(i)
       GROUP BY label, dim""",
    doc="per-dimension vector profile (the drift/normalization check "
    "for an embedding pipeline): posexplode the array to (label, dim, "
    "x), aggregate mean/std per (label, dimension). Spark posexplode "
    "is 0-based, SQL 1-based subscripts — shifted explicitly. "
    "Scales: the exploded stream is (rows × dims) slim doubles with "
    "map-side partial aggregation; restricting to the first 8 dims "
    "prunes BEFORE the shuffle. Float32 values cast to double before "
    "accumulating on both engines (same convention as "
    "embedding_hof_stats).",
)
def q_embedding_dim_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label",
        F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias(
            "dim0", "x"
        ),
    ).filter(F.col("dim0") <= 7)
    return (
        exploded.groupBy("label", (F.col("dim0") + 1).cast("int").alias("dim"))
        .agg(
            F.round(F.avg("x"), 6).alias("dim_mean"),
            F.round(F.stddev_samp("x"), 6).alias("dim_std"),
        )
    )


@_register(
    "entity_resolution_parts",
    """WITH RECURSIVE
       px AS (SELECT p_partkey, p_name FROM part
              WHERE p_partkey <= 2000),
       pairs AS (
         SELECT a.p_partkey AS key_a, b.p_partkey AS key_b
         FROM px a JOIN px b
           ON split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
          AND a.p_partkey < b.p_partkey
         WHERE levenshtein(a.p_name, b.p_name) <= 2),
       edges AS (SELECT key_a AS s, key_b AS d FROM pairs
                 UNION SELECT key_b, key_a FROM pairs),
       reach(node, r) AS (
           SELECT p_partkey, p_partkey FROM px
           UNION
           SELECT e.d, reach.r FROM reach JOIN edges e ON e.s = reach.node)
       SELECT node AS p_partkey, min(r) AS canonical_id,
              node = min(r) AS keep
       FROM reach GROUP BY node""",
    doc="END-TO-END entity resolution (the capstone composition): "
    "block on a name token → edit-distance ≤2 scoring within blocks "
    "(never all-pairs) → connected components (pointer jumping, "
    "O(log n) rounds) → deterministic min-id survivor. The WHOLE "
    "composition carries one oracle (blocked pairs + recursive-CTE "
    "reachability), the same discipline as corpus_curation_funnel: "
    "component interfaces can't drift apart silently. Scales: block "
    "join is |block|² per block, components shuffle slim (node, "
    "label) pairs, survivors derive from the labels — no step "
    "touches an unblocked cross product. Runs on a fixed keyed slice "
    "(p_partkey <= 2000): the fixture's synthetic names are DENSE in "
    "edit space, so at sf0.1 the full table yields 5.5M matching "
    "pairs and near-clique components — realistic name data is "
    "sparse; the operator's at-scale evidence is the banded/"
    "components family, this entry certifies the COMPOSITION.",
)
def q_entity_resolution_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import resolve_components

    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_partkey") <= 2000)
        .select("p_partkey", "p_name")
    )
    blk = F.split(F.col("p_name"), " ").getItem(1)
    a = p.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("_na"),
        blk.alias("_blk"),
    )
    b = p.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("_nb"),
        blk.alias("_blk"),
    )
    pairs = (
        a.join(b, "_blk")
        .filter(F.col("key_a") < F.col("key_b"))
        .filter(F.levenshtein("_na", "_nb") <= 2)
        .select("key_a", "key_b")
    )
    return resolve_components(
        p.select("p_partkey"),
        pairs,
        id_col="p_partkey",
        src_col="key_a",
        dst_col="key_b",
    )


@_register(
    "rfm_customer_segments",
    """WITH rfm AS (
         SELECT o_custkey,
                max(o_orderdate) AS last_order,
                CAST(count(*) AS BIGINT) AS frequency,
                sum(o_totalprice) AS monetary
         FROM orders GROUP BY o_custkey),
       scored AS (
         SELECT o_custkey,
                ntile(4) OVER (ORDER BY last_order, o_custkey) AS r_score,
                ntile(4) OVER (ORDER BY frequency, o_custkey) AS f_score,
                ntile(4) OVER (ORDER BY monetary, o_custkey) AS m_score
         FROM rfm)
       SELECT r_score, f_score, m_score,
              CAST(count(*) AS BIGINT) AS n_customers
       FROM scored GROUP BY r_score, f_score, m_score""",
    doc="RFM segmentation (the classic CRM workload): one pass builds "
    "recency/frequency/monetary per customer, three ntile(4) windows "
    "score them, final agg counts the 64 segments. Ties broken by "
    "custkey so quartile boundaries are engine-identical. Scale note: "
    "unpartitioned ntile is a single-reducer sort — fine for "
    "|customers| summary rows (dim-sized after the first agg), and "
    "the percentile-threshold join is the swap-in at true scale.",
)
def q_rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum("o_totalprice").alias("monetary"),
    )
    def nt(col):
        return F.ntile(4).over(W.orderBy(col, "o_custkey"))
    scored = rfm.select(
        nt(F.col("last_order")).alias("r_score"),
        nt(F.col("frequency")).alias("f_score"),
        nt(F.col("monetary")).alias("m_score"),
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


@_register(
    "percentile_cont_prices",
    """SELECT p_brand,
              round(quantile_cont(p_retailprice, 0.25), 4) AS q25,
              round(quantile_cont(p_retailprice, 0.50), 4) AS q50,
              round(quantile_cont(p_retailprice, 0.75), 4) AS q75
       FROM part GROUP BY p_brand""",
    doc="exact interpolated percentiles per group: Spark "
    "percentile_cont ≡ DuckDB quantile_cont (both linear "
    "interpolation between order statistics) — the exact tier "
    "backing approx_percentile's sketch tier. Exact percentiles "
    "shuffle the full value column per group (fine per-brand); the "
    "approx tier is the 100 TB default.",
)
def q_percentile_cont_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    def pc(f):
        return F.expr(
            f"percentile_cont({f}) WITHIN GROUP (ORDER BY p_retailprice)"
        )
    return p.groupBy("p_brand").agg(
        F.round(pc(0.25), 4).alias("q25"),
        F.round(pc(0.50), 4).alias("q50"),
        F.round(pc(0.75), 4).alias("q75"),
    )


@_register(
    "event_transition_matrix",
    """SELECT prev_type, event_type AS next_type,
              CAST(count(*) AS BIGINT) AS n,
              round(count(*) * 1.0 / sum(count(*))
                    OVER (PARTITION BY prev_type), 4) AS p_next
       FROM (SELECT user_id, event_type,
                    lag(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                        AS prev_type
             FROM events) t
       WHERE prev_type IS NOT NULL
       GROUP BY prev_type, event_type""",
    doc="first-order Markov transition matrix over per-user event "
    "sequences: lag window (one key shuffle) → transition counts → "
    "row-normalized probabilities via a window over the 5x5 count "
    "frame. Ties in ts broken by event_id so sequences are "
    "deterministic. The behavioral-analytics primitive behind "
    "next-action prediction and anomalous-flow detection; state "
    "per key is one row of lookback, counts collapse map-side.",
)
def q_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    counts = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    wt = W.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wt), 4).alias("p_next"),
    )


@_register(
    "linear_attribution_credit",
    """WITH purchases AS (
         SELECT event_id AS pid, user_id, ts AS pts FROM events
         WHERE event_type = 'purchase'),
       touches AS (
         SELECT p.pid, e.event_type AS channel
         FROM purchases p JOIN events e
           ON e.user_id = p.user_id
          AND e.event_type IN ('click', 'view')
          AND e.ts >= p.pts - INTERVAL 1 DAY AND e.ts < p.pts),
       credit AS (
         SELECT pid, channel,
                1.0 / count(*) OVER (PARTITION BY pid) AS w
         FROM touches)
       SELECT channel, round(sum(w), 4) AS credit,
              CAST(count(DISTINCT pid) AS BIGINT) AS n_purchases
       FROM credit GROUP BY channel""",
    doc="LINEAR multi-touch attribution (the companion to last-touch): "
    "every click/view in the day before a purchase shares the "
    "purchase's credit equally (1/n per touch) — a user-keyed "
    "interval join (range predicate rides the equi-join as a "
    "residual, never a cross product), per-purchase touch counts via "
    "a window, one final channel rollup. Credit conservation (sum "
    "over channels = attributed purchases) falls out of the 1/n "
    "split and is what the oracle certifies end-to-end.",
)
def q_linear_attribution_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("_u"),
        F.col("ts").alias("pts"),
    )
    touches = e.filter(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("_u2"),
        F.col("event_type").alias("channel"),
        F.col("ts").alias("tts"),
    )
    joined = purchases.join(
        touches,
        (F.col("_u") == F.col("_u2"))
        & (F.col("tts") >= F.col("pts") - F.expr("INTERVAL 1 DAY"))
        & (F.col("tts") < F.col("pts")),
    ).select("pid", "channel")
    wp = W.partitionBy("pid")
    credit = joined.select(
        "pid", "channel", (F.lit(1.0) / F.count(F.lit(1)).over(wp)).alias("w")
    )
    return credit.groupBy("channel").agg(
        F.round(F.sum("w"), 4).alias("credit"),
        F.countDistinct("pid").alias("n_purchases"),
    )


@_register(
    "rolling_zscore_anomalies",
    """SELECT event_id, user_id,
              round(z, 2) AS zscore
       FROM (SELECT event_id, user_id, value,
                    (value - avg(value) OVER w)
                        / NULLIF(stddev_samp(value) OVER w, 0) AS z
             FROM events
             WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
       WHERE z IS NOT NULL AND abs(z) > 3.0""",
    doc="rolling z-score anomaly detection: each event scored against "
    "its user's TRAILING 20-event window (ROWS BETWEEN ... AND 1 "
    "PRECEDING — the current row must not contaminate its own "
    "baseline), flag |z| > 3. NULLIF guards the constant-window "
    "degenerate case. One user-keyed shuffle, O(window) state per "
    "row — the streaming-adjacent monitoring primitive; the "
    "event-time version is streaming_running_totals' stateful op.",
)
def q_rolling_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    z = (F.col("value") - F.avg("value").over(w)) / F.nullif(
        F.stddev_samp("value").over(w), F.lit(0.0)
    )
    return (
        e.select("event_id", "user_id", z.alias("z"))
        .filter(F.col("z").isNotNull() & (F.abs("z") > 3.0))
        .select("event_id", "user_id", F.round("z", 2).alias("zscore"))
    )


@_register(
    "missing_orderkey_ranges",
    """WITH present AS (SELECT o_orderkey FROM orders
                       WHERE o_orderstatus <> 'P'),
       bounds AS (SELECT min(o_orderkey) AS lo, max(o_orderkey) AS hi
                  FROM present),
       expected AS (SELECT unnest(generate_series(lo, hi)) AS k
                    FROM bounds),
       missing AS (SELECT k FROM expected
                   WHERE NOT EXISTS (SELECT 1 FROM present o
                                     WHERE o.o_orderkey = k)),
       grouped AS (SELECT k, k - row_number() OVER (ORDER BY k) AS grp
                   FROM missing)
       SELECT min(k) AS gap_start, max(k) AS gap_end,
              CAST(count(*) AS BIGINT) AS gap_len
       FROM grouped GROUP BY grp""",
    doc="sequence-gap detection (the completeness check for id-keyed "
    "ingest): generate the expected key range (sequence + explode — "
    "distributed, not a driver loop), anti-join against present keys, "
    "collapse consecutive missing keys into ranges via the classic "
    "gaps-and-islands (k - row_number). Scales: the spine generates "
    "per-partition; the anti-join shuffles only keys; output is one "
    "row per GAP, not per missing key. The fixture's key space is "
    "dense, so the probe treats pending ('P') orders as the holes — "
    "same plan, non-trivial output at every SF.",
)
def q_missing_orderkey_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the fixture's key space is dense, so the probe runs against the
    # non-'P' subset — the pending orders ARE the ingest gaps
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "P")
    b = o.agg(
        F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi")
    )
    expected = b.select(
        F.explode(F.sequence("lo", "hi")).alias("k")
    )
    missing = expected.join(
        o.select(F.col("o_orderkey").alias("k")), "k", "left_anti"
    )
    grp = (F.col("k") - F.row_number().over(W.orderBy("k"))).alias("grp")
    return (
        missing.select("k", grp)
        .groupBy("grp")
        .agg(
            F.min("k").alias("gap_start"),
            F.max("k").alias("gap_end"),
            F.count(F.lit(1)).alias("gap_len"),
        )
        .drop("grp")
    )


@_register(
    "benford_first_digit",
    """SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                               AS VARCHAR), 1, 1) AS INT) AS digit,
              CAST(count(*) AS BIGINT) AS n,
              round(count(*) * 1.0
                    / (SELECT count(*) FROM orders
                       WHERE o_totalprice >= 1), 4) AS observed_p,
              round(log10(1.0 + 1.0
                    / CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                       AS VARCHAR), 1, 1) AS INT)), 4)
                  AS benford_p
       FROM orders WHERE o_totalprice >= 1
       GROUP BY digit""",
    doc="Benford first-digit profile (fraud/synthetic-data screening): "
    "leading digit of each amount vs the log10(1 + 1/d) expectation. "
    "Digit extracted via integer-truncate → string head on BOTH "
    "engines (float formatting differs across engines; integer "
    "formatting doesn't). Map-side 9-group agg; the 1-row total is a "
    "scalar broadcast.",
)
def q_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digit = F.substring(
        F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
    ).cast("int")
    total = o.agg(F.count(F.lit(1)).alias("_tot"))
    return (
        o.select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
        .join(F.broadcast(total))
        .select(
            "digit",
            "n",
            F.round(F.col("n") / F.col("_tot"), 4).alias("observed_p"),
            F.round(F.log10(1.0 + 1.0 / F.col("digit")), 4).alias(
                "benford_p"
            ),
        )
    )


@_register(
    "topk_with_ties_by_segment",
    """SELECT c_mktsegment, c_custkey, c_acctbal
       FROM (SELECT c_mktsegment, c_custkey, c_acctbal,
                    rank() OVER (PARTITION BY c_mktsegment
                                 ORDER BY round(c_acctbal, 0) DESC) AS rk
             FROM customer) t
       WHERE rk <= 3""",
    doc="TOP K WITH TIES semantics: rank() (not row_number) over a "
    "coarsened key keeps EVERY row tied at the boundary — the "
    "SQL-standard FETCH FIRST ... WITH TIES behavior, semantically "
    "distinct from window_topk_per_group's arbitrary tie-cut. The "
    "rank key is round(bal) so ties actually occur in the fixture; "
    "output rows can exceed 3 per group by design. One key shuffle "
    "for the window; no global sort.",
)
def q_topk_with_ties_by_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.round("c_acctbal", 0).desc()
    )
    return (
        c.select("c_mktsegment", "c_custkey", "c_acctbal")
        .withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") <= 3)
        .drop("rk")
    )


@_register(
    "abc_part_classification",
    """WITH rev AS (SELECT l_partkey,
                          sum(l_extendedprice * (1 - l_discount)) AS r
                   FROM lineitem GROUP BY l_partkey),
       ranked AS (SELECT l_partkey, r,
                         sum(r) OVER (ORDER BY r DESC, l_partkey)
                             / sum(r) OVER () AS cum_share
                  FROM rev)
       SELECT CASE WHEN cum_share <= 0.5 THEN 'A'
                   WHEN cum_share <= 0.8 THEN 'B'
                   ELSE 'C' END AS abc_class,
              CAST(count(*) AS BIGINT) AS n_parts,
              round(sum(r), 2) AS class_revenue
       FROM ranked GROUP BY abc_class""",
    doc="Pareto / ABC analysis (inventory classics): parts ranked by "
    "revenue, cumulative-share window classifies A (top 50% of "
    "revenue) / B (to 80%) / C (tail). Cumulative sum is ordered by "
    "(revenue DESC, partkey) — the unique tie-break that makes the "
    "running share engine-identical. Scale note: the ordered window "
    "runs over the |parts|-sized AGGREGATE, not the fact table; the "
    "global sum is the window's unpartitioned frame (1 extra pass "
    "over the same frame, no join).",
)
def q_abc_part_classification(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("r")
    )
    w_cum = W.orderBy(F.col("r").desc(), F.col("l_partkey"))
    ranked = rev.select(
        "l_partkey",
        "r",
        (
            F.sum("r").over(w_cum)
            / F.sum("r").over(W.partitionBy())
        ).alias("cum_share"),
    )
    cls = (
        F.when(F.col("cum_share") <= 0.5, "A")
        .when(F.col("cum_share") <= 0.8, "B")
        .otherwise("C")
    )
    return ranked.groupBy(cls.alias("abc_class")).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.sum("r"), 2).alias("class_revenue"),
    )


@_register(
    "time_weighted_avg_value",
    """SELECT user_id,
              round(sum(value * dur_s) / sum(dur_s), 4) AS twa_value,
              CAST(count(*) AS BIGINT) AS n_intervals
       FROM (SELECT user_id, value,
                    CAST(date_diff('second', ts,
                         lead(ts) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id))
                         AS DOUBLE) AS dur_s
             FROM events) t
       WHERE dur_s IS NOT NULL AND dur_s > 0
       GROUP BY user_id""",
    doc="time-weighted average (TWAP / IoT sensor mean): each reading "
    "weighted by how long it was current (lead(ts) - ts), so "
    "irregular sampling doesn't bias the mean toward chatty periods "
    "— the semantics a plain avg() silently gets wrong on event "
    "streams. One user-keyed shuffle for the window, agg reuses the "
    "same partitioning. Open last intervals are excluded (no known "
    "duration), identically on both engines.",
)
def q_time_weighted_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # DuckDB date_diff('second', a, b) counts SECOND-BOUNDARY
    # crossings (truncate each side to seconds, then subtract) — not
    # floor(b - a); match it exactly
    sec = lambda c: F.floor(
        F.unix_micros(c.cast("timestamp")) / 1_000_000
    )
    dur_s = (sec(F.lead("ts").over(w)) - sec(F.col("ts"))).cast("double")
    return (
        e.select("user_id", "value", dur_s.alias("dur_s"))
        .filter(F.col("dur_s").isNotNull() & (F.col("dur_s") > 0))
        .groupBy("user_id")
        .agg(
            F.round(
                F.sum(F.col("value") * F.col("dur_s")) / F.sum("dur_s"), 4
            ).alias("twa_value"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
    )


@_register(
    "yoy_monthly_revenue",
    """WITH m AS (SELECT date_trunc('month', o_orderdate) AS mon,
                        sum(o_totalprice) AS rev
                  FROM orders GROUP BY mon)
       SELECT CAST(mon AS TIMESTAMP) AS mon,
              round(rev, 2) AS revenue,
              round(rev / lag(rev, 12) OVER (ORDER BY mon) - 1, 4)
                  AS yoy_change
       FROM m""",
    doc="year-over-year growth: monthly revenue joined to itself 12 "
    "months back via lag(12) — the seasonal comparison that a naive "
    "month-over-month delta gets wrong. The lag runs over the "
    "months-sized AGGREGATE (driver-tiny), not the fact table; NULL "
    "for the first year by construction. date_trunc output cast to "
    "TIMESTAMP on both engines (DuckDB yields DATE-like).",
)
def q_yoy_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("mon")
    ).agg(F.sum("o_totalprice").alias("rev"))
    w = W.orderBy("mon")
    return m.select(
        # NTZ per the derived-timestamp convention (host-tz independent)
        F.col("mon").cast("timestamp_ntz").alias("mon"),
        F.round("rev", 2).alias("revenue"),
        F.round(F.col("rev") / F.lag("rev", 12).over(w) - 1, 4).alias(
            "yoy_change"
        ),
    )


@_register(
    "cep_error_then_purchase",
    """SELECT p.event_id AS purchase_id, p.user_id,
              CAST(date_diff('second', e.ts, p.ts) AS BIGINT)
                  AS secs_after_error
       FROM events p
       JOIN events e
         ON e.user_id = p.user_id AND e.event_type = 'error'
        AND e.ts < p.ts AND e.ts >= p.ts - INTERVAL 30 MINUTE
       WHERE p.event_type = 'purchase'
         AND e.ts = (SELECT max(e2.ts) FROM events e2
                     WHERE e2.user_id = p.user_id
                       AND e2.event_type = 'error' AND e2.ts < p.ts)
         AND NOT EXISTS (SELECT 1 FROM events s
                         WHERE s.user_id = p.user_id
                           AND s.event_type = 'signup'
                           AND s.ts > e.ts AND s.ts < p.ts)""",
    doc="complex-event pattern (CEP): purchase within 30 min AFTER an "
    "error with NO signup in between — the A-then-B-without-C shape "
    "behind fraud and recovery-flow detection. Spark side is pure "
    "windows over ONE user-keyed sort: last-error-before via "
    "last(when(error), ignorenulls) and last-signup-before likewise; "
    "the no-C condition is signup_ts < error_ts. No self-joins at "
    "all — the oracle states the same pattern as correlated "
    "subqueries and must agree, certifying the window rewrite. "
    "Ambiguity guard: error/signup ties on ts broken by event order "
    "in the window sort (ts, event_id).",
)
def q_cep_error_then_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, -1
    )
    last_err = F.last(
        F.when(F.col("event_type") == "error", F.col("ts")), ignorenulls=True
    ).over(w)
    last_signup = F.last(
        F.when(F.col("event_type") == "signup", F.col("ts")), ignorenulls=True
    ).over(w)
    flagged = (
        e.select("event_id", "user_id", "event_type", "ts")
        .withColumn("_err", last_err)
        .withColumn("_sgn", last_signup)
        .filter(F.col("event_type") == "purchase")
        .filter(
            F.col("_err").isNotNull()
            & (F.col("_err") >= F.col("ts") - F.expr("INTERVAL 30 MINUTES"))
            & (F.col("_sgn").isNull() | (F.col("_sgn") < F.col("_err")))
        )
    )
    sec = lambda c: F.floor(F.unix_micros(c.cast("timestamp")) / 1_000_000)
    return flagged.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        (sec(F.col("ts")) - sec(F.col("_err"))).alias("secs_after_error"),
    )


@_register(
    "top_session_paths",
    """WITH seq AS (
         SELECT user_id, ts, event_id, event_type,
                CASE WHEN ts - lag(ts) OVER w > INTERVAL '30 minutes'
                     OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS brk
         FROM events WINDOW w AS (PARTITION BY user_id
                                  ORDER BY ts, event_id)),
       sess AS (
         SELECT user_id, ts, event_id, event_type,
                sum(brk) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS sid
         FROM seq),
       paths AS (
         SELECT user_id, sid,
                array_to_string(
                    (list(event_type ORDER BY ts, event_id))[1:3],
                    '>') AS path
         FROM sess GROUP BY user_id, sid)
       SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
       FROM paths GROUP BY path
       ORDER BY n_sessions DESC, path LIMIT 20""",
    doc="session path analysis: sessionize (gaps-and-islands running "
    "sum over the 30-min break flag — same rewrite sessionize_events "
    "pins), take each session's FIRST THREE event types in "
    "deterministic (ts, event_id) order, count path frequencies. "
    "The ordered prefix is sort_array(collect_list(struct)) sliced "
    "to 3 — collect_list alone is partition-order dependent, the "
    "struct sort restores determinism. Top-20 tie-broken by path.",
)
def q_top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    tsec = F.unix_micros(F.col("ts").cast("timestamp"))
    brk = F.when(
        tsec - F.lag(tsec).over(w) > 1800 * 1_000_000,
        1,
    ).otherwise(0)
    # lag NULL (first event) starts a session too
    brk = F.when(F.lag("ts").over(w).isNull(), 1).otherwise(brk)
    sess = e.select(
        "user_id", "ts", "event_id", "event_type", brk.alias("brk")
    ).withColumn("sid", F.sum("brk").over(w))
    path = F.array_join(
        F.slice(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct("ts", "event_id", "event_type")
                    )
                ),
                lambda s: s.event_type,
            ),
            1,
            3,
        ),
        ">",
    )
    paths = sess.groupBy("user_id", "sid").agg(path.alias("path"))
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), F.col("path"))
        .limit(20)
    )


@_register(
    "part_affinity_lift",
    """WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey
                        FROM lineitem),
       n AS (SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n_orders
             FROM baskets),
       item AS (SELECT l_partkey, count(*) AS c FROM baskets
                GROUP BY l_partkey),
       pair AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                       count(*) AS c_ab
                FROM baskets a JOIN baskets b
                  ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
                GROUP BY part_a, part_b
                HAVING count(*) >= 3)
       SELECT p.part_a, p.part_b, CAST(p.c_ab AS BIGINT) AS n_both,
              round(p.c_ab / n.n_orders, 6) AS support,
              round(p.c_ab * 1.0 / ia.c, 4) AS confidence_a_to_b,
              round(p.c_ab * n.n_orders / (ia.c * 1.0 * ib.c), 4) AS lift
       FROM pair p
       JOIN item ia ON p.part_a = ia.l_partkey
       JOIN item ib ON p.part_b = ib.l_partkey, n
       ORDER BY lift DESC, p.part_a, p.part_b LIMIT 25""",
    doc="market-basket association rules: support / confidence / lift "
    "for co-purchased part pairs (the Apriori 2-itemset tier). "
    "Candidate pairs come from a basket self-join on the order key — "
    "|basket|² per order, never a global cross product — with a "
    "min-support HAVING that prunes before the metric joins; item "
    "counts broadcast. Lift > 1 = genuinely associated, not just "
    "popular. Tie-broken (part_a, part_b) for a stable top-25. At "
    "100 TB the same shape runs on a sampled or min-support-raised "
    "basket set — support pruning IS the scale knob.",
)
def q_part_affinity_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import _shared

    li = _t(spark, sf_dir, "lineitem")
    # the slim distinct (order, part) basket frame feeds the order
    # count, the per-item counts and BOTH pair-join sides — without
    # the checkpoint the scan+distinct re-derived per consumer
    baskets = _shared(li.select("l_orderkey", "l_partkey").distinct())
    n_orders = baskets.agg(
        F.countDistinct("l_orderkey").cast("double").alias("_n")
    )
    item = _shared(
        baskets.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    )
    a = baskets.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_partkey").alias("part_a")
    )
    b = baskets.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_partkey").alias("part_b")
    )
    pair = (
        a.join(b, "_ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= 3)
    )
    ia = item.select(F.col("l_partkey").alias("part_a"), F.col("c").alias("_ca"))
    ib = item.select(F.col("l_partkey").alias("part_b"), F.col("c").alias("_cb"))
    return (
        pair.join(F.broadcast(ia), "part_a")
        .join(F.broadcast(ib), "part_b")
        .join(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            F.col("c_ab").alias("n_both"),
            F.round(F.col("c_ab") / F.col("_n"), 6).alias("support"),
            F.round(F.col("c_ab") / F.col("_ca"), 4).alias(
                "confidence_a_to_b"
            ),
            F.round(
                F.col("c_ab") * F.col("_n") / (F.col("_ca") * F.col("_cb")), 4
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "part_a", "part_b")
        .limit(25)
    )


@_register(
    "gini_customer_revenue",
    """WITH cr AS (SELECT o_custkey, sum(o_totalprice) AS rev
                   FROM orders GROUP BY o_custkey),
       ranked AS (SELECT rev,
                         row_number() OVER (ORDER BY rev, o_custkey) AS i,
                         count(*) OVER () AS n,
                         sum(rev) OVER () AS total
                  FROM cr)
       SELECT round(2.0 * sum(i * rev) / (n * total)
                    - (n + 1.0) / n, 6) AS gini,
              CAST(n AS BIGINT) AS n_customers
       FROM ranked GROUP BY n, total""",
    doc="Gini coefficient of customer revenue (concentration metric "
    "for revenue-at-risk analysis): exact closed form G = 2·Σ(i·x_i)/"
    "(n·Σx) − (n+1)/n over rank-ordered values, custkey tie-break. "
    "The rank/total windows run over the |customers|-sized AGGREGATE; "
    "the single global sort is dim-sized. Companion to the ABC "
    "classification (same Lorenz machinery, scalar summary).",
)
def q_gini_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    cr = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("rev"))
    wr = W.orderBy("rev", "o_custkey")
    wall = W.partitionBy()
    ranked = cr.select(
        "rev",
        F.row_number().over(wr).alias("i"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("rev").over(wall).alias("total"),
    )
    return ranked.groupBy("n", "total").agg(
        F.round(
            2.0 * F.sum(F.col("i") * F.col("rev")) / (F.col("n") * F.col("total"))
            - (F.col("n") + 1.0) / F.col("n"),
            6,
        ).alias("gini"),
        F.col("n").cast("bigint").alias("n_customers"),
    ).select("gini", "n_customers")


@_register(
    "new_vs_returning_revenue",
    """WITH firsts AS (SELECT o_custkey,
                             min(o_orderdate) AS first_dt
                      FROM orders GROUP BY o_custkey)
       SELECT CAST(date_trunc('month', o.o_orderdate) AS TIMESTAMP)
                  AS mon,
              CASE WHEN o.o_orderdate = f.first_dt
                   THEN 'new' ELSE 'returning' END AS cust_type,
              round(sum(o.o_totalprice), 2) AS revenue,
              CAST(count(*) AS BIGINT) AS n_orders
       FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
       GROUP BY mon, cust_type""",
    doc="new-vs-returning revenue split per month (the growth-"
    "accounting view): each order classified by whether it IS its "
    "customer's first (min-date window; expressed as an aggregate "
    "join so the oracle states it identically). One custkey shuffle "
    "shared by the min and the join; monthly rollup is partial-agg "
    "friendly. NTZ month per the derived-timestamp convention.",
)
def q_new_vs_returning_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    firsts = o.groupBy(F.col("o_custkey").alias("_ck")).agg(
        F.min("o_orderdate").alias("first_dt")
    )
    ctype = F.when(
        F.col("o_orderdate") == F.col("first_dt"), "new"
    ).otherwise("returning")
    return (
        o.join(firsts, o.o_custkey == F.col("_ck"))
        .groupBy(
            F.date_trunc("month", "o_orderdate")
            .cast("timestamp_ntz")
            .alias("mon"),
            ctype.alias("cust_type"),
        )
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@_register(
    "repurchase_interval_profile",
    """WITH gaps AS (
         SELECT o_custkey,
                CAST(date_diff('day',
                     lag(o_orderdate) OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate,
                                                     o_orderkey),
                     o_orderdate) AS DOUBLE) AS gap_days
         FROM orders)
       SELECT round(quantile_cont(gap_days, 0.25), 2) AS q25_days,
              round(quantile_cont(gap_days, 0.50), 2) AS median_days,
              round(quantile_cont(gap_days, 0.75), 2) AS q75_days,
              round(avg(gap_days), 2) AS mean_days,
              CAST(count(*) AS BIGINT) AS n_intervals
       FROM gaps WHERE gap_days IS NOT NULL""",
    doc="repurchase-interval profile (the retention-health metric "
    "behind 'when should we expect the next order'): per-customer "
    "consecutive-order gaps via lag, summarized as exact interpolated "
    "quartiles + mean. One custkey shuffle for the window; the "
    "percentile runs over the gaps frame. date_diff('day') boundary-"
    "crossing semantics matched exactly (dates are midnight-aligned "
    "in the fixture so crossings == elapsed days).",
)
def q_repurchase_interval_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    day = lambda c: F.floor(
        F.unix_micros(c.cast("timestamp")) / (86400 * 1_000_000)
    )
    gap = (day(F.col("o_orderdate")) - day(F.lag("o_orderdate").over(w))).cast(
        "double"
    )
    gaps = o.select(gap.alias("gap_days")).filter(
        F.col("gap_days").isNotNull()
    )
    pc = lambda f: F.expr(
        f"percentile_cont({f}) WITHIN GROUP (ORDER BY gap_days)"
    )
    return gaps.agg(
        F.round(pc(0.25), 2).alias("q25_days"),
        F.round(pc(0.50), 2).alias("median_days"),
        F.round(pc(0.75), 2).alias("q75_days"),
        F.round(F.avg("gap_days"), 2).alias("mean_days"),
        F.count(F.lit(1)).alias("n_intervals"),
    )


@_register(
    "rapid_repeat_orders",
    """SELECT a.o_orderkey AS key_a, b.o_orderkey AS key_b,
              a.o_custkey,
              round(abs(a.o_totalprice - b.o_totalprice), 2)
                  AS price_delta
       FROM orders a JOIN orders b
         ON a.o_custkey = b.o_custkey
        AND a.o_orderkey < b.o_orderkey
        AND b.o_orderdate >= a.o_orderdate
        AND b.o_orderdate <= a.o_orderdate + INTERVAL 2 DAY""",
    doc="rapid-repeat-order audit (the duplicate-payment screen's "
    "shape on data without planted dupes): same customer, two orders "
    "within two days, with the amount delta for triage. The join "
    "keys on custkey so candidate generation is an equi-join with "
    "the date window as a residual — the naive date-range self-join "
    "without the customer key would be an all-pairs trap. In a real "
    "AP system the delta==0 slice is the duplicate-payment alarm.",
)
def q_rapid_repeat_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    a = o.select(
        F.col("o_orderkey").alias("key_a"),
        "o_custkey",
        F.col("o_totalprice").alias("_pa"),
        F.col("o_orderdate").alias("_da"),
    )
    b = o.select(
        F.col("o_orderkey").alias("key_b"),
        F.col("o_custkey").alias("_ck"),
        F.col("o_totalprice").alias("_pb"),
        F.col("o_orderdate").alias("_db"),
    )
    return (
        a.join(
            b,
            (F.col("o_custkey") == F.col("_ck"))
            & (F.col("key_a") < F.col("key_b"))
            & (F.col("_db") >= F.col("_da"))
            & (F.col("_db") <= F.col("_da") + F.expr("INTERVAL 2 DAYS")),
        )
        .select(
            "key_a",
            "key_b",
            "o_custkey",
            F.round(F.abs(F.col("_pa") - F.col("_pb")), 2).alias(
                "price_delta"
            ),
        )
    )


# =====================================================================
# Gaps-and-islands: longest consecutive-day order streak per priority.
# The classic islands rewrite (date minus dense row_number is constant
# within a run) keeps everything as two hash aggregations + one window
# partitioned by priority — no self-join, no sequence materialization.
# Scales: the window partitions by priority (parallel across groups);
# distinct-date pre-agg shrinks input to |priority|×|days| rows first.
# =====================================================================


@_register(
    "order_streak_islands",
    """WITH d AS (SELECT DISTINCT o_orderpriority,
                         CAST(o_orderdate AS DATE) AS d
                  FROM orders),
       isl AS (SELECT o_orderpriority, d,
                      d - CAST(row_number() OVER (
                              PARTITION BY o_orderpriority ORDER BY d)
                          AS INT) AS anchor
               FROM d),
       runs AS (SELECT o_orderpriority, anchor,
                       CAST(count(*) AS BIGINT) AS len
                FROM isl GROUP BY 1, 2)
       SELECT o_orderpriority,
              CAST(max(len) AS BIGINT) AS max_streak_days,
              CAST(count(*) AS BIGINT) AS n_islands
       FROM runs GROUP BY 1""",
    doc="gaps-and-islands longest consecutive-day streak of order "
    "activity per priority: distinct-date pre-agg, date-minus-"
    "row_number island anchor, two hash aggs; window partitioned by "
    "priority so no serial stage",
)
def q_order_streak_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        _t(spark, sf_dir, "orders")
        .select(
            "o_orderpriority", F.col("o_orderdate").cast("date").alias("d")
        )
        .distinct()
    )
    w = W.partitionBy("o_orderpriority").orderBy("d")
    runs = (
        o.withColumn(
            "anchor", F.date_sub(F.col("d"), F.row_number().over(w))
        )
        .groupBy("o_orderpriority", "anchor")
        .agg(F.count("*").alias("len"))
    )
    return runs.groupBy("o_orderpriority").agg(
        F.max("len").alias("max_streak_days"),
        F.count("*").alias("n_islands"),
    )


# =====================================================================
# Welch's two-sample t-test per group — the unequal-variance test the
# reference's evaluation tier lacks (its stats stop at accuracy/AUC;
# metrics ml/metrics.py). Promo (discount > 0.05) vs non-promo
# extended price per return flag; t statistic and Welch–Satterthwaite
# degrees of freedom from one conditional-aggregate pass.
# Scales: single map-side-combinable hash agg; no shuffle beyond the
# |groups|-row exchange.
# =====================================================================


@_register(
    "welch_ttest_price_promo",
    """WITH s AS (
         SELECT l_returnflag,
                CAST(count(*) FILTER (WHERE l_discount > 0.05)
                     AS BIGINT) AS n_a,
                avg(l_extendedprice) FILTER (WHERE l_discount > 0.05)
                    AS m_a,
                var_samp(l_extendedprice) FILTER (WHERE l_discount > 0.05)
                    AS v_a,
                CAST(count(*) FILTER (WHERE l_discount <= 0.05)
                     AS BIGINT) AS n_b,
                avg(l_extendedprice) FILTER (WHERE l_discount <= 0.05)
                    AS m_b,
                var_samp(l_extendedprice) FILTER (WHERE l_discount <= 0.05)
                    AS v_b
         FROM lineitem GROUP BY 1)
       SELECT l_returnflag, n_a, n_b,
              round(m_a - m_b, 2) AS mean_diff,
              round((m_a - m_b) / sqrt(v_a / n_a + v_b / n_b), 4)
                  AS t_stat,
              round(pow(v_a / n_a + v_b / n_b, 2)
                    / (pow(v_a / n_a, 2) / (n_a - 1)
                       + pow(v_b / n_b, 2) / (n_b - 1)), 4) AS welch_df
       FROM s""",
    doc="Welch unequal-variance two-sample t-test (promo vs non-promo "
    "extended price per return flag): conditional count/avg/var_samp "
    "in ONE hash-agg pass, t and Welch-Satterthwaite df as projections",
)
def q_welch_ttest_price_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    promo = F.col("l_discount") > 0.05
    price = F.col("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.when(promo, 1)).alias("n_a"),
        F.avg(F.when(promo, price)).alias("m_a"),
        F.var_samp(F.when(promo, price)).alias("v_a"),
        F.count(F.when(~promo, 1)).alias("n_b"),
        F.avg(F.when(~promo, price)).alias("m_b"),
        F.var_samp(F.when(~promo, price)).alias("v_b"),
    )
    se2 = F.col("v_a") / F.col("n_a") + F.col("v_b") / F.col("n_b")
    return s.select(
        "l_returnflag",
        "n_a",
        "n_b",
        F.round(F.col("m_a") - F.col("m_b"), 2).alias("mean_diff"),
        F.round((F.col("m_a") - F.col("m_b")) / F.sqrt(se2), 4).alias(
            "t_stat"
        ),
        F.round(
            F.pow(se2, 2)
            / (
                F.pow(F.col("v_a") / F.col("n_a"), 2) / (F.col("n_a") - 1)
                + F.pow(F.col("v_b") / F.col("n_b"), 2) / (F.col("n_b") - 1)
            ),
            4,
        ).alias("welch_df"),
    )


# =====================================================================
# Zipf's-law fit per corpus source: regression slope of ln(freq) on
# ln(rank) over each source's top-100 tokens. Natural-language token
# frequencies follow freq ∝ rank^s with s ≈ -1; the fitted slope is a
# standard corpus-health diagnostic (synthetic/templated text shows
# flat or cliffed curves). regr_slope/regr_intercept are built-in
# JVM-side aggregates in both engines.
# Scales: token explode → two-level hash agg (map-side combine on
# (source, token)); the per-source window ranks only |vocab| rows.
# =====================================================================


@_register(
    "zipf_slope_by_source",
    r"""WITH f AS (
         SELECT source, token, CAST(count(*) AS BIGINT) AS n
         FROM (SELECT source,
                      unnest(string_split_regex(trim(text), '\s+')) AS token
               FROM documents)
         WHERE token <> '' GROUP BY 1, 2),
       r AS (SELECT source, n,
                    row_number() OVER (PARTITION BY source
                                       ORDER BY n DESC, token) AS rank
             FROM f)
       SELECT source,
              round(regr_slope(ln(n), ln(rank)), 4) AS zipf_slope,
              round(regr_intercept(ln(n), ln(rank)), 4) AS zipf_intercept,
              CAST(count(*) AS BIGINT) AS n_ranks
       FROM r WHERE rank <= 100 GROUP BY 1""",
    doc="Zipf's-law slope per source: ln(freq)~ln(rank) OLS over each "
    "source's top-100 tokens via built-in regr_slope/regr_intercept; "
    "token tie-break is alphabetical so both engines rank identically",
)
def q_zipf_slope_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    freq = toks.groupBy("source", "token").agg(F.count("*").alias("n"))
    w = W.partitionBy("source").orderBy(F.desc("n"), F.col("token"))
    ranked = freq.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= 100
    )
    y, x = F.log(F.col("n")), F.log(F.col("rank"))
    return ranked.groupBy("source").agg(
        F.round(F.regr_slope(y, x), 4).alias("zipf_slope"),
        F.round(F.regr_intercept(y, x), 4).alias("zipf_intercept"),
        F.count("*").alias("n_ranks"),
    )


# =====================================================================
# Sorted-neighborhood entity-resolution blocking (Hernández & Stolfo):
# sort records by a blocking key and compare only records within a
# fixed-size sliding window of the sort order — the complementary
# strategy to fuzzy_part_pairs' token blocking (SN catches prefix
# typos token blocking misses; token blocking catches mid-string
# variants SN's sort separates). The window join is rewritten as an
# EQUI-join: explode offsets 1..w and match a.rn + off = b.rn, so the
# plan is a hash join on rn, never a BNLJ range join.
# Scales: global rank comes from operators/layout.global_row_number
# (range exchange + per-partition numbering + broadcast offsets — no
# single-partition window); the join shuffles slim (rn, key, name)
# rows only.
# =====================================================================


@_register(
    "sorted_neighborhood_pairs",
    """WITH r AS (SELECT p_partkey, p_name,
                         row_number() OVER (ORDER BY p_name, p_partkey)
                             AS rn
                  FROM part)
       SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
              CAST(b.rn - a.rn AS INT) AS w_dist,
              CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
       FROM r a JOIN r b ON b.rn BETWEEN a.rn + 1 AND a.rn + 2
       WHERE levenshtein(a.p_name, b.p_name) <= 3""",
    doc="sorted-neighborhood blocking: rank by name (scalable "
    "global_row_number, no serial window), equi-join a.rn+off=b.rn "
    "for off in 1..w instead of a range join, edit-distance verify",
)
def q_sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.layout import global_row_number

    p = _t(spark, sf_dir, "part").select("p_partkey", "p_name")
    r = global_row_number(p, ["p_name", "p_partkey"], n_partitions=8)
    a = r.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
        F.col("rn").alias("rn_a"),
    ).withColumn("off", F.explode(F.array(F.lit(1), F.lit(2))))
    b = r.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
        F.col("rn").alias("rn_b"),
    )
    return (
        a.withColumn("_match", F.col("rn_a") + F.col("off"))
        .join(b, F.col("_match") == F.col("rn_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= 3)
        .select(
            "key_a",
            "key_b",
            F.col("off").cast("int").alias("w_dist"),
            F.col("dist").cast("int").alias("dist"),
        )
    )


# =====================================================================
# Time-to-conversion profile (first view → first purchase): per-user
# conditional-min firsts in one hash agg, day-bucketed delay histogram
# with cumulative conversion share. The microsecond-difference bucket
# (floor(Δµs / 86400e6)) is integer-exact in both engines — no
# timezone or fractional-seconds drift.
# Scales: one map-side-combinable agg over events; the histogram
# window runs on the ≤|max-delay-days| aggregated rows.
# =====================================================================


@_register(
    "time_to_conversion_profile",
    """WITH f AS (
         SELECT user_id,
                min(ts) FILTER (WHERE event_type = 'view') AS fv,
                min(ts) FILTER (WHERE event_type = 'purchase') AS fp
         FROM events GROUP BY 1),
       b AS (SELECT CAST(floor((epoch_us(fp) - epoch_us(fv))
                               / 86400000000.0) AS INT) AS day_bucket,
                    CAST(count(*) AS BIGINT) AS n_users
             FROM f WHERE fv IS NOT NULL AND fp >= fv GROUP BY 1)
       SELECT day_bucket, n_users,
              round(CAST(sum(n_users) OVER (ORDER BY day_bucket
                         ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                    / sum(n_users) OVER (), 4) AS cum_share
       FROM b""",
    doc="first-view→first-purchase conversion-delay histogram with "
    "cumulative share: conditional MIN firsts in one agg, exact "
    "microsecond day bucketing, tiny-frame cumulative window",
)
def q_time_to_conversion_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.col("ts"))
        ).alias("fv"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("fp"),
    )
    conv = f.filter(
        F.col("fv").isNotNull() & (F.col("fp") >= F.col("fv"))
    ).select(
        F.floor(
            (
                F.unix_micros(F.col("fp").cast("timestamp"))
                - F.unix_micros(F.col("fv").cast("timestamp"))
            )
            / F.lit(86400000000.0)
        )
        .cast("int")
        .alias("day_bucket")
    )
    b = conv.groupBy("day_bucket").agg(F.count("*").alias("n_users"))
    w_cum = W.orderBy("day_bucket").rowsBetween(W.unboundedPreceding, 0)
    w_all = W.partitionBy()
    return b.select(
        "day_bucket",
        "n_users",
        F.round(
            F.sum("n_users").over(w_cum).cast("double")
            / F.sum("n_users").over(w_all),
            4,
        ).alias("cum_share"),
    )


# =====================================================================
# EWMA (exponentially weighted moving average) of daily revenue with a
# finite 10-day memory — expressed EXACTLY (not iteratively) as a
# dot product of the window's trailing values with a geometric weight
# vector, via higher-order array functions in both engines. Daily
# revenues are rounded to cents FIRST so both engines fold identical
# inputs in identical order (collect_list/list() preserve frame order).
# Scales: the expensive part is the daily pre-agg (map-side combine);
# the windowed HOF runs over the ~|days| aggregated rows only.
# =====================================================================


@_register(
    "ewma_daily_revenue",
    """WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
                         round(sum(o_totalprice), 2) AS rev
                  FROM orders GROUP BY 1),
       l AS (SELECT day, rev,
                    list(rev) OVER (ORDER BY day ROWS 9 PRECEDING) AS lst
             FROM d)
       SELECT day, rev,
              round(list_dot_product(lst,
                        list_transform(generate_series(len(lst) - 1, 0, -1),
                                       e -> pow(0.7, e)))
                    / list_sum(
                        list_transform(generate_series(len(lst) - 1, 0, -1),
                                       e -> pow(0.7, e))), 4) AS ewma
       FROM l""",
    doc="exact finite-memory EWMA of daily revenue: trailing-10-row "
    "window list dot geometric weights via HOFs (zip_with/aggregate "
    "in Spark, list_dot_product in DuckDB); inputs pre-rounded so "
    "both engines fold identical values in frame order",
)
def q_ewma_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("rev")
    )
    wf = W.orderBy("day").rowsBetween(-9, 0)
    l = d.withColumn("lst", F.collect_list("rev").over(wf))
    seq = F.sequence(F.size("lst") - 1, F.lit(0), F.lit(-1))
    wts = F.transform(seq, lambda e: F.pow(F.lit(0.7), e))
    num = F.aggregate(
        F.zip_with(F.col("lst"), wts, lambda x, wt: x * wt),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    den = F.aggregate(wts, F.lit(0.0), lambda a, x: a + x)
    return l.select(
        "day", "rev", F.round(num / den, 4).alias("ewma")
    )


# =====================================================================
# Kaplan–Meier survival estimator over customer ordering lifetimes:
# duration = days between first and last order (30-day buckets),
# churned = last order before 2001-02-01 (later actives are right-
# censored — they leave the risk set without a churn event, which is
# the entire point of KM vs a naive churn histogram). S(t) =
# Π_{u≤t} (1 − d_u/n_u) computed as exp of a cumulative ln sum.
# Scales: one hash agg per customer, then all windows run on the
# ≤|buckets| aggregated rows.
# =====================================================================


@_register(
    "kaplan_meier_customer_churn",
    """WITH u AS (SELECT o_custkey,
                         min(CAST(o_orderdate AS DATE)) AS f,
                         max(CAST(o_orderdate AS DATE)) AS l
                  FROM orders GROUP BY 1),
       d AS (SELECT CAST(date_diff('day', f, l) // 30 AS INT)
                        AS month_bucket,
                    l < DATE '2001-02-01' AS churned
             FROM u),
       t AS (SELECT month_bucket,
                    CAST(count(*) FILTER (churned) AS BIGINT) AS d_t,
                    CAST(count(*) AS BIGINT) AS leave_t
             FROM d GROUP BY 1),
       k AS (SELECT month_bucket, d_t,
                    sum(leave_t) OVER () - coalesce(
                        sum(leave_t) OVER (ORDER BY month_bucket
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0) AS n_t
             FROM t)
       SELECT month_bucket, d_t, CAST(n_t AS BIGINT) AS n_at_risk,
              round(exp(sum(ln(1.0 - CAST(d_t AS DOUBLE) / n_t))
                        OVER (ORDER BY month_bucket
                              ROWS UNBOUNDED PRECEDING)), 4) AS survival
       FROM k WHERE d_t > 0""",
    doc="Kaplan-Meier survival over customer order-span lifetimes "
    "with right-censoring (active-past-cutoff customers exit the "
    "risk set without a churn event); product via exp(cum-sum(ln)), "
    "windows on the aggregated bucket frame only",
)
def q_kaplan_meier_customer_churn(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    u = o.groupBy("o_custkey").agg(
        F.min(F.col("o_orderdate").cast("date")).alias("f"),
        F.max(F.col("o_orderdate").cast("date")).alias("l"),
    )
    d = u.select(
        F.floor(F.datediff(F.col("l"), F.col("f")) / 30)
        .cast("int")
        .alias("month_bucket"),
        (F.col("l") < F.lit("2001-02-01").cast("date")).alias("churned"),
    )
    t = d.groupBy("month_bucket").agg(
        F.count(F.when(F.col("churned"), 1)).alias("d_t"),
        F.count("*").alias("leave_t"),
    )
    w_all = W.partitionBy()
    w_prior = W.orderBy("month_bucket").rowsBetween(
        W.unboundedPreceding, -1
    )
    w_cum = W.orderBy("month_bucket").rowsBetween(W.unboundedPreceding, 0)
    k = t.select(
        "month_bucket",
        "d_t",
        (
            F.sum("leave_t").over(w_all)
            - F.coalesce(F.sum("leave_t").over(w_prior), F.lit(0))
        ).alias("n_t"),
    )
    return (
        k.select(
            "month_bucket",
            "d_t",
            F.col("n_t").cast("long").alias("n_at_risk"),
            F.round(
                F.exp(
                    F.sum(
                        F.log(
                            F.lit(1.0)
                            - F.col("d_t").cast("double") / F.col("n_t")
                        )
                    ).over(w_cum)
                ),
                4,
            ).alias("survival"),
        )
        .filter(F.col("d_t") > 0)
    )


# =====================================================================
# Exact weighted median (quantity-weighted extended price) per return
# flag: the smallest value whose cumulative weight reaches half the
# total — the weighted generalization median_exact lacks. One window
# cum-sum ordered by (value, unique key) per group, then a MIN over
# the qualifying rows; both engines fold identical weights in
# identical order so the cut row matches exactly.
# Scales: windows partition by flag (parallel across groups); no
# global sort, no collect.
# =====================================================================


@_register(
    "weighted_median_price_by_flag",
    """WITH c AS (
         SELECT l_returnflag, l_extendedprice,
                sum(l_quantity) OVER (PARTITION BY l_returnflag
                    ORDER BY l_extendedprice, l_orderkey, l_linenumber
                    ROWS UNBOUNDED PRECEDING) AS cumw,
                sum(l_quantity) OVER (PARTITION BY l_returnflag) AS totw
         FROM lineitem)
       SELECT l_returnflag,
              min(l_extendedprice) AS weighted_median,
              round(CAST(max(totw) AS DOUBLE), 2) AS total_weight
       FROM c WHERE 2 * cumw >= totw GROUP BY 1""",
    doc="exact weighted median (quantity-weighted price) per return "
    "flag: per-group cumulative-weight window with unique-key "
    "tie-break, min over rows past the half-weight cut",
)
def q_weighted_median_price_by_flag(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    w_cum = W.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    ).rowsBetween(W.unboundedPreceding, 0)
    w_all = W.partitionBy("l_returnflag")
    c = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum("l_quantity").over(w_cum).alias("cumw"),
        F.sum("l_quantity").over(w_all).alias("totw"),
    )
    return (
        c.filter(2 * F.col("cumw") >= F.col("totw"))
        .groupBy("l_returnflag")
        .agg(
            F.min("l_extendedprice").alias("weighted_median"),
            F.round(F.max("totw").cast("double"), 2).alias("total_weight"),
        )
    )


# =====================================================================
# BM25 relevance scoring (Robertson k1=1.2, b=0.75, +1 idf) of every
# document against a fixed query term set — the standard retrieval
# scorer a training-data curation stack uses for quality-targeted
# selection (tfidf_top_terms covers the vectorizer; this is the
# ranker). Corpus stats (N, avgdl) are 1-row scalar aggregates
# broadcast into the per-(doc,term) score — the same shape at any
# scale since only tf rows for the |q| query terms survive the join.
# =====================================================================


@_register(
    "bm25_doc_scores",
    r"""WITH tok AS (SELECT doc_id,
                           unnest(string_split_regex(trim(text), '\s+'))
                               AS token
                    FROM documents),
       tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS n
              FROM tok WHERE token <> '' GROUP BY 1, 2),
       dl AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS dl
              FROM tf GROUP BY 1),
       s AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
                    avg(dl) AS avgdl
             FROM dl),
       q AS (SELECT unnest(['hash', 'join', 'scan']) AS token),
       df AS (SELECT token, CAST(count(*) AS BIGINT) AS df
              FROM tf JOIN q USING (token) GROUP BY 1)
       SELECT tf.doc_id, CAST(count(*) AS BIGINT) AS n_terms,
              round(sum(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
                        * tf.n * 2.2
                        / (tf.n + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))),
                    4) AS bm25
       FROM tf JOIN df USING (token)
       JOIN dl USING (doc_id) CROSS JOIN s
       GROUP BY 1""",
    doc="BM25 (k1=1.2, b=0.75, +1 idf) document scores for query "
    "terms {hash, join, scan}: tf/df/doclen from one tokenize pass, "
    "1-row corpus stats broadcast, only query-term tf rows survive "
    "the semi-like join",
)
def q_bm25_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    terms = ["hash", "join", "scan"]
    from ..operators.dedup import _shared

    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    # the slim (doc_id, token, n) tf frame feeds dl, the per-term doc
    # frequencies AND the scoring join — checkpointed so the corpus
    # tokenize+aggregate runs once, not once per consumer
    tf = _shared(tok.groupBy("doc_id", "token").agg(F.count("*").alias("n")))
    dl = tf.groupBy("doc_id").agg(F.sum("n").alias("dl"))
    s = dl.agg(F.avg("dl").alias("avgdl")).crossJoin(
        docs.agg(F.count("*").alias("n_docs"))
    )
    df_ = (
        tf.filter(F.col("token").isin(terms))
        .groupBy("token")
        .agg(F.count("*").alias("df"))
    )
    idf = F.log(
        F.lit(1)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    score_term = (
        idf
        * F.col("n")
        * F.lit(2.2)
        / (
            F.col("n")
            + F.lit(1.2)
            * (F.lit(0.25) + F.lit(0.75) * F.col("dl") / F.col("avgdl"))
        )
    )
    return (
        tf.join(F.broadcast(df_), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(s))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms"),
            F.round(F.sum(score_term), 4).alias("bm25"),
        )
    )


# =====================================================================
# Degree distribution of the co-purchase graph — the diagnostic that
# decides whether triangle counting / components need skew handling
# (a power-law tail means hub vertices; see triangle_count's degree
# orientation). Degree per node is one hash agg over the symmetric
# edge list; the histogram is a second tiny agg.
# =====================================================================


@_register(
    "copurchase_degree_histogram",
    """WITH e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
                  FROM lineitem a
                  JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                                 AND a.l_partkey <> b.l_partkey),
       deg AS (SELECT src, CAST(count(*) AS BIGINT) AS degree
               FROM e GROUP BY 1)
       SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
       FROM deg GROUP BY 1""",
    doc="co-purchase graph degree histogram (symmetric edge list -> "
    "per-node degree -> degree frequency): the skew diagnostic for "
    "graph ops; two hash aggs over slim (src,dst) rows",
)
def q_copurchase_degree_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.graph import copurchase_edges

    e = copurchase_edges(_t(spark, sf_dir, "lineitem"))
    deg = e.groupBy(F.col("src")).agg(F.count("*").alias("degree"))
    return deg.groupBy("degree").agg(F.count("*").alias("n_nodes"))


# =====================================================================
# Exact heavy hitters via Misra–Gries candidates + exact verify
# (operators/sketches.py::exact_heavy_hitters). The oracle is the
# plain GROUP BY / HAVING — identical output, but the engine path
# never shuffles the full distinct-key space: per-partition MG
# summaries (pigeonhole superset guarantee) bound the shuffle to
# ≤ k·P candidate rows plus the semi-joined verify counts.
# =====================================================================


@_register(
    "heavy_hitter_users",
    """SELECT user_id, CAST(count(*) AS BIGINT) AS freq
       FROM events WHERE user_id IS NOT NULL GROUP BY 1
       HAVING count(*) >= ceil(0.008 * (
           SELECT count(*) FROM events WHERE user_id IS NOT NULL))""",
    doc="exact phi=0.008 heavy hitters over events.user_id: "
    "Misra-Gries per-partition candidates (mapInPandas, batched "
    "uniform-decrement), broadcast-semi-join exact verify — same "
    "answer as GROUP BY/HAVING with a candidate-bounded shuffle",
)
def q_heavy_hitter_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import exact_heavy_hitters

    return exact_heavy_hitters(
        _t(spark, sf_dir, "events"), "user_id", phi=0.008
    )


# =====================================================================
# Bigram-LM cross-entropy scoring (CCNet-style quality filtering):
# train add-one-smoothed bigram MLE counts on the corpus itself, then
# score every document by the perplexity of its own bigrams under
# that model — the classic "how language-like is this text" filter a
# pretraining curation stack runs before mixing. All counts are
# integer-exact; only the final avg-ln/exp is rounded.
# Scales: two hash aggs build the model; scoring joins bigram
# instances to their counts on (w1,w2)/(w1) — map-side-combinable
# shuffles on slim token pairs; the vocab size is a 1-row broadcast.
# =====================================================================


@_register(
    "bigram_lm_perplexity",
    r"""WITH tok AS (
         SELECT doc_id, i AS pos, toks[i] AS token
         FROM (SELECT doc_id,
                      string_split_regex(trim(text), '\s+') AS toks
               FROM documents),
              UNNEST(generate_series(1, len(toks))) AS u(i)
         WHERE toks[i] <> ''),
       b AS (SELECT * FROM (
               SELECT doc_id,
                      lag(token) OVER (PARTITION BY doc_id
                                       ORDER BY pos) AS w1,
                      token AS w2
               FROM tok)
             WHERE w1 IS NOT NULL),
       c12 AS (SELECT w1, w2, count(*) AS c12 FROM b GROUP BY 1, 2),
       c1 AS (SELECT w1, count(*) AS c1 FROM b GROUP BY 1),
       v AS (SELECT count(DISTINCT token) AS v FROM tok)
       SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
              round(exp(-avg(ln((c12.c12 + 1.0) / (c1.c1 + v.v)))), 4)
                  AS ppl
       FROM b JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
       GROUP BY 1""",
    doc="add-one bigram LM perplexity per document, model trained on "
    "the corpus itself (CCNet-style quality scoring): integer count "
    "model via two hash aggs, scoring joins on (w1,w2)/(w1), 1-row "
    "vocab broadcast; round(4) absorbs ln-sum fold order",
)
def q_bigram_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias(
            "pos", "token"
        ),
    ).filter(F.col("token") != "")
    from ..operators.dedup import _shared

    wl = W.partitionBy("doc_id").orderBy("pos")
    # the bigram stream feeds c12, c1 AND the scoring join — without
    # the checkpoint each consumer re-derived the corpus explode + lag
    # window (3 window passes over the token stream). `v` stays on
    # `tok`: single-token docs contribute a distinct token but no
    # bigram, so it cannot be derived from `b`.
    b = _shared(
        tok.select(
            "doc_id",
            F.lag("token").over(wl).alias("w1"),
            F.col("token").alias("w2"),
        )
        .filter(F.col("w1").isNotNull())
    )
    c12 = b.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = b.groupBy("w1").agg(F.count("*").alias("c1"))
    v = tok.agg(F.countDistinct("token").alias("v"))
    ll = F.log((F.col("c12") + F.lit(1.0)) / (F.col("c1") + F.col("v")))
    return (
        b.join(c12, ["w1", "w2"])
        .join(c1, ["w1"])
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.exp(-F.avg(ll)), 4).alias("ppl"),
        )
    )


# =====================================================================
# Robust statistics: winsorized mean — clip values at the group's
# exact p05/p95 (percentile_cont interpolation) before averaging, the
# outlier-resistant mean robust_outliers_price's MAD screen pairs
# with. Percentiles come from ONE per-group aggregate and join back
# broadcast (|groups| rows), so the data is scanned twice but never
# shuffled beyond the group keys.
# =====================================================================


@_register(
    "winsorized_mean_price",
    """WITH q AS (SELECT l_returnflag,
                         quantile_cont(l_extendedprice, 0.05) AS p05,
                         quantile_cont(l_extendedprice, 0.95) AS p95
                  FROM lineitem GROUP BY 1)
       SELECT l.l_returnflag,
              round(avg(least(greatest(l.l_extendedprice, q.p05),
                              q.p95)), 2) AS winsorized_mean,
              round(avg(l.l_extendedprice), 2) AS raw_mean,
              CAST(count(*) AS BIGINT) AS n
       FROM lineitem l JOIN q USING (l_returnflag)
       GROUP BY 1""",
    doc="winsorized (5%/95%-clipped) mean vs raw mean per return "
    "flag: exact interpolated percentiles from one per-group agg, "
    "broadcast back, clip via least/greatest in the averaging pass",
)
def q_winsorized_mean_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    q = li.groupBy("l_returnflag").agg(
        F.expr("percentile_cont(0.05) WITHIN GROUP "
               "(ORDER BY l_extendedprice)").alias("p05"),
        F.expr("percentile_cont(0.95) WITHIN GROUP "
               "(ORDER BY l_extendedprice)").alias("p95"),
    )
    clipped = F.least(
        F.greatest(F.col("l_extendedprice"), F.col("p05")), F.col("p95")
    )
    return (
        li.join(F.broadcast(q), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.avg(clipped), 2).alias("winsorized_mean"),
            F.round(F.avg("l_extendedprice"), 2).alias("raw_mean"),
            F.count("*").alias("n"),
        )
    )


# =====================================================================
# Deterministic mode (most frequent value, smallest-value tie-break)
# per group — the built-in mode() leaves ties unspecified, so the
# engine form is the rank-over-counts rewrite that pins them.
# Scales: two hash aggs + a window over the (group, value) count
# frame — never the raw rows.
# =====================================================================


@_register(
    "mode_quantity_by_flag",
    """SELECT l_returnflag, mode_quantity, CAST(n AS BIGINT) AS n
       FROM (SELECT l_returnflag, l_quantity AS mode_quantity,
                    count(*) AS n,
                    row_number() OVER (PARTITION BY l_returnflag
                        ORDER BY count(*) DESC, l_quantity) AS rk
             FROM lineitem GROUP BY 1, 2)
       WHERE rk = 1""",
    doc="deterministic per-group mode: count per (group, value), "
    "rank by count desc with smallest-value tie-break — the "
    "tie-pinned form of the built-in mode() aggregate",
)
def q_mode_quantity_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count("*").alias("n")
    )
    w = W.partitionBy("l_returnflag").orderBy(
        F.desc("n"), F.col("l_quantity")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "l_returnflag",
            F.col("l_quantity").alias("mode_quantity"),
            "n",
        )
    )


# =====================================================================
# Hierarchical percent-of-parent: each nation's share of its region's
# revenue — two-level aggregate where the parent total comes from a
# second grouping of the SAME child aggregate (no rescan) joined back
# broadcast. The standard drill-down ratio shape.
# =====================================================================


@_register(
    "nation_revenue_share_of_region",
    """WITH nat AS (
         SELECT r.r_name AS region, n.n_name AS nation,
                sum(l.l_extendedprice * (1 - l.l_discount)) AS rev
         FROM lineitem l
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         JOIN customer c ON o.o_custkey = c.c_custkey
         JOIN nation n ON c.c_nationkey = n.n_nationkey
         JOIN region r ON n.n_regionkey = r.r_regionkey
         GROUP BY 1, 2)
       SELECT region, nation, round(rev, 2) AS nation_rev,
              round(100.0 * rev / sum(rev) OVER (PARTITION BY region), 4)
                  AS pct_of_region
       FROM nat""",
    doc="percent-of-parent drill-down: nation revenue share within "
    "region — fact joins broadcast the dimension chain, parent total "
    "via a window over the |nations|-row child aggregate (no rescan)",
)
def q_nation_revenue_share_of_region(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    nat = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("rev")
        )
    )
    w = W.partitionBy("region")
    return nat.select(
        "region",
        "nation",
        F.round(F.col("rev"), 2).alias("nation_rev"),
        F.round(F.lit(100.0) * F.col("rev") / F.sum("rev").over(w), 4).alias(
            "pct_of_region"
        ),
    )


# =====================================================================
# IVF with nprobe = n_cells probes EVERY cell, making the search
# EXACT regardless of the quantizer fit — the recall ladder's
# endpoint, which upgrades the IVF path from rows-only evidence to a
# full value oracle (the partial-probe `ivf_search` entry measures
# the approximate regime; its recall is pinned in pytest).
# =====================================================================


@_register(
    "ivf_search_full_probe",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
       q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
       SELECT e.vec_id,
              round(sqrt(list_sum(list_transform(
                        generate_series(1, len(e.v)),
                        i -> (e.v[i] - q.qv[i]) ^ 2))), 4) AS dist
       FROM e, q WHERE e.vec_id <> 0
       ORDER BY dist, e.vec_id LIMIT 5""",
    doc="IVF probe search at nprobe=n_cells — every cell probed, so "
    "the result is the EXACT Euclidean top-k independent of the "
    "quantizer fit; oracle is the brute-force scan, same elementwise "
    "(a-b)^2 fold order on both engines "
    "(operators/similarity.py::ivf_search)",
)
def q_ivf_search_full_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf_search

    return ivf_search(
        _t(spark, sf_dir, "embeddings"),
        query_id=0,
        k=5,
        nprobe=8,
        n_cells=8,
    )


# =====================================================================
# Rolling 7-day distinct users (WAU per day) — COUNT(DISTINCT) over a
# sliding window, which Spark's window frames cannot express
# directly. The scalable rewrite: dedupe to (user, active_day), then
# EXPLODE the 7 target days each activity-day contributes to and hash
# -aggregate distinct users per target day — an equi-shuffle on
# (target_day), never a range join, never a per-window rescan.
# Output restricted to days with a full 7-day lookback inside the
# data range so every reported window is complete.
# =====================================================================


@_register(
    "rolling_7d_distinct_users",
    """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
                  FROM events),
       bounds AS (SELECT min(d) AS dmin, max(d) AS dmax FROM ud),
       contrib AS (SELECT user_id, d + CAST(o.i AS INT) AS target_day
                   FROM ud, UNNEST(generate_series(0, 6)) AS o(i)),
       wau AS (SELECT target_day,
                      CAST(count(DISTINCT user_id) AS BIGINT) AS wau
               FROM contrib GROUP BY 1)
       SELECT w.target_day AS day, w.wau
       FROM wau w, bounds b
       WHERE w.target_day BETWEEN b.dmin + 6 AND b.dmax""",
    doc="rolling 7-day distinct users per day: (user, day) dedupe -> "
    "explode 7 contribution offsets -> equi-shuffle distinct count; "
    "the windowed-COUNT-DISTINCT rewrite that avoids range joins and "
    "per-window rescans",
)
def q_rolling_7d_distinct_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    bounds = ud.agg(
        F.min("d").alias("dmin"), F.max("d").alias("dmax")
    )
    contrib = ud.withColumn(
        "off", F.explode(F.sequence(F.lit(0), F.lit(6)))
    ).withColumn("target_day", F.date_add(F.col("d"), F.col("off")))
    wau = contrib.groupBy("target_day").agg(
        F.countDistinct("user_id").alias("wau")
    )
    return (
        wau.crossJoin(F.broadcast(bounds))
        .filter(
            (F.col("target_day") >= F.date_add(F.col("dmin"), 6))
            & (F.col("target_day") <= F.col("dmax"))
        )
        .select(F.col("target_day").alias("day"), "wau")
    )


# =====================================================================
# Overlapping-interval merge (union of per-user activity intervals):
# each event opens a 30-minute activity interval; overlapping ones
# merge; output per user = merged-interval count and total covered
# seconds. The islands rewrite: an interval starts a new island iff
# its start exceeds the running MAX of all prior ends (cumulative-max
# window per user), island id = running count of such breaks, then
# one aggregate per island and one per user.
# Scales: windows partition by user; everything else is hash aggs.
# =====================================================================


@_register(
    "merged_active_intervals",
    """WITH iv AS (SELECT user_id, ts AS s,
                          ts + INTERVAL 30 MINUTE AS e
                   FROM events),
       marked AS (
         SELECT user_id, s, e,
                CASE WHEN s > coalesce(max(e) OVER (
                         PARTITION BY user_id ORDER BY s, e
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING),
                         TIMESTAMP '1900-01-01')
                     THEN 1 ELSE 0 END AS brk
         FROM iv),
       isl AS (SELECT user_id, s, e,
                      sum(brk) OVER (PARTITION BY user_id
                                     ORDER BY s, e
                                     ROWS UNBOUNDED PRECEDING) AS island
               FROM marked),
       m AS (SELECT user_id, island, min(s) AS ms, max(e) AS me
             FROM isl GROUP BY 1, 2)
       SELECT user_id,
              CAST(count(*) AS BIGINT) AS n_intervals,
              CAST(sum(epoch_us(me) - epoch_us(ms)) AS BIGINT)
                  AS active_micros
       FROM m GROUP BY 1""",
    doc="overlapping-interval merge per user (30-min activity "
    "envelopes): cumulative-max-of-ends break detection, running-sum "
    "island ids, per-island then per-user aggregation — the "
    "gaps-and-islands form that never self-joins intervals",
)
def q_merged_active_intervals(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("e"),
    )
    w_prior = W.partitionBy("user_id").orderBy("s", "e").rowsBetween(
        W.unboundedPreceding, -1
    )
    marked = iv.withColumn(
        "brk",
        F.when(
            F.col("s")
            > F.coalesce(
                F.max("e").over(w_prior),
                F.lit("1900-01-01").cast("timestamp"),
            ),
            1,
        ).otherwise(0),
    )
    w_cum = W.partitionBy("user_id").orderBy("s", "e").rowsBetween(
        W.unboundedPreceding, 0
    )
    isl = marked.withColumn("island", F.sum("brk").over(w_cum))
    m = isl.groupBy("user_id", "island").agg(
        F.min("s").alias("ms"), F.max("e").alias("me")
    )
    return m.groupBy("user_id").agg(
        F.count("*").alias("n_intervals"),
        F.sum(
            F.unix_micros(F.col("me").cast("timestamp"))
            - F.unix_micros(F.col("ms").cast("timestamp"))
        ).alias("active_micros"),
    )


# =====================================================================
# Candidate-key discovery over the orders table: a column (set) is a
# candidate key iff its distinct count equals the row count — the
# metadata-profiling pass schema-inference and CDC tooling run before
# choosing merge keys. ONE aggregate computes all columns' distinct
# counts (exact; count_distinct over a 1.5M-row column is a plain
# shuffle of the distinct values — at 100 TB swap in the HLL tier
# from operators/sketches for a first pass, confirming exactly only
# on the survivors).
# =====================================================================


@_register(
    "candidate_key_profile",
    """SELECT CAST(count(*) AS BIGINT) AS n_rows,
              CAST(count(DISTINCT o_orderkey) AS BIGINT)
                  AS d_orderkey,
              count(DISTINCT o_orderkey) = count(*) AS key_orderkey,
              CAST(count(DISTINCT o_custkey) AS BIGINT) AS d_custkey,
              count(DISTINCT o_custkey) = count(*) AS key_custkey,
              CAST(count(DISTINCT o_totalprice) AS BIGINT)
                  AS d_totalprice,
              count(DISTINCT o_totalprice) = count(*) AS key_totalprice
       FROM orders""",
    doc="candidate-key discovery: per-column exact distinct counts vs "
    "row count in one aggregate pass; the profiling step before "
    "choosing merge/upsert keys (HLL tier is the 100 TB first pass)",
)
def q_candidate_key_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    n = F.count("*")
    return o.agg(
        n.alias("n_rows"),
        F.countDistinct("o_orderkey").alias("d_orderkey"),
        (F.countDistinct("o_orderkey") == n).alias("key_orderkey"),
        F.countDistinct("o_custkey").alias("d_custkey"),
        (F.countDistinct("o_custkey") == n).alias("key_custkey"),
        F.countDistinct("o_totalprice").alias("d_totalprice"),
        (F.countDistinct("o_totalprice") == n).alias("key_totalprice"),
    )


# =====================================================================
# Pareto frontier (2-D skyline): suppliers not dominated on (revenue,
# quantity). Computed on the per-supplier AGGREGATE (|suppliers|
# rows), where the airtight dominance anti-join is affordable; at
# larger frontier inputs the sort-based sweep (order by rev desc,
# running max of qty) is the scale path — the anti-join form is kept
# because it handles measure ties with exact skyline semantics.
# =====================================================================


@_register(
    "pareto_frontier_suppliers",
    """WITH s AS (SELECT l_suppkey,
                         round(sum(l_extendedprice * (1 - l_discount)), 2)
                             AS rev,
                         round(sum(l_quantity), 2) AS qty
                  FROM lineitem GROUP BY 1)
       SELECT a.l_suppkey, a.rev, a.qty
       FROM s a
       WHERE NOT EXISTS (
           SELECT 1 FROM s b
           WHERE b.rev >= a.rev AND b.qty >= a.qty
             AND (b.rev > a.rev OR b.qty > a.qty))""",
    doc="2-D Pareto frontier over the per-supplier (revenue, "
    "quantity) aggregate: exact dominance anti-join on the tiny "
    "aggregate frame (tie-correct); sort-sweep is the scale path",
)
def q_pareto_frontier_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = li.groupBy("l_suppkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("rev"),
        F.round(F.sum("l_quantity"), 2).alias("qty"),
    )
    a = s.select(
        F.col("l_suppkey"), F.col("rev"), F.col("qty")
    )
    b = s.select(
        F.col("l_suppkey").alias("_sk"),
        F.col("rev").alias("_rev"),
        F.col("qty").alias("_qty"),
    )
    dominated = (
        (F.col("_rev") >= F.col("rev"))
        & (F.col("_qty") >= F.col("qty"))
        & ((F.col("_rev") > F.col("rev")) | (F.col("_qty") > F.col("qty")))
    )
    return a.join(F.broadcast(b), dominated, "left_anti")


# =====================================================================
# Running balance with threshold resets — the per-key SEQUENTIAL
# recurrence (b_i = 0 if b_{i-1}+q_i ≥ T else b_{i-1}+q_i) that no
# window frame can express (resets break prefix-sum associativity).
# Engine path: applyInPandas — per-key Arrow batch, deterministic
# in-group sort, plain scan; parallel across keys, sequential only
# within one key, which is the inherent dependency structure. The
# oracle is a DuckDB RECURSIVE CTE walking rn → rn+1 — genuinely
# different execution strategy, same exact arithmetic.
# =====================================================================


@_register(
    "restock_resets_by_supplier",
    """WITH RECURSIVE li AS (
         SELECT l_suppkey, l_quantity,
                row_number() OVER (PARTITION BY l_suppkey
                    ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
         FROM lineitem WHERE l_suppkey < 10),
       walk(l_suppkey, rn, bal, resets) AS (
         SELECT l_suppkey, rn,
                CASE WHEN l_quantity >= 100 THEN 0 ELSE l_quantity END,
                CASE WHEN l_quantity >= 100 THEN 1 ELSE 0 END
         FROM li WHERE rn = 1
         UNION ALL
         SELECT li.l_suppkey, li.rn,
                CASE WHEN w.bal + li.l_quantity >= 100 THEN 0
                     ELSE w.bal + li.l_quantity END,
                w.resets + CASE WHEN w.bal + li.l_quantity >= 100
                                THEN 1 ELSE 0 END
         FROM walk w JOIN li ON li.l_suppkey = w.l_suppkey
                            AND li.rn = w.rn + 1)
       SELECT l_suppkey, CAST(max(rn) AS BIGINT) AS n_lines,
              CAST(max(resets) AS BIGINT) AS n_resets,
              round(max(CASE WHEN rn = mx THEN bal END), 2)
                  AS final_balance
       FROM (SELECT *, max(rn) OVER (PARTITION BY l_suppkey) AS mx
             FROM walk)
       GROUP BY 1""",
    doc="threshold-reset running balance per supplier (T=100): "
    "sequential per-key recurrence via applyInPandas (parallel "
    "across keys, scan within — the inherent dependency shape); "
    "oracle walks the same recurrence as a recursive CTE",
)
def q_restock_resets_by_supplier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import pandas as pd

    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_suppkey") < 10)
        .select(
            "l_suppkey",
            "l_quantity",
            "l_shipdate",
            "l_orderkey",
            "l_linenumber",
        )
    )

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["l_shipdate", "l_orderkey", "l_linenumber"]
        )
        bal, resets = 0.0, 0
        for q in pdf["l_quantity"]:
            bal += float(q)
            if bal >= 100.0:
                bal, resets = 0.0, resets + 1
        return pd.DataFrame(
            {
                "l_suppkey": [int(pdf["l_suppkey"].iloc[0])],
                "n_lines": [len(pdf)],
                "n_resets": [resets],
                "final_balance": [round(bal, 2)],
            }
        )

    return li.groupBy("l_suppkey").applyInPandas(
        walk,
        schema="l_suppkey long, n_lines long, n_resets long, "
        "final_balance double",
    )


# =====================================================================
# Rolling exact median of daily revenue (trailing 8-day frame) —
# median over a window FRAME, which Spark's median() aggregate
# rejects; the rewrite collects the frame into an array and takes the
# DISCRETE median (lower middle, = quantile_disc 0.5) with HOF
# expressions (array_sort + element_at) — no interpolation
# arithmetic, so values stay parquet-exact and immune to the
# engines' round-half-mode split on .xx5 midpoints. Frame arrays are
# ≤8 doubles built over the ~|days| aggregated rows.
# =====================================================================


@_register(
    "rolling_median_daily_revenue",
    """WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
                         round(sum(o_totalprice), 2) AS rev
                  FROM orders GROUP BY 1)
       SELECT day, rev,
              quantile_disc(rev, 0.5) OVER (
                        ORDER BY day ROWS 7 PRECEDING)
                  AS rolling_median
       FROM d""",
    doc="exact discrete rolling median over a trailing 8-row frame: "
    "collect_list + array_sort + lower-middle element HOFs (Spark "
    "median() refuses window frames; quantile_disc twin on the "
    "oracle side — no midpoint arithmetic, no round-half-mode trap)",
)
def q_rolling_median_daily_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("rev")
    )
    wf = W.orderBy("day").rowsBetween(-7, 0)
    lst = F.array_sort(F.collect_list("rev").over(wf))
    med = F.element_at(lst, F.ceil(F.size(lst) / 2).cast("int"))
    return d.select("day", "rev", med.alias("rolling_median"))


# =====================================================================
# Autocorrelation of daily revenue at lags 1, 2, 7 — the seasonality
# screen before fitting any forecast. Lag columns from one ordered
# window over the ~|days| aggregate, Pearson corr as built-in
# co-moment aggregates; inputs pre-rounded so both engines correlate
# identical series.
# =====================================================================


@_register(
    "daily_revenue_autocorrelation",
    """WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
                         round(sum(o_totalprice), 2) AS rev
                  FROM orders GROUP BY 1),
       l AS (SELECT rev,
                    lag(rev, 1) OVER (ORDER BY day) AS lag1,
                    lag(rev, 2) OVER (ORDER BY day) AS lag2,
                    lag(rev, 7) OVER (ORDER BY day) AS lag7
             FROM d)
       SELECT CAST(count(*) AS BIGINT) AS n_days,
              round(corr(rev, lag1), 4) AS acf_1,
              round(corr(rev, lag2), 4) AS acf_2,
              round(corr(rev, lag7), 4) AS acf_7
       FROM l""",
    doc="lag-1/2/7 autocorrelation of daily revenue: ordered lag "
    "window on the daily aggregate + built-in Pearson corr; the "
    "pre-forecast seasonality screen",
)
def q_daily_revenue_autocorrelation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("rev")
    )
    wl = W.orderBy("day")
    l = d.select(
        "rev",
        F.lag("rev", 1).over(wl).alias("lag1"),
        F.lag("rev", 2).over(wl).alias("lag2"),
        F.lag("rev", 7).over(wl).alias("lag7"),
    )
    return l.agg(
        F.count("*").alias("n_days"),
        F.round(F.corr("rev", "lag1"), 4).alias("acf_1"),
        F.round(F.corr("rev", "lag2"), 4).alias("acf_2"),
        F.round(F.corr("rev", "lag7"), 4).alias("acf_7"),
    )


# =====================================================================
# Grid-density clustering (DBSCAN-style) over the 2-D embedding
# projection, COMPOSED from existing primitives: hash-agg density
# grid (dense cell = minPts reached), 8-neighbor adjacency via
# offset-explode EQUI-join (never a spatial range join), connected
# components via operators/dedup.resolve_components (pointer
# jumping). Cluster count/extent per min-cell-id label. The oracle
# walks the same dense-cell graph with a recursive CTE.
# Scales: density grid is one map-side-combinable agg; adjacency
# joins dense cells only (≪ points); components run O(log n) rounds.
# =====================================================================


@_register(
    "grid_density_clusters",
    """WITH RECURSIVE
       cells AS (SELECT CAST(floor(CAST(embedding[1] AS DOUBLE) / 0.05)
                             AS BIGINT) AS gx,
                        CAST(floor(CAST(embedding[2] AS DOUBLE) / 0.05)
                             AS BIGINT) AS gy,
                        CAST(count(*) AS BIGINT) AS n
                 FROM embeddings GROUP BY 1, 2 HAVING count(*) >= 4),
       keyed AS (SELECT (gx + 100) * 1000 + (gy + 100) AS cell,
                        gx, gy, n
                 FROM cells),
       edges AS (SELECT a.cell AS s, b.cell AS d
                 FROM keyed a JOIN keyed b
                   ON b.gx BETWEEN a.gx - 1 AND a.gx + 1
                  AND b.gy BETWEEN a.gy - 1 AND a.gy + 1
                  AND a.cell <> b.cell),
       reach(node, r) AS (
           SELECT cell, cell FROM keyed
           UNION
           SELECT e.d, reach.r FROM reach JOIN edges e ON e.s = reach.node),
       comp AS (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node)
       SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_cells,
              CAST(sum(k.n) AS BIGINT) AS n_points
       FROM comp JOIN keyed k ON comp.node = k.cell
       GROUP BY 1""",
    doc="DBSCAN-style grid-density clustering on the embedding's "
    "first two dims (cell 0.05, minPts 4): density grid hash agg, "
    "8-neighbor adjacency via offset-explode equi-join, "
    "resolve_components min-label clusters; recursive-CTE oracle",
)
def q_grid_density_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import resolve_components

    emb = _t(spark, sf_dir, "embeddings")
    cells = (
        emb.select(
            F.floor(
                F.col("embedding").getItem(0).cast("double") / 0.05
            ).alias("gx"),
            F.floor(
                F.col("embedding").getItem(1).cast("double") / 0.05
            ).alias("gy"),
        )
        .groupBy("gx", "gy")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 4)
    )
    keyed = cells.withColumn(
        "cell", (F.col("gx") + 100) * 1000 + (F.col("gy") + 100)
    )
    offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
               if (dx, dy) != (0, 0)]
    neigh = keyed.select(
        "cell",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                    for dx, dy in offsets
                ]
            )
        ).alias("o"),
        "gx",
        "gy",
    ).select(
        F.col("cell").alias("s"),
        (
            (F.col("gx") + F.col("o.dx") + 100) * 1000
            + (F.col("gy") + F.col("o.dy") + 100)
        ).alias("d"),
    )
    exists = keyed.select(F.col("cell").alias("d"))
    edges = (
        neigh.join(exists, "d", "semi")
        .filter(F.col("s") < F.col("d"))
        .select(F.col("s").alias("doc_a"), F.col("d").alias("doc_b"))
    )
    nodes = keyed.select(F.col("cell").alias("doc_id"))
    comp = resolve_components(nodes, edges, id_col="doc_id")
    return (
        comp.select(
            F.col("doc_id").alias("cell"),
            F.col("canonical_id").alias("cluster_id"),
        )
        .join(keyed.select("cell", "n"), "cell")
        .groupBy("cluster_id")
        .agg(
            F.count("*").alias("n_cells"),
            F.sum("n").alias("n_points"),
        )
    )


# =====================================================================
# CUSUM changepoint screen on daily revenue: S_t = Σ_{u≤t}(rev_u − μ)
# peaks where the series' mean shifts. Arithmetic is done in exact
# integer CENTS (sum and cumulative sum are exact longs; μ enters as
# one exact-rational division), so both engines walk identical
# doubles and the argmax day is stable. Output: the candidate
# changepoint (max |S_t|) with its magnitude.
# =====================================================================


@_register(
    "cusum_changepoint_daily_revenue",
    """WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
                         CAST(round(sum(o_totalprice) * 100, 0) AS BIGINT)
                             AS rev_c
                  FROM orders GROUP BY 1),
       s AS (SELECT day,
                    sum(rev_c) OVER (ORDER BY day
                        ROWS UNBOUNDED PRECEDING) AS cum_c,
                    row_number() OVER (ORDER BY day) AS t,
                    sum(rev_c) OVER () AS tot_c,
                    count(*) OVER () AS n
             FROM d),
       c AS (SELECT day,
                    round((cum_c - t * (CAST(tot_c AS DOUBLE) / n))
                          / 100.0, 2) AS cusum
             FROM s)
       SELECT day AS changepoint_day, cusum AS cusum_value,
              (SELECT CAST(count(*) AS BIGINT) FROM d) AS n_days
       FROM c
       ORDER BY abs(cusum) DESC, day LIMIT 1""",
    doc="CUSUM mean-shift screen over daily revenue in exact integer "
    "cents (cumsum and totals exact longs, one rational division), "
    "argmax |S_t| with day tie-break = the candidate changepoint",
)
def q_cusum_changepoint_daily_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.round(F.sum("o_totalprice") * 100, 0)
        .cast("long")
        .alias("rev_c")
    )
    w_cum = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    w_all = W.partitionBy()
    s = d.select(
        "day",
        F.sum("rev_c").over(w_cum).alias("cum_c"),
        F.row_number().over(W.orderBy("day")).alias("t"),
        F.sum("rev_c").over(w_all).alias("tot_c"),
        F.count("*").over(w_all).alias("n"),
    )
    c = s.select(
        "day",
        F.round(
            (
                F.col("cum_c")
                - F.col("t") * (F.col("tot_c").cast("double") / F.col("n"))
            )
            / 100.0,
            2,
        ).alias("cusum"),
        F.col("n").alias("n_days"),
    )
    return (
        c.orderBy(F.abs(F.col("cusum")).desc(), F.col("day"))
        .limit(1)
        .select(
            F.col("day").alias("changepoint_day"),
            F.col("cusum").alias("cusum_value"),
            "n_days",
        )
    )


# =====================================================================
# Mutual information between event type and 6-hour day-part — the
# information-theoretic association screen beside the chi-square test
# (chi2_event_type_bucket): MI = Σ (n_xy/N)·ln(n_xy·N/(n_x·n_y)),
# every term from exact integer counts; joint and marginals from one
# pass each, broadcast back, 1-row N.
# =====================================================================


@_register(
    "mutual_information_type_daypart",
    """WITH e AS (SELECT event_type,
                         CAST(extract(hour FROM ts) AS INT) // 6
                             AS daypart
                  FROM events),
       xy AS (SELECT event_type, daypart,
                     CAST(count(*) AS BIGINT) AS n_xy
              FROM e GROUP BY 1, 2),
       x AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_x
             FROM e GROUP BY 1),
       y AS (SELECT daypart, CAST(count(*) AS BIGINT) AS n_y
             FROM e GROUP BY 1),
       n AS (SELECT CAST(count(*) AS BIGINT) AS total FROM e)
       SELECT round(sum((CAST(n_xy AS DOUBLE) / total)
                        * ln(CAST(n_xy AS DOUBLE) * total
                             / (CAST(n_x AS DOUBLE) * n_y))), 6)
                  AS mi_nats,
              CAST(max(total) AS BIGINT) AS n_events
       FROM xy JOIN x USING (event_type) JOIN y USING (daypart)
       CROSS JOIN n""",
    doc="mutual information (nats) between event type and 6-hour "
    "day-part from exact integer counts: joint + marginal hash aggs, "
    "1-row total broadcast; the information-theoretic twin of the "
    "chi-square association screen",
)
def q_mutual_information_type_daypart(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        (F.hour("ts").cast("int") / 6).cast("int").alias("daypart"),
    )
    xy = e.groupBy("event_type", "daypart").agg(
        F.count("*").alias("n_xy")
    )
    x = e.groupBy("event_type").agg(F.count("*").alias("n_x"))
    y = e.groupBy("daypart").agg(F.count("*").alias("n_y"))
    n = e.agg(F.count("*").alias("total"))
    term = (F.col("n_xy").cast("double") / F.col("total")) * F.log(
        F.col("n_xy").cast("double")
        * F.col("total")
        / (F.col("n_x").cast("double") * F.col("n_y"))
    )
    return (
        xy.join(F.broadcast(x), "event_type")
        .join(F.broadcast(y), "daypart")
        .crossJoin(F.broadcast(n))
        .agg(
            F.round(F.sum(term), 6).alias("mi_nats"),
            F.max("total").alias("n_events"),
        )
    )


# =====================================================================
# Contrastive hard-negative mining: for each query vector, the top-k
# most-similar corpus vectors with a DIFFERENT label — the negatives
# that sit closest to the decision boundary, which is what a
# contrastive/embedding trainer wants in its batch. Same broadcast-
# query + ranking-window shape as the exact kNN baseline, with the
# cross-label predicate pushed into the join.
# =====================================================================


@_register(
    "hard_negative_mining",
    """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
       q AS (SELECT vec_id AS query_id, label AS query_label, v AS qv
             FROM e WHERE vec_id < 10),
       scored AS (
         SELECT q.query_id, e.vec_id AS negative_id,
                e.label AS negative_label,
                round(list_dot_product(e.v, q.qv)
                      / (sqrt(list_dot_product(e.v, e.v))
                         * sqrt(list_dot_product(q.qv, q.qv))), 4)
                    AS cosine
         FROM e, q
         WHERE e.vec_id <> q.query_id AND e.label <> q.query_label)
       SELECT query_id, negative_id, negative_label, cosine FROM scored
       QUALIFY row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, negative_id)
               <= 5""",
    doc="contrastive hard-negative mining: per-query top-5 nearest "
    "CROSS-label vectors (the boundary negatives an embedding "
    "trainer batches); broadcast queries, cross-label predicate in "
    "the join, ranking window",
)
def q_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("v"),
    )
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("v").alias("qv"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("v"), F.col("qv"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.zip_with(F.col(c), F.col(c), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(
            (F.col("vec_id") != F.col("query_id"))
            & (F.col("label") != F.col("query_label"))
        )
        .select(
            "query_id",
            F.col("vec_id").alias("negative_id"),
            F.col("label").alias("negative_label"),
            F.round(dot / (norm("v") * norm("qv")), 4).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.col("negative_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .drop("rk")
    )


# =====================================================================
# Largest-remainder apportionment: allocate an integer budget of 1000
# units across nations proportionally to revenue, preserving the
# exact total — floor each share, then hand the leftover units to the
# largest fractional remainders (rank window, deterministic
# tie-break). The reporting/finance classic that naive rounding
# breaks (rounded shares don't sum to the budget). Shares derive
# from exact integer cents so both engines rank identical doubles.
# =====================================================================


@_register(
    "largest_remainder_allocation",
    """WITH nat AS (
         SELECT n.n_name AS nation,
                CAST(round(sum(l.l_extendedprice * (1 - l.l_discount))
                           * 100, 0) AS BIGINT) AS rev_c
         FROM lineitem l
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         JOIN customer c ON o.o_custkey = c.c_custkey
         JOIN nation n ON c.c_nationkey = n.n_nationkey
         GROUP BY 1),
       s AS (SELECT nation, rev_c,
                    1000.0 * rev_c / sum(rev_c) OVER () AS share,
                    CAST(floor(1000.0 * rev_c / sum(rev_c) OVER ())
                         AS BIGINT) AS base
             FROM nat),
       r AS (SELECT nation, base, share - base AS rem,
                    1000 - sum(base) OVER () AS leftover,
                    row_number() OVER (ORDER BY share - base DESC,
                                       nation) AS rk
             FROM s)
       SELECT nation,
              CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                   AS BIGINT) AS units
       FROM r""",
    doc="largest-remainder apportionment of 1000 units across nations "
    "by revenue: floor shares + leftover to the largest remainders "
    "(deterministic tie-break); total exactly preserved — the "
    "allocation naive per-row rounding cannot guarantee",
)
def q_largest_remainder_allocation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    nat = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                )
                * 100,
                0,
            )
            .cast("long")
            .alias("rev_c")
        )
    )
    w_all = W.partitionBy()
    share = F.lit(1000.0) * F.col("rev_c") / F.sum("rev_c").over(w_all)
    s = nat.select(
        "nation",
        share.alias("share"),
        F.floor(share).cast("long").alias("base"),
    )
    r = s.select(
        "nation",
        "base",
        (F.col("share") - F.col("base")).alias("rem"),
        (F.lit(1000) - F.sum("base").over(w_all)).alias("leftover"),
        F.row_number()
        .over(W.orderBy(F.desc(F.col("share") - F.col("base")), "nation"))
        .alias("rk"),
    )
    return r.select(
        "nation",
        (
            F.col("base")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("long")
        .alias("units"),
    )


# =====================================================================
# Equi-DEPTH histogram of extended price: decile boundaries from one
# exact interpolated-percentile aggregate (broadcast back), bin
# membership via the boundary array — the histogram whose bins carry
# equal mass, the complement of the equi-width histogram
# (histogram_quantity). Bin assignment compares against identical
# boundary doubles in both engines.
# =====================================================================


@_register(
    "equi_depth_histogram_price",
    """WITH b AS (SELECT quantile_cont(l_extendedprice,
                             [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8,
                              0.9]) AS qs
                  FROM lineitem),
       binned AS (SELECT
           CAST(1 + (CASE WHEN l_extendedprice > qs[1] THEN 1 ELSE 0 END)
              + (CASE WHEN l_extendedprice > qs[2] THEN 1 ELSE 0 END)
              + (CASE WHEN l_extendedprice > qs[3] THEN 1 ELSE 0 END)
              + (CASE WHEN l_extendedprice > qs[4] THEN 1 ELSE 0 END)
              + (CASE WHEN l_extendedprice > qs[5] THEN 1 ELSE 0 END)
              + (CASE WHEN l_extendedprice > qs[6] THEN 1 ELSE 0 END)
              + (CASE WHEN l_extendedprice > qs[7] THEN 1 ELSE 0 END)
              + (CASE WHEN l_extendedprice > qs[8] THEN 1 ELSE 0 END)
              + (CASE WHEN l_extendedprice > qs[9] THEN 1 ELSE 0 END)
                 AS INT) AS bin,
           l_extendedprice
         FROM lineitem CROSS JOIN b)
       SELECT bin, CAST(count(*) AS BIGINT) AS n,
              min(l_extendedprice) AS bin_min,
              max(l_extendedprice) AS bin_max
       FROM binned GROUP BY 1""",
    doc="equi-depth decile histogram of price: exact interpolated "
    "decile boundaries from ONE percentile aggregate broadcast back, "
    "bin = count of boundaries exceeded; equal-mass complement of "
    "the equi-width histogram",
)
def q_equi_depth_histogram_price(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    qs = [i / 10 for i in range(1, 10)]
    b = li.agg(
        *[
            F.expr(
                f"percentile_cont({q}) WITHIN GROUP "
                "(ORDER BY l_extendedprice)"
            ).alias(f"q{i}")
            for i, q in enumerate(qs, start=1)
        ]
    )
    binned = li.crossJoin(F.broadcast(b)).select(
        "l_extendedprice",
        (
            F.lit(1)
            + sum(
                F.when(
                    F.col("l_extendedprice") > F.col(f"q{i}"), 1
                ).otherwise(0)
                for i in range(1, 10)
            )
        )
        .cast("int")
        .alias("bin"),
    )
    return binned.groupBy("bin").agg(
        F.count("*").alias("n"),
        F.min("l_extendedprice").alias("bin_min"),
        F.max("l_extendedprice").alias("bin_max"),
    )


# =====================================================================
# Functional-dependency discovery: X → Y holds iff the number of
# distinct X values equals the number of distinct (X, Y) pairs — the
# profiling pass (beside candidate_key_profile) that schema tooling
# runs to find derivable columns. One aggregate per tested pair over
# pre-deduped slim frames.
# =====================================================================


@_register(
    "functional_dependency_check",
    """SELECT 'o_orderkey->o_custkey' AS fd,
              CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_lhs,
              CAST(count(DISTINCT (o_orderkey, o_custkey)) AS BIGINT)
                  AS n_pairs,
              count(DISTINCT o_orderkey)
                  = count(DISTINCT (o_orderkey, o_custkey)) AS holds
       FROM orders
       UNION ALL
       SELECT 'o_custkey->o_orderpriority' AS fd,
              CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_lhs,
              CAST(count(DISTINCT (o_custkey, o_orderpriority))
                   AS BIGINT) AS n_pairs,
              count(DISTINCT o_custkey)
                  = count(DISTINCT (o_custkey, o_orderpriority)) AS holds
       FROM orders""",
    doc="functional-dependency discovery (X→Y iff NDV(X) = NDV(X,Y)): "
    "the schema-profiling pass that finds derivable columns; one "
    "distinct-aggregate per tested pair",
)
def q_functional_dependency_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = _t(spark, sf_dir, "orders")

    def fd(lhs: str, rhs: str) -> DataFrame:
        return o.agg(
            F.lit(f"{lhs}->{rhs}").alias("fd"),
            F.countDistinct(lhs).alias("n_lhs"),
            F.countDistinct(lhs, rhs).alias("n_pairs"),
            (F.countDistinct(lhs) == F.countDistinct(lhs, rhs)).alias(
                "holds"
            ),
        )

    return fd("o_orderkey", "o_custkey").unionAll(
        fd("o_custkey", "o_orderpriority")
    )


# =====================================================================
# Peak concurrency per day (sweep line): each event opens a 30-minute
# session envelope; +1/−1 deltas at the endpoints, a GLOBAL prefix
# sum gives instantaneous concurrency, then max per day. The prefix
# sum runs through operators/layout.global_running_sum — range
# exchange + per-partition cumsum + broadcast offsets — so the
# classic "ORDER BY over everything" sweep never serializes into one
# task. End events sort before coincident starts (delta asc), i.e.
# half-open [s, e) envelopes.
# =====================================================================


@_register(
    "peak_concurrency_daily",
    """WITH deltas AS (
         SELECT ts, 1 AS delta, event_id FROM events
         UNION ALL
         SELECT ts + INTERVAL 30 MINUTE, -1, event_id FROM events),
       run AS (SELECT CAST(ts AS DATE) AS day,
                      sum(delta) OVER (ORDER BY ts, delta, event_id
                          ROWS UNBOUNDED PRECEDING) AS conc
               FROM deltas)
       SELECT day, CAST(max(conc) AS BIGINT) AS peak_concurrency
       FROM run GROUP BY 1""",
    doc="sweep-line peak concurrency per day over 30-min session "
    "envelopes: +1/-1 endpoint deltas, DISTRIBUTED global prefix sum "
    "(layout.global_running_sum: range exchange + per-partition "
    "cumsum + broadcast offsets — no SinglePartition window), max "
    "per day; ends sort before coincident starts (half-open "
    "intervals)",
)
def q_peak_concurrency_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.layout import global_running_sum

    ev = _t(spark, sf_dir, "events")
    starts = ev.select(
        F.col("ts"), F.lit(1).alias("delta"), "event_id"
    )
    ends = ev.select(
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("ts"),
        F.lit(-1).alias("delta"),
        "event_id",
    )
    deltas = starts.unionAll(ends)
    run = global_running_sum(
        deltas,
        ["ts", "delta", "event_id"],
        "delta",
        out_col="conc",
        n_partitions=16,
    )
    return (
        run.select(F.col("ts").cast("date").alias("day"), "conc")
        .groupBy("day")
        .agg(F.max("conc").alias("peak_concurrency"))
    )


# =====================================================================
# Day-of-week seasonality index: average daily revenue per weekday
# divided by the overall daily average — the multiplicative seasonal
# profile a forecaster divides out. Spark's dayofweek is 1=Sunday;
# DuckDB's dow is 0=Sunday: the oracle shifts by +1 (the documented
# cross-engine calendar trap, handled the same way as
# calendar_functions_orders). Revenue pre-rounded to cents so both
# engines average identical values.
# =====================================================================


@_register(
    "dow_seasonality_index",
    """WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
                         round(sum(o_totalprice), 2) AS rev
                  FROM orders GROUP BY 1),
       g AS (SELECT CAST(dayofweek(day) + 1 AS INT) AS dow,
                    avg(rev) AS dow_avg,
                    CAST(count(*) AS BIGINT) AS n_days
             FROM d GROUP BY 1),
       o AS (SELECT avg(rev) AS overall FROM d)
       SELECT dow, n_days, round(dow_avg, 2) AS dow_avg_revenue,
              round(dow_avg / overall, 4) AS seasonal_index
       FROM g CROSS JOIN o""",
    doc="day-of-week multiplicative seasonality index of daily "
    "revenue (dow avg / overall avg); Spark dayofweek is 1=Sunday vs "
    "DuckDB dow 0=Sunday — oracle shifts +1",
)
def q_dow_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("rev")
    )
    g = d.groupBy(
        F.dayofweek("day").cast("int").alias("dow")
    ).agg(
        F.avg("rev").alias("dow_avg"), F.count("*").alias("n_days")
    )
    overall = d.agg(F.avg("rev").alias("overall"))
    return g.crossJoin(F.broadcast(overall)).select(
        "dow",
        "n_days",
        F.round(F.col("dow_avg"), 2).alias("dow_avg_revenue"),
        F.round(F.col("dow_avg") / F.col("overall"), 4).alias(
            "seasonal_index"
        ),
    )


# =====================================================================
# Systematic sampling: every 200th order in key order — the
# QA/audit sampling scheme (deterministic, evenly spread over the
# sort dimension, reproducible on any cluster layout). The global
# rank comes from layout.global_row_number, so the sample never
# funnels through a single-partition window.
# =====================================================================


@_register(
    "systematic_sample_orders",
    """SELECT o_orderkey, o_totalprice
       FROM (SELECT o_orderkey, o_totalprice,
                    row_number() OVER (ORDER BY o_orderkey) AS rn
             FROM orders)
       WHERE rn % 200 = 1""",
    doc="systematic (every-200th-row) sample over key order: "
    "deterministic, evenly spread, layout-independent; global rank "
    "via layout.global_row_number — no SinglePartition window",
)
def q_systematic_sample_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.layout import global_row_number

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    ranked = global_row_number(o, ["o_orderkey"], n_partitions=16)
    return ranked.filter(F.col("rn") % 200 == 1).select(
        "o_orderkey", "o_totalprice"
    )


# =====================================================================
# Arrow-optimized scalar Python UDF (Spark 4 `udf(useArrow=True)`):
# the sanctioned scalar-Python tier between JVM expressions and
# pandas_udf — Arrow-batched transfer (plans as ArrowEvalPython, not
# the flagged row-pickling BatchEvalPython), per-value Python logic.
# Kept OUT of hot paths by policy; this entry exists to pin the API
# surface with a JVM-expressible twin as its oracle (the CASE
# expression both engines run).
# =====================================================================


@_register(
    "arrow_udf_price_tier",
    """SELECT tier, CAST(count(*) AS BIGINT) AS n,
              round(sum(o_totalprice), 2) AS revenue
       FROM (SELECT CASE WHEN o_totalprice < 50000 THEN 'S'
                         WHEN o_totalprice < 150000 THEN 'M'
                         WHEN o_totalprice < 300000 THEN 'L'
                         ELSE 'XL' END AS tier,
                    o_totalprice
             FROM orders)
       GROUP BY 1""",
    doc="Arrow-optimized scalar Python UDF (useArrow=True, plans as "
    "ArrowEvalPython — the sanctioned scalar-Python tier, not the "
    "flagged BatchEvalPython): price-tier labeling with the "
    "equivalent CASE expression as oracle",
)
def q_arrow_udf_price_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udf

    @udf(returnType="string", useArrow=True)
    def tier(p: float) -> str:
        if p < 50000:
            return "S"
        if p < 150000:
            return "M"
        if p < 300000:
            return "L"
        return "XL"

    o = _t(spark, sf_dir, "orders")
    return (
        o.select(tier(F.col("o_totalprice")).alias("tier"), "o_totalprice")
        .groupBy("tier")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


# =====================================================================
# Inverted-index build (the search-engine artifact BM25 serves from):
# token → document-frequency + SORTED posting list of doc_ids, for
# the 20 highest-df tokens (deterministic tie-break). Posting lists
# are space-joined STRINGS (array_join over the sorted doc_id list):
# membership and order are both deterministic, and a flat string —
# unlike array<string> — survives the driver's pandas-based
# canonicalizer, which cannot hash list-typed cells (the one red row
# in CORRECTNESS_r09).
# Scales: one tokenize + distinct pass, one hash agg per token; the
# top-k cut runs on the |vocab|-row aggregate.
# =====================================================================


@_register(
    "inverted_index_postings",
    r"""WITH tok AS (SELECT DISTINCT doc_id,
                           unnest(string_split_regex(trim(text), '\s+'))
                               AS token
                    FROM documents),
       t AS (SELECT token, CAST(count(*) AS BIGINT) AS df,
                    array_to_string(list_sort(list(doc_id)), ' ')
                        AS postings
             FROM tok WHERE token <> '' GROUP BY 1)
       SELECT token, df, postings
       FROM t ORDER BY df DESC, token LIMIT 20""",
    doc="inverted-index posting lists for the 20 highest-df tokens: "
    "distinct (doc, token) pass, sorted doc_id arrays per token — "
    "the search-index artifact the BM25 ranker serves from",
)
def q_inverted_index_postings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias(
                "token"
            ),
        )
        .filter(F.col("token") != "")
        .distinct()
    )
    t = tok.groupBy("token").agg(
        F.count("*").alias("df"),
        F.array_join(
            F.sort_array(F.collect_list("doc_id")), " "
        ).alias("postings"),
    )
    return t.orderBy(F.desc("df"), "token").limit(20)


# =====================================================================
# Cumulative distinct count — COUNT(DISTINCT) over a running window,
# which neither engine's window aggregates accept. Spark rewrite:
# size(collect_set(...)) over the per-user ordered frame (exact for
# bounded-cardinality columns like event_type). The oracle uses a
# correlated distinct-count subquery — a different strategy, same
# semantics. Per-user windows keep the stage parallel.
# =====================================================================


@_register(
    "cumulative_distinct_event_types",
    """SELECT e.event_id, e.user_id,
              CAST((SELECT count(DISTINCT e2.event_type) FROM events e2
                    WHERE e2.user_id = e.user_id
                      AND (e2.ts < e.ts
                           OR (e2.ts = e.ts
                               AND e2.event_id <= e.event_id)))
                   AS INT) AS n_types_seen
       FROM events e""",
    doc="running COUNT(DISTINCT event_type) per user: "
    "size(collect_set) over the ordered per-user frame (exact for "
    "bounded-cardinality values); oracle is a correlated "
    "distinct-count subquery — different strategy, same semantics",
)
def q_cumulative_distinct_event_types(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, 0
    )
    return ev.select(
        "event_id",
        "user_id",
        F.size(F.collect_set("event_type").over(w))
        .cast("int")
        .alias("n_types_seen"),
    )


# =====================================================================
# Higher central moments of document length per source — skewness and
# excess kurtosis computed EXPLICITLY from broadcast means and central
# -moment aggregates (population form), because the engines' built-in
# skewness/kurtosis disagree on bias correction. Two passes: 1-row-
# per-source means broadcast back, then one moment aggregate.
# =====================================================================


@_register(
    "doc_length_moments_by_source",
    """WITH m AS (SELECT source, avg(CAST(n_chars AS DOUBLE)) AS mu
                  FROM documents GROUP BY 1),
       c AS (SELECT d.source,
                    CAST(count(*) AS BIGINT) AS n,
                    max(m.mu) AS mu,
                    avg(pow(d.n_chars - m.mu, 2)) AS m2,
                    avg(pow(d.n_chars - m.mu, 3)) AS m3,
                    avg(pow(d.n_chars - m.mu, 4)) AS m4
             FROM documents d JOIN m USING (source) GROUP BY 1)
       SELECT source, n, round(mu, 4) AS mean_len,
              round(sqrt(m2), 4) AS std_pop,
              round(m3 / pow(m2, 1.5), 4) AS skewness_pop,
              round(m4 / pow(m2, 2) - 3, 4) AS excess_kurtosis_pop
       FROM c""",
    doc="population skewness / excess kurtosis of doc length per "
    "source from explicit central moments (broadcast means + one "
    "moment aggregate) — engine-built-ins disagree on bias "
    "correction, the explicit form doesn't",
)
def q_doc_length_moments_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    m = d.groupBy("source").agg(
        F.avg(F.col("n_chars").cast("double")).alias("mu")
    )
    dev = F.col("n_chars") - F.col("mu")
    c = (
        d.join(F.broadcast(m), "source")
        .groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.max("mu").alias("mu"),
            F.avg(F.pow(dev, 2)).alias("m2"),
            F.avg(F.pow(dev, 3)).alias("m3"),
            F.avg(F.pow(dev, 4)).alias("m4"),
        )
    )
    return c.select(
        "source",
        "n",
        F.round(F.col("mu"), 4).alias("mean_len"),
        F.round(F.sqrt(F.col("m2")), 4).alias("std_pop"),
        F.round(F.col("m3") / F.pow(F.col("m2"), 1.5), 4).alias(
            "skewness_pop"
        ),
        F.round(F.col("m4") / F.pow(F.col("m2"), 2) - 3, 4).alias(
            "excess_kurtosis_pop"
        ),
    )


# =====================================================================
# ROLLUP with grouping_id: the bitmask that tells a NULL-from-rollup
# subtotal row apart from a NULL-in-data group — the disambiguation
# every BI layer over a rollup needs (rollup_agg leaves it implicit).
# grouping_id bit order is the GROUP BY column order in both engines.
# =====================================================================


@_register(
    "rollup_grouping_id",
    """SELECT l_returnflag, l_linestatus,
              CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus)
                   AS INT) AS gid,
              CAST(count(*) AS BIGINT) AS n
       FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",
    doc="ROLLUP with the grouping-bit disambiguator (subtotal NULL vs "
    "data NULL): grouping_id bitmask in GROUP BY column order, "
    "identical across engines",
)
def q_rollup_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("int").alias("gid"),
        F.count("*").alias("n"),
    ).select("l_returnflag", "l_linestatus", "gid", "n")


# =====================================================================
# U-shaped (position-based) multi-touch attribution — the 40/20/40
# companion to linear_attribution_credit: first and last touch get
# 40% of each purchase's credit, the middle touches split the
# remaining 20%; single-touch gets all, two-touch splits evenly.
# Same user-keyed interval join; position and count from one window
# pair keyed by purchase, deterministic touch order (ts, event_id).
# =====================================================================


@_register(
    "u_shaped_attribution",
    """WITH purchases AS (
         SELECT event_id AS pid, user_id, ts AS pts FROM events
         WHERE event_type = 'purchase'),
       touches AS (
         SELECT p.pid, e.event_type AS channel, e.ts AS tts,
                e.event_id AS tid
         FROM purchases p JOIN events e
           ON e.user_id = p.user_id
          AND e.event_type IN ('click', 'view')
          AND e.ts >= p.pts - INTERVAL 1 DAY AND e.ts < p.pts),
       pos AS (
         SELECT pid, channel,
                row_number() OVER (PARTITION BY pid
                                   ORDER BY tts, tid) AS rn,
                count(*) OVER (PARTITION BY pid) AS n
         FROM touches),
       credit AS (
         SELECT pid, channel,
                CASE WHEN n = 1 THEN 1.0
                     WHEN n = 2 THEN 0.5
                     WHEN rn = 1 OR rn = n THEN 0.4
                     ELSE 0.2 / (n - 2) END AS w
         FROM pos)
       SELECT channel, round(sum(w), 4) AS credit,
              CAST(count(DISTINCT pid) AS BIGINT) AS n_purchases
       FROM credit GROUP BY channel""",
    doc="U-shaped (40/20/40 position-based) multi-touch attribution: "
    "first/last touch 40% each, middles split 20%; credit "
    "conservation per purchase holds by construction, same interval "
    "join as the linear model",
)
def q_u_shaped_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("_u"),
        F.col("ts").alias("pts"),
    )
    touches = e.filter(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("_u2"),
        F.col("event_type").alias("channel"),
        F.col("ts").alias("tts"),
        F.col("event_id").alias("tid"),
    )
    joined = purchases.join(
        touches,
        (F.col("_u") == F.col("_u2"))
        & (F.col("tts") >= F.col("pts") - F.expr("INTERVAL 1 DAY"))
        & (F.col("tts") < F.col("pts")),
    ).select("pid", "channel", "tts", "tid")
    wp = W.partitionBy("pid")
    pos = joined.select(
        "pid",
        "channel",
        F.row_number()
        .over(W.partitionBy("pid").orderBy("tts", "tid"))
        .alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    w = (
        F.when(F.col("n") == 1, 1.0)
        .when(F.col("n") == 2, 0.5)
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("n")), 0.4)
        .otherwise(F.lit(0.2) / (F.col("n") - 2))
    )
    return (
        pos.select("pid", "channel", w.alias("w"))
        .groupBy("channel")
        .agg(
            F.round(F.sum("w"), 4).alias("credit"),
            F.countDistinct("pid").alias("n_purchases"),
        )
    )


# =====================================================================
# Geometric mean of daily revenue growth — the compounding-correct
# average of ratios (arithmetic means of growth rates overstate
# compound growth): exp(avg(ln(rev_t / rev_{t-1}))). Ratios come
# from pre-rounded daily revenues so both engines fold identical
# values; one ordered-lag window on the daily aggregate.
# =====================================================================


@_register(
    "geometric_mean_daily_growth",
    """WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
                         round(sum(o_totalprice), 2) AS rev
                  FROM orders GROUP BY 1),
       r AS (SELECT rev / lag(rev) OVER (ORDER BY day) AS ratio
             FROM d)
       SELECT CAST(count(*) AS BIGINT) AS n_ratios,
              round(exp(avg(ln(ratio))), 6) AS geo_mean_growth,
              round(avg(ratio), 6) AS arith_mean_growth
       FROM r WHERE ratio IS NOT NULL""",
    doc="geometric vs arithmetic mean of day-over-day revenue growth "
    "ratios (exp-avg-ln on the daily aggregate): the "
    "compounding-correct average, with the arithmetic one beside it "
    "to show the overstatement",
)
def q_geometric_mean_daily_growth(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("rev")
    )
    r = d.select(
        (F.col("rev") / F.lag("rev").over(W.orderBy("day"))).alias("ratio")
    ).filter(F.col("ratio").isNotNull())
    return r.agg(
        F.count("*").alias("n_ratios"),
        F.round(F.exp(F.avg(F.log("ratio"))), 6).alias("geo_mean_growth"),
        F.round(F.avg("ratio"), 6).alias("arith_mean_growth"),
    )


# =====================================================================
# FP-Growth frequent itemsets (MLlib pattern mining) over per-order
# part baskets — the full-lattice generalization of the size-2
# part_affinity_lift query. The itemset/support output is fully
# determined by (data, minSupport) but its SIZE-3+ tier is not
# SQL-expressible at reasonable cost, so the catalog entry is
# rows-only and tests/test_ml.py pins the size-≤2 tier against the
# exact SQL counts (same discipline as the ANN recall anchors).
# Scales: FP-Growth is the classic shared-nothing frequent-pattern
# algorithm (conditional FP-trees per suffix, distributed by item).
# =====================================================================


@_register(
    "fpgrowth_itemsets",
    # FP-Growth output is DETERMINISTIC (exact support counts), so an
    # Apriori-style SQL enumeration is a true oracle. Support is
    # ABSOLUTE (>= 5 baskets) because relative support degenerates
    # with scale on this corpus: parts scale with SF, so any fixed
    # fraction is non-trivial at one SF and empty/explosive at
    # another (measured: thr5 -> 200/4/0 itemsets of size 1/2/3 at
    # sf0.001, 2000/1/0 at sf0.01, 20000/0/0 at sf0.1). The SQL
    # covers sizes <= 3; a frequent size-4 itemset would surface as a
    # row-count mismatch rather than silent undercoverage. MLlib's
    # threshold is freq >= ceil(minSupport * n_baskets); passing
    # 4.5/n_baskets makes that exactly 5 regardless of float error.
    """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                  FROM lineitem),
       f1 AS (SELECT [p] AS items, count(*) AS freq
              FROM op GROUP BY p HAVING count(*) >= 5),
       f2 AS (SELECT [a.p, b.p] AS items, count(*) AS freq
              FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
              GROUP BY a.p, b.p HAVING count(*) >= 5),
       f3 AS (SELECT [a.p, b.p, c.p] AS items, count(*) AS freq
              FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
                        JOIN op c ON a.o = c.o AND b.p < c.p
              GROUP BY a.p, b.p, c.p HAVING count(*) >= 5),
       u AS (SELECT * FROM f1 UNION ALL SELECT * FROM f2
             UNION ALL SELECT * FROM f3)
       SELECT to_json(items) AS itemset, CAST(freq AS BIGINT) AS freq,
              CAST(len(items) AS INT) AS n_items
       FROM u""",
    doc="MLlib FP-Growth frequent itemsets over per-order part "
    "baskets (absolute support >= 5 baskets), oracled against an "
    "exact Apriori SQL enumeration of sizes 1-3; size-<=2 tier "
    "additionally pinned in tests/test_ml.py::"
    "test_fpgrowth_small_itemsets_match_sql. Scales: FP-Growth "
    "distributes conditional FP-trees by item suffix — no candidate "
    "explosion, one shuffle per level",
)
def q_fpgrowth_itemsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.fpm import FPGrowth

    from ..operators.dedup import _shared

    li = _t(spark, sf_dir, "lineitem")
    # r12: the basket aggregation is consumed four times (our basket
    # count, MLlib's minCount count, the frequent-items pass and the
    # FP-tree pass) — share the shuffled aggregate instead of
    # re-deriving it from the lineitem scan per consumer
    baskets = _shared(
        li.groupBy("l_orderkey").agg(
            F.collect_set("l_partkey").alias("items")
        )
    )
    n_baskets = baskets.count()
    model = FPGrowth(
        itemsCol="items", minSupport=4.5 / n_baskets, minConfidence=0.1
    ).fit(baskets)
    return model.freqItemsets.select(
        F.to_json(F.sort_array("items")).alias("itemset"),
        F.col("freq").alias("freq"),
        F.size("items").alias("n_items"),
    )


# =====================================================================
# PCA projection of the embedding corpus (MLlib PCA) — the
# dimensionality-reduction step an embedding pipeline runs for
# visualization/whitening. Distributed: MLlib computes the exact
# Gramian/covariance in one pass and eigendecomposes driver-side
# (d×d — driver cost independent of row count). The catalog entry
# runs the SAME MLlib operator on a FIXED 2-dim feature slice so a
# closed-form DuckDB eigen-solve can certify it end-to-end: MLlib's
# covariance route and the exact-decimal closed form agree to ~1e-12
# on the eigenvectors, far inside the round(4) bins (verified
# hash-exact at sf0.001/0.01/0.1). The full 64-d surface is the same
# function (any d, any k) with numpy parity pinned in
# tests/test_ml.py::test_pca_matches_numpy_eig.
# =====================================================================


@_register(
    "pca_embedding_projection",
    # Mirrors MLlib semantics, NOT classic PCA: the projection is the
    # RAW row (no mean subtraction — PCA.transform does not center)
    # times the covariance eigenvectors, and each axis is flipped so
    # its largest-|loading| entry (ties → lower index) is
    # non-negative (ml/pca.py::pca_projection_signed's convention).
    """WITH d AS (SELECT vec_id,
                  CAST(CAST(embedding[1] AS DOUBLE) AS DECIMAL(13,10)) AS x,
                  CAST(CAST(embedding[2] AS DOUBLE) AS DECIMAL(13,10)) AS y,
                  CAST(embedding[1] AS DOUBLE) AS xd,
                  CAST(embedding[2] AS DOUBLE) AS yd
           FROM embeddings),
       s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                    CAST(CAST(sum(x) AS VARCHAR) AS DOUBLE) AS sx,
                    CAST(CAST(sum(y) AS VARCHAR) AS DOUBLE) AS sy,
                    CAST(CAST(sum(x * x) AS VARCHAR) AS DOUBLE) AS sxx,
                    CAST(CAST(sum(x * y) AS VARCHAR) AS DOUBLE) AS sxy,
                    CAST(CAST(sum(y * y) AS VARCHAR) AS DOUBLE) AS syy
             FROM d),
       c AS (SELECT sxx / n - (sx / n) * (sx / n) AS cxx,
                    sxy / n - (sx / n) * (sy / n) AS cxy,
                    syy / n - (sy / n) * (sy / n) AS cyy
             FROM s),
       e AS (SELECT cxx, cxy, cyy,
                    ((cxx + cyy)
                     + sqrt((cxx - cyy) * (cxx - cyy)
                            + 4.0 * (cxy * cxy))) / 2.0 AS l1
             FROM c),
       v0 AS (SELECT CASE WHEN cxy <> 0.0 THEN cxy
                          WHEN cxx >= cyy THEN 1.0 ELSE 0.0 END AS wx,
                     CASE WHEN cxy <> 0.0 THEN l1 - cxx
                          WHEN cxx >= cyy THEN 0.0 ELSE 1.0 END AS wy
              FROM e),
       v1 AS (SELECT wx / sqrt(wx * wx + wy * wy) AS ux,
                     wy / sqrt(wx * wx + wy * wy) AS uy
              FROM v0),
       vs AS (SELECT CASE WHEN (CASE WHEN abs(ux) >= abs(uy)
                                     THEN ux ELSE uy END) >= 0.0
                          THEN ux ELSE -ux END AS v1x,
                     CASE WHEN (CASE WHEN abs(ux) >= abs(uy)
                                     THEN ux ELSE uy END) >= 0.0
                          THEN uy ELSE -uy END AS v1y
              FROM v1),
       vv AS (SELECT v1x, v1y,
                     CASE WHEN (CASE WHEN abs(-v1y) >= abs(v1x)
                                     THEN -v1y ELSE v1x END) >= 0.0
                          THEN -v1y ELSE v1y END AS v2x,
                     CASE WHEN (CASE WHEN abs(-v1y) >= abs(v1x)
                                     THEN -v1y ELSE v1x END) >= 0.0
                          THEN v1x ELSE -v1x END AS v2y
              FROM vs)
       SELECT d.vec_id,
              round(d.xd * vv.v1x + d.yd * vv.v1y, 4) + 0.0 AS pc1,
              round(d.xd * vv.v2x + d.yd * vv.v2y, 4) + 0.0 AS pc2
       FROM d CROSS JOIN vv""",
    doc="MLlib PCA (exact one-pass covariance + driver-side "
    "eigensolve, deterministic largest-|loading| sign convention) run "
    "end-to-end on a fixed 2-dim embedding slice so the DuckDB "
    "closed-form eigen-solve certifies the WHOLE MLlib route — "
    "uncentered projection and sign convention mirrored exactly; the "
    "64-d surface is the same operator with numpy parity pinned in "
    "tests/test_ml.py (ml/pca.py::pca_projection_signed)",
)
def q_pca_embedding_projection(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..ml.pca import pca_projection_signed

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.slice(F.col("embedding").cast("array<double>"), 1, 2).alias(
            "embedding"
        ),
    )
    return pca_projection_signed(emb, k=2)


# =====================================================================
# Closed-form 2-feature PCA — the oracle-checkable tier of the PCA
# surface: exact-decimal covariance sufficient statistics (partition-
# order independent), the 2x2 quadratic eigen-solve in a FIXED IEEE
# operation order mirrored textually by the SQL, deterministic
# eigenvector signs, map-only projection. One pass + O(1) driver math:
# the tall-skinny-PCA shape that scales to 100 TB.
# =====================================================================


@_register(
    "pca_2d_exact",
    # Every float op below textually mirrors ml/pca.py::pca2_exact —
    # exact decimal sums cross to double via one correctly-rounded
    # conversion on each side (VARCHAR->DOUBLE here, float(Decimal)
    # there), after which both engines run the identical double
    # program, so even round(...,4) boundaries agree bit-for-bit.
    """WITH d AS (SELECT vec_id,
                  CAST(CAST(embedding[1] AS DOUBLE) AS DECIMAL(13,10)) AS x,
                  CAST(CAST(embedding[2] AS DOUBLE) AS DECIMAL(13,10)) AS y,
                  CAST(embedding[1] AS DOUBLE) AS xd,
                  CAST(embedding[2] AS DOUBLE) AS yd
           FROM embeddings),
       s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                    CAST(CAST(sum(x) AS VARCHAR) AS DOUBLE) AS sx,
                    CAST(CAST(sum(y) AS VARCHAR) AS DOUBLE) AS sy,
                    CAST(CAST(sum(x * x) AS VARCHAR) AS DOUBLE) AS sxx,
                    CAST(CAST(sum(x * y) AS VARCHAR) AS DOUBLE) AS sxy,
                    CAST(CAST(sum(y * y) AS VARCHAR) AS DOUBLE) AS syy
             FROM d WHERE x IS NOT NULL AND y IS NOT NULL),
       c AS (SELECT sx / n AS mx, sy / n AS my,
                    sxx / n - (sx / n) * (sx / n) AS cxx,
                    sxy / n - (sx / n) * (sy / n) AS cxy,
                    syy / n - (sy / n) * (sy / n) AS cyy
             FROM s),
       e AS (SELECT mx, my, cxx, cxy, cyy,
                    ((cxx + cyy)
                     + sqrt((cxx - cyy) * (cxx - cyy)
                            + 4.0 * (cxy * cxy))) / 2.0 AS l1
             FROM c),
       v0 AS (SELECT mx, my,
                     CASE WHEN cxy <> 0.0 THEN cxy
                          WHEN cxx >= cyy THEN 1.0 ELSE 0.0 END AS wx,
                     CASE WHEN cxy <> 0.0 THEN l1 - cxx
                          WHEN cxx >= cyy THEN 0.0 ELSE 1.0 END AS wy
              FROM e),
       v1 AS (SELECT mx, my,
                     wx / sqrt(wx * wx + wy * wy) AS ux,
                     wy / sqrt(wx * wx + wy * wy) AS uy
              FROM v0),
       vs AS (SELECT mx, my,
                     CASE WHEN ux < 0.0 OR (ux = 0.0 AND uy < 0.0)
                          THEN -ux ELSE ux END AS v1x,
                     CASE WHEN ux < 0.0 OR (ux = 0.0 AND uy < 0.0)
                          THEN -uy ELSE uy END AS v1y
              FROM v1),
       vv AS (SELECT mx, my, v1x, v1y,
                     CASE WHEN -v1y < 0.0 OR (-v1y = 0.0 AND v1x < 0.0)
                          THEN v1y ELSE -v1y END AS v2x,
                     CASE WHEN -v1y < 0.0 OR (-v1y = 0.0 AND v1x < 0.0)
                          THEN -v1x ELSE v1x END AS v2y
              FROM vs)
       SELECT d.vec_id,
              round((d.xd - vv.mx) * vv.v1x
                    + (d.yd - vv.my) * vv.v1y, 4) + 0.0 AS pc1,
              round((d.xd - vv.mx) * vv.v2x
                    + (d.yd - vv.my) * vv.v2y, 4) + 0.0 AS pc2
       FROM d CROSS JOIN vv""",
    doc="closed-form 2-feature PCA over embedding dims (0,1): exact "
    "decimal sufficient statistics in one distributed pass, 2x2 "
    "quadratic eigen-solve driver-side in a fixed IEEE op order, "
    "deterministic signs, map-only projection — the oracle recomputes "
    "sums, solve, and per-row projection end-to-end "
    "(ml/pca.py::pca2_exact)",
)
def q_pca_2d_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ml.pca import pca2_exact

    return pca2_exact(_t(spark, sf_dir, "embeddings"), x_idx=0, y_idx=1)


# =====================================================================
# Lorenz curve deciles — the curve behind gini_customer_revenue:
# customers ranked by revenue, cumulative population share vs
# cumulative revenue share at each decile boundary. ntile gives the
# engine-identical decile cut (same tie-break key), the shares come
# from window sums over the 10-row decile aggregate.
# =====================================================================


@_register(
    "lorenz_curve_deciles",
    """WITH c AS (SELECT o_custkey,
                         round(sum(o_totalprice), 2) AS rev
                  FROM orders GROUP BY 1),
       t AS (SELECT rev,
                    ntile(10) OVER (ORDER BY rev, o_custkey) AS decile
             FROM c),
       d AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_cust,
                    sum(rev) AS rev
             FROM t GROUP BY 1)
       SELECT decile, n_cust,
              round(CAST(sum(n_cust) OVER (ORDER BY decile
                         ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                    / sum(n_cust) OVER (), 4) AS cum_pop_share,
              round(sum(rev) OVER (ORDER BY decile
                        ROWS UNBOUNDED PRECEDING)
                    / sum(rev) OVER (), 4) AS cum_rev_share
       FROM d""",
    doc="Lorenz curve at decile boundaries (cumulative population vs "
    "revenue share, customers ranked by revenue) — the curve the "
    "Gini coefficient integrates; ntile cut tie-broken by key for "
    "engine-identical deciles",
)
def q_lorenz_curve_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = o.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("rev")
    )
    t = c.select(
        "rev",
        F.ntile(10).over(W.orderBy("rev", "o_custkey")).alias("decile"),
    )
    d = t.groupBy("decile").agg(
        F.count("*").alias("n_cust"), F.sum("rev").alias("rev")
    )
    w_cum = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    w_all = W.partitionBy()
    return d.select(
        "decile",
        "n_cust",
        F.round(
            F.sum("n_cust").over(w_cum).cast("double")
            / F.sum("n_cust").over(w_all),
            4,
        ).alias("cum_pop_share"),
        F.round(
            F.sum("rev").over(w_cum) / F.sum("rev").over(w_all), 4
        ).alias("cum_rev_share"),
    )


# =====================================================================
# Cohort LTV curve: cumulative revenue per first-order cohort YEAR by
# months-since-first-order offset — the money companion to
# cohort_retention's headcount matrix. Offsets quantized to quarters
# to keep the matrix compact; cumulative along each cohort row via a
# per-cohort window on the aggregated frame.
# =====================================================================


@_register(
    "cohort_ltv_curve",
    """WITH first_order AS (
         SELECT o_custkey, min(CAST(o_orderdate AS DATE)) AS f
         FROM orders GROUP BY 1),
       rev AS (SELECT CAST(extract(year FROM fo.f) AS INT)
                          AS cohort_year,
                      CAST(((extract(year FROM o.o_orderdate) * 12
                              + extract(month FROM o.o_orderdate))
                             - (extract(year FROM fo.f) * 12
                                + extract(month FROM fo.f))) // 3
                           AS INT) AS quarter_offset,
                      sum(o.o_totalprice) AS rev
               FROM orders o JOIN first_order fo USING (o_custkey)
               GROUP BY 1, 2)
       SELECT cohort_year, quarter_offset,
              round(rev, 2) AS quarter_rev,
              round(sum(rev) OVER (PARTITION BY cohort_year
                        ORDER BY quarter_offset
                        ROWS UNBOUNDED PRECEDING), 2) AS cum_ltv
       FROM rev""",
    doc="cohort LTV curve: cumulative revenue per first-order-year "
    "cohort by quarter offset — the money companion to the retention "
    "headcount matrix; per-cohort windows on the aggregated frame",
)
def q_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    fo = o.groupBy("o_custkey").agg(
        F.min(F.col("o_orderdate").cast("date")).alias("f")
    )
    rev = (
        o.join(fo, "o_custkey")
        .groupBy(
            F.year("f").cast("int").alias("cohort_year"),
            F.floor(
                (
                    (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
                    - (F.year("f") * 12 + F.month("f"))
                )
                / 3
            )
            .cast("int")
            .alias("quarter_offset"),
        )
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    w_cum = W.partitionBy("cohort_year").orderBy(
        "quarter_offset"
    ).rowsBetween(W.unboundedPreceding, 0)
    return rev.select(
        "cohort_year",
        "quarter_offset",
        F.round(F.col("rev"), 2).alias("quarter_rev"),
        F.round(F.sum("rev").over(w_cum), 2).alias("cum_ltv"),
    )


# =====================================================================
# Shingle novelty per document: the fraction of a doc's 3-grams first
# seen in THIS doc (min doc_id over the shingle's occurrences) — the
# temporal-novelty screen a curation pipeline uses to find
# boilerplate-heavy late additions. First-occurrence attribution is
# one min-aggregate per shingle joined back on the shingle key.
# =====================================================================


@_register(
    "shingle_novelty_by_doc",
    r"""WITH t AS (SELECT doc_id,
                         string_split_regex(trim(text), '\s+') AS toks
                  FROM documents),
       sh AS (SELECT DISTINCT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                         AS shingle
              FROM t, UNNEST(generate_series(1,
                       greatest(len(toks) - 2, 0))) AS u(i)),
       firsts AS (SELECT shingle, min(doc_id) AS first_doc
                  FROM sh GROUP BY 1)
       SELECT sh.doc_id,
              CAST(count(*) AS BIGINT) AS n_shingles,
              CAST(count(*) FILTER (f.first_doc = sh.doc_id) AS BIGINT)
                  AS n_novel,
              round(CAST(count(*) FILTER (f.first_doc = sh.doc_id)
                         AS DOUBLE) / count(*), 4) AS novelty
       FROM sh JOIN firsts f USING (shingle)
       GROUP BY 1""",
    doc="per-doc shingle novelty (share of 3-grams first seen in this "
    "doc, by min-doc_id attribution): the temporal boilerplate "
    "screen; one min-agg per shingle + shingle-key join back",
)
def q_shingle_novelty_by_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import _doc_shingles

    docs = _t(spark, sf_dir, "documents")
    sh = _doc_shingles(docs, "doc_id", "text", 3)
    firsts = sh.groupBy("shingle").agg(
        F.min("doc_id").alias("first_doc")
    )
    j = sh.join(firsts, "shingle")
    novel = F.count(
        F.when(F.col("first_doc") == F.col("doc_id"), 1)
    )
    return j.groupBy("doc_id").agg(
        F.count("*").alias("n_shingles"),
        novel.alias("n_novel"),
        F.round(novel.cast("double") / F.count("*"), 4).alias("novelty"),
    )


# =====================================================================
# Population Stability Index between early (≤1997) and late (≥1998)
# order prices — the ML-ops drift metric run before retraining on new
# data: PSI = Σ (p_i − q_i)·ln(p_i/q_i) over the EARLY period's
# decile bins (binning by the reference distribution is the standard
# convention). All counts exact integers; bins from one percentile
# aggregate broadcast back.
# =====================================================================


@_register(
    "psi_price_drift",
    """WITH early AS (SELECT o_totalprice AS p FROM orders
                     WHERE o_orderdate < TIMESTAMP '1998-01-01'),
       late AS (SELECT o_totalprice AS p FROM orders
                WHERE o_orderdate >= TIMESTAMP '1998-01-01'),
       b AS (SELECT quantile_cont(p, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,
                                      0.9]) AS qs
             FROM early),
       eb AS (SELECT CAST(1 + CAST(p > qs[1] AS INT) + CAST(p > qs[2] AS INT) + CAST(p > qs[3] AS INT) + CAST(p > qs[4] AS INT) + CAST(p > qs[5] AS INT) + CAST(p > qs[6] AS INT) + CAST(p > qs[7] AS INT) + CAST(p > qs[8] AS INT) + CAST(p > qs[9] AS INT) AS INT)
                  AS bin, count(*) AS n
              FROM early CROSS JOIN b GROUP BY 1),
       lb AS (SELECT CAST(1 + CAST(p > qs[1] AS INT) + CAST(p > qs[2] AS INT) + CAST(p > qs[3] AS INT) + CAST(p > qs[4] AS INT) + CAST(p > qs[5] AS INT) + CAST(p > qs[6] AS INT) + CAST(p > qs[7] AS INT) + CAST(p > qs[8] AS INT) + CAST(p > qs[9] AS INT) AS INT)
                  AS bin, count(*) AS n
              FROM late CROSS JOIN b GROUP BY 1)
       SELECT round(sum((pe - pl) * ln(pe / pl)), 6) AS psi,
              CAST(count(*) AS BIGINT) AS n_bins
       FROM (SELECT eb.bin,
                    CAST(eb.n AS DOUBLE)
                        / sum(eb.n) OVER () AS pe,
                    CAST(lb.n AS DOUBLE)
                        / sum(lb.n) OVER () AS pl
             FROM eb JOIN lb USING (bin))""",
    doc="Population Stability Index of order price, early(<=1997) vs "
    "late(>=1998), over the early period's decile bins (reference-"
    "binning convention): the pre-retrain drift gate; exact counts, "
    "1-row bin-edge broadcast",
)
def q_psi_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    cutoff = F.lit("1998-01-01").cast("timestamp")
    early = o.filter(F.col("o_orderdate") < cutoff).select(
        F.col("o_totalprice").alias("p")
    )
    late = o.filter(F.col("o_orderdate") >= cutoff).select(
        F.col("o_totalprice").alias("p")
    )
    qs = [i / 10 for i in range(1, 10)]
    b = early.agg(
        *[
            F.expr(
                f"percentile_cont({q}) WITHIN GROUP (ORDER BY p)"
            ).alias(f"q{i}")
            for i, q in enumerate(qs, start=1)
        ]
    )

    def binned(df: DataFrame) -> DataFrame:
        e = df.crossJoin(F.broadcast(b))
        bin_ = (
            F.lit(1)
            + sum(
                F.when(F.col("p") > F.col(f"q{i}"), 1).otherwise(0)
                for i in range(1, 10)
            )
        ).cast("int")
        return e.select(bin_.alias("bin")).groupBy("bin").agg(
            F.count("*").alias("n")
        )

    eb = binned(early).select("bin", F.col("n").alias("ne"))
    lb = binned(late).select("bin", F.col("n").alias("nl"))
    w_all = W.partitionBy()
    j = eb.join(lb, "bin").select(
        (F.col("ne").cast("double") / F.sum("ne").over(w_all)).alias("pe"),
        (F.col("nl").cast("double") / F.sum("nl").over(w_all)).alias("pl"),
    )
    return j.agg(
        F.round(
            F.sum(
                (F.col("pe") - F.col("pl"))
                * F.log(F.col("pe") / F.col("pl"))
            ),
            6,
        ).alias("psi"),
        F.count("*").alias("n_bins"),
    )


# =====================================================================
# Two-sample Kolmogorov–Smirnov statistic (early vs late order
# prices): max |F1 − F2| over the pooled sorted values. Each sample's
# empirical CDF comes from cumulative counts over the pooled order —
# one union, one ordered window pair on slim (value, flag) rows, one
# max. The drift metric PSI's binned view can miss.
# =====================================================================


@_register(
    "group_quantiles_events",
    # Discrete (type-1) quantiles: the value at 1-indexed rank ceil(qn)
    # — parquet-exact on both engines, no interpolation .xx5 rounding
    # hazard (SURVEY §7.4).
    """WITH r AS (SELECT event_type, value,
                         row_number() OVER (PARTITION BY event_type
                                            ORDER BY value) AS rn,
                         count(*) OVER (PARTITION BY event_type) AS n
                  FROM events WHERE value IS NOT NULL)
       SELECT event_type,
              CAST(max(n) AS BIGINT) AS n,
              max(CASE WHEN rn = greatest(CAST(ceil(0.25 * n) AS BIGINT), 1)
                       THEN value END) AS q25,
              max(CASE WHEN rn = greatest(CAST(ceil(0.50 * n) AS BIGINT), 1)
                       THEN value END) AS q50,
              max(CASE WHEN rn = greatest(CAST(ceil(0.75 * n) AS BIGINT), 1)
                       THEN value END) AS q75
       FROM r GROUP BY event_type""",
    doc="per-group exact discrete quantiles via the grouped-map ARROW "
    "surface (applyInArrow: pyarrow Tables in/out, no pandas hop) — "
    "rank-selected values are engine-exact where interpolated "
    "quantiles round-half differently "
    "(operators/profile.py::group_quantiles_arrow)",
)
def q_group_quantiles_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import group_quantiles_arrow

    return group_quantiles_arrow(
        _t(spark, sf_dir, "events"), "event_type", "value"
    )


@_register(
    "cogrouped_ks_by_event_type",
    # Exact per-key KS: cumulative counts at DISTINCT pooled values
    # (complete counts at ties — right-CDFs), the same formulation the
    # numpy kernel computes; intermediate-row windows would overshoot
    # at cross-sample ties.
    """WITH pooled AS (
         SELECT event_type, value AS v,
                CASE WHEN ts < TIMESTAMP '2024-01-16'
                     THEN 1 ELSE 0 END AS in_a
         FROM events),
       d AS (SELECT event_type, v,
                    sum(in_a) AS da, sum(1 - in_a) AS db
             FROM pooled GROUP BY event_type, v),
       c AS (SELECT event_type, v,
                    sum(da) OVER (PARTITION BY event_type ORDER BY v
                                  ROWS UNBOUNDED PRECEDING) AS ca,
                    sum(db) OVER (PARTITION BY event_type ORDER BY v
                                  ROWS UNBOUNDED PRECEDING) AS cb,
                    sum(da) OVER (PARTITION BY event_type) AS na,
                    sum(db) OVER (PARTITION BY event_type) AS nb
             FROM d)
       SELECT event_type,
              CAST(max(na) AS BIGINT) AS n_a,
              CAST(max(nb) AS BIGINT) AS n_b,
              round(max(abs(CAST(ca AS DOUBLE) / na
                            - CAST(cb AS DOUBLE) / nb)), 6) AS ks
       FROM c GROUP BY event_type""",
    doc="per-key two-sample KS drift (first vs second half of the "
    "month, per event type) via the CO-GROUPED-map Arrow surface — "
    "cogroup().applyInPandas co-shuffles both frames once and hands "
    "each kernel the per-key frame pair; exact distinct-value "
    "right-CDF statistic, value-verified by the oracle "
    "(operators/profile.py::cogrouped_ks)",
)
def q_cogrouped_ks_by_event_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.profile import cogrouped_ks

    ev = _t(spark, sf_dir, "events")
    split = F.lit("2024-01-16").cast("timestamp")
    return cogrouped_ks(
        ev.filter(F.col("ts") < split),
        ev.filter(F.col("ts") >= split),
        "event_type",
        "value",
    )


@_register(
    "ks_statistic_price_periods",
    """WITH pooled AS (
         SELECT o_totalprice AS p,
                CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                     THEN 1 ELSE 0 END AS is_early,
                o_orderkey
         FROM orders),
       c AS (SELECT p,
                    sum(is_early) OVER (ORDER BY p, o_orderkey
                        ROWS UNBOUNDED PRECEDING) AS c1,
                    sum(1 - is_early) OVER (ORDER BY p, o_orderkey
                        ROWS UNBOUNDED PRECEDING) AS c2,
                    sum(is_early) OVER () AS n1,
                    sum(1 - is_early) OVER () AS n2
             FROM pooled),
       v AS (SELECT p, max(c1) AS c1, max(c2) AS c2,
                    max(n1) AS n1, max(n2) AS n2
             FROM c GROUP BY p)
       SELECT round(max(abs(CAST(c1 AS DOUBLE) / n1
                            - CAST(c2 AS DOUBLE) / n2)), 6) AS ks_stat,
              CAST(max(n1) AS BIGINT) AS n_early,
              CAST(max(n2) AS BIGINT) AS n_late
       FROM v""",
    doc="two-sample KS statistic (early vs late order price): pooled "
    "sort, per-sample cumulative counts from one window pair, max "
    "CDF gap at VALUE boundaries (exact under ties) — the unbinned "
    "drift metric beside PSI; at scale the ordered cumsum rides "
    "layout.global_running_sum",
)
def q_ks_statistic_price_periods(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    pooled = o.select(
        F.col("o_totalprice").alias("p"),
        F.when(
            F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"),
            1,
        )
        .otherwise(0)
        .alias("is_early"),
        "o_orderkey",
    )
    from ..operators.layout import global_running_sums

    pooled = pooled.withColumn(
        "is_late", 1 - F.col("is_early")
    )
    run = global_running_sums(
        pooled,
        ["p", "o_orderkey"],
        ["is_early", "is_late"],
        ["c1", "c2"],
        n_partitions=16,
    )
    tot = pooled.agg(
        F.sum("is_early").alias("n1"), F.sum("is_late").alias("n2")
    )
    # CDF gap evaluated at VALUE boundaries (end-of-tie-block
    # cumulative = per-value max) — exact KS under ties
    run = run.groupBy("p").agg(
        F.max("c1").alias("c1"), F.max("c2").alias("c2")
    )
    c = run.select("c1", "c2").crossJoin(F.broadcast(tot))
    return c.agg(
        F.round(
            F.max(
                F.abs(
                    F.col("c1").cast("double") / F.col("n1")
                    - F.col("c2").cast("double") / F.col("n2")
                )
            ),
            6,
        ).alias("ks_stat"),
        F.max("n1").cast("long").alias("n_early"),
        F.max("n2").cast("long").alias("n_late"),
    )


# =====================================================================
# Diversified top-k (the search/reco "fair ranking" pattern): the 10
# highest-revenue parts subject to AT MOST 2 per brand — a per-brand
# rank filter BEFORE the global cut, so one dominant brand can't
# monopolize the result. Both ranks are windows over the per-part
# AGGREGATE; ties broken by part key for engine-identical cuts.
# =====================================================================


@_register(
    "diversified_topk_parts",
    """WITH r AS (SELECT p.p_partkey, p.p_brand,
                         round(sum(l.l_extendedprice
                                   * (1 - l.l_discount)), 2) AS rev
                  FROM lineitem l JOIN part p
                    ON l.l_partkey = p.p_partkey
                  GROUP BY 1, 2),
       b AS (SELECT *, row_number() OVER (PARTITION BY p_brand
                           ORDER BY rev DESC, p_partkey) AS brand_rank
             FROM r)
       SELECT p_partkey, p_brand, rev,
              CAST(brand_rank AS INT) AS brand_rank
       FROM b WHERE brand_rank <= 2
       ORDER BY rev DESC, p_partkey LIMIT 10""",
    doc="diversified top-10 parts by revenue with at most 2 per brand "
    "(per-brand rank filter before the global cut — the fair-ranking "
    "pattern that stops one brand monopolizing results); both ranks "
    "on the per-part aggregate, key tie-breaks",
)
def q_diversified_topk_parts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    r = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_partkey", "p_brand")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ),
                2,
            ).alias("rev")
        )
    )
    wb = W.partitionBy("p_brand").orderBy(F.desc("rev"), "p_partkey")
    b = r.withColumn(
        "brand_rank", F.row_number().over(wb).cast("int")
    ).filter(F.col("brand_rank") <= 2)
    return b.orderBy(F.desc("rev"), "p_partkey").limit(10).select(
        "p_partkey", "p_brand", "rev", "brand_rank"
    )


# =====================================================================
# max_by / min_by aggregate surface (Spark ≥3.3; DuckDB arg_max /
# arg_min): the argmax-as-aggregate that replaces a window-rank pass
# when only the extremal row's companion value is needed — per brand,
# the part name with the highest retail price (key tie-break folded
# into the comparator tuple so both engines pick the same row).
# =====================================================================


@_register(
    "max_by_part_per_brand",
    """SELECT p_brand,
              arg_max(p_name,
                      CAST(round(p_retailprice * 100, 0) AS BIGINT)
                          * 10000000 + p_partkey) AS priciest_part,
              max(p_retailprice) AS max_retail
       FROM part GROUP BY 1""",
    doc="max_by/arg_max aggregate surface: per brand, the name of the "
    "highest-retail part in ONE aggregate pass (no window, no "
    "self-join). DuckDB arg_max takes only SCALAR comparators, so "
    "ties are pinned via an exact integer composite key "
    "(cents * 1e7 + partkey — widen the multiplier for key spaces "
    "past 1e7)",
)
def q_max_by_part_per_brand(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    key = (
        F.round(F.col("p_retailprice") * 100, 0).cast("long")
        * F.lit(10_000_000)
        + F.col("p_partkey")
    )
    return p.groupBy("p_brand").agg(
        F.max_by("p_name", key).alias("priciest_part"),
        F.max("p_retailprice").alias("max_retail"),
    )


# =====================================================================
# Shard-uniformity audit: chi-square goodness-of-fit of the training
# shard assignment against the uniform expectation — the QA check on
# shard_assignment's md5 bucketing (composition: the export operator
# feeds its own statistical audit). All counts exact; expectation
# N/16 enters as one exact-rational division.
# =====================================================================


@_register(
    "shard_uniformity_chi2",
    """WITH k AS (SELECT CAST(strpos('0123456789abcdef',
                           substr(md5('42-' || CAST(doc_id AS VARCHAR)),
                                  8, 1)) - 1 AS INT) AS shard
                  FROM documents),
       c AS (SELECT shard, CAST(count(*) AS BIGINT) AS n FROM k
             GROUP BY 1),
       t AS (SELECT CAST(sum(n) AS DOUBLE) / 16 AS expected FROM c)
       SELECT CAST(count(*) AS BIGINT) AS n_shards,
              round(sum(pow(n - expected, 2) / expected), 4)
                  AS chi2_stat,
              CAST(15 AS INT) AS dof
       FROM c CROSS JOIN t""",
    doc="chi-square goodness-of-fit of the md5 training-shard "
    "assignment vs uniform (the export QA audit composed on "
    "operators/shard.shard_assignment's bucketing); exact counts, "
    "1-row expectation broadcast",
)
def q_shard_uniformity_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.shard import shard_assignment

    sh = shard_assignment(
        _t(spark, sf_dir, "documents"), n_shards=16, seed=42
    )
    c = sh.groupBy("shard").agg(F.count("*").alias("n"))
    t = c.agg(
        (F.sum("n").cast("double") / 16).alias("expected")
    )
    return c.crossJoin(F.broadcast(t)).agg(
        F.count("*").alias("n_shards"),
        F.round(
            F.sum(
                F.pow(F.col("n") - F.col("expected"), 2)
                / F.col("expected")
            ),
            4,
        ).alias("chi2_stat"),
        F.lit(15).cast("int").alias("dof"),
    )


# =====================================================================
# Int8-quantized vs float similarity serving: the same top-5 search
# for query vector 0 executed in BOTH domains — float cosine (the
# exact tier) and symmetric-int8 dot product rescaled by the two
# vectors' scales (the serving tier quantize_embeddings feeds).
# Integer code dot products are EXACT (≤ 127²·d ≪ 2⁵³), so the only
# float ops are the two scale multiplies — engine-identical. Output
# is both rankings side by side (method, rank, neighbor, score);
# agreement between them IS the recall readout.
# =====================================================================


@_register(
    "int8_vs_float_topk",
    r"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
       s AS (SELECT vec_id, v,
                    list_max(list_transform(v, x -> abs(x))) / 127.0
                        AS scale
             FROM e),
       q AS (SELECT vec_id, v, scale,
                    list_transform(v, x -> CASE WHEN scale = 0 THEN 0.0
                        ELSE round(x / scale, 0) END) AS qv
             FROM s),
       qq AS (SELECT v AS q_v, qv AS q_qv, scale AS q_scale
              FROM q WHERE vec_id = 0),
       scored AS (
         SELECT q.vec_id,
                round(list_dot_product(q.v, qq.q_v)
                      / (sqrt(list_dot_product(q.v, q.v))
                         * sqrt(list_dot_product(qq.q_v, qq.q_v))), 4)
                    AS cosine,
                round(q.scale * qq.q_scale
                      * list_dot_product(q.qv, qq.q_qv), 4) AS int8_dot
         FROM q, qq WHERE q.vec_id <> 0),
       f AS (SELECT 'float' AS method, vec_id AS neighbor_id,
                    cosine AS score,
                    CAST(row_number() OVER (ORDER BY cosine DESC, vec_id)
                         AS INT) AS rank
             FROM scored),
       i AS (SELECT 'int8' AS method, vec_id AS neighbor_id,
                    int8_dot AS score,
                    CAST(row_number() OVER (ORDER BY int8_dot DESC,
                                            vec_id) AS INT) AS rank
             FROM scored)
       SELECT method, rank, neighbor_id, score FROM f WHERE rank <= 5
       UNION ALL
       SELECT method, rank, neighbor_id, score FROM i WHERE rank <= 5""",
    doc="int8-quantized vs float top-5 similarity serving for one "
    "query: integer code dot products are exact, only the two scale "
    "multiplies are float — both rankings side by side, agreement = "
    "the quantization recall readout "
    "(operators/similarity.py::quantize_embeddings serving tier)",
)
def q_int8_vs_float_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    s = e.withColumn(
        "scale",
        F.array_max(F.transform(F.col("v"), lambda x: F.abs(x)))
        / F.lit(127.0),
    )
    q = s.withColumn(
        "qv",
        F.transform(
            F.col("v"),
            lambda x: F.when(F.col("scale") == 0, F.lit(0.0)).otherwise(
                F.round(x / F.col("scale"), 0)
            ),
        ),
    )
    qq = (
        q.filter(F.col("vec_id") == 0)
        .select(
            F.col("v").alias("q_v"),
            F.col("qv").alias("q_qv"),
            F.col("scale").alias("q_scale"),
        )
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    scored = (
        q.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qq))
        .select(
            "vec_id",
            F.round(
                dot(F.col("v"), F.col("q_v"))
                / (
                    F.sqrt(dot(F.col("v"), F.col("v")))
                    * F.sqrt(dot(F.col("q_v"), F.col("q_v")))
                ),
                4,
            ).alias("cosine"),
            F.round(
                F.col("scale")
                * F.col("q_scale")
                * dot(F.col("qv"), F.col("q_qv")),
                4,
            ).alias("int8_dot"),
        )
    )
    f = scored.select(
        F.lit("float").alias("method"),
        F.row_number()
        .over(W.orderBy(F.desc("cosine"), "vec_id"))
        .cast("int")
        .alias("rank"),
        F.col("vec_id").alias("neighbor_id"),
        F.col("cosine").alias("score"),
    ).filter(F.col("rank") <= 5)
    i = scored.select(
        F.lit("int8").alias("method"),
        F.row_number()
        .over(W.orderBy(F.desc("int8_dot"), "vec_id"))
        .cast("int")
        .alias("rank"),
        F.col("vec_id").alias("neighbor_id"),
        F.col("int8_dot").alias("score"),
    ).filter(F.col("rank") <= 5)
    return f.unionAll(i).select("method", "rank", "neighbor_id", "score")


# =====================================================================
# Negative-sampling distribution (word2vec's unigram^0.75 table):
# token sampling weights flattened by the 3/4 power, normalized, with
# the cumulative boundary each sampler bucket uses — built over the
# top-100 vocabulary (deterministic tie-break). The exponent and
# normalization are the published convention; everything runs on the
# |vocab|-row aggregate.
# =====================================================================


@_register(
    "negative_sampling_table",
    r"""WITH f AS (SELECT token, CAST(count(*) AS BIGINT) AS n
                  FROM (SELECT unnest(string_split_regex(trim(text),
                                                         '\s+')) AS token
                        FROM documents)
                  WHERE token <> '' GROUP BY 1),
       top AS (SELECT token, n,
                      row_number() OVER (ORDER BY n DESC, token) AS rk
               FROM f QUALIFY rk <= 100),
       w AS (SELECT token, n, rk, pow(n, 0.75) AS wt FROM top)
       SELECT token, n,
              round(wt / sum(wt) OVER (), 6) AS prob,
              round(sum(wt) OVER (ORDER BY rk
                        ROWS UNBOUNDED PRECEDING)
                    / sum(wt) OVER (), 6) AS cum_prob
       FROM w""",
    doc="word2vec negative-sampling table (unigram^0.75, normalized, "
    "cumulative bucket boundaries) over the top-100 vocabulary; "
    "windows on the aggregate only",
)
def q_negative_sampling_table(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    f = (
        docs.select(
            F.explode(
                F.split(F.trim(F.col("text")), r"\s+")
            ).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    top = f.withColumn(
        "rk", F.row_number().over(W.orderBy(F.desc("n"), "token"))
    ).filter(F.col("rk") <= 100)
    w = top.withColumn("wt", F.pow(F.col("n"), 0.75))
    w_all = W.partitionBy()
    w_cum = W.orderBy("rk").rowsBetween(W.unboundedPreceding, 0)
    return w.select(
        "token",
        "n",
        F.round(F.col("wt") / F.sum("wt").over(w_all), 6).alias("prob"),
        F.round(
            F.sum("wt").over(w_cum) / F.sum("wt").over(w_all), 6
        ).alias("cum_prob"),
    )


# =====================================================================
# Revenue bridge (waterfall) decomposition: the 1997→1998 revenue
# change per return flag split into VOLUME effect ((q98−q97)·p̄97)
# and PRICE effect ((p̄98−p̄97)·q98) — the standard FP&A variance
# bridge whose two effects reconcile exactly to the total change
# (volume at old price + price at new volume is the exact identity).
# Everything from two conditional aggregates in one pass.
# =====================================================================


@_register(
    "revenue_bridge_price_volume",
    """WITH s AS (
         SELECT l_returnflag,
                sum(l_quantity) FILTER (
                    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                      AND l_shipdate < TIMESTAMP '1998-01-01') AS q97,
                sum(l_extendedprice) FILTER (
                    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                      AND l_shipdate < TIMESTAMP '1998-01-01') AS r97,
                sum(l_quantity) FILTER (
                    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
                      AND l_shipdate < TIMESTAMP '1999-01-01') AS q98,
                sum(l_extendedprice) FILTER (
                    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
                      AND l_shipdate < TIMESTAMP '1999-01-01') AS r98
         FROM lineitem GROUP BY 1)
       SELECT l_returnflag,
              round(r98 - r97, 2) AS total_change,
              round((q98 - q97) * (r97 / q97), 2) AS volume_effect,
              round((r98 / q98 - r97 / q97) * q98, 2) AS price_effect
       FROM s""",
    doc="FP&A revenue bridge per return flag (1997 -> 1998): volume "
    "effect at old unit price + price effect at new volume — the "
    "exact decomposition identity; two conditional aggregates in one "
    "pass",
)
def q_revenue_bridge_price_volume(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")

    def yr(y: int):
        return (
            F.col("l_shipdate") >= F.lit(f"{y}-01-01").cast("timestamp")
        ) & (
            F.col("l_shipdate") < F.lit(f"{y + 1}-01-01").cast("timestamp")
        )

    s = li.groupBy("l_returnflag").agg(
        F.sum(F.when(yr(1997), F.col("l_quantity"))).alias("q97"),
        F.sum(F.when(yr(1997), F.col("l_extendedprice"))).alias("r97"),
        F.sum(F.when(yr(1998), F.col("l_quantity"))).alias("q98"),
        F.sum(F.when(yr(1998), F.col("l_extendedprice"))).alias("r98"),
    )
    return s.select(
        "l_returnflag",
        F.round(F.col("r98") - F.col("r97"), 2).alias("total_change"),
        F.round(
            (F.col("q98") - F.col("q97"))
            * (F.col("r97") / F.col("q97")),
            2,
        ).alias("volume_effect"),
        F.round(
            (F.col("r98") / F.col("q98") - F.col("r97") / F.col("q97"))
            * F.col("q98"),
            2,
        ).alias("price_effect"),
    )


# =====================================================================
# Lexical richness per source: type-token ratio and hapax-legomena
# rate (share of once-occurring types) — the corpus-linguistics
# screens beside the Zipf slope for spotting templated/synthetic
# text (low TTR, thin hapax tail). One (source, token) count pass
# feeds both.
# =====================================================================


@_register(
    "lexical_richness_by_source",
    r"""WITH f AS (SELECT source, token, CAST(count(*) AS BIGINT) AS n
                  FROM (SELECT source,
                               unnest(string_split_regex(trim(text),
                                                         '\s+')) AS token
                        FROM documents)
                  WHERE token <> '' GROUP BY 1, 2)
       SELECT source,
              CAST(sum(n) AS BIGINT) AS n_tokens,
              CAST(count(*) AS BIGINT) AS vocab,
              round(CAST(count(*) AS DOUBLE) / sum(n), 6) AS ttr,
              round(CAST(count(*) FILTER (n = 1) AS DOUBLE)
                    / count(*), 6) AS hapax_rate
       FROM f GROUP BY 1""",
    doc="lexical richness per source: type-token ratio and hapax rate "
    "from one (source, token) count pass — the corpus-linguistics "
    "screens beside zipf_slope_by_source for templated text",
)
def q_lexical_richness_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    f = (
        docs.select(
            "source",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias(
                "token"
            ),
        )
        .filter(F.col("token") != "")
        .groupBy("source", "token")
        .agg(F.count("*").alias("n"))
    )
    hapax = F.count(F.when(F.col("n") == 1, 1))
    return f.groupBy("source").agg(
        F.sum("n").alias("n_tokens"),
        F.count("*").alias("vocab"),
        F.round(
            F.count("*").cast("double") / F.sum("n"), 6
        ).alias("ttr"),
        F.round(hapax.cast("double") / F.count("*"), 6).alias(
            "hapax_rate"
        ),
    )


# =====================================================================
# Token-budget corpus selection — greedy "best N-token corpus" pick:
# rank by (n_chars DESC, doc_id) and keep the longest prefix whose
# cumulative whitespace-token count fits the budget. The Spark side
# avoids the global-sort window: a distributed per-rank-value
# histogram finds the cutoff, full bins return as a filter, and only
# the single cutoff bin pays a (partitioned, bin-sized) window cumsum
# — exactly equal to the oracle's global cumsum by the greedy prefix
# property (non-negative token counts → monotone cumulative sum).
# =====================================================================


@_register(
    "token_budget_selection",
    r"""WITH d AS (SELECT doc_id, n_chars,
                  CAST(len(string_split_regex(trim(text), '\s+'))
                       AS BIGINT) AS n_toks
           FROM documents),
       c AS (SELECT doc_id, n_chars, n_toks,
                    SUM(n_toks) OVER (ORDER BY n_chars DESC, doc_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS cum
             FROM d)
       SELECT doc_id, n_chars, n_toks FROM c WHERE cum <= 10000""",
    doc="greedy token-budget corpus selection (keep the best docs by "
    "length-proxy until a 10K-token budget is spent) — histogram-"
    "cutoff plan instead of a global-sort window: one groupBy pass, a "
    "driver walk over the bounded rank histogram, a filter for full "
    "bins, and a bin-local window cumsum for the one partial bin "
    "(operators/curation.py::token_budget_select)",
)
def q_token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import token_count
    from ..operators.curation import token_budget_select

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", token_count("text").cast("long").alias("n_toks")
    )
    return token_budget_select(d, budget=10_000)


# =====================================================================
# Per-source frequency capping — at most N docs per source, preferring
# long docs with a deterministic id tiebreak: the standard defense
# against one crawl domain dominating a training mixture. One
# partitioned window; shuffles once on the group key.
# =====================================================================


@_register(
    "source_quota_cap",
    """WITH r AS (SELECT doc_id, source, n_chars,
                  row_number() OVER (PARTITION BY source
                                     ORDER BY n_chars DESC, doc_id) AS rn
           FROM documents)
       SELECT doc_id, source, n_chars FROM r WHERE rn <= 15""",
    doc="frequency capping: keep at most 15 docs per source by "
    "(n_chars DESC, doc_id) — one row_number window partitioned on "
    "the group key (operators/curation.py::source_quota_cap)",
)
def q_source_quota_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import source_quota_cap

    return source_quota_cap(_t(spark, sf_dir, "documents"), cap=15)


# =====================================================================
# Exponential smoothing of the hourly event series — the trainer-side
# "smoothed throughput" signal. Cross-engine float parity is designed
# in, not hoped for: α=1/2 makes every kernel weight a power of two,
# the kernel is TRUNCATED at 16 lags and renormalized (weights
# 2^(16-j)/(2^17-1), an exact rational), so the numerator is an exact
# BIGINT dot product in both engines and the single final division
# produces bit-identical doubles. Warm-up rows (fewer than 17
# observations) are dropped rather than renormalized per-row. One
# window pass partitioned on event_type — a single key shuffle.
# =====================================================================


@_register(
    "ewma_hourly_events",
    """WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hour,
                         CAST(count(*) AS BIGINT) AS n
                  FROM events GROUP BY 1, 2),
       r AS (SELECT event_type, hour, n,
                    CAST(row_number() OVER (PARTITION BY event_type
                                            ORDER BY hour) AS INT) AS i,
                    """ + " + ".join(
                        f"lag(n, {j}) OVER (PARTITION BY event_type ORDER BY hour) * {2 ** (16 - j)}"
                        for j in range(17)
                    ) + """ AS num
             FROM h)
       SELECT event_type, CAST(hour AS TIMESTAMP) AS hour, n,
              round(CAST(num AS DOUBLE) / 131071.0, 6) AS ewma
       FROM r WHERE i >= 17""",
    doc="exponential smoothing (half-life one hour) of hourly event "
    "counts per type: 16-lag truncated renormalized kernel with "
    "power-of-two weights — exact-integer numerator in both engines, "
    "one final double division, bit-identical cross-engine; warm-up "
    "rows dropped; one event_type-partitioned window pass",
)
def q_ewma_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("event_type").orderBy("hour")
    num = None
    for j in range(17):
        term = F.lag("n", j).over(w) * F.lit(2 ** (16 - j))
        num = term if num is None else num + term
    return (
        hourly.select(
            "event_type",
            F.col("hour").cast("timestamp_ntz").alias("hour"),
            "n",
            F.row_number().over(w).alias("_i"),
            num.alias("_num"),
        )
        .filter(F.col("_i") >= 17)
        .select(
            "event_type",
            "hour",
            "n",
            F.round(F.col("_num").cast("double") / F.lit(131071.0), 6).alias(
                "ewma"
            ),
        )
    )


# =====================================================================
# Round 9 — PageRank promoted to the oracled tier (bounded power
# iteration in exact integer mass), IVF search promoted via a
# triangle-inequality exactness certificate, the full-dimension PCA
# driver-catalog entry restored (r8 ADVICE: the certified 2-d slice
# variant had replaced it under the same name), and two mixture-tier
# additions (epoch-aware upsampling, per-source dedup-vs-quota
# diagnostics).
# =====================================================================


@_register(
    "pagerank_mass_bounded",
    # Chained-CTE replay of the exact-integer power iteration: every
    # engine op is BIGINT floor division / multiplication / addition,
    # so the masses are bit-identical by construction (no float sums
    # anywhere). r0 = 10^12 per node; 3 iterations of
    # M' = (15*scale + 85*recv) // 100 with recv = sum(mass // deg)
    # over in-edges. The copurchase graph is symmetric -> no dangling
    # nodes -> no dangling term (operators/graph.py::pagerank_mass
    # carries it for general graphs).
    """WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk
                  FROM lineitem WHERE l_orderkey < 2000),
       e AS (SELECT DISTINCT a.pk AS src, b.pk AS dst
             FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk),
       deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d
               FROM e GROUP BY src),
       r0 AS (SELECT src AS node, CAST(1000000000000 AS BIGINT) AS m
              FROM deg),
       r1 AS (SELECT e.dst AS node,
                     CAST((15000000000000 + 85 * CAST(SUM(r0.m // deg.d)
                           AS BIGINT)) // 100 AS BIGINT) AS m
              FROM e JOIN r0 ON e.src = r0.node
                     JOIN deg ON e.src = deg.src
              GROUP BY e.dst),
       r2 AS (SELECT e.dst AS node,
                     CAST((15000000000000 + 85 * CAST(SUM(r1.m // deg.d)
                           AS BIGINT)) // 100 AS BIGINT) AS m
              FROM e JOIN r1 ON e.src = r1.node
                     JOIN deg ON e.src = deg.src
              GROUP BY e.dst),
       r3 AS (SELECT e.dst AS node,
                     CAST((15000000000000 + 85 * CAST(SUM(r2.m // deg.d)
                           AS BIGINT)) // 100 AS BIGINT) AS m
              FROM e JOIN r2 ON e.src = r2.node
                     JOIN deg ON e.src = deg.src
              GROUP BY e.dst)
       SELECT node, m AS rank_mass FROM r3
       ORDER BY rank_mass DESC, node LIMIT 20""",
    doc="PageRank promoted to the value-oracle tier: 3-step power "
    "iteration over the part co-purchase graph in EXACT INTEGER mass "
    "(floor-division contributions, damping 85/100 as a rational) — "
    "bit-identical across engines/layouts because no float sum ever "
    "occurs; the float fixed-point production sibling stays "
    "pagerank_copurchase (operators/graph.py::pagerank_mass)",
)
def q_pagerank_mass_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import copurchase_edges, pagerank_mass

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    ranks = pagerank_mass(copurchase_edges(li), n_iter=3)
    return (
        ranks.select("node", F.col("mass").alias("rank_mass"))
        .orderBy(F.col("rank_mass").desc(), F.col("node"))
        .limit(20)
    )


@_register(
    "ivf_search_exact_pruned",
    # The oracle is the plain exact top-k: the probed search carries a
    # triangle-inequality certificate (kth-distance upper bound from
    # the initial probe, cells with |q-c| - r_c beyond it provably
    # hold nothing closer), so the pruned result EQUALS the exact scan
    # or the hash mismatches — the verified-ANN pattern applied to
    # IVF. Same elementwise (a-b)^2 fold order as the Spark side.
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
       q AS (SELECT v AS qv FROM e WHERE vec_id = 3)
       SELECT e.vec_id,
              round(sqrt(list_sum(list_transform(
                        generate_series(1, len(e.v)),
                        i -> (e.v[i] - q.qv[i]) ^ 2))), 4) AS dist
       FROM e, q WHERE e.vec_id <> 3
       ORDER BY dist, e.vec_id LIMIT 5""",
    doc="IVF search with an exactness certificate: initial nprobe=2 "
    "scan bounds the kth distance, cell radii + the triangle "
    "inequality certify every unscanned cell, one expanded scan "
    "returns the PROVABLY exact top-k — two pruned scans total, no "
    "recall loss to oracle against "
    "(operators/similarity.py::ivf_search_exact_pruned)",
)
def q_ivf_search_exact_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf_search_exact_pruned

    return ivf_search_exact_pruned(
        _t(spark, sf_dir, "embeddings"),
        query_id=3,
        k=5,
        nprobe_initial=2,
        n_cells=8,
    )


@_register(
    "pca_embedding_projection_fulldim",
    None,  # 64-d covariance eigensolve -> rows-only (numpy parity
    # pinned in tests/test_ml.py); the certified 2-d slice variant is
    # pca_embedding_projection
    doc="MLlib PCA k=2 over the FULL 64-d embedding corpus — the r8 "
    "ADVICE restoration: the driver catalog exercises the 64-d "
    "covariance/eigensolve path end-to-end again (the same-named "
    "entry had narrowed to the DuckDB-certifiable 2-d slice); "
    "uncentered projection + largest-|loading| sign convention "
    "(ml/pca.py::pca_projection_signed)",
)
def q_pca_embedding_projection_fulldim(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..ml.pca import pca_projection_signed

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    return pca_projection_signed(emb, k=2)


@_register(
    "epoch_upsample_assignment",
    r"""WITH d AS (SELECT doc_id, n_chars,
                  CAST(len(string_split_regex(trim(text), '\s+'))
                       AS BIGINT) AS n_toks
           FROM documents),
       t AS (SELECT CAST(sum(n_toks) AS BIGINT) AS total FROM d),
       p AS (SELECT CAST(least(70000 // total, 4) AS BIGINT) AS f,
                    CAST(70000 - least(70000 // total, 4) * total
                         AS BIGINT) AS rem
             FROM t),
       c AS (SELECT doc_id, n_chars, n_toks,
                    SUM(n_toks) OVER (ORDER BY n_chars DESC, doc_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS cum
             FROM d)
       SELECT c.doc_id, c.n_chars, c.n_toks,
              CAST(p.f + CASE WHEN p.f < 4 AND c.cum <= p.rem
                              THEN 1 ELSE 0 END AS INT) AS n_epochs
       FROM c, p
       WHERE p.f + CASE WHEN p.f < 4 AND c.cum <= p.rem
                        THEN 1 ELSE 0 END > 0""",
    doc="epoch-aware upsampling under a 70K-token budget (epoch cap "
    "4): whole-corpus passes that fit earn everyone an epoch, the "
    "leftover buys one extra epoch for the best (n_chars DESC, "
    "doc_id) prefix via the histogram-cutoff selector — repeat-count "
    "table for deterministic corpus replay; no global sort "
    "(operators/curation.py::epoch_upsample_assign)",
)
def q_epoch_upsample_assignment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..functions import token_count
    from ..operators.curation import epoch_upsample_assign

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", token_count("text").cast("long").alias("n_toks")
    )
    return epoch_upsample_assign(d, budget=70_000, max_epochs=4)


@_register(
    "source_dedup_quota_report",
    """WITH prof AS (SELECT source,
                    CAST(count(*) AS BIGINT) AS n_docs,
                    CAST(count(DISTINCT md5(text)) AS BIGINT)
                        AS n_unique_texts
             FROM documents GROUP BY source),
       r AS (SELECT doc_id, source,
                    row_number() OVER (PARTITION BY source
                                       ORDER BY n_chars DESC, doc_id)
                        AS rn
             FROM documents),
       kept AS (SELECT source, CAST(count(*) AS BIGINT) AS n_kept
                FROM r WHERE rn <= 15 GROUP BY source)
       SELECT p.source, p.n_docs, p.n_unique_texts,
              p.n_docs - p.n_unique_texts AS n_dup_docs,
              CAST(((p.n_docs - p.n_unique_texts) * 10000) // p.n_docs
                   AS BIGINT) AS dup_per_10k,
              k.n_kept,
              CAST((k.n_kept * 10000) // 15 AS BIGINT) AS fill_per_10k,
              greatest(p.n_docs - 15, 0) AS over_quota
       FROM prof p JOIN kept k ON p.source = k.source""",
    doc="per-source dedup-rate-vs-quota diagnostics: exact-dup "
    "profile (count distinct content per source) joined against the "
    "source_quota_cap survivors — integer basis-point ratios, two "
    "per-source hash aggregates + the quota window + one tiny join "
    "(operators/curation.py::source_dedup_quota_report)",
)
def q_source_dedup_quota_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.curation import source_dedup_quota_report

    return source_dedup_quota_report(
        _t(spark, sf_dir, "documents"), cap=15
    )


@_register(
    "curriculum_phase_assignment",
    r"""WITH k AS (SELECT doc_id, n_chars,
                         md5('42-' || CAST(doc_id AS VARCHAR)) AS key
                  FROM documents)
       SELECT doc_id,
              CAST(strpos('0123456789abcdef', substr(key, 8, 1)) - 1
                   AS INT) AS shard,
              n_chars,
              CAST(ntile(4) OVER (PARTITION BY substr(key, 8, 1)
                                  ORDER BY n_chars, doc_id)
                   AS INT) AS phase
       FROM k""",
    doc="curriculum-learning phase assignment: within each "
    "deterministic md5 training shard, ntile(4) over (n_chars ASC, "
    "doc_id) orders documents easy-to-hard — SQL-standard ntile is "
    "engine-identical, the whole assignment a pure function of "
    "(id, length, seed); shard-parallel windows, no global sort "
    "(operators/shard.py::curriculum_phases)",
)
def q_curriculum_phase_assignment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.shard import curriculum_phases

    return curriculum_phases(
        _t(spark, sf_dir, "documents"), n_shards=16, n_phases=4, seed=42
    )


@_register(
    "mixture_epoch_plan",
    r"""WITH d AS (SELECT source,
                  CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(sum(CAST(len(string_split_regex(trim(text),
                       '\s+')) AS BIGINT)) AS BIGINT) AS n_toks
           FROM documents GROUP BY source),
       s AS (SELECT *, CAST(sum(n_docs) OVER () AS BIGINT) AS td
             FROM d),
       b AS (SELECT *, (200000 * n_docs) // td AS base,
                    (200000 * n_docs) % td AS rem
             FROM s),
       r AS (SELECT source, n_docs, n_toks, base,
                    200000 - CAST(sum(base) OVER () AS BIGINT)
                        AS leftover,
                    row_number() OVER (ORDER BY rem DESC, source) AS rk
             FROM b)
       SELECT source, n_docs, n_toks,
              CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                   AS BIGINT) AS alloc_toks,
              CAST(least((base + CASE WHEN rk <= leftover
                                      THEN 1 ELSE 0 END) // n_toks, 4)
                   AS INT) AS n_epochs,
              CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                   - least((base + CASE WHEN rk <= leftover
                                        THEN 1 ELSE 0 END)
                           // n_toks, 4) * n_toks
                   AS BIGINT) AS residual_toks
       FROM r""",
    doc="per-source mixture plan under a 200K-token budget: doc-"
    "balanced largest-remainder apportionment (pure integer — base "
    "div + mod-ranked leftover units, allocations sum to the budget "
    "exactly), whole epochs capped at 4, residual reported — one "
    "per-source aggregate + windows over the source-level frame "
    "(operators/curation.py::mixture_epoch_plan)",
)
def q_mixture_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import token_count
    from ..operators.curation import mixture_epoch_plan

    d = _t(spark, sf_dir, "documents").select(
        "source", token_count("text").cast("long").alias("n_toks")
    )
    return mixture_epoch_plan(d, budget=200_000, max_epochs=4)


@_register(
    "shard_balance_report",
    r"""WITH k AS (SELECT doc_id,
                  CAST(len(string_split_regex(trim(text), '\s+'))
                       AS BIGINT) AS n_toks,
                  CAST(strpos('0123456789abcdef',
                              substr(md5('42-' || CAST(doc_id AS VARCHAR)),
                                     8, 1)) - 1 AS INT) AS shard
           FROM documents),
       p AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
                    CAST(sum(n_toks) AS BIGINT) AS n_toks
             FROM k GROUP BY shard),
       t AS (SELECT *, CAST(sum(n_toks) OVER () AS BIGINT) AS total
             FROM p)
       SELECT shard, n_docs, n_toks,
              CAST((n_toks * 10000) // total AS BIGINT) AS toks_per_10k
       FROM t""",
    doc="per-shard loader-balance report for the deterministic "
    "training shards: doc/token counts + token share in integer "
    "basis-points (the straggler-shard diagnostic a loader owner "
    "reads before an epoch) — one groupBy on the md5 shard key, one "
    "window over the 16-row aggregate "
    "(operators/shard.py::shard_balance_report)",
)
def q_shard_balance_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import token_count
    from ..operators.shard import shard_balance_report

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", token_count("text").cast("long").alias("n_toks")
    )
    return shard_balance_report(d, n_shards=16, seed=42)


@_register(
    "gopher_quality_rules",
    r"""WITH s AS (
         SELECT doc_id,
                list_filter(string_split_regex(trim(text), '\s+'),
                            t -> t <> '') AS toks,
                CAST(length(regexp_replace(text, '\s+', '', 'g'))
                     AS DOUBLE) AS chars,
                CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                         t -> t IN ('the','a','of','and','to','in',
                                    'is','it'))) AS INT) AS n_stop
         FROM documents),
       m AS (SELECT doc_id,
                    CAST(len(toks) AS INT) AS n_words,
                    CASE WHEN len(toks) > 0
                         THEN chars / len(toks) END AS mwl,
                    CASE WHEN len(toks) > 0
                         THEN CAST(len(list_filter(toks,
                                  t -> regexp_matches(t, '[A-Za-z]')))
                                   AS DOUBLE) / len(toks) END AS af,
                    n_stop
             FROM s)
       SELECT doc_id, n_words,
              round(mwl, 4) AS mean_word_len,
              round(af, 4) AS alpha_frac,
              n_stop AS n_stopwords,
              coalesce(n_words > 0 AND n_words >= 50
                       AND n_words <= 100000, FALSE) AS word_count_ok,
              coalesce(n_words > 0 AND mwl >= 3.0 AND mwl <= 10.0,
                       FALSE) AS word_len_ok,
              coalesce(n_words > 0 AND af >= 0.8, FALSE) AS alpha_ok,
              coalesce(n_words > 0 AND n_stop >= 2, FALSE) AS stopword_ok,
              coalesce(n_words > 0 AND n_words >= 50 AND n_words <= 100000
                       AND mwl >= 3.0 AND mwl <= 10.0 AND af >= 0.8
                       AND n_stop >= 2, FALSE) AS pass_gopher
       FROM m""",
    doc="Gopher-style rule PANEL per document (word-count bounds, mean "
    "word length, alphabetic-word fraction, stopword presence) with "
    "per-rule verdicts + overall gate — the audit-grade filter readout "
    "(unlike quality_score's blended scalar); flags compare UNROUNDED "
    "per-row integer ratios so the gate is engine-exact; map-only "
    "column expressions, no shuffle "
    "(operators/textstats.py::gopher_rules)",
)
def q_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textstats import gopher_rules

    return gopher_rules(_t(spark, sf_dir, "documents"))


@_register(
    "token_pmi_pairs",
    r"""WITH dt AS (
         SELECT DISTINCT doc_id, t AS token
         FROM (SELECT doc_id,
                      unnest(string_split_regex(trim(text), '\s+')) AS t
               FROM documents)
         WHERE t <> ''),
       vf AS (SELECT token, count(*) AS df_docs FROM dt
              GROUP BY token HAVING count(*) >= 5),
       dtv AS (SELECT dt.doc_id, dt.token FROM dt JOIN vf USING (token)),
       pr AS (SELECT a.token AS token_a, b.token AS token_b,
                     count(*) AS df_pair
              FROM dtv a JOIN dtv b
                ON a.doc_id = b.doc_id AND a.token < b.token
              GROUP BY a.token, b.token),
       n AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents)
       SELECT pr.token_a, pr.token_b,
              CAST(pr.df_pair AS BIGINT) AS df_pair,
              round(ln(pr.df_pair * n.nd
                       / (fa.df_docs * fb.df_docs)), 4) AS pmi
       FROM pr
       JOIN vf fa ON fa.token = pr.token_a
       JOIN vf fb ON fb.token = pr.token_b
       CROSS JOIN n
       ORDER BY pr.df_pair * n.nd / (fa.df_docs * fb.df_docs) DESC,
                pr.token_a, pr.token_b
       LIMIT 25""",
    doc="token-pair PMI by document co-occurrence (phrase-mining / "
    "collocation signal) over a min-doc-freq vocabulary; ranked by the "
    "exact-integer RATIO (not ln) with lexicographic tie-break so the "
    "top-k cut never flips on a libm ulp — same discipline as "
    "tfidf_top_terms (operators/textstats.py::token_pmi)",
)
def q_token_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textstats import token_pmi

    return token_pmi(_t(spark, sf_dir, "documents"))


@_register(
    "count_min_heavy_hitters",
    r"""WITH tok AS (
         SELECT t AS token
         FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS t
               FROM documents)
         WHERE t <> ''),
       rb AS (SELECT token, r.i AS row_i,
                     CAST(CAST('0x' || substr(md5('42-'
                               || CAST(r.i AS VARCHAR) || '-' || token),
                               1, 6) AS BIGINT) % 16 AS INT) AS bucket
              FROM tok, range(0, 4) r(i)),
       sk AS (SELECT row_i, bucket, count(*) AS c
              FROM rb GROUP BY row_i, bucket),
       ex AS (SELECT token, count(*) AS exact_count
              FROM tok GROUP BY token),
       pb AS (SELECT ex.token, ex.exact_count, r.i AS row_i,
                     CAST(CAST('0x' || substr(md5('42-'
                               || CAST(r.i AS VARCHAR) || '-' || ex.token),
                               1, 6) AS BIGINT) % 16 AS INT) AS bucket
              FROM ex, range(0, 4) r(i)),
       est AS (SELECT pb.token, pb.exact_count, min(sk.c) AS est_count
               FROM pb JOIN sk USING (row_i, bucket)
               GROUP BY pb.token, pb.exact_count)
       SELECT token, CAST(est_count AS BIGINT) AS est_count,
              CAST(exact_count AS BIGINT) AS exact_count
       FROM est ORDER BY est_count DESC, token LIMIT 20""",
    doc="Count-Min sketch heavy hitters with an md5 engine-portable "
    "hash (d=4; w=16 here so the ~30-token synthetic vocab actually "
    "collides and the min-over-rows estimate differs from exact — "
    "w=256 default for real vocabularies): the d×w sketch table "
    "builds in one map-side-"
    "combined agg and BROADCASTS back onto the distinct-token stream; "
    "estimate = min over rows — the whole sketch, every estimate and "
    "the top-k cut are integer-exact, so the oracle recomputes the "
    "sketch itself (estimate ≥ exact is the visible one-sided error; "
    "the JVM-sketch sibling count_min_totals stays rows-only) "
    "(operators/sketches.py::count_min_heavy_hitters)",
)
def q_count_min_heavy_hitters(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.sketches import count_min_heavy_hitters

    return count_min_heavy_hitters(_t(spark, sf_dir, "documents"), width=16)


@_register(
    "stratified_kfold_orders",
    r"""WITH r AS (
         SELECT o_orderpriority AS label,
                row_number() OVER (
                  PARTITION BY o_orderpriority
                  ORDER BY md5('42-' || CAST(o_orderkey AS VARCHAR)),
                           o_orderkey) AS rn
         FROM orders)
       SELECT CAST((rn - 1) % 5 AS INT) AS fold, label,
              CAST(count(*) AS BIGINT) AS n
       FROM r GROUP BY fold, label""",
    doc="deterministic stratified k-fold assignment (md5-permuted "
    "round-robin within each label stratum — every (fold,label) cell "
    "balanced to ±1 BY CONSTRUCTION, engine/layout-independent unlike "
    "randomSplit) verified here as the (fold, label) count matrix "
    "(operators/sample.py::stratified_kfold)",
)
def q_stratified_kfold_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.sample import stratified_kfold

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderpriority").alias("label")
    )
    return (
        stratified_kfold(o, "label", "o_orderkey", k=5)
        .groupBy("fold", "label")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@_register(
    "semantic_centroid_outliers",
    """WITH e AS (SELECT vec_id, label,
                        CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
       m AS (SELECT label, r.i AS dim, avg(v[r.i]) AS m
             FROM e, range(1, 65) r(i) GROUP BY label, r.i),
       c AS (SELECT label, list(m ORDER BY dim) AS cv
             FROM m GROUP BY label),
       s AS (SELECT e.label, e.vec_id,
                    round(list_dot_product(e.v, c.cv)
                          / (sqrt(list_dot_product(e.v, e.v))
                             * sqrt(list_dot_product(c.cv, c.cv))), 4)
                        AS cos_centroid
             FROM e JOIN c USING (label))
       SELECT label, vec_id, cos_centroid,
              (cos_centroid < 0.0) AS is_outlier
       FROM s""",
    doc="SemDeDup/D4-style prototype readout: cosine of every vector "
    "to its label centroid with a fixed-threshold outlier flag — "
    "emits ALL rows and flags on the ROUNDED cosine, so engine "
    "agreement reduces to rounded-value agreement (no top-k boundary "
    "a last-ulp centroid sum could flip); centroid = (label, dim) "
    "partial-agg means rebuilt into a broadcast array, corpus never "
    "shuffles (operators/similarity.py::label_centroid_distances)",
)
def q_semantic_centroid_outliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.similarity import label_centroid_distances

    return label_centroid_distances(_t(spark, sf_dir, "embeddings"))


@_register(
    "truncated_dim_topk_overlap",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
       q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
       sc AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                     round(list_dot_product(e.v, q.qv)
                           / (sqrt(list_dot_product(e.v, e.v))
                              * sqrt(list_dot_product(q.qv, q.qv))), 4)
                         AS cf,
                     round(list_dot_product(e.v[1:16], q.qv[1:16])
                           / (sqrt(list_dot_product(e.v[1:16],
                                                    e.v[1:16]))
                              * sqrt(list_dot_product(q.qv[1:16],
                                                      q.qv[1:16]))), 4)
                         AS cp
              FROM e, q WHERE e.vec_id <> q.query_id),
       r AS (SELECT query_id,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY cf DESC, neighbor_id)
                        AS rf,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY cp DESC, neighbor_id)
                        AS rp
             FROM sc)
       SELECT query_id,
              CAST(count(*) FILTER (WHERE rf <= 10 AND rp <= 10) AS INT)
                  AS n_overlap,
              round(count(*) FILTER (WHERE rf <= 10 AND rp <= 10)
                    / 10.0, 2) AS recall_at_k
       FROM r GROUP BY query_id""",
    doc="Matryoshka retrieval-fidelity eval: recall@10 of the first-16-"
    "dim PREFIX cosine ranking against the full 64-dim ranking per "
    "query — the go/no-go readout for serving truncated embeddings at "
    "a quarter of the index cost; both rankings cut on (rounded "
    "cosine, id) so the sets are engine-exact; one corpus scan "
    "computes both scores, shuffle keyed on query_id only "
    "(operators/similarity.py::truncated_topk_overlap)",
)
def q_truncated_dim_topk_overlap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.similarity import truncated_topk_overlap

    return truncated_topk_overlap(_t(spark, sf_dir, "embeddings"))


@_register(
    "bootstrap_ci_daily_revenue",
    r"""WITH d0 AS (SELECT CAST(o_orderdate AS DATE) AS day,
                          sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
                   FROM orders GROUP BY 1),
       d AS (SELECT row_number() OVER (ORDER BY day) - 1 AS i,
                    CAST(rev AS DECIMAL(18,2)) AS v
             FROM d0),
       n AS (SELECT count(*) AS n FROM d),
       grid AS (SELECT b.i AS b, j.i AS j
                FROM range(0, 200) b(i), (SELECT i FROM d) j(i)),
       draws AS (SELECT g.b,
                        CAST('0x' || substr(md5('42-'
                             || CAST(g.b AS VARCHAR) || '-'
                             || CAST(g.j AS VARCHAR)), 1, 8) AS BIGINT)
                          % n.n AS i
                 FROM grid g, n),
       means AS (SELECT dr.b,
                        CAST(sum(d.v) AS DOUBLE)
                          / (SELECT CAST(n AS DOUBLE) FROM n) AS m
                 FROM draws dr JOIN d USING (i) GROUP BY dr.b),
       ranked AS (SELECT m, row_number() OVER (ORDER BY m, b) - 1 AS r
                  FROM means),
       ci AS (SELECT round(min(m), 2) AS ci_lo, round(max(m), 2) AS ci_hi
              FROM ranked WHERE r IN (5, 194)),
       pt AS (SELECT CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                  AS pm FROM d)
       SELECT (SELECT CAST(n AS BIGINT) FROM n) AS n,
              CAST(200 AS INT) AS n_boot,
              round(pt.pm, 2) AS point_mean, ci.ci_lo, ci.ci_hi
       FROM ci, pt""",
    doc="deterministic bootstrap 95% CI for MEAN DAILY REVENUE: "
    "replicate b's j-th draw is md5('42-b-j')-uniform — no RNG, no "
    "layout dependence, every draw a pure function of (seed,b,j); "
    "replicate means use EXACT decimal sums (one double division at "
    "the end) so all 200 order statistics are engine-identical and "
    "the oracle replays the ENTIRE resampling experiment; bootstrap "
    "runs on the broadcast daily AGGREGATE (the fact table never "
    "participates) (operators/profile.py::bootstrap_ci_mean)",
)
def q_bootstrap_ci_daily_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.profile import bootstrap_ci_mean

    d = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias(
                "revenue"
            )
        )
    )
    return bootstrap_ci_mean(d, "day", "revenue", n_boot=200, alpha=0.05)


@_register(
    "seasonal_naive_backtest_revenue",
    r"""WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
                         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                              AS DOUBLE) AS y
                  FROM orders GROUP BY 1),
       f AS (SELECT day, y, lag(y, 7) OVER (ORDER BY day) AS fc FROM d)
       SELECT strftime(day, '%Y-%m') AS month,
              CAST(count(*) AS BIGINT) AS n_days,
              round(avg(CASE WHEN y <> 0
                        THEN abs(y - fc) / y END), 4) AS mape,
              round(avg(CASE WHEN y + fc <> 0
                        THEN 2.0 * abs(y - fc) / (y + fc) END), 4)
                  AS smape
       FROM f WHERE fc IS NOT NULL GROUP BY month""",
    doc="seasonal-naive (lag-7) forecast backtest over daily revenue: "
    "per-month MAPE/SMAPE — the baseline any forecaster must beat; "
    "exact-decimal daily sums cast once to double, one lag window "
    "over the aggregate series, one month-keyed agg "
    "(operators/profile.py::seasonal_naive_backtest)",
)
def q_seasonal_naive_backtest_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.profile import seasonal_naive_backtest

    d = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias(
                "revenue"
            )
        )
    )
    return seasonal_naive_backtest(d, "day", "revenue", season=7)


@_register(
    "dup_ngram_char_fraction_docs",
    r"""WITH t AS (SELECT doc_id,
                         list_filter(string_split_regex(trim(text),
                                     '\s+'), x -> x <> '') AS toks
                  FROM documents),
       g AS (SELECT doc_id,
                    toks[i] || ' ' || toks[i+1] AS gram
             FROM t, UNNEST(generate_series(1,
                      greatest(len(toks) - 1, 0))) AS u(i)),
       pg AS (SELECT doc_id, gram, count(*) AS cnt
              FROM g GROUP BY doc_id, gram),
       pd AS (SELECT doc_id,
                     sum(cnt * length(gram)) AS tot,
                     sum(CASE WHEN cnt > 1 THEN cnt * length(gram)
                              ELSE 0 END) AS dup
              FROM pg GROUP BY doc_id)
       SELECT d.doc_id,
              coalesce(((20000 * pd.dup + pd.tot) // (2 * pd.tot))
                       / 10000.0, 0.0) AS dup_char_frac,
              coalesce(((20000 * pd.dup + pd.tot) // (2 * pd.tot))
                       / 10000.0 > 0.1, FALSE) AS is_repetitive
       FROM documents d LEFT JOIN pd USING (doc_id)""",
    doc="Gopher's duplicate-n-gram CHARACTER-fraction rule (the rep "
    "signal unigram stats miss): share of bigram characters inside "
    "bigrams repeated within the document (n=2 / flag 0.1 on this "
    "short-doc corpus; Gopher's 2..4-gram tiers are the n parameter), "
    "flag on the ROUNDED fraction; per-row JVM gram arrays, one "
    "(doc,gram) + one per-doc agg "
    "(operators/textstats.py::dup_ngram_char_fraction)",
)
def q_dup_ngram_char_fraction_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.textstats import dup_ngram_char_fraction

    return dup_ngram_char_fraction(
        _t(spark, sf_dir, "documents"), n=2, flag_threshold=0.1
    )


@_register(
    "prefix_ndcg_eval",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
       q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
       sc AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                     round(list_dot_product(e.v, q.qv)
                           / (sqrt(list_dot_product(e.v, e.v))
                              * sqrt(list_dot_product(q.qv, q.qv))), 4)
                         AS cf,
                     round(list_dot_product(e.v[1:16], q.qv[1:16])
                           / (sqrt(list_dot_product(e.v[1:16],
                                                    e.v[1:16]))
                              * sqrt(list_dot_product(q.qv[1:16],
                                                      q.qv[1:16]))), 4)
                         AS cp
              FROM e, q WHERE e.vec_id <> q.query_id),
       r AS (SELECT query_id,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY cf DESC, neighbor_id)
                        AS rf,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY cp DESC, neighbor_id)
                        AS rp
             FROM sc)
       SELECT query_id,
              round(sum(CASE WHEN rp <= 10 AND rf <= 10
                             THEN 1.0 / log2(rp + 1) ELSE 0.0 END)
                    / 4.543559338088346, 4) AS ndcg_at_k
       FROM r GROUP BY query_id""",
    doc="NDCG@10 of the 16-dim-prefix ranking vs the full 64-dim "
    "ranking — the position-aware companion to "
    "truncated_dim_topk_overlap (recall counts hits, NDCG penalizes "
    "burying them); IDCG is the embedded constant Σ 1/log2(p+1) so "
    "both engines normalize identically; rankings cut on (rounded "
    "cosine, id) (operators/similarity.py::prefix_ndcg)",
)
def q_prefix_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import prefix_ndcg

    return prefix_ndcg(_t(spark, sf_dir, "embeddings"))


@_register(
    "rrf_fused_topk",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
       q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
       sc AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                     round(list_dot_product(e.v, q.qv)
                           / (sqrt(list_dot_product(e.v, e.v))
                              * sqrt(list_dot_product(q.qv, q.qv))), 4)
                         AS cf,
                     round(list_dot_product(e.v[1:16], q.qv[1:16])
                           / (sqrt(list_dot_product(e.v[1:16],
                                                    e.v[1:16]))
                              * sqrt(list_dot_product(q.qv[1:16],
                                                      q.qv[1:16]))), 4)
                         AS cp
              FROM e, q WHERE e.vec_id <> q.query_id),
       r AS (SELECT query_id, neighbor_id,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY cf DESC, neighbor_id)
                        AS rf,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY cp DESC, neighbor_id)
                        AS rp
             FROM sc),
       f AS (SELECT query_id, neighbor_id,
                    1.0 / (60 + rf) + 1.0 / (60 + rp) AS s
             FROM r),
       rk AS (SELECT query_id, neighbor_id, s,
                     CAST(row_number() OVER (PARTITION BY query_id
                                             ORDER BY s DESC,
                                                      neighbor_id)
                          AS INT) AS fused_rank
              FROM f)
       SELECT query_id, fused_rank, neighbor_id,
              round(s, 6) AS rrf_score
       FROM rk WHERE fused_rank <= 5""",
    doc="reciprocal-rank fusion of the exact full-dim ranking and the "
    "cheap 16-dim-prefix ranking (Cormack 2009; k=60) — calibration-"
    "free retriever combination; each RRF term is one IEEE division "
    "of exact integers so scores are engine-exact and the fused "
    "top-k cut needs no rounding "
    "(operators/similarity.py::rrf_fuse_rankings)",
)
def q_rrf_fused_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import rrf_fuse_rankings

    return rrf_fuse_rankings(_t(spark, sf_dir, "embeddings"))


@_register(
    "mann_whitney_value_click_purchase",
    """WITH p AS (SELECT (event_type = 'click') AS ia, value AS v
                 FROM events
                 WHERE event_type IN ('click', 'purchase')
                   AND value IS NOT NULL),
       pv AS (SELECT v, sum(CASE WHEN ia THEN 1 ELSE 0 END) AS ca,
                     count(*) AS ct
              FROM p GROUP BY v),
       c AS (SELECT ca, ct,
                    sum(ct) OVER (ORDER BY v) - ct + (ct + 1) / 2.0
                        AS mr
             FROM pv),
       a AS (SELECT CAST(sum(ca * mr) AS DOUBLE) AS r_a,
                    CAST(sum(ca) AS BIGINT) AS n_a,
                    CAST(sum(ct - ca) AS BIGINT) AS n_b,
                    CAST(sum(ct*ct*ct - ct) AS BIGINT) AS tie_sum
             FROM c),
       av AS (SELECT *, n_a * n_b / 12.0
                        * (n_a + n_b + 1
                           - tie_sum / ((n_a + n_b)
                                        * (n_a + n_b - 1))) AS var
              FROM a),
       zc AS (SELECT n_a, n_b,
                     r_a - n_a * (n_a + 1) / 2.0 AS u_a,
                     round(CASE WHEN var > 0 THEN
                           ((r_a - n_a * (n_a + 1) / 2.0)
                            - n_a * n_b / 2.0) / sqrt(var) END,
                           4) AS z
              FROM av),
       pp AS (SELECT *, abs(z) AS az,
                     1.0 / (1.0 + 0.2316419 * abs(z)) AS t
              FROM zc)
       SELECT n_a, n_b, u_a,
              CAST(n_a * n_b AS DOUBLE) - u_a AS u_b, z,
              round(2.0 * (exp(-0.5 * az * az)
                           / sqrt(2.0 * 3.141592653589793))
                    * (t * (0.319381530
                            + t * (-0.356563782
                                   + t * (1.781477937
                                          + t * (-1.821255978
                                                 + t * 1.330274429))))),
                    4) AS p_two_sided
       FROM pp""",
    doc="Mann-Whitney U rank-sum test (click vs purchase event values) "
    "WITHOUT row-ranking: the pooled sample reduces to per-DISTINCT-"
    "VALUE counts, midranks come from a prefix sum over that "
    "aggregate, and R1 = Σ cnt_a·midrank is exact halves (< 2^52) — "
    "engine-exact U statistics; tie-corrected z and the A&S-polynomial "
    "normal p are the only libm steps, rounded to 4 "
    "(operators/profile.py::mann_whitney_u)",
)
def q_mann_whitney_value_click_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.profile import mann_whitney_u

    return mann_whitney_u(
        _t(spark, sf_dir, "events"), "value", "event_type",
        "click", "purchase",
    )


@_register(
    "theil_sen_daily_revenue",
    r"""WITH d AS (SELECT CAST(o_orderdate AS DATE) - DATE '1970-01-01'
                        AS x,
                      CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                           AS DOUBLE) AS y
               FROM orders GROUP BY CAST(o_orderdate AS DATE)),
       pr AS (SELECT a.x AS xa, b.x AS xb,
                     (b.y - a.y) / (b.x - a.x) AS s
              FROM d a JOIN d b ON a.x < b.x),
       n AS (SELECT count(*) AS np FROM pr),
       rk AS (SELECT s, row_number() OVER (ORDER BY s, xa, xb) - 1 AS r
              FROM pr)
       SELECT (SELECT CAST(count(*) AS BIGINT) FROM d) AS n_points,
              (SELECT CAST(np AS BIGINT) FROM n) AS n_pairs,
              round(s, 6) AS slope
       FROM rk, n WHERE r = (np - 1) // 2""",
    doc="Theil-Sen robust trend of daily revenue: median of all "
    "pairwise slopes over the calendar-BOUNDED daily aggregate (n² of "
    "~2,400 days ≈ 2.9M slim pairs at any SF — quadratic in days, "
    "never in facts); every slope is one IEEE division of exact "
    "inputs and the median is a (slope, i, j) order statistic — "
    "engine-exact selection, rounded output "
    "(operators/profile.py::theil_sen_slope)",
)
def q_theil_sen_daily_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.profile import theil_sen_slope

    d = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("y")
        )
        .select(
            F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
            .alias("x"),
            "y",
        )
    )
    return theil_sen_slope(d, "x", "y")


@_register(
    "trimmed_mean_value_by_type",
    """WITH r AS (SELECT event_type, value,
                        row_number() OVER (PARTITION BY event_type
                                           ORDER BY value) AS rn,
                        count(*) OVER (PARTITION BY event_type) AS n
                 FROM events WHERE value IS NOT NULL)
       SELECT event_type,
              round(avg(value), 4) AS trimmed_mean,
              CAST(min(n) AS BIGINT) AS n
       FROM r
       WHERE rn > floor(n * 0.1) AND rn <= n - floor(n * 0.1)
       GROUP BY event_type""",
    doc="exact 10% trimmed mean per event type via a GROUPED-AGG "
    "pandas UDF (Series→scalar — completes the Arrow UDF family "
    "alongside the scalar/grouped-map/co-grouped/UDTF surfaces); the "
    "trim count floor(n*0.1) uses the same float product both "
    "engines compute, so the surviving multiset is engine-identical "
    "and only the final mean's summation order differs (round 4) "
    "(operators/profile.py::trimmed_mean_by_group)",
)
def q_trimmed_mean_value_by_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.profile import trimmed_mean_by_group

    return trimmed_mean_by_group(
        _t(spark, sf_dir, "events"), "event_type", "value"
    )


@_register(
    "link_prediction_copurchase",
    """WITH e AS (
         SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
                         greatest(a.l_partkey, b.l_partkey) AS v
         FROM lineitem a
         JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                        AND a.l_partkey <> b.l_partkey
         WHERE a.l_orderkey < 2000 AND b.l_orderkey < 2000),
       adj AS (SELECT u AS n, v AS nbr FROM e
               UNION ALL SELECT v AS n, u AS nbr FROM e),
       deg AS (SELECT n, count(*) AS deg FROM adj GROUP BY n),
       cand AS (SELECT a.nbr AS x, b.nbr AS y, count(*) AS common
                FROM adj a JOIN adj b
                  ON a.n = b.n AND a.nbr < b.nbr
                GROUP BY a.nbr, b.nbr),
       nonadj AS (SELECT c.x, c.y, c.common FROM cand c
                  LEFT JOIN e ON e.u = c.x AND e.v = c.y
                  WHERE e.u IS NULL)
       SELECT x AS part_a, y AS part_b,
              CAST(common AS BIGINT) AS common,
              round(common
                    / CAST(dx.deg + dy.deg - common AS DOUBLE), 4)
                  AS jaccard
       FROM nonadj
       JOIN deg dx ON dx.n = x
       JOIN deg dy ON dy.n = y
       ORDER BY common DESC, x, y LIMIT 20""",
    doc="common-neighbor link prediction on the co-purchase graph "
    "(bounded order slice, same subgraph as bfs_copurchase_hops): "
    "top non-adjacent part pairs by shared neighbors + neighborhood "
    "Jaccard — the 'also bought' candidate generator; integer "
    "ranking, engine-exact cut. The operator's max_degree guard "
    "drops hub nodes before the wedge join (degree² fanout — the "
    "graph analog of the hot-shingle cap) "
    "(operators/graph.py::common_neighbors_link_prediction)",
)
def q_link_prediction_copurchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.graph import (
        common_neighbors_link_prediction,
        copurchase_edges,
    )

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    return common_neighbors_link_prediction(copurchase_edges(li))


@_register(
    "dp_noisy_priority_counts",
    """WITH c AS (SELECT o_orderpriority, count(*) AS n
                 FROM orders GROUP BY o_orderpriority),
       u AS (SELECT o_orderpriority, n,
                    (CAST(CAST('0x' || substr(md5('42-'
                          || o_orderpriority), 1, 12) AS BIGINT)
                          AS DOUBLE) + 0.5) / 281474976710656.0 AS uu
             FROM c)
       SELECT o_orderpriority,
              round(n + (-1.0) * sign(uu - 0.5)
                        * ln(1.0 - 2.0 * abs(uu - 0.5)), 4)
                  AS noisy_count,
              CAST(1.0 AS DOUBLE) AS epsilon
       FROM u""",
    doc="Laplace-mechanism noisy group counts (sensitivity-1 COUNT "
    "GROUP BY at eps=1): inverse-CDF noise from an md5 uniform in "
    "(0,1) — SEEDED noise verifies the mechanism cross-engine but "
    "provides NO privacy (docs say so loudly); production swaps the "
    "uniform for a secure RNG draw. Map-only noise over the group "
    "aggregate — DP overhead is per-GROUP constant "
    "(operators/dq.py::dp_noisy_group_counts)",
)
def q_dp_noisy_priority_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.dq import dp_noisy_group_counts

    return dp_noisy_group_counts(
        _t(spark, sf_dir, "orders"), "o_orderpriority", epsilon=1.0
    )


@_register(
    "wilson_ci_conversion_by_type",
    """WITH a AS (SELECT event_type,
                        sum(CASE WHEN value > 100.0 THEN 1 ELSE 0 END)
                            AS k,
                        count(*) AS n
                 FROM events GROUP BY event_type)
       SELECT event_type,
              CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
              round(k / CAST(n AS DOUBLE), 4) AS rate,
              round((k / CAST(n AS DOUBLE)
                     + 1.959963984540054 * 1.959963984540054 / (2.0 * n)
                     - 1.959963984540054
                       * sqrt((k / CAST(n AS DOUBLE))
                              * (1.0 - k / CAST(n AS DOUBLE)) / n
                              + 1.959963984540054 * 1.959963984540054
                                / (4.0 * n * n)))
                    / (1.0 + 1.959963984540054
                             * 1.959963984540054 / n), 4) AS ci_lo,
              round((k / CAST(n AS DOUBLE)
                     + 1.959963984540054 * 1.959963984540054 / (2.0 * n)
                     + 1.959963984540054
                       * sqrt((k / CAST(n AS DOUBLE))
                              * (1.0 - k / CAST(n AS DOUBLE)) / n
                              + 1.959963984540054 * 1.959963984540054
                                / (4.0 * n * n)))
                    / (1.0 + 1.959963984540054
                             * 1.959963984540054 / n), 4) AS ci_hi
       FROM a""",
    doc="Wilson score interval for per-type conversion rate (value > "
    "100 as the success predicate) — the A/B readout that behaves at "
    "small n and extreme rates where Wald doesn't; the 95% z is an "
    "embedded literal so both engines run the identical closed form "
    "(sqrt is the only libm step) "
    "(operators/profile.py::wilson_ci_proportion)",
)
def q_wilson_ci_conversion_by_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.profile import wilson_ci_proportion

    return wilson_ci_proportion(
        _t(spark, sf_dir, "events"), "event_type", F.col("value") > 100.0
    )


@_register(
    "cuped_order_value_by_segment",
    """WITH y AS (SELECT o_custkey AS ck, sum(o_totalprice) AS yv
                 FROM orders WHERE year(o_orderdate) = 1996
                 GROUP BY o_custkey),
       x AS (SELECT o_custkey AS ck, sum(o_totalprice) AS xv
             FROM orders WHERE year(o_orderdate) = 1995
             GROUP BY o_custkey),
       m AS (SELECT c.c_mktsegment, y.yv AS yy,
                    coalesce(x.xv, 0.0) AS xx
             FROM y JOIN customer c ON c.c_custkey = y.ck
             LEFT JOIN x ON x.ck = y.ck),
       mo AS (SELECT covar_pop(xx, yy) / var_pop(xx) AS th,
                     avg(xx) AS xb, var_pop(yy) AS vy
              FROM m),
       a AS (SELECT m.c_mktsegment, m.yy,
                    m.yy - mo.th * (m.xx - mo.xb) AS ya, mo.vy
             FROM m, mo),
       r AS (SELECT round(1.0 - var_pop(ya) / min(vy), 6)
                 AS var_reduction FROM a)
       SELECT a.c_mktsegment, CAST(count(*) AS BIGINT) AS n,
              round(avg(a.yy), 4) AS mean_raw,
              round(avg(a.ya), 4) AS mean_adjusted,
              r.var_reduction
       FROM a, r GROUP BY a.c_mktsegment, r.var_reduction""",
    doc="CUPED variance reduction (Deng 2013) on per-customer 1996 "
    "order value with 1995 spend as the pre-period covariate: "
    "adjusted = y − θ(x−x̄), θ = cov/var over the joined population "
    "(missing history → x=0); per-segment raw vs adjusted means + the "
    "population variance-reduction share — the experimentation "
    "operator that shrinks A/B CIs for free; same covar_pop/var_pop "
    "algebra the grouped_ols oracle certifies, one key-partitioned "
    "join + one broadcast 1-row moment frame "
    "(operators/profile.py::cuped_adjustment)",
)
def q_cuped_order_value_by_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.profile import cuped_adjustment

    o = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    y = (
        o.filter(F.year("o_orderdate") == 1996)
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.sum("o_totalprice").alias("y"))
        .join(F.broadcast(cust), "c_custkey")
    )
    x = (
        o.filter(F.year("o_orderdate") == 1995)
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.sum("o_totalprice").alias("x"))
    )
    return cuped_adjustment(
        y, x, "c_custkey", "c_mktsegment", y_col="y", x_col="x"
    )


@_register(
    "assortativity_copurchase",
    """WITH e AS (
         SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
                         greatest(a.l_partkey, b.l_partkey) AS v
         FROM lineitem a
         JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                        AND a.l_partkey <> b.l_partkey
         WHERE a.l_orderkey < 2000 AND b.l_orderkey < 2000),
       bo AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
       d AS (SELECT u, count(*) AS deg FROM bo GROUP BY u)
       SELECT CAST(count(DISTINCT bo.u) AS BIGINT) AS n_nodes,
              CAST(count(*) / 2 AS BIGINT) AS n_edges,
              round(corr(CAST(du.deg AS DOUBLE),
                         CAST(dv.deg AS DOUBLE)), 4) AS assortativity
       FROM bo
       JOIN d du ON du.u = bo.u
       JOIN d dv ON dv.u = bo.v""",
    doc="degree assortativity (Newman 2002) of the co-purchase graph "
    "(bounded slice): Pearson correlation of endpoint degrees over "
    "both edge directions — hub-to-hub vs hub-to-leaf wiring in one "
    "number; degree table broadcast onto the edge stream, one corr "
    "aggregate (operators/graph.py::degree_assortativity)",
)
def q_assortativity_copurchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.graph import copurchase_edges, degree_assortativity

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    return degree_assortativity(copurchase_edges(li))


@_register(
    "clustering_coef_copurchase",
    """WITH e0 AS (
         SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
                         greatest(a.l_partkey, b.l_partkey) AS v
         FROM lineitem a
         JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                        AND a.l_partkey <> b.l_partkey
         WHERE a.l_orderkey < 2000 AND b.l_orderkey < 2000),
       hubs AS (SELECT n FROM (
                  SELECT n, count(*) AS d FROM (
                    SELECT u AS n FROM e0
                    UNION ALL SELECT v AS n FROM e0) GROUP BY n)
                WHERE d > 40),
       e AS (SELECT u, v FROM e0
             WHERE u NOT IN (SELECT n FROM hubs)
               AND v NOT IN (SELECT n FROM hubs)),
       adj AS (SELECT u AS n, v AS nbr FROM e
               UNION ALL SELECT v AS n, u AS nbr FROM e),
       d AS (SELECT n, count(*) AS deg FROM adj GROUP BY n),
       tr AS (SELECT a.n, count(*) AS tri
              FROM adj a JOIN adj b
                ON a.n = b.n AND a.nbr < b.nbr
              JOIN e ON e.u = a.nbr AND e.v = b.nbr
              GROUP BY a.n),
       c AS (SELECT d.n AS node, d.deg AS degree,
                    coalesce(tr.tri, 0) AS triangles,
                    2.0 * coalesce(tr.tri, 0)
                        / (d.deg * (d.deg - 1)) AS cc
             FROM d LEFT JOIN tr ON tr.n = d.n
             WHERE d.deg >= 2)
       SELECT node, CAST(degree AS BIGINT) AS degree,
              CAST(triangles AS BIGINT) AS triangles,
              round(cc, 4) AS clustering_coef
       FROM c ORDER BY cc DESC, node LIMIT 20""",
    doc="local clustering coefficient per node on the co-purchase "
    "graph (bounded slice): cc = 2·tri/(deg·(deg−1)) — neighborhood "
    "clique-ness per vertex; wedge join semi-joined against the edge "
    "set, integer arithmetic until one exact-int IEEE division so the "
    "(cc DESC, node) cut is engine-exact; max_degree=40 hub guard "
    "bounds the degree² wedge fanout (hubs removed from the subgraph "
    "BEFORE the wedge, degrees recomputed self-consistently — the "
    "guard BINDS on this slice: max raw degree 54) "
    "(operators/graph.py::local_clustering_coefficient)",
)
def q_clustering_coef_copurchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.graph import (
        copurchase_edges,
        local_clustering_coefficient,
    )

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    return local_clustering_coefficient(
        copurchase_edges(li), max_degree=40
    )


@_register(
    "did_auto_segment_revenue",
    """WITH m AS (
         SELECT CASE
                  WHEN c.c_mktsegment = 'AUTOMOBILE'
                       AND year(o.o_orderdate) = 1996 THEN 'treat_post'
                  WHEN c.c_mktsegment = 'AUTOMOBILE' THEN 'treat_pre'
                  WHEN year(o.o_orderdate) = 1996 THEN 'ctrl_post'
                  ELSE 'ctrl_pre' END AS c,
                o.o_totalprice AS v
         FROM orders o
         JOIN customer c ON c.c_custkey = o.o_custkey
         WHERE year(o.o_orderdate) IN (1995, 1996))
       SELECT CAST(sum(CASE WHEN c='treat_pre' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_treat_pre,
              CAST(sum(CASE WHEN c='treat_post' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_treat_post,
              CAST(sum(CASE WHEN c='ctrl_pre' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_ctrl_pre,
              CAST(sum(CASE WHEN c='ctrl_post' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_ctrl_post,
              round(avg(CASE WHEN c='treat_pre' THEN v END), 4)
                  AS mean_treat_pre,
              round(avg(CASE WHEN c='treat_post' THEN v END), 4)
                  AS mean_treat_post,
              round(avg(CASE WHEN c='ctrl_pre' THEN v END), 4)
                  AS mean_ctrl_pre,
              round(avg(CASE WHEN c='ctrl_post' THEN v END), 4)
                  AS mean_ctrl_post,
              round((avg(CASE WHEN c='treat_post' THEN v END)
                     - avg(CASE WHEN c='treat_pre' THEN v END))
                    - (avg(CASE WHEN c='ctrl_post' THEN v END)
                       - avg(CASE WHEN c='ctrl_pre' THEN v END)), 4)
                  AS did_estimate
       FROM m""",
    doc="two-by-two difference-in-differences (AUTOMOBILE segment as "
    "treated, 1995→1996 as pre/post): four conditional cell means + "
    "the DiD estimate from the UNROUNDED means, rounded once — the "
    "natural-experiment causal readout; one conditional aggregate "
    "pass over the keyed join, no window "
    "(operators/profile.py::difference_in_differences)",
)
def q_did_auto_segment_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.profile import difference_in_differences

    o = _t(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").isin(1995, 1996)
    )
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    j = o.join(
        F.broadcast(cust),
        o.o_custkey == cust.c_custkey,
    )
    return difference_in_differences(
        j,
        F.col("c_mktsegment") == "AUTOMOBILE",
        F.year("o_orderdate") == 1996,
        "o_totalprice",
    )


@_register(
    "srm_check_customer_split",
    """WITH a AS (
         SELECT sum(CASE WHEN CAST('0x' || substr(md5('42-'
                        || CAST(c_custkey AS VARCHAR)), 9, 4) AS BIGINT)
                        < 32768 THEN 1 ELSE 0 END) AS n_a,
                sum(CASE WHEN CAST('0x' || substr(md5('42-'
                        || CAST(c_custkey AS VARCHAR)), 9, 4) AS BIGINT)
                        < 32768 THEN 0 ELSE 1 END) AS n_b
         FROM customer),
       c AS (SELECT CAST(n_a AS BIGINT) AS n_a,
                    CAST(n_b AS BIGINT) AS n_b,
                    round((n_a - (n_a + n_b) * 0.5)
                          * (n_a - (n_a + n_b) * 0.5)
                          / ((n_a + n_b) * 0.5)
                          + (n_b - (n_a + n_b) * 0.5)
                          * (n_b - (n_a + n_b) * 0.5)
                          / ((n_a + n_b) * 0.5), 4) AS chi2
             FROM a),
       p AS (SELECT *, sqrt(chi2) AS az,
                    1.0 / (1.0 + 0.2316419 * sqrt(chi2)) AS t
             FROM c)
       SELECT n_a, n_b, CAST(0.5 AS DOUBLE) AS expected_frac_a, chi2,
              round(2.0 * (exp(-0.5 * az * az)
                           / sqrt(2.0 * 3.141592653589793))
                    * (t * (0.319381530
                            + t * (-0.356563782
                                   + t * (1.781477937
                                          + t * (-1.821255978
                                                 + t * 1.330274429))))),
                    4) AS p_value,
              round(2.0 * (exp(-0.5 * az * az)
                           / sqrt(2.0 * 3.141592653589793))
                    * (t * (0.319381530
                            + t * (-0.356563782
                                   + t * (1.781477937
                                          + t * (-1.821255978
                                                 + t * 1.330274429))))),
                    4) < 0.001 AS srm_flag
       FROM p""",
    doc="sample-ratio-mismatch guardrail for the md5 deterministic "
    "50/50 traffic split (the same u16 splitter mixture_sample and "
    "the export CLI use): 1-dof chi-square of observed variant counts "
    "vs expectation, p via the A&S normal polynomial (p = 2(1−Φ(√χ²)) "
    "— neither engine ships a chi-square CDF), flag on the ROUNDED p "
    "at the 0.001 convention; exact-integer χ² before the libm steps "
    "(operators/profile.py::srm_check)",
)
def q_srm_check_customer_split(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.profile import srm_check

    return srm_check(_t(spark, sf_dir, "customer"), "c_custkey")


@_register(
    "hour_uniformity_bh_by_type",
    """WITH h AS (SELECT event_type, extract(hour FROM ts) AS hh,
                        count(*) AS c
                 FROM events GROUP BY event_type, hh),
       g AS (SELECT event_type, sum(c) AS n, sum(c * c) AS ss
             FROM h GROUP BY event_type),
       c2 AS (SELECT event_type,
                     24.0 * ss / n - n AS chi2 FROM g),
       z AS (SELECT event_type, chi2,
                    (cbrt(chi2 / 23.0) - (1.0 - 2.0 / (9.0 * 23.0)))
                      / sqrt(2.0 / (9.0 * 23.0)) AS zz
             FROM c2),
       pv AS (SELECT event_type, round(chi2, 4) AS chi2,
                     round(CASE WHEN zz >= 0
                           THEN 0.5 * (2.0 * (exp(-0.5 * abs(zz) * abs(zz))
                                / sqrt(2.0 * 3.141592653589793))
                                * ((1.0 / (1.0 + 0.2316419 * abs(zz)))
                                   * (0.319381530
                                      + (1.0 / (1.0 + 0.2316419 * abs(zz)))
                                        * (-0.356563782
                                           + (1.0 / (1.0 + 0.2316419
                                                     * abs(zz)))
                                             * (1.781477937
                                                + (1.0 / (1.0 + 0.2316419
                                                          * abs(zz)))
                                                  * (-1.821255978
                                                     + (1.0
                                                        / (1.0 + 0.2316419
                                                           * abs(zz)))
                                                       * 1.330274429))))))
                           ELSE 1.0 - 0.5
                                * (2.0 * (exp(-0.5 * abs(zz) * abs(zz))
                                / sqrt(2.0 * 3.141592653589793))
                                * ((1.0 / (1.0 + 0.2316419 * abs(zz)))
                                   * (0.319381530
                                      + (1.0 / (1.0 + 0.2316419 * abs(zz)))
                                        * (-0.356563782
                                           + (1.0 / (1.0 + 0.2316419
                                                     * abs(zz)))
                                             * (1.781477937
                                                + (1.0 / (1.0 + 0.2316419
                                                          * abs(zz)))
                                                  * (-1.821255978
                                                     + (1.0
                                                        / (1.0 + 0.2316419
                                                           * abs(zz)))
                                                       * 1.330274429))))))
                           END, 4) AS p_value
              FROM z),
       r AS (SELECT *, row_number() OVER (ORDER BY p_value, event_type)
                        AS rk,
                    count(*) OVER () AS m
             FROM pv),
       adj AS (SELECT *,
                      round(least(min(CAST(m AS DOUBLE) * p_value / rk)
                                  OVER (ORDER BY p_value DESC,
                                                 event_type DESC),
                                  1.0), 4) AS p_adj
               FROM r)
       SELECT event_type, chi2, p_value, p_adj,
              (p_adj < 0.05) AS rejected
       FROM adj""",
    doc="per-segment chi-square hour-of-day uniformity test with "
    "Benjamini-Hochberg FDR adjustment across the family — the "
    "multiple-testing discipline for one-test-per-segment metric "
    "platforms; exact-integer chi2 (closed form absorbs empty bins), "
    "Wilson-Hilferty cube-root z through the A&S normal polynomial "
    "(reflected for z<0), BH running min over the |segments|-row "
    "family frame (operators/profile.py::hour_uniformity_tests_bh)",
)
def q_hour_uniformity_bh_by_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.profile import hour_uniformity_tests_bh

    return hour_uniformity_tests_bh(
        _t(spark, sf_dir, "events"), "event_type"
    )


@_register(
    "qte_value_click_purchase",
    """WITH s AS (SELECT (event_type = 'click') AS ia, value AS v
                 FROM events
                 WHERE event_type IN ('click', 'purchase')
                   AND value IS NOT NULL),
       r AS (SELECT ia, v,
                    row_number() OVER (PARTITION BY ia ORDER BY v)
                        AS rk,
                    count(*) OVER (PARTITION BY ia) AS n
             FROM s),
       q AS (SELECT CAST(qq.i AS INT) AS q, r.ia, r.v
             FROM r, range(1, 10) qq(i)
             WHERE r.rk = CAST(ceil(qq.i * r.n / 10.0) AS BIGINT))
       SELECT a.q, a.v AS value_a, b.v AS value_b,
              round(a.v - b.v, 4) AS qte
       FROM q a JOIN q b ON a.q = b.q AND a.ia AND NOT b.ia""",
    doc="quantile treatment effect: per-decile difference between the "
    "click and purchase value distributions — the distributional A/B "
    "readout that surfaces tail-only effects means hide; deciles are "
    "EXACT lower order statistics (tie-invariant values, the "
    "median_exact discipline), so both sides' quantile values are "
    "raw-parquet-exact (operators/profile.py::quantile_treatment_effect)",
)
def q_qte_value_click_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.profile import quantile_treatment_effect

    return quantile_treatment_effect(
        _t(spark, sf_dir, "events"), "value", "event_type",
        "click", "purchase",
    )


# =====================================================================
# Sequential-testing guardrail: mixture SPRT (Johari et al. 2017)
# over the daily click-vs-purchase value aggregate — the always-valid
# companion to the Wilson/SRM tier: a per-day p-value that stays
# valid under DAILY PEEKING. Exact decimal cumulative sums; log Λ
# rounds to 6 BEFORE the running max so the extremum (and therefore
# the p sequence and reject flags) is engine-exact; p = exp of the
# already-rounded max, rounded to 4 (the mann_whitney discipline).
# Windows run over the |days|-row aggregate only.
# =====================================================================


@_register(
    "msprt_guardrail_click_purchase",
    """WITH s AS (SELECT CAST(ts AS DATE) AS day,
                        (event_type = 'click') AS ia,
                        CAST(value AS DECIMAL(18,2)) AS v
                 FROM events
                 WHERE event_type IN ('click', 'purchase')
                   AND value IS NOT NULL),
       d AS (SELECT day,
                    sum(CASE WHEN ia THEN 1 ELSE 0 END) AS na,
                    sum(CASE WHEN NOT ia THEN 1 ELSE 0 END) AS nb,
                    sum(CASE WHEN ia THEN v
                             ELSE CAST('0' AS DECIMAL(18,2)) END) AS sa,
                    sum(CASE WHEN NOT ia THEN v
                             ELSE CAST('0' AS DECIMAL(18,2)) END) AS sb
             FROM s GROUP BY 1),
       c AS (SELECT day,
                    sum(na) OVER w AS cna, sum(nb) OVER w AS cnb,
                    sum(sa) OVER w AS csa, sum(sb) OVER w AS csb
             FROM d
             WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING)),
       t AS (SELECT day, cna, cnb,
                    CAST(CAST(csa AS VARCHAR) AS DOUBLE) / cna
                    - CAST(CAST(csb AS VARCHAR) AS DOUBLE) / cnb
                        AS theta,
                    CAST(cna AS DOUBLE) * cnb / (cna + cnb) AS neff
             FROM c WHERE cna > 0 AND cnb > 0),
       l AS (SELECT day, cna, cnb, theta,
                    round(0.5 * ln(2500.0 / (2500.0 + neff * 25.0))
                          + 25.0 * neff * neff * theta * theta
                            / (2.0 * 2500.0
                               * (2500.0 + neff * 25.0)), 6)
                        AS log_lambda
             FROM t),
       m AS (SELECT *, max(log_lambda)
                        OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                        AS mx
             FROM l)
       SELECT day, CAST(cna AS BIGINT) AS n_a,
              CAST(cnb AS BIGINT) AS n_b,
              round(theta, 4) AS theta, log_lambda,
              round(least(1.0, exp(-mx)), 4) AS p_always_valid,
              (round(least(1.0, exp(-mx)), 4) <= 0.05) AS reject
       FROM m""",
    doc="mSPRT always-valid sequential test over daily click-vs-"
    "purchase values: cumulative exact-decimal sums -> theta and "
    "effective n per day, known-variance mixture log-likelihood "
    "ratio (sigma2=2500, tau2=25 as shared literals), running max of "
    "the ROUNDED log Lambda, always-valid p = exp(-max) capped at 1 "
    "- the peeking-proof guardrail the Wilson/SRM tier needs "
    "(operators/profile.py::msprt_sequential_readout)",
)
def q_msprt_guardrail_click_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.profile import msprt_sequential_readout

    return msprt_sequential_readout(
        _t(spark, sf_dir, "events"), "ts", "value", "event_type",
        "click", "purchase",
    )


# =====================================================================
# Isotonic calibration over score bins via the max-min (minimax)
# characterization — iso(i) = max_{j<=i} min_{k>=i} rate(j..k) — the
# join/aggregate formulation of pool-adjacent-violators (PAVA is
# sequential; the minimax form is order-free and engine-exact: every
# pooled rate is ONE IEEE division of exact cumulative integers).
# The B-row bin aggregate is the only thing the B^2 range frame and
# B^3 membership join ever touch; the fact table contributes one
# hash-aggregate pass.
# =====================================================================


@_register(
    "isotonic_calibration_value_purchase",
    """WITH f AS (SELECT least(19, CAST(floor(value / 25.0) AS INT))
                      AS bin,
                      (event_type = 'purchase') AS ispos
               FROM events
               WHERE value IS NOT NULL
                 AND value >= 0.0 AND value < 500.0),
       bins AS (SELECT bin, count(*) AS n,
                       sum(CASE WHEN ispos THEN 1 ELSE 0 END) AS npos
                FROM f GROUP BY 1),
       cum AS (SELECT bin, n, npos,
                      sum(n) OVER w AS cn, sum(npos) OVER w AS cp
               FROM bins
               WINDOW w AS (ORDER BY bin ROWS UNBOUNDED PRECEDING)),
       jj AS (SELECT bin AS j, cn - n AS cnj, cp - npos AS cpj
              FROM cum),
       kk AS (SELECT bin AS k, cn AS cnk, cp AS cpk FROM cum),
       r AS (SELECT jj.j, kk.k,
                    CAST(kk.cpk - jj.cpj AS DOUBLE)
                    / CAST(kk.cnk - jj.cnj AS DOUBLE) AS rate
             FROM jj JOIN kk ON jj.j <= kk.k),
       innermin AS (SELECT b.bin, b.n, b.npos, r.j,
                           min(r.rate) AS minr
                    FROM bins b
                    JOIN r ON r.j <= b.bin AND r.k >= b.bin
                    GROUP BY 1, 2, 3, 4),
       iso AS (SELECT bin, n, npos, max(minr) AS iso
               FROM innermin GROUP BY 1, 2, 3)
       SELECT bin, CAST(n AS BIGINT) AS n,
              round(CAST(npos AS DOUBLE) / n, 4) AS raw_rate,
              round(iso, 4) AS calibrated_rate
       FROM iso""",
    doc="isotonic calibration of the event-value 'score' against the "
    "purchase outcome over 20 fixed-width bins: minimax form of "
    "isotonic regression (max over j<=i of min over k>=i of the "
    "pooled j..k rate) — the calibration step a learned quality "
    "filter needs before thresholding scores as probabilities; all "
    "pooled rates are single IEEE divisions of exact cumulative "
    "integers, so the min/max lattice is engine-exact "
    "(operators/profile.py::isotonic_calibration_bins)",
)
def q_isotonic_calibration_value_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.profile import isotonic_calibration_bins

    ev = _t(spark, sf_dir, "events")
    return isotonic_calibration_bins(
        ev,
        "value",
        F.col("event_type") == F.lit("purchase"),
        n_bins=20,
        lo=0.0,
        hi=500.0,
    )


# =====================================================================
# Labeled-data QA tier (round 10): inter-filter agreement, score
# calibration error, experiment sizing, split-leakage audit,
# vocabulary coverage, class-balance reweighting — the operational
# readouts a training-data platform runs around its filters and
# splits. All closed-form over exact-integer / exact-decimal
# aggregates; libm steps (pow) follow the round-after discipline.
# =====================================================================


@_register(
    "cohens_kappa_filter_agreement",
    r"""WITH s AS (SELECT
         (len(list_filter(string_split_regex(trim(text), '\s+'),
              t -> t <> '')) >= 50) AS ra,
         (len(list_filter(string_split_regex(trim(text), '\s+'),
              t -> t IN ('the','a','of','and','to','in','is','it')))
          >= 4) AS rb
       FROM documents),
       c AS (SELECT ra, rb, count(*) AS n FROM s GROUP BY 1, 2),
       t AS (SELECT CAST(sum(n) AS BIGINT) AS n,
                    sum(CASE WHEN ra = rb THEN n ELSE 0 END) AS agree
             FROM c),
       rm AS (SELECT ra AS cat, sum(n) AS r FROM c GROUP BY 1),
       cm AS (SELECT rb AS cat, sum(n) AS cc FROM c GROUP BY 1),
       pe AS (SELECT sum(rm.r * cm.cc) AS pen
              FROM rm JOIN cm ON rm.cat = cm.cat),
       x AS (SELECT t.n,
                    CAST(agree AS DOUBLE) / t.n AS po,
                    CAST(pen AS DOUBLE)
                    / (CAST(t.n AS DOUBLE) * t.n) AS pex
             FROM t, pe)
       SELECT n, round(po, 4) AS p_observed,
              round(pex, 4) AS p_expected,
              round(CASE WHEN pex < 1.0
                         THEN (po - pex) / (1.0 - pex) END, 4)
                  AS kappa
       FROM x""",
    doc="Cohen's kappa between two document FILTERS (word-count rule "
    "vs stopword rule) — chance-corrected agreement, the labeled-"
    "data QA readout that says whether a second filter adds "
    "independent signal (kappa~0) or is redundant (kappa~1); exact "
    "integer contingency + marginals, two IEEE divisions "
    "(operators/profile.py::cohens_kappa)",
)
def q_cohens_kappa_filter_agreement(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.profile import cohens_kappa
    from ..operators.textstats import stopword_count
    from ..functions import word_tokens

    d = _t(spark, sf_dir, "documents").select(
        (
            F.size(F.filter(word_tokens("text"), lambda t: t != ""))
            >= 50
        ).alias("_ra"),
        (stopword_count("text") >= 4).alias("_rb"),
    )
    return cohens_kappa(d, "_ra", "_rb")


@_register(
    "ece_value_purchase",
    """WITH s AS (SELECT value / 500.0 AS score,
                        (event_type = 'purchase') AS pos
                 FROM events
                 WHERE value IS NOT NULL
                   AND value / 500.0 >= 0.0 AND value / 500.0 < 1.0),
       b AS (SELECT least(19, CAST(floor(score / 0.05) AS INT))
                        AS bin,
                    count(*) AS n,
                    sum(CASE WHEN pos THEN 1 ELSE 0 END) AS npos,
                    sum(CAST(score AS DECIMAL(18,6))) AS ssum
             FROM s GROUP BY 1),
       g AS (SELECT n, abs(CAST(npos AS DOUBLE) / n
                           - CAST(CAST(ssum AS VARCHAR) AS DOUBLE)
                             / n) AS gap
             FROM b)
       SELECT CAST(sum(n) AS BIGINT) AS n,
              CAST(count(*) AS INT) AS n_bins_used,
              round(sum(gap * n) / sum(n), 6) AS ece,
              round(max(gap), 6) AS mce
       FROM g""",
    doc="expected calibration error of the scaled event value as a "
    "purchase-probability score: per-bin |rate - mean score| "
    "weighted by bin mass (+ max-bin MCE) — the one-number "
    "calibration readout beside the isotonic fit; per-bin score "
    "sums are exact decimals (value/500 is 5-decimal-exact), "
    "converted once per bin (operators/profile.py::"
    "expected_calibration_error)",
)
def q_ece_value_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import expected_calibration_error

    ev = _t(spark, sf_dir, "events").select(
        (F.col("value") / F.lit(500.0)).alias("score"),
        "event_type",
    )
    return expected_calibration_error(
        ev,
        "score",
        F.col("event_type") == F.lit("purchase"),
        n_bins=20,
        lo=0.0,
        hi=1.0,
    )


@_register(
    "mde_by_event_type",
    """WITH d AS (SELECT event_type,
                        CAST(value AS DECIMAL(18,2)) AS v
                 FROM events WHERE value IS NOT NULL),
       a AS (SELECT event_type, count(*) AS n,
                    sum(v) AS s1,
                    sum(CAST(CAST(v AS DECIMAL(19,2))
                             * CAST(v AS DECIMAL(19,2))
                             AS DECIMAL(38,4))) AS s2
             FROM d GROUP BY 1),
       x AS (SELECT event_type, n,
                    CAST(CAST(s1 AS VARCHAR) AS DOUBLE) AS s1d,
                    CAST(CAST(s2 AS VARCHAR) AS DOUBLE) AS s2d
             FROM a),
       y AS (SELECT event_type, n, s1d / n AS mean,
                    greatest((s2d - s1d * s1d / n) / n, 0.0) AS var
             FROM x)
       SELECT event_type, CAST(n AS BIGINT) AS n,
              round(mean, 4) AS mean,
              round(sqrt(var), 4) AS sd,
              round(2.8016 * sqrt(4.0 * var / n), 4) AS mde_abs,
              round(CASE WHEN mean <> 0 THEN
                    2.8016 * sqrt(4.0 * var / n) / mean END, 6)
                  AS mde_rel
       FROM y""",
    doc="minimum detectable effect per event-type segment: "
    "MDE = (z_0.975 + z_0.8)*sqrt(4 sigma^2 / n) for an even two-arm "
    "split — the test-sizing readout; variance from EXACT decimal "
    "sums (sum v, sum v^2) converted once each, so the closed form "
    "is engine-identical; quantile sum 2.8016 is a shared literal "
    "(operators/profile.py::mde_readout)",
)
def q_mde_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import mde_readout

    # 1.96 + 0.8416 sums to exactly the double the SQL literal 2.8016
    # parses to (verified) — both engines share one constant
    return mde_readout(
        _t(spark, sf_dir, "events"), "event_type", "value",
        z_alpha=1.96, z_power=0.8416,
    )


@_register(
    "split_leakage_orders",
    """WITH s AS (SELECT o_custkey AS e,
                   CASE WHEN strpos('0123456789abcdef',
                             substr(md5('42-' ||
                                   CAST(o_orderkey AS VARCHAR)),
                                    8, 1)) - 1 = 0
                        THEN 'eval' ELSE 'train' END AS sp
                 FROM orders),
       es AS (SELECT DISTINCT e, sp FROM s),
       pe AS (SELECT e,
                     array_to_string(list_sort(list(sp)), '+')
                         AS splits,
                     count(*) AS k
              FROM es GROUP BY e)
       SELECT splits, CAST(count(*) AS BIGINT) AS n_entities,
              bool_or(k > 1) AS leaked
       FROM pe GROUP BY splits ORDER BY splits""",
    doc="entity-level split-leakage audit: orders hash-split at ROW "
    "level (md5 of o_orderkey, 1/16 eval — the classic mistake), "
    "entities = customers; reports per split-membership pattern how "
    "many customers land train-only / eval-only / BOTH (leaked) — "
    "the check that catches eval measuring memorization; md5 16-way "
    "assignment equals the 8th hex digit, engine-exact "
    "(operators/shard.py::split_leakage_report)",
)
def q_split_leakage_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.shard import split_leakage_report

    o = _t(spark, sf_dir, "orders")
    key = F.md5(
        F.concat(F.lit("42-"), F.col("o_orderkey").cast("string"))
    )
    shard = F.conv(F.substring(key, 1, 8), 16, 10).cast("long") % 16
    split = F.when(shard == 0, F.lit("eval")).otherwise(F.lit("train"))
    return split_leakage_report(o, "o_custkey", split)


@_register(
    "token_coverage_curve",
    r"""WITH f AS (SELECT token, count(*) AS c
                  FROM (SELECT unnest(string_split_regex(trim(text),
                                      '\s+')) AS token
                        FROM documents)
                  WHERE token <> '' GROUP BY 1),
       r AS (SELECT row_number() OVER (ORDER BY c DESC, token) AS r,
                    sum(c) OVER (ORDER BY c DESC, token
                                 ROWS UNBOUNDED PRECEDING) AS cum,
                    sum(c) OVER () AS tot,
                    count(*) OVER () AS nv
             FROM f)
       SELECT CAST(r AS INT) AS k, CAST(nv AS BIGINT)
                  AS distinct_tokens,
              round(CAST(cum AS DOUBLE) / tot, 6) AS coverage
       FROM r WHERE r IN (5, 10, 20, 30, 100, 1000) ORDER BY k""",
    doc="vocabulary coverage curve: token-mass fraction covered by "
    "the top-K tokens for K in (5,10,20,30,100,1000) — the tokenizer-"
    "vocab sizing readout (coverage@K ~ 1 - OOV under a top-K "
    "vocab); (count DESC, token) ranking is exact-integer with "
    "deterministic tie-break (operators/textstats.py::"
    "token_coverage_curve)",
)
def q_token_coverage_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.textstats import token_coverage_curve

    return token_coverage_curve(_t(spark, sf_dir, "documents"))


@_register(
    "class_balanced_weights_orderstatus",
    """WITH c AS (SELECT o_orderstatus, count(*) AS n
                 FROM orders GROUP BY 1),
       w AS (SELECT o_orderstatus, n,
                    (1.0 - 0.999)
                    / (1.0 - pow(0.999, CAST(n AS DOUBLE))) AS wr
             FROM c),
       run AS (SELECT sum(wr * n) OVER wf AS z,
                      sum(n) OVER wf AS tot,
                      row_number() OVER (ORDER BY o_orderstatus DESC)
                          AS rev
               FROM w
               WINDOW wf AS (ORDER BY o_orderstatus
                             ROWS UNBOUNDED PRECEDING)),
       z AS (SELECT z, tot FROM run WHERE rev = 1)
       SELECT w.o_orderstatus, CAST(w.n AS BIGINT) AS n,
              round(w.wr * CAST(z.tot AS DOUBLE) / z.z, 6) AS weight
       FROM w, z""",
    doc="class-balanced loss weights from the effective number of "
    "samples (Cui et al. 2019) over the skewed order-status label "
    "(P is ~2%): w ~ (1-beta)/(1-beta^n), normalized so "
    "sum(w*n) = N; pow is the single libm step on exact integer n, "
    "rounded at 6 (operators/curation.py::class_balanced_weights)",
)
def q_class_balanced_weights_orderstatus(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.curation import class_balanced_weights

    return class_balanced_weights(
        _t(spark, sf_dir, "orders"), "o_orderstatus", beta=0.999
    )


@_register(
    "l_diversity_audit_customers",
    """SELECT c_nationkey, c_mktsegment,
              CAST(count(*) AS BIGINT) AS class_size,
              CAST(count(DISTINCT (c_acctbal < 0)) AS BIGINT)
                  AS n_sensitive_values
       FROM customer GROUP BY 1, 2
       HAVING count(DISTINCT (c_acctbal < 0)) < 2""",
    doc="l-diversity audit over (nation, segment) quasi-identifiers "
    "with account-balance sign as the sensitive attribute: classes "
    "whose members all share one sensitive value — the homogeneity "
    "leak k-anonymity cannot see (Machanavajjhala et al. 2007); one "
    "exact distinct-count aggregate "
    "(operators/dq.py::l_diversity_audit)",
)
def q_l_diversity_audit_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.dq import l_diversity_audit

    c = _t(spark, sf_dir, "customer").withColumn(
        "_neg", F.col("c_acctbal") < 0
    )
    return l_diversity_audit(
        c, ["c_nationkey", "c_mktsegment"], "_neg", l=2
    )


@_register(
    "source_overlap_jaccard_docs",
    r"""WITH t AS (SELECT doc_id, source,
                         string_split_regex(trim(text), '\s+') AS toks
                  FROM documents),
       sh AS (SELECT DISTINCT source,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                         AS shingle
              FROM t, UNNEST(generate_series(1,
                       greatest(len(toks) - 2, 0))) AS u(i)),
       per AS (SELECT source, count(*) AS n FROM sh GROUP BY 1),
       inter AS (SELECT a.source AS source_a, b.source AS source_b,
                        count(*) AS n_common
                 FROM sh a JOIN sh b ON a.shingle = b.shingle
                                    AND a.source < b.source
                 GROUP BY 1, 2)
       SELECT i.source_a, i.source_b,
              CAST(pa.n AS BIGINT) AS n_a,
              CAST(pb.n AS BIGINT) AS n_b,
              CAST(i.n_common AS BIGINT) AS n_common,
              round(CAST(i.n_common AS DOUBLE)
                    / (pa.n + pb.n - i.n_common), 6) AS jaccard
       FROM inter i
       JOIN per pa ON pa.source = i.source_a
       JOIN per pb ON pb.source = i.source_b
       ORDER BY jaccard DESC, source_a, source_b""",
    doc="cross-source 3-gram shingle overlap: Jaccard of every source "
    "pair's distinct shingle sets — the corpus-governance readout "
    "that finds feed-level mirrors before per-document dedup; "
    "shingle-keyed self-join fans out by SOURCE count (bounded), "
    "never corpus size; exact-integer jaccard "
    "(operators/dedup.py::source_overlap_jaccard)",
)
def q_source_overlap_jaccard_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.dedup import source_overlap_jaccard

    return source_overlap_jaccard(_t(spark, sf_dir, "documents"))


@_register(
    "energy_distance_click_purchase",
    """WITH p AS (SELECT (event_type = 'click') AS ia,
                        CAST(value AS DECIMAL(18,2)) AS v
                 FROM events
                 WHERE event_type IN ('click', 'purchase')
                   AND value IS NOT NULL),
       pv AS (SELECT v,
                     CAST(sum(CASE WHEN ia THEN 1 ELSE 0 END)
                          AS BIGINT) AS a,
                     CAST(sum(CASE WHEN NOT ia THEN 1 ELSE 0 END)
                          AS BIGINT) AS b
              FROM p GROUP BY v),
       pre AS (SELECT v, a, b,
                      coalesce(sum(a) OVER w, 0) AS ca,
                      coalesce(sum(b) OVER w, 0) AS cb,
                      coalesce(sum(CAST(v * a AS DECIMAL(38,2)))
                               OVER w,
                               CAST('0' AS DECIMAL(38,2))) AS sa,
                      coalesce(sum(CAST(v * b AS DECIMAL(38,2)))
                               OVER w,
                               CAST('0' AS DECIMAL(38,2))) AS sb
               FROM pv
               WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED
                            PRECEDING AND 1 PRECEDING)),
       ag AS (SELECT CAST(sum(a) AS BIGINT) AS n_a,
                     CAST(sum(b) AS BIGINT) AS n_b,
                     sum(CAST(CAST(b AS DECIMAL(18,0))
                              * CAST(v*ca - sa AS DECIMAL(19,2))
                              AS DECIMAL(38,2))
                         + CAST(CAST(a AS DECIMAL(18,0))
                                * CAST(v*cb - sb AS DECIMAL(19,2))
                                AS DECIMAL(38,2))) AS sxy,
                     sum(CAST(CAST(a AS DECIMAL(18,0))
                              * CAST(v*ca - sa AS DECIMAL(19,2))
                              AS DECIMAL(38,2))) AS sxx,
                     sum(CAST(CAST(b AS DECIMAL(18,0))
                              * CAST(v*cb - sb AS DECIMAL(19,2))
                              AS DECIMAL(38,2))) AS syy
              FROM pre),
       x AS (SELECT n_a, n_b,
                    CASE WHEN n_a > 0 AND n_b > 0 THEN
                      CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
                      / (CAST(n_a AS DOUBLE) * n_b) END AS e_xy,
                    CASE WHEN n_a > 0 AND n_b > 0 THEN
                      2.0 * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
                      / (CAST(n_a AS DOUBLE) * n_a) END AS e_xx,
                    CASE WHEN n_a > 0 AND n_b > 0 THEN
                      2.0 * CAST(CAST(syy AS VARCHAR) AS DOUBLE)
                      / (CAST(n_b AS DOUBLE) * n_b) END AS e_yy
             FROM ag)
       SELECT n_a, n_b,
              round(e_xy, 6) AS e_xy,
              round(e_xx, 6) AS e_xx,
              round(e_yy, 6) AS e_yy,
              round(CASE WHEN n_a > 0 AND n_b > 0 THEN
                    sqrt(greatest(2.0 * e_xy - e_xx - e_yy, 0.0))
                    END, 6) AS energy_distance
       FROM x""",
    doc="exact two-sample energy distance (Szekely-Rizzo) between "
    "click and purchase value distributions — the whole-distribution "
    "drift statistic KS's sup-gap misses in tails; mean pairwise "
    "|x-y| via the sorted-prefix identity over the per-distinct-"
    "value aggregate, ALL in exact decimal arithmetic (no float "
    "summation anywhere), three final IEEE divisions "
    "(operators/profile.py::energy_distance_two_sample)",
)
def q_energy_distance_click_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.profile import energy_distance_two_sample

    return energy_distance_two_sample(
        _t(spark, sf_dir, "events"), "value", "event_type",
        "click", "purchase",
    )


@_register(
    "embedding_dim_moments_docs",
    """WITH d AS (SELECT CAST(u.i - 1 AS INT) AS dim,
                        CAST(e.embedding[u.i] AS DOUBLE) AS xd
                 FROM embeddings e,
                      UNNEST(generate_series(1, len(e.embedding)))
                          AS u(i)),
       a AS (SELECT dim, count(*) AS n,
                    sum(CAST(xd AS DECIMAL(13,10))) AS s1,
                    sum(CAST(CAST(xd AS DECIMAL(13,10))
                             * CAST(xd AS DECIMAL(13,10))
                             AS DECIMAL(26,20))) AS s2,
                    min(xd) AS mn, max(xd) AS mx,
                    sum(CASE WHEN xd = 0.0 THEN 1 ELSE 0 END) AS z
             FROM d GROUP BY 1),
       x AS (SELECT dim, n,
                    CAST(CAST(s1 AS VARCHAR) AS DOUBLE) AS s1d,
                    CAST(CAST(s2 AS VARCHAR) AS DOUBLE) AS s2d,
                    mn, mx, z
             FROM a)
       SELECT dim, CAST(n AS BIGINT) AS n,
              round(s1d / n, 6) AS mean,
              round(sqrt(greatest((s2d - s1d * s1d / n) / n, 0.0)), 6)
                  AS std,
              round(mn, 6) AS min, round(mx, 6) AS max,
              round(CAST(z AS DOUBLE) / n, 6) AS zero_frac
       FROM x""",
    doc="per-dimension embedding moments (mean/std/min/max/zero "
    "fraction) — the embedding QA audit for dead dims and scale "
    "drift; cross-row sums use the pca_2d_exact DECIMAL(13,10) "
    "discipline (exact decimal aggregates, one correctly-rounded "
    "conversion each), so the moments are summation-order-free "
    "(operators/profile.py::embedding_dim_moments)",
)
def q_embedding_dim_moments_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.profile import embedding_dim_moments

    return embedding_dim_moments(_t(spark, sf_dir, "embeddings"))


@_register(
    "cmh_odds_ratio_priority_value",
    """WITH j AS (SELECT c.c_mktsegment AS k,
                        (o.o_orderpriority = '1-URGENT') AS e,
                        (o.o_totalprice > 200000) AS oc
                 FROM orders o
                 JOIN customer c ON c.c_custkey = o.o_custkey),
       cells AS (SELECT k,
                   sum(CASE WHEN e AND oc THEN 1 ELSE 0 END) AS aa,
                   sum(CASE WHEN e AND NOT oc THEN 1 ELSE 0 END) AS bb,
                   sum(CASE WHEN NOT e AND oc THEN 1 ELSE 0 END) AS cc,
                   sum(CASE WHEN NOT e AND NOT oc THEN 1 ELSE 0 END)
                       AS dd
                 FROM j GROUP BY k),
       run AS (SELECT k,
                 sum(CAST(aa AS DOUBLE) * dd / (aa + bb + cc + dd))
                     OVER w AS num,
                 sum(CAST(bb AS DOUBLE) * cc / (aa + bb + cc + dd))
                     OVER w AS den,
                 sum(aa + bb + cc + dd) OVER w AS tot,
                 row_number() OVER (ORDER BY k DESC) AS rev,
                 count(*) OVER () AS ns
               FROM cells
               WINDOW w AS (ORDER BY k ROWS UNBOUNDED PRECEDING))
       SELECT CAST(ns AS INT) AS n_strata, CAST(tot AS BIGINT) AS n,
              round(CASE WHEN den > 0 THEN num / den END, 6)
                  AS or_mh,
              round(CASE WHEN den > 0 AND num > 0
                         THEN ln(num / den) END, 6)
                  AS log_or_mh
       FROM run WHERE rev = 1""",
    doc="Cochran-Mantel-Haenszel pooled odds ratio of urgent priority "
    "vs high order value, stratified by market segment — the "
    "Simpson's-paradox-proof effect readout; per-stratum a*d/n terms "
    "are IEEE divisions of exact ints summed in STRATUM ORDER (a "
    "sequential window fold, identical on both engines) "
    "(operators/profile.py::cmh_odds_ratio)",
)
def q_cmh_odds_ratio_priority_value(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.profile import cmh_odds_ratio

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment"),
        F.col("o_orderpriority"),
        F.col("o_totalprice"),
    )
    return cmh_odds_ratio(
        j,
        "c_mktsegment",
        F.col("o_orderpriority") == F.lit("1-URGENT"),
        F.col("o_totalprice") > F.lit(200000),
    )


@_register(
    "overdispersion_event_types",
    """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                        count(*) AS c
                 FROM events GROUP BY 1, 2),
       a AS (SELECT event_type, count(*) AS n_days,
                    sum(c) AS s1, sum(c * c) AS s2
             FROM d GROUP BY 1),
       x AS (SELECT event_type, n_days,
                    CAST(s1 AS DOUBLE) / n_days AS mean,
                    (CAST(s2 AS DOUBLE)
                     - CAST(s1 AS DOUBLE) * s1 / n_days) / n_days
                        AS var
             FROM a)
       SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
              round(mean, 4) AS mean_daily,
              round(var, 4) AS var_daily,
              round(CASE WHEN mean > 0 THEN var / mean END, 4)
                  AS dispersion,
              (CASE WHEN mean > 0 THEN var / mean END > 1.5)
                  AS overdispersed
       FROM x""",
    doc="daily-count overdispersion (variance-to-mean dispersion "
    "index) per event type — flags clumped/bursty counts whose "
    "Poisson-assumption CIs are invalid; exact integer sums end to "
    "end, closed-form IEEE at the edge "
    "(operators/profile.py::overdispersion_check)",
)
def q_overdispersion_event_types(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.profile import overdispersion_check

    return overdispersion_check(_t(spark, sf_dir, "events"), "event_type")


@_register(
    "conformal_interval_daily_revenue",
    """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
                            sum(CAST(o_totalprice AS DECIMAL(18,2)))
                                AS y
                     FROM orders GROUP BY 1),
       fc AS (SELECT d, CAST(y AS DOUBLE) AS yd,
                     lag(CAST(y AS DOUBLE), 7) OVER (ORDER BY d)
                         AS f,
                     row_number() OVER (ORDER BY d) AS r,
                     count(*) OVER () AS n
              FROM daily),
       sc AS (SELECT d, abs(yd - f) AS s,
                     (r <= floor(n * 0.5)) AS is_calib
              FROM fc WHERE f IS NOT NULL),
       cal AS (SELECT s,
                      row_number() OVER (ORDER BY s, d) AS rk,
                      count(*) OVER () AS nc
               FROM sc WHERE is_calib),
       q AS (SELECT s AS qv FROM cal
             WHERE rk = least(nc, CAST(ceil((nc + 1) * 0.9)
                                       AS INT))),
       t AS (SELECT count(*) AS nt,
                    sum(CASE WHEN sc.s <= q.qv THEN 1 ELSE 0 END)
                        AS cov,
                    max(q.qv) AS qv
             FROM sc, q WHERE NOT is_calib)
       SELECT (SELECT CAST(count(*) AS BIGINT) FROM sc
               WHERE is_calib) AS n_calib,
              CAST(nt AS BIGINT) AS n_test,
              round(qv, 2) AS q_hat,
              round(CAST(cov AS DOUBLE) / nt, 4) AS coverage,
              CAST(0.9 AS DOUBLE) AS target_coverage
       FROM t""",
    doc="split-conformal prediction interval around the lag-7 "
    "seasonal-naive revenue forecast: calibration-prefix |residual| "
    "order statistic as the distribution-free half-width, empirical "
    "held-out coverage vs the 1-alpha guarantee — the uncertainty-"
    "calibration check for any forecaster; exact order statistics "
    "and integer ratios throughout "
    "(operators/profile.py::split_conformal_interval)",
)
def q_conformal_interval_daily_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.profile import split_conformal_interval

    return split_conformal_interval(
        _t(spark, sf_dir, "orders"), "o_orderdate", "o_totalprice",
        season=7, calib_frac=0.5, alpha=0.1,
    )


@_register(
    "wasserstein_click_purchase",
    """WITH p AS (SELECT (event_type = 'click') AS ia,
                        CAST(value AS DECIMAL(18,2)) AS v
                 FROM events
                 WHERE event_type IN ('click', 'purchase')
                   AND value IS NOT NULL),
       pv AS (SELECT v,
                     CAST(sum(CASE WHEN ia THEN 1 ELSE 0 END)
                          AS BIGINT) AS a,
                     CAST(sum(CASE WHEN NOT ia THEN 1 ELSE 0 END)
                          AS BIGINT) AS b
              FROM p GROUP BY v),
       pre AS (SELECT v,
                      sum(a) OVER wc AS ca, sum(b) OVER wc AS cb,
                      sum(a) OVER () AS na, sum(b) OVER () AS nb,
                      lead(v) OVER (ORDER BY v) AS vn
               FROM pv
               WINDOW wc AS (ORDER BY v ROWS UNBOUNDED PRECEDING)),
       ag AS (SELECT max(na) AS n_a, max(nb) AS n_b,
                     sum(CASE WHEN vn IS NOT NULL THEN
                         CAST(CAST(abs(ca * nb - cb * na)
                                   AS DECIMAL(18,0))
                              * CAST(vn - v AS DECIMAL(19,2))
                              AS DECIMAL(38,2)) END) AS w
              FROM pre)
       SELECT CAST(n_a AS BIGINT) AS n_a,
              CAST(n_b AS BIGINT) AS n_b,
              round(CASE WHEN n_a > 0 AND n_b > 0 THEN
                    coalesce(CAST(CAST(w AS VARCHAR) AS DOUBLE), 0.0)
                    / (CAST(n_a AS DOUBLE) * n_b) END, 4)
                  AS wasserstein_1
       FROM ag""",
    doc="exact 1-D Wasserstein-1 (earth-mover) distance between click "
    "and purchase value distributions — the units-of-the-metric "
    "distribution-shift readout; |F_a - F_b| kept as exact integers "
    "(|ca*nb - cb*na|), value gaps exact decimals, ONE final IEEE "
    "division (operators/profile.py::wasserstein_1d)",
)
def q_wasserstein_click_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.profile import wasserstein_1d

    return wasserstein_1d(
        _t(spark, sf_dir, "events"), "value", "event_type",
        "click", "purchase",
    )


@_register(
    "spearman_quantity_price",
    """WITH d AS (SELECT CAST(l_quantity AS DOUBLE) AS x,
                        CAST(l_extendedprice AS DOUBLE) AS y
                 FROM lineitem
                 WHERE l_quantity IS NOT NULL
                   AND l_extendedprice IS NOT NULL),
       px AS (SELECT x, count(*) AS c FROM d GROUP BY x),
       rxm AS (SELECT x,
                 2 * coalesce(sum(c) OVER (ORDER BY x
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) + c + 1 AS rx
               FROM px),
       py AS (SELECT y, count(*) AS c FROM d GROUP BY y),
       rym AS (SELECT y,
                 2 * coalesce(sum(c) OVER (ORDER BY y
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) + c + 1 AS ry
               FROM py),
       j AS (SELECT rx, ry FROM d
             JOIN rxm USING (x) JOIN rym USING (y)),
       a AS (SELECT count(*) AS n,
               sum(CAST(rx AS DECIMAL(28,0))) AS sx,
               sum(CAST(ry AS DECIMAL(28,0))) AS sy,
               sum(CAST(CAST(rx AS DECIMAL(19,0))
                        * CAST(rx AS DECIMAL(19,0))
                        AS DECIMAL(38,0))) AS sxx,
               sum(CAST(CAST(ry AS DECIMAL(19,0))
                        * CAST(ry AS DECIMAL(19,0))
                        AS DECIMAL(38,0))) AS syy,
               sum(CAST(CAST(rx AS DECIMAL(19,0))
                        * CAST(ry AS DECIMAL(19,0))
                        AS DECIMAL(38,0))) AS sxy
             FROM j),
       z AS (SELECT n,
               CAST(n AS DECIMAL(10,0))
                 * CAST(sxy AS DECIMAL(28,0))
                 - CAST(sx AS DECIMAL(19,0))
                   * CAST(sy AS DECIMAL(19,0)) AS num,
               CAST(n AS DECIMAL(10,0))
                 * CAST(sxx AS DECIMAL(28,0))
                 - CAST(sx AS DECIMAL(19,0))
                   * CAST(sx AS DECIMAL(19,0)) AS vx,
               CAST(n AS DECIMAL(10,0))
                 * CAST(syy AS DECIMAL(28,0))
                 - CAST(sy AS DECIMAL(19,0))
                   * CAST(sy AS DECIMAL(19,0)) AS vy
             FROM a)
       SELECT CAST(n AS BIGINT) AS n,
              round(CASE WHEN vx > 0 AND vy > 0 THEN
                    CAST(CAST(num AS VARCHAR) AS DOUBLE)
                    / sqrt(CAST(CAST(vx AS VARCHAR) AS DOUBLE)
                           * CAST(CAST(vy AS VARCHAR) AS DOUBLE))
                    END, 6) AS spearman_rho
       FROM z""",
    doc="tie-corrected Spearman rank correlation of line quantity vs "
    "extended price WITHOUT row ranking: doubled midranks (exact "
    "ints) from per-distinct-value prefix sums, joined back by "
    "value; all Pearson sufficient statistics in exact DECIMAL, one "
    "sqrt + one divide at the edge "
    "(operators/profile.py::spearman_correlation)",
)
def q_spearman_quantity_price(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.profile import spearman_correlation

    return spearman_correlation(
        _t(spark, sf_dir, "lineitem"), "l_quantity", "l_extendedprice"
    )


@_register(
    "cramers_v_priority_status",
    """WITH cont AS (SELECT CAST(o_orderpriority AS VARCHAR) AS a,
                           CAST(o_orderstatus AS VARCHAR) AS b,
                           count(*) AS o
                    FROM orders
                    WHERE o_orderpriority IS NOT NULL
                      AND o_orderstatus IS NOT NULL
                    GROUP BY 1, 2),
       rm AS (SELECT a, sum(o) AS ra FROM cont GROUP BY 1),
       cm AS (SELECT b, sum(o) AS cb FROM cont GROUP BY 1),
       cells AS (SELECT c.a, c.b, c.o, rm.ra, cm.cb
                 FROM cont c JOIN rm USING (a) JOIN cm USING (b)),
       run AS (SELECT a, b,
                 sum(CAST(o AS DOUBLE) * o
                     / (CAST(ra AS DOUBLE) * cb)) OVER w AS s,
                 sum(o) OVER w AS n,
                 row_number() OVER (ORDER BY a DESC, b DESC) AS rev
               FROM cells
               WINDOW w AS (ORDER BY a, b ROWS UNBOUNDED PRECEDING)),
       last AS (SELECT * FROM run WHERE rev = 1),
       dims AS (SELECT (SELECT count(*) FROM rm) AS nr,
                       (SELECT count(*) FROM cm) AS nc)
       SELECT CAST(l.n AS BIGINT) AS n,
              CAST(d.nr AS INT) AS n_rows_cat,
              CAST(d.nc AS INT) AS n_cols_cat,
              round(CAST(l.n AS DOUBLE) * (l.s - 1.0), 4) AS chi2,
              round(CASE WHEN least(d.nr, d.nc) - 1 > 0 THEN
                    sqrt(greatest(CAST(l.n AS DOUBLE) * (l.s - 1.0)
                                  / l.n / (least(d.nr, d.nc) - 1),
                                  0.0)) END, 6) AS cramers_v
       FROM last l, dims d""",
    doc="Cramer's V association between order priority and order "
    "status: [0,1]-normalized chi-square effect size; exact integer "
    "contingency + marginals, per-cell o^2/(row*col) IEEE divisions "
    "summed in CELL ORDER (sequential window fold, both engines add "
    "identically) (operators/profile.py::cramers_v)",
)
def q_cramers_v_priority_status(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.profile import cramers_v

    return cramers_v(
        _t(spark, sf_dir, "orders"), "o_orderpriority", "o_orderstatus"
    )


def _kcenter_sql(k: int = 5) -> str:
    """Build the k-round Gonzalez greedy oracle: round i picks the
    argmax-of-min-distance row given rounds 0..i-1, each as a chained
    CTE; mechanical but long, so generated."""
    dist = (
        "sqrt(list_sum(list_transform(generate_series(1, len(e.v)),"
        " i -> (e.v[i] - {c}[i]) ^ 2)))"
    )
    ctes = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
        " FROM embeddings)",
        "c0 AS (SELECT v AS v0 FROM e WHERE vec_id = 0)",
    ]
    for i in range(1, k):
        froms = ["e", "c0"] + [f"p{j}" for j in range(1, i)]
        dists = [dist.format(c="c0.v0")] + [
            dist.format(c=f"p{j}.v") for j in range(1, i)
        ]
        dm = dists[0] if len(dists) == 1 else (
            "least(" + ", ".join(dists) + ")"
        )
        excl = ["e.vec_id <> 0"] + [
            f"e.vec_id <> p{j}.vec_id" for j in range(1, i)
        ]
        ctes.append(
            f"p{i} AS (SELECT e.vec_id, e.v, {dm} AS dm"
            f" FROM {', '.join(froms)}"
            f" WHERE {' AND '.join(excl)}"
            f" ORDER BY dm DESC, e.vec_id LIMIT 1)"
        )
    selects = [
        "SELECT CAST(0 AS INT) AS sel_order,"
        " CAST(0 AS BIGINT) AS vec_id, CAST(0.0 AS DOUBLE) AS d_min"
    ] + [
        f"SELECT CAST({i} AS INT), CAST(p{i}.vec_id AS BIGINT),"
        f" round(p{i}.dm, 4) FROM p{i}"
        for i in range(1, k)
    ]
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        + "\nUNION ALL ".join(selects)
    )


@_register(
    "k_center_greedy_embeddings",
    _kcenter_sql(5),
    doc="Gonzalez k-center greedy (farthest-point) selection of 5 "
    "diverse embeddings from a fixed start: deterministic argmax-of-"
    "min-distance rounds (same (a-b)^2 fold both engines, smallest-"
    "id tie-break) make the whole greedy trajectory value-exact; the "
    "oracle replays all 4 rounds as chained CTEs — the diverse-"
    "coreset / farthest-point-sampling primitive "
    "(operators/similarity.py::k_center_greedy)",
)
def q_k_center_greedy_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.similarity import k_center_greedy

    return k_center_greedy(
        _t(spark, sf_dir, "embeddings"), k=5, start_id=0
    )


@_register(
    "lsh_banding_planner_docs",
    r"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                  FROM documents),
       sh AS (SELECT DISTINCT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
              FROM t, UNNEST(generate_series(1, greatest(len(toks) - 2, 0)))
                   AS u(i)),
       sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                    count(*) AS n_common
             FROM sh a JOIN sh b
               ON a.shingle = b.shingle AND a.doc_id < b.doc_id
             GROUP BY 1, 2),
       hist AS (SELECT floor(100 * (CAST(p.n_common AS DOUBLE)
                              / (sa.n_sh + sb.n_sh - p.n_common))) / 100.0
                           AS j_bucket,
                       CAST(count(*) AS BIGINT) AS n_pairs
                FROM p JOIN sizes sa ON p.doc_a = sa.doc_id
                       JOIN sizes sb ON p.doc_b = sb.doc_id
                WHERE CAST(p.n_common AS DOUBLE)
                      / (sa.n_sh + sb.n_sh - p.n_common) >= 0.3
                GROUP BY 1),
       grid AS (SELECT * FROM (VALUES (128, 1), (64, 2), (32, 4),
                                      (16, 8), (8, 16), (4, 32))
                     AS g(b, r)),
       gplan AS (SELECT CAST(b AS INTEGER) AS b, CAST(r AS INTEGER) AS r,
                        round(pow(1.0 / b, 1.0 / r), 6) AS s_curve_threshold,
                        round(1 - pow(1 - pow(0.7, r), b), 6) AS p_at_target,
                        (row_number() OVER (
                            ORDER BY round(abs(round(pow(1.0 / b, 1.0 / r), 6)
                                              - 0.7), 6), b) = 1)
                            AS recommended
                 FROM grid)
       SELECT g.b, g.r, g.s_curve_threshold, g.p_at_target, g.recommended,
              h.j_bucket, h.n_pairs,
              round(1 - pow(1 - pow(h.j_bucket, g.r), g.b), 6) AS p_collide,
              round(h.n_pairs * (1 - pow(1 - pow(h.j_bucket, g.r), g.b)), 4)
                  AS expected_candidates,
              (h.j_bucket < 0.7) AS counts_toward_false
       FROM gplan g CROSS JOIN hist h""",
    doc="LSH banding parameter planner: closed-form S-curve readout "
    "per (bands, rows) grid point — collision probability "
    "1-(1-t^r)^b at the target threshold, the ~50% crossover "
    "(1/b)^(1/r), and expected true/false candidate mass from the "
    "corpus's OBSERVED exact-Jaccard pair histogram; 'recommended' "
    "marks the grid point whose crossover lands nearest the target "
    "(operators/dedup.py::lsh_banding_planner)",
)
def q_lsh_banding_planner_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import lsh_banding_planner

    return lsh_banding_planner(
        _t(spark, sf_dir, "documents"),
        jaccard_floor=0.3,
        target_threshold=0.7,
    )


@_register(
    "ivf_assignment_drift",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
       c AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < 8),
       d AS (SELECT e.vec_id, c.cell,
                    list_sum(list_transform(generate_series(1, len(e.v)),
                             i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i])))
                        AS d2
             FROM e CROSS JOIN c),
       a AS (SELECT vec_id, cell,
                    row_number() OVER (PARTITION BY vec_id
                                       ORDER BY d2, cell) AS rk
             FROM d),
       cells AS (SELECT cell,
                        sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END)
                            AS n_a,
                        sum(CASE WHEN vec_id % 2 = 0 THEN 0 ELSE 1 END)
                            AS n_b
                 FROM a WHERE rk = 1 GROUP BY cell),
       tot AS (SELECT sum(n_a) AS ta, sum(n_b) AS tb FROM cells)
       SELECT CAST(cell AS INTEGER) AS cell,
              CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
              round((n_a + 1) / CAST(ta + 8 AS DOUBLE), 6) AS share_a,
              round((n_b + 1) / CAST(tb + 8 AS DOUBLE), 6) AS share_b,
              round(((n_a + 1) / CAST(ta + 8 AS DOUBLE)
                     - (n_b + 1) / CAST(tb + 8 AS DOUBLE))
                    * ln(((n_a + 1) / CAST(ta + 8 AS DOUBLE))
                         / ((n_b + 1) / CAST(tb + 8 AS DOUBLE))), 6)
                  AS psi_term
       FROM cells, tot""",
    doc="IVF assignment drift between two corpus snapshots (even/odd "
    "id halves): nearest-centroid occupancy histograms under a fixed "
    "first-k codebook, Laplace-smoothed, compared by per-cell PSI "
    "terms — the re-cluster alarm of a production ANN index "
    "(operators/similarity.py::ivf_assignment_drift)",
)
def q_ivf_assignment_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf_assignment_drift

    return ivf_assignment_drift(_t(spark, sf_dir, "embeddings"), k=8)


@_register(
    "padding_waste_planner_docs",
    r"""WITH s AS (SELECT * FROM (VALUES ('pow2_16_128', [16, 32, 64, 128]),
                                        ('pow2_32_128', [32, 64, 128]),
                                        ('fixed_128', [128]))
                       AS v(strategy, bounds)),
       l AS (SELECT CAST(len(string_split_regex(trim(text), '\s+'))
                         AS BIGINT) AS len
             FROM documents),
       j AS (SELECT strategy,
                    CAST(coalesce(list_min(list_filter(bounds,
                                                       b -> b >= len)),
                                  list_max(bounds)) AS BIGINT) AS bucket,
                    len
             FROM l CROSS JOIN s),
       g AS (SELECT strategy, bucket,
                    CAST(count(*) AS BIGINT) AS n_docs,
                    CAST(sum(least(len, bucket)) AS BIGINT) AS tokens_kept,
                    CAST(sum(bucket - least(len, bucket)) AS BIGINT)
                        AS tokens_pad,
                    CAST(sum(len - least(len, bucket)) AS BIGINT)
                        AS tokens_truncated
             FROM j GROUP BY 1, 2)
       SELECT strategy, bucket, n_docs, tokens_kept, tokens_pad,
              tokens_truncated,
              round(tokens_kept / CAST(tokens_kept + tokens_pad AS DOUBLE), 6)
                  AS efficiency
       FROM g""",
    doc="length-bucketed batching planner: per (strategy, bucket) "
    "document count, kept/pad/truncated token mass and packing "
    "efficiency for candidate context-length boundary grids — the "
    "padding-waste readout that sizes a training loader's buckets "
    "(operators/shard.py::padding_waste_planner)",
)
def q_padding_waste_planner_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.shard import padding_waste_planner

    return padding_waste_planner(_t(spark, sf_dir, "documents"))


@_register(
    "script_mix_profile_docs",
    r"""WITH c AS (
         SELECT source, coalesce(text, '') AS t FROM documents),
       p AS (
         SELECT source,
                length(t) AS n_all,
                length(t) - length(regexp_replace(t, '[A-Za-z]', '', 'g'))
                    AS c_latin,
                length(t) - length(regexp_replace(t, '[0-9]', '', 'g'))
                    AS c_digit,
                length(t) - length(regexp_replace(t, '[ \t\n\r]', '', 'g'))
                    AS c_space,
                length(t) - length(regexp_replace(t, '[!-/:-@\[-`{-~]',
                                                  '', 'g')) AS c_punct,
                length(t) - length(regexp_replace(t,
                    '[\x{4e00}-\x{9fff}]', '', 'g')) AS c_cjk,
                length(t) - length(regexp_replace(t,
                    '[\x{0400}-\x{04ff}]', '', 'g')) AS c_cyr
         FROM c)
       SELECT source,
              CAST(sum(n_all) AS BIGINT) AS n_chars,
              CAST(sum(c_latin) AS BIGINT) AS n_latin,
              CAST(sum(c_digit) AS BIGINT) AS n_digit,
              CAST(sum(c_space) AS BIGINT) AS n_space,
              CAST(sum(c_punct) AS BIGINT) AS n_punct,
              CAST(sum(c_cjk) AS BIGINT) AS n_cjk,
              CAST(sum(c_cyr) AS BIGINT) AS n_cyrillic,
              CAST(sum(n_all) - (sum(c_latin) + sum(c_digit) + sum(c_space)
                   + sum(c_punct) + sum(c_cjk) + sum(c_cyr)) AS BIGINT)
                  AS n_other,
              round(sum(c_latin) / CAST(sum(n_all) AS DOUBLE), 6)
                  AS frac_latin,
              round(sum(c_digit) / CAST(sum(n_all) AS DOUBLE), 6)
                  AS frac_digit,
              round(sum(c_space) / CAST(sum(n_all) AS DOUBLE), 6)
                  AS frac_space,
              round(sum(c_punct) / CAST(sum(n_all) AS DOUBLE), 6)
                  AS frac_punct,
              round(sum(c_cjk) / CAST(sum(n_all) AS DOUBLE), 6) AS frac_cjk,
              round(sum(c_cyr) / CAST(sum(n_all) AS DOUBLE), 6)
                  AS frac_cyrillic
       FROM p GROUP BY source""",
    doc="per-source Unicode-script composition (Latin/digit/space/"
    "punct/CJK/Cyrillic/other character mass + fractions) — the "
    "multilingual governance readout before language routing; exact "
    "integer counts via length-difference regex, map-only + one "
    "keyed aggregate (operators/textstats.py::script_mix_profile)",
)
def q_script_mix_profile_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textstats import script_mix_profile

    return script_mix_profile(_t(spark, sf_dir, "documents"))


@_register(
    "dup_cluster_length_profile_docs",
    r"""WITH pre AS (
         SELECT text,
                array_to_string(string_split_regex(trim(text), '\s+')[1:3],
                                ' ') AS lead3
         FROM documents),
       cl AS (
         SELECT md5(lower(regexp_replace(trim(lead3), '\s+', ' ', 'g')))
                    AS fp,
                count(*) AS n,
                sum(len(string_split_regex(trim(text), '\s+'))) AS st,
                sum(length(text)) AS sc
         FROM pre GROUP BY 1)
       SELECT CASE WHEN n = 1 THEN '1' WHEN n = 2 THEN '2'
                   WHEN n <= 5 THEN '3-5' ELSE '6+' END
                  AS cluster_size_bucket,
              CAST(count(*) AS BIGINT) AS n_clusters,
              CAST(sum(n) AS BIGINT) AS n_docs,
              round(sum(st) / CAST(sum(n) AS DOUBLE), 4) AS avg_tokens,
              round(sum(sc) / CAST(sum(n) AS DOUBLE), 4) AS avg_chars
       FROM cl GROUP BY 1""",
    doc="duplicate-cluster size vs document length: lead-3-token "
    "prefix-fingerprint clusters bucketed by size (1/2/3-5/6+) with mean "
    "tokens/chars per doc — the 'duplicated content skews short' "
    "curation diagnostic "
    "(operators/dedup.py::dup_cluster_length_profile)",
)
def q_dup_cluster_length_profile_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.dedup import dup_cluster_length_profile

    return dup_cluster_length_profile(
        _t(spark, sf_dir, "documents"), prefix_tokens=3
    )


@_register(
    "ngram_novelty_by_source_docs",
    r"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                  FROM documents),
       sh AS (SELECT DISTINCT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
              FROM t, UNNEST(generate_series(1, greatest(len(toks) - 2, 0)))
                   AS u(i)),
       gd AS (SELECT shingle, count(*) AS ndocs FROM sh GROUP BY 1),
       pd AS (SELECT sh.doc_id, count(*) AS grams,
                     sum(CASE WHEN gd.ndocs = 1 THEN 1 ELSE 0 END) AS unseen
              FROM sh JOIN gd USING (shingle) GROUP BY 1),
       j AS (SELECT d.source, coalesce(pd.grams, 0) AS grams,
                    coalesce(pd.unseen, 0) AS unseen
             FROM documents d LEFT JOIN pd USING (doc_id))
       SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(grams) AS BIGINT) AS grams_total,
              CAST(sum(unseen) AS BIGINT) AS grams_unique_to_doc,
              round(CASE WHEN sum(grams) > 0
                         THEN sum(unseen) / CAST(sum(grams) AS DOUBLE)
                         END, 6) AS novelty
       FROM j GROUP BY source""",
    doc="per-source n-gram novelty: fraction of distinct-per-doc "
    "trigrams that appear in no other document — the inverse-"
    "boilerplate readout; exact integer counts, slim gram-keyed "
    "shuffles (operators/textstats.py::ngram_novelty_by_source)",
)
def q_ngram_novelty_by_source_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.textstats import ngram_novelty_by_source

    return ngram_novelty_by_source(_t(spark, sf_dir, "documents"))


@_register(
    "zipf_slope_by_source_docs",
    r"""WITH toks AS (SELECT source,
                            unnest(string_split_regex(trim(text), '\s+'))
                                AS t
                     FROM documents),
       f AS (SELECT source, t, count(*) AS c FROM toks
             WHERE t <> '' GROUP BY 1, 2),
       r AS (SELECT source,
                    ln(CAST(row_number() OVER (PARTITION BY source
                                               ORDER BY c DESC, t)
                            AS DOUBLE)) AS lr,
                    ln(CAST(c AS DOUBLE)) AS lf
             FROM f),
       a AS (SELECT source, count(*) AS n, sum(lr) AS sr, sum(lf) AS sf,
                    sum(lr * lr) AS srr, sum(lr * lf) AS srf
             FROM r GROUP BY 1)
       SELECT source, CAST(n AS BIGINT) AS vocab_size,
              round(CASE WHEN n * srr - sr * sr <> 0
                         THEN (n * srf - sr * sf) / (n * srr - sr * sr)
                         END, 4) AS zipf_slope
       FROM a""",
    doc="per-source Zipf slope: log-log OLS of token frequency on "
    "rank (count DESC, token ties) — the corpus-naturalness "
    "diagnostic, ~-1 for natural language "
    "(operators/textstats.py::zipf_slope_by_source)",
)
def q_zipf_slope_by_source_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textstats import zipf_slope_by_source

    return zipf_slope_by_source(_t(spark, sf_dir, "documents"))


def _mmr_sql(k: int = 5, pool: int = 12, lam: float = 0.7) -> str:
    """Chained-CTE oracle for mmr_rerank_topk (the k_center pattern):
    pool = map-side top-``pool`` by relevance, then k greedy rounds
    each picking argmax of lam*rel − (1−lam)*max-sim-to-selected with
    smallest-id ties. Cosines are the same sequential list_sum fold
    the Spark/driver side runs."""
    dot = (
        "list_sum(list_transform(generate_series(1, len({a})),"
        " i -> {a}[i] * {b}[i]))"
    )
    nrm = (
        "sqrt(list_sum(list_transform(generate_series(1, len({a})),"
        " i -> {a}[i] * {a}[i])))"
    )

    def cos(a: str, b: str) -> str:
        return (
            f"({dot.format(a=a, b=b)}"
            f" / ({nrm.format(a=a)} * {nrm.format(a=b)}))"
        )

    mu = 1.0 - lam
    ctes = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
        " FROM embeddings)",
        "q AS (SELECT v AS qv FROM e WHERE vec_id = 0)",
        f"pool AS (SELECT e.vec_id, e.v, {cos('e.v', 'q.qv')} AS rel"
        f" FROM e, q WHERE e.vec_id <> 0 AND {nrm.format(a='e.v')} > 0"
        f" ORDER BY rel DESC, e.vec_id LIMIT {pool})",
        f"p0 AS (SELECT vec_id, v, rel, {lam} * rel AS score FROM pool"
        f" ORDER BY rel DESC, vec_id LIMIT 1)",
    ]
    for i in range(1, k):
        froms = ["pool c"] + [f"p{j}" for j in range(i)]
        sims = [cos("c.v", f"p{j}.v") for j in range(i)]
        msim = sims[0] if len(sims) == 1 else (
            "greatest(" + ", ".join(sims) + ")"
        )
        excl = [f"c.vec_id <> p{j}.vec_id" for j in range(i)]
        ctes.append(
            f"p{i} AS (SELECT c.vec_id, c.v, c.rel,"
            f" {lam} * c.rel - {mu} * {msim} AS score"
            f" FROM {', '.join(froms)}"
            f" WHERE {' AND '.join(excl)}"
            f" ORDER BY score DESC, c.vec_id LIMIT 1)"
        )
    selects = [
        f"SELECT CAST({i} AS INT) AS sel_order,"
        f" CAST(p{i}.vec_id AS BIGINT) AS vec_id,"
        f" p{i}.score AS mmr_score FROM p{i}"
        for i in range(k)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(selects)


@_register(
    "mmr_rerank_topk",
    _mmr_sql(5, 12, 0.7),
    doc="Maximal Marginal Relevance re-ranking (Carbonell & Goldstein "
    "1998): top-12 relevance pool via TakeOrderedAndProject, then 5 "
    "greedy diversity-aware picks (lam=0.7) with deterministic "
    "smallest-id ties — the RAG post-retrieval re-ranker; the whole "
    "greedy trajectory replays as chained CTEs "
    "(operators/similarity.py::mmr_rerank_topk)",
)
def q_mmr_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import mmr_rerank_topk

    return mmr_rerank_topk(
        _t(spark, sf_dir, "embeddings"), query_id=0, k=5, pool=12, lam=0.7
    )


@_register(
    "ivf_recall_curve",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
       c AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < 8),
       d AS (SELECT e.vec_id, e.v, c.cell,
                    list_sum(list_transform(generate_series(1, len(e.v)),
                             i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i])))
                        AS d2
             FROM e CROSS JOIN c),
       a AS (SELECT vec_id, v, cell FROM (
               SELECT vec_id, v, cell,
                      row_number() OVER (PARTITION BY vec_id
                                         ORDER BY d2, cell) AS rk
               FROM d) WHERE rk = 1),
       q AS (SELECT vec_id AS query_id, v AS qv FROM e
             WHERE vec_id >= 8 AND vec_id < 11),
       pr AS (SELECT query_id, cell, row_number() OVER (
                        PARTITION BY query_id ORDER BY dq, cell)
                        AS probe_rank
              FROM (SELECT q.query_id, c.cell,
                           list_sum(list_transform(
                               generate_series(1, len(q.qv)),
                               i -> (q.qv[i] - c.cv[i])
                                    * (q.qv[i] - c.cv[i]))) AS dq
                    FROM q CROSS JOIN c)),
       sc AS (SELECT q.query_id, a.vec_id AS neighbor_id, a.cell,
                     list_sum(list_transform(generate_series(1, len(a.v)),
                              i -> (a.v[i] - q.qv[i])
                                   * (a.v[i] - q.qv[i]))) AS d2
              FROM a CROSS JOIN q WHERE a.vec_id <> q.query_id),
       ex AS (SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY d2, neighbor_id) AS r
                FROM sc) WHERE r <= 10),
       g AS (SELECT unnest([1, 2, 4, 8]) AS nprobe),
       cand AS (SELECT sc.query_id, g.nprobe, sc.neighbor_id, sc.d2
                FROM sc JOIN pr ON sc.query_id = pr.query_id
                                AND sc.cell = pr.cell
                     CROSS JOIN g
                WHERE pr.probe_rank <= g.nprobe),
       retr AS (SELECT query_id, nprobe,
                       CAST(count(*) AS BIGINT) AS n_retrieved
                FROM cand GROUP BY 1, 2),
       ap AS (SELECT query_id, nprobe, neighbor_id FROM (
                SELECT query_id, nprobe, neighbor_id,
                       row_number() OVER (PARTITION BY query_id, nprobe
                                          ORDER BY d2, neighbor_id) AS r
                FROM cand) WHERE r <= 10),
       ov AS (SELECT ap.query_id, ap.nprobe, count(*) AS n_overlap
              FROM ap JOIN ex ON ap.query_id = ex.query_id
                             AND ap.neighbor_id = ex.neighbor_id
              GROUP BY 1, 2)
       SELECT r.query_id, CAST(r.nprobe AS INTEGER) AS nprobe,
              r.n_retrieved,
              CAST(coalesce(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
              round(coalesce(ov.n_overlap, 0) / 10.0, 2) AS recall
       FROM retr r LEFT JOIN ov ON r.query_id = ov.query_id
                               AND r.nprobe = ov.nprobe""",
    doc="IVF recall-vs-nprobe curve: recall@10 of probing the 1/2/4/8 "
    "nearest cells against exact top-10, per query, under the fixed "
    "first-8 codebook — the accuracy/cost tuning readout of an ANN "
    "index (operators/similarity.py::ivf_recall_curve)",
)
def q_ivf_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf_recall_curve

    return ivf_recall_curve(
        _t(spark, sf_dir, "embeddings"),
        n_cells=8,
        n_queries=3,
        k=10,
        nprobes=(1, 2, 4, 8),
    )


@_register(
    "domain_reweight_step_docs",
    r"""WITH s AS (
         SELECT source,
                CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE)
                    AS toks,
                CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                         t -> t IN ('the','a','of','and','to','in','is','it')))
                    AS DOUBLE) AS sw,
                CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
                    AS chars
         FROM documents),
       per AS (
         SELECT source,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(toks) AS BIGINT) AS n_tokens,
                sum(round(0.4 * least(toks / 50.0, 1.0)
                    + 0.3 * least((sw / toks) / 0.05, 1.0)
                    + 0.3 * (CASE WHEN chars / toks BETWEEN 2.0 AND 12.0
                                  THEN 1.0 ELSE 0.3 END), 4)) AS qsum
         FROM s GROUP BY source),
       t AS (SELECT sum(n_tokens) AS tot FROM per),
       u AS (SELECT per.source, per.n_docs, per.n_tokens,
                    1.0 - per.qsum / per.n_docs AS loss,
                    per.n_tokens / CAST(t.tot AS DOUBLE) AS w_old,
                    per.n_tokens / CAST(t.tot AS DOUBLE)
                        * exp(1.0 * (1.0 - per.qsum / per.n_docs)) AS w_upd
             FROM per, t),
       z AS (SELECT sum(w_upd) AS z FROM u)
       SELECT u.source, u.n_docs, u.n_tokens,
              round(u.loss, 6) AS proxy_loss,
              round(u.w_old, 6) AS weight_old,
              round(u.w_upd / z.z, 6) AS weight_new
       FROM u, z""",
    doc="one DoReMi-style exponentiated-gradient domain-weight update "
    "(Xie et al. 2023, simplified): token-share weights scaled by "
    "exp(eta * proxy loss) and renormalized — proxy loss is 1 minus "
    "the rule-based mean quality "
    "(operators/curation.py::domain_reweight_step)",
)
def q_domain_reweight_step_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.curation import domain_reweight_step

    return domain_reweight_step(_t(spark, sf_dir, "documents"), eta=1.0)


@_register(
    "token_burstiness_topk",
    r"""WITH pairs AS (
         SELECT doc_id, unnest(string_split_regex(trim(text), '\s+'))
                    AS t
         FROM documents),
       pc AS (SELECT t, doc_id, count(*) AS c FROM pairs
              WHERE t <> '' GROUP BY 1, 2),
       st AS (SELECT t AS token, sum(c) AS cf, count(*) AS df
              FROM pc GROUP BY 1)
       SELECT token, CAST(cf AS BIGINT) AS cf, CAST(df AS BIGINT) AS df,
              round(cf / CAST(df AS DOUBLE), 4) AS burstiness
       FROM st ORDER BY cf DESC, token LIMIT 50""",
    doc="Church-Gale burstiness of the top-50 tokens: collection "
    "frequency over document frequency — clumping tokens (cf/df >> 1) "
    "flag markup/boilerplate at the token level "
    "(operators/textstats.py::token_burstiness_topk)",
)
def q_token_burstiness_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textstats import token_burstiness_topk

    return token_burstiness_topk(_t(spark, sf_dir, "documents"), k=50)


@_register(
    "fd_profile_lineitem",
    """WITH c1 AS (
         SELECT 'l_partkey' AS determinant, 'l_suppkey' AS dependent,
                CAST(count(*) AS BIGINT) AS n_det_values,
                CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_violating,
                CAST(max(nd) AS BIGINT) AS max_fanout,
                max(nd) <= 1 AS fd_holds
         FROM (SELECT l_partkey, count(DISTINCT l_suppkey) AS nd
               FROM lineitem GROUP BY 1)),
       c2 AS (
         SELECT 'l_orderkey', 'l_returnflag',
                CAST(count(*) AS BIGINT),
                CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT),
                CAST(max(nd) AS BIGINT), max(nd) <= 1
         FROM (SELECT l_orderkey, count(DISTINCT l_returnflag) AS nd
               FROM lineitem GROUP BY 1)),
       c3 AS (
         SELECT 'l_orderkey', 'l_linestatus',
                CAST(count(*) AS BIGINT),
                CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT),
                CAST(max(nd) AS BIGINT), max(nd) <= 1
         FROM (SELECT l_orderkey, count(DISTINCT l_linestatus) AS nd
               FROM lineitem GROUP BY 1))
       SELECT * FROM c1 UNION ALL SELECT * FROM c2
       UNION ALL SELECT * FROM c3""",
    doc="functional-dependency discovery over candidate column pairs "
    "(determinant cardinality, violating determinants, worst fan-out, "
    "holds verdict) — the normalization/join-key schema-profiling "
    "primitive (operators/dq.py::fd_profile)",
)
def q_fd_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dq import fd_profile

    return fd_profile(
        _t(spark, sf_dir, "lineitem"),
        [
            ("l_partkey", "l_suppkey"),
            ("l_orderkey", "l_returnflag"),
            ("l_orderkey", "l_linestatus"),
        ],
    )


@_register(
    "candidate_key_profile_orders",
    """WITH one AS (
         SELECT count(*) AS n,
                count(DISTINCT o_orderkey) AS d1,
                sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS nl1,
                count(DISTINCT o_custkey) AS d2,
                sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS nl2,
                count(DISTINCT o_orderdate) AS d3,
                sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS nl3
         FROM orders)
       SELECT 'o_orderkey' AS column, CAST(n AS BIGINT) AS n_rows,
              CAST(d1 AS BIGINT) AS n_distinct,
              CAST(nl1 AS BIGINT) AS n_nulls,
              round(d1 / CAST(n AS DOUBLE), 6) AS uniqueness,
              d1 = n AND nl1 = 0 AS is_key FROM one
       UNION ALL
       SELECT 'o_custkey', CAST(n AS BIGINT), CAST(d2 AS BIGINT),
              CAST(nl2 AS BIGINT), round(d2 / CAST(n AS DOUBLE), 6),
              d2 = n AND nl2 = 0 FROM one
       UNION ALL
       SELECT 'o_orderdate', CAST(n AS BIGINT), CAST(d3 AS BIGINT),
              CAST(nl3 AS BIGINT), round(d3 / CAST(n AS DOUBLE), 6),
              d3 = n AND nl3 = 0 FROM one""",
    doc="candidate-key discovery: exact per-column distinct counts, "
    "null counts, uniqueness ratios and is_key verdicts in ONE "
    "multi-distinct pass (Catalyst Expand) "
    "(operators/dq.py::candidate_key_profile)",
)
def q_candidate_key_profile_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.dq import candidate_key_profile

    return candidate_key_profile(
        _t(spark, sf_dir, "orders"),
        ["o_orderkey", "o_custkey", "o_orderdate"],
    )


@_register(
    "blocking_quality_report_docs",
    # Christen's blocking metrics, recomputed end-to-end in SQL: the
    # md5-MinHash banded candidates (4 bands x 4 rows over the
    # calibration-certified signature) vs the exact shingle-Jaccard
    # truth set; counts are exact integers, metrics one division each.
    r"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                  FROM documents),
       sh AS (SELECT DISTINCT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
              FROM t, UNNEST(generate_series(1, greatest(len(toks) - 2, 0)))
                   AS u(i)),
       sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                    count(*) AS n_common
             FROM sh a JOIN sh b
               ON a.shingle = b.shingle AND a.doc_id < b.doc_id
             GROUP BY 1, 2),
       truth AS (SELECT p.doc_a, p.doc_b
                 FROM p JOIN sizes sa ON p.doc_a = sa.doc_id
                        JOIN sizes sb ON p.doc_b = sb.doc_id
                 WHERE CAST(p.n_common AS DOUBLE)
                       / (sa.n_sh + sb.n_sh - p.n_common) >= 0.3),
       sig AS (SELECT doc_id, s.i,
                      min(md5(CAST(s.i AS VARCHAR) || '-' || shingle)) AS mh
               FROM sh CROSS JOIN UNNEST(generate_series(0, 15)) AS s(i)
               GROUP BY doc_id, s.i),
       band AS (SELECT doc_id, CAST(i // 4 AS INT) AS band_idx,
                       string_agg(mh, '|' ORDER BY i) AS band_key
                FROM sig GROUP BY doc_id, CAST(i // 4 AS INT)),
       cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM band a JOIN band b
                  ON a.band_idx = b.band_idx AND a.band_key = b.band_key
                 AND a.doc_id < b.doc_id),
       md AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
       mt AS (SELECT count(*) AS n_true FROM truth),
       mc AS (SELECT count(*) AS n_candidates FROM cand),
       mh AS (SELECT count(*) AS n_hits
              FROM cand c JOIN truth t2
                ON c.doc_a = t2.doc_a AND c.doc_b = t2.doc_b)
       SELECT CAST(n_docs AS BIGINT) AS n_docs,
              CAST(n_docs * (n_docs - 1.0) / 2.0 AS BIGINT)
                  AS n_possible_pairs,
              CAST(n_candidates AS BIGINT) AS n_candidates,
              CAST(n_true AS BIGINT) AS n_true,
              CAST(n_hits AS BIGINT) AS n_hits,
              round(CASE WHEN n_true > 0
                         THEN n_hits / CAST(n_true AS DOUBLE) END, 6)
                  AS pair_completeness,
              round(CASE WHEN n_candidates > 0
                         THEN n_hits / CAST(n_candidates AS DOUBLE) END, 6)
                  AS pair_quality,
              round(1.0 - n_candidates
                          / (n_docs * (n_docs - 1.0) / 2.0), 6)
                  AS reduction_ratio,
              round(CASE WHEN (CASE WHEN n_true > 0
                               THEN n_hits / CAST(n_true AS DOUBLE) END
                             + CASE WHEN n_candidates > 0
                               THEN n_hits / CAST(n_candidates AS DOUBLE) END)
                             > 0
                         THEN 2.0
                              * (n_hits / CAST(n_true AS DOUBLE))
                              * (n_hits / CAST(n_candidates AS DOUBLE))
                              / (n_hits / CAST(n_true AS DOUBLE)
                                 + n_hits / CAST(n_candidates AS DOUBLE))
                         END, 6) AS f_score
       FROM md, mt, mc, mh""",
    doc="blocking-scheme quality report (Christen): md5-MinHash "
    "banded candidates (4x4 over the calibration-certified "
    "signature) scored against the exact shingle-Jaccard truth set "
    "— pair completeness / pair quality / reduction ratio / F-score, "
    "the audit a 100 TB dedup stack runs on a sample before "
    "committing its banding parameters "
    "(operators/dedup.py::blocking_quality_report)",
)
def q_blocking_quality_report_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.dedup import blocking_quality_report

    return blocking_quality_report(
        _t(spark, sf_dir, "documents"),
        threshold=0.3,
        n_hashes=16,
        bands=4,
    )


@_register(
    "heaps_law_fit_docs",
    # Integer bucket assignment (// on exact integers), exact prefix
    # sums; ln/OLS is the zipf_slope float class (<= K terms, round 4).
    r"""WITH b AS (SELECT min(doc_id) AS min_id, max(doc_id) AS max_id
                  FROM documents),
       tok AS (SELECT doc_id, t AS tokn
               FROM (SELECT doc_id,
                            UNNEST(string_split_regex(trim(text), '\s+'))
                                AS t
                     FROM documents)
               WHERE t <> ''),
       dt AS (SELECT doc_id, count(*) AS n_tok FROM tok GROUP BY doc_id),
       tb AS (SELECT ((dt.doc_id - b.min_id) * 10)
                     // (b.max_id - b.min_id + 1) + 1 AS bkt,
                     sum(n_tok) AS tokm
              FROM dt, b GROUP BY 1),
       fd AS (SELECT tokn, min(doc_id) AS first_doc FROM tok GROUP BY tokn),
       vb AS (SELECT ((fd.first_doc - b.min_id) * 10)
                     // (b.max_id - b.min_id + 1) + 1 AS bkt,
                     count(*) AS typ
              FROM fd, b GROUP BY 1),
       cum AS (SELECT tb.bkt,
                      sum(tb.tokm) OVER (ORDER BY tb.bkt) AS ct,
                      sum(coalesce(vb.typ, 0)) OVER (ORDER BY tb.bkt) AS cv
               FROM tb LEFT JOIN vb ON vb.bkt = tb.bkt),
       pts AS (SELECT bkt, ct, cv,
                      ln(CAST(ct AS DOUBLE)) AS x,
                      ln(CAST(cv AS DOUBLE)) AS y
               FROM cum WHERE ct > 0 AND cv > 0),
       fit AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                      sum(x) AS sx, sum(y) AS sy,
                      sum(x * x) AS sxx, sum(x * y) AS sxy
               FROM pts)
       SELECT CAST(bkt AS INT) AS checkpoint,
              CAST(ct AS BIGINT) AS cum_tokens,
              CAST(cv AS BIGINT) AS cum_types,
              round(CASE WHEN n * sxx - sx * sx <> 0
                         THEN (n * sxy - sx * sy) / (n * sxx - sx * sx)
                         END, 4) AS heaps_beta,
              round(CASE WHEN n * sxx - sx * sx <> 0
                         THEN exp((sy - (n * sxy - sx * sy)
                                        / (n * sxx - sx * sx) * sx) / n)
                         END, 4) AS heaps_k
       FROM pts, fit""",
    doc="Heaps-law vocabulary-growth fit: cumulative distinct-type "
    "count vs cumulative token mass over 10 doc_id-range checkpoints "
    "(first-occurrence trick — no cumulative-distinct window), plus "
    "the log-log OLS fit V = k*N^beta; the tokenizer-pressure "
    "extrapolation readout beside zipf_slope_by_source "
    "(operators/textstats.py::heaps_law_fit)",
)
def q_heaps_law_fit_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textstats import heaps_law_fit

    return heaps_law_fit(_t(spark, sf_dir, "documents"), n_checkpoints=10)


@_register(
    "dp_user_bounded_counts",
    # Seeded md5 subsample order + seeded md5 Laplace draw — both
    # engine-portable, so bounding, sensitivity and noise verify
    # end-to-end (NO privacy from deterministic noise; docs say so).
    """WITH r AS (SELECT event_type,
                        row_number() OVER (
                            PARTITION BY user_id
                            ORDER BY md5('43-' || CAST(user_id AS VARCHAR)
                                         || '-'
                                         || CAST(event_id AS VARCHAR)),
                                     event_id) AS rn
                 FROM events),
       c AS (SELECT event_type, count(*) AS n
             FROM r WHERE rn <= 2 GROUP BY event_type),
       u AS (SELECT event_type, n,
                    (CAST(CAST('0x' || substr(md5('43-'
                          || event_type), 1, 12) AS BIGINT)
                          AS DOUBLE) + 0.5) / 281474976710656.0 AS uu
             FROM c)
       SELECT event_type,
              CAST(n AS BIGINT) AS bounded_count,
              round(n + (-2.0) * sign(uu - 0.5)
                        * ln(1.0 - 2.0 * abs(uu - 0.5)), 4)
                  AS noisy_count,
              CAST(1.0 AS DOUBLE) AS epsilon,
              2 AS contribution_cap
       FROM u""",
    doc="USER-level DP noisy counts with contribution bounding "
    "(Wilson et al. 2020): each user's rows capped at 2 via a "
    "seeded-md5 pseudo-random per-user row_number (keyed window, "
    "never a global sort), then Laplace noise at scale cap/eps=2 — "
    "the sensitivity accounting row-level DP gets wrong when one "
    "user contributes thousands of rows "
    "(operators/dq.py::dp_contribution_bounded_counts)",
)
def q_dp_user_bounded_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dq import dp_contribution_bounded_counts

    return dp_contribution_bounded_counts(
        _t(spark, sf_dir, "events"),
        "event_type",
        "user_id",
        "event_id",
        cap=2,
        epsilon=1.0,
        seed=43,
    )


@_register(
    "krippendorff_alpha_docs",
    # Exact integer coincidence counts; D_o terms divide by (m-1)=2
    # (exact dyadic); alpha is one fixed expression over 1-row totals.
    r"""WITH r AS (SELECT doc_id,
                         CASE WHEN length(coalesce(text, '')) >= 150
                              THEN 1 ELSE 0 END AS r1,
                         CASE WHEN len(string_split_regex(trim(
                                       coalesce(text, '')),
                                       '\s+')) >= 30 THEN 1 ELSE 0 END
                             AS r2,
                         CASE WHEN contains(coalesce(text, ''), 'the')
                              THEN 1 ELSE 0 END AS r3
                  FROM documents),
       v AS (SELECT doc_id, UNNEST([r1, r2, r3]) AS val FROM r),
       i AS (SELECT doc_id,
                    sum(CASE WHEN val = 1 THEN 1 ELSE 0 END) AS n1,
                    sum(CASE WHEN val = 0 THEN 1 ELSE 0 END) AS n0
             FROM v GROUP BY doc_id
             HAVING sum(1) >= 2),
       t AS (SELECT count(*) AS n_items,
                    sum(n0 + n1) AS n_ratings,
                    sum(n1) AS n_pos,
                    sum(n0) AS n_neg,
                    sum(2.0 * n0 * n1
                        / CAST(n0 + n1 - 1 AS DOUBLE)) AS sd
             FROM i)
       SELECT CAST(n_items AS BIGINT) AS n_items,
              CAST(n_ratings AS BIGINT) AS n_ratings,
              CAST(n_pos AS BIGINT) AS n_pos,
              CAST(n_neg AS BIGINT) AS n_neg,
              round(sd / n_ratings, 6) AS d_observed,
              round(2.0 * n_pos * n_neg
                    / (CAST(n_ratings AS DOUBLE)
                       * (n_ratings - 1.0)), 6) AS d_expected,
              round(CASE WHEN n_pos > 0 AND n_neg > 0
                         THEN 1.0 - (sd / n_ratings)
                              / (2.0 * n_pos * n_neg
                                 / (CAST(n_ratings AS DOUBLE)
                                    * (n_ratings - 1.0)))
                         END, 6) AS alpha
       FROM t""",
    doc="Krippendorff's alpha over three deterministic binary "
    "quality raters (char-length >= 150, token-count >= 30, "
    "contains 'the') — the multi-rater generalization of Cohen's "
    "kappa for annotator/filter-panel agreement; exact integer "
    "coincidence counts, dyadic per-item disagreement at 3 raters "
    "(operators/profile.py::krippendorff_alpha_binary)",
)
def q_krippendorff_alpha_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import krippendorff_alpha_binary

    t = F.coalesce(F.col("text"), F.lit(""))
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        (F.length(t) >= 150).alias("r1"),
        (F.size(F.split(F.trim(t), r"\s+")) >= 30).alias("r2"),
        t.contains("the").alias("r3"),
    )
    return krippendorff_alpha_binary(d, "doc_id", ["r1", "r2", "r3"])


@_register(
    "calinski_harabasz_embeddings",
    """WITH d AS (SELECT e.label AS l, CAST(u.i - 1 AS INT) AS dim,
                        CAST(e.embedding[u.i] AS DOUBLE) AS xd
                 FROM embeddings e,
                      UNNEST(generate_series(1, len(e.embedding)))
                          AS u(i)),
       a AS (SELECT l, dim, count(*) AS n,
                    sum(CAST(xd AS DECIMAL(13,10))) AS s1,
                    sum(CAST(CAST(xd AS DECIMAL(13,10))
                             * CAST(xd AS DECIMAL(13,10))
                             AS DECIMAL(26,20))) AS s2
             FROM d GROUP BY 1, 2),
       g AS (SELECT dim,
                    CAST(CAST(sum(s1) AS VARCHAR) AS DOUBLE) AS gs1,
                    sum(n) AS gn
             FROM a GROUP BY dim),
       x AS (SELECT a.l, a.dim, CAST(a.n AS DOUBLE) AS n,
                    CAST(CAST(a.s1 AS VARCHAR) AS DOUBLE) AS s1d,
                    CAST(CAST(a.s2 AS VARCHAR) AS DOUBLE) AS s2d,
                    g.gs1, CAST(g.gn AS DOUBLE) AS gn
             FROM a JOIN g ON a.dim = g.dim),
       s AS (SELECT sum(s2d - s1d * s1d / n) AS w,
                    sum(n * (s1d / n - gs1 / gn)
                          * (s1d / n - gs1 / gn)) AS b
             FROM x),
       meta AS (SELECT count(*) AS nv, count(DISTINCT label) AS k
                FROM embeddings)
       SELECT CAST(nv AS BIGINT) AS n_vectors,
              CAST(k AS INT) AS n_clusters,
              round(b, 4) AS between_ss,
              round(w, 4) AS within_ss,
              round(CASE WHEN k > 1 AND w > 0 AND nv > k
                         THEN (b / (k - 1.0)) / (w / (nv - k * 1.0))
                         END, 4) AS ch_index
       FROM s, meta""",
    doc="Calinski-Harabasz variance-ratio index of the labeled "
    "embedding set — the O(n*d) cluster-separability metric that "
    "reduces to per-(label, dim) decimal-exact moment aggregates "
    "(silhouette's O(n^2) alternative for 100 TB corpora) "
    "(operators/similarity.py::calinski_harabasz)",
)
def q_calinski_harabasz_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.similarity import calinski_harabasz

    return calinski_harabasz(_t(spark, sf_dir, "embeddings"))


@_register(
    "davies_bouldin_embeddings",
    """WITH d AS (SELECT e.label AS l, CAST(u.i - 1 AS INT) AS dim,
                        CAST(e.embedding[u.i] AS DOUBLE) AS xd
                 FROM embeddings e,
                      UNNEST(generate_series(1, len(e.embedding)))
                          AS u(i)),
       a AS (SELECT l, dim, count(*) AS n,
                    sum(CAST(xd AS DECIMAL(13,10))) AS s1,
                    sum(CAST(CAST(xd AS DECIMAL(13,10))
                             * CAST(xd AS DECIMAL(13,10))
                             AS DECIMAL(26,20))) AS s2
             FROM d GROUP BY 1, 2),
       mom AS (SELECT l, dim, n,
                      CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / n AS mu,
                      CAST(CAST(s2 AS VARCHAR) AS DOUBLE) / n
                      - (CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / n)
                        * (CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / n)
                          AS var_d
               FROM a),
       sig AS (SELECT l, sqrt(greatest(sum(var_d), 0.0)) AS sigma
               FROM mom GROUP BY l),
       dist AS (SELECT i.l AS li, j.l AS lj,
                       sqrt(sum((i.mu - j.mu) * (i.mu - j.mu))) AS dij
                FROM mom i JOIN mom j ON i.dim = j.dim AND i.l <> j.l
                GROUP BY 1, 2),
       r AS (SELECT li,
                    max(CASE WHEN dij > 0
                             THEN (si.sigma + sj.sigma) / dij END)
                        AS rmax
             FROM dist JOIN sig si ON si.l = dist.li
                       JOIN sig sj ON sj.l = dist.lj
             GROUP BY li),
       agg AS (SELECT avg(rmax) AS db, count(*) AS k FROM r),
       meta AS (SELECT count(*) AS nv FROM embeddings)
       SELECT CAST(nv AS BIGINT) AS n_vectors,
              CAST(k AS INT) AS n_clusters,
              round(db, 4) AS db_index
       FROM agg, meta""",
    doc="Davies-Bouldin index of the labeled embedding set — "
    "worst-pair cluster-similarity ratio averaged over clusters; "
    "same per-(label, dim) decimal-exact moment base as "
    "calinski_harabasz, k^2*d aggregate-sized centroid-distance "
    "join, no pairwise row join "
    "(operators/similarity.py::davies_bouldin)",
)
def q_davies_bouldin_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.similarity import davies_bouldin

    return davies_bouldin(_t(spark, sf_dir, "embeddings"))


@_register(
    "rbo_int8_vs_float",
    # Same scoring CTEs as int8_vs_float_topk; the RBO tail uses the
    # suffix-sum identity over the 5-row depth frame.
    r"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
       s AS (SELECT vec_id, v,
                    list_max(list_transform(v, x -> abs(x))) / 127.0
                        AS scale
             FROM e),
       q AS (SELECT vec_id, v, scale,
                    list_transform(v, x -> CASE WHEN scale = 0 THEN 0.0
                        ELSE round(x / scale, 0) END) AS qv
             FROM s),
       qq AS (SELECT v AS q_v, qv AS q_qv, scale AS q_scale
              FROM q WHERE vec_id = 0),
       scored AS (
         SELECT q.vec_id,
                round(list_dot_product(q.v, qq.q_v)
                      / (sqrt(list_dot_product(q.v, q.v))
                         * sqrt(list_dot_product(qq.q_v, qq.q_v))), 4)
                    AS cosine,
                round(q.scale * qq.q_scale
                      * list_dot_product(q.qv, qq.q_qv), 4) AS int8_dot
         FROM q, qq WHERE q.vec_id <> 0),
       f AS (SELECT vec_id,
                    row_number() OVER (ORDER BY cosine DESC, vec_id)
                        AS ra
             FROM scored),
       i AS (SELECT vec_id,
                    row_number() OVER (ORDER BY int8_dot DESC, vec_id)
                        AS rb
             FROM scored),
       m AS (SELECT greatest(f.ra, i.rb) AS mm
             FROM f JOIN i ON f.vec_id = i.vec_id
             WHERE f.ra <= 5 AND i.rb <= 5),
       dep AS (SELECT d,
                      sum(pow(0.9, d - 1) / d) OVER (ORDER BY d DESC)
                          AS sfx
               FROM (SELECT UNNEST(generate_series(1, 5)) AS d)),
       t AS (SELECT count(*) AS n_common,
                    coalesce(sum(dep.sfx), 0.0) AS ssum
             FROM m JOIN dep ON dep.d = m.mm)
       SELECT 5 AS k, CAST(0.9 AS DOUBLE) AS p,
              CAST(n_common AS BIGINT) AS n_common,
              round(n_common / 5.0, 4) AS overlap_at_k,
              round(0.09999999999999998 * ssum, 4) AS rbo
       FROM t""",
    doc="rank-biased overlap (Webber 2010, truncated, p=0.9) between "
    "the float-cosine and int8-quantized top-5 rankings for one "
    "query — the top-weighted agreement readout behind the "
    "quantization go/no-go; suffix-sum identity over the 5-row depth "
    "frame, no per-depth recomputation "
    "(operators/similarity.py::rank_biased_overlap)",
)
def q_rbo_int8_vs_float(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import _shared
    from ..operators.similarity import rank_biased_overlap

    # the ≤2k-row ranking frame feeds both method filters, and each
    # side is consumed twice inside rank_biased_overlap (k_eff count +
    # matched join) — without the checkpoint the int8-vs-float scoring
    # subtree re-derived per consumer (measured r12: 6 parquet scans)
    both = _shared(q_int8_vs_float_topk(spark, sf_dir))
    a = both.filter(F.col("method") == "float").select(
        "neighbor_id", "rank"
    )
    b = both.filter(F.col("method") == "int8").select(
        "neighbor_id", "rank"
    )
    return rank_biased_overlap(a, b, p=0.9, k=5)


@_register(
    "intra_doc_line_dedup_docs",
    """WITH t AS (
         SELECT doc_id,
                'AD BANNER' || chr(10) || text || chr(10) || 'AD BANNER'
                    AS t2
         FROM documents),
       a AS (SELECT doc_id, string_split(t2, chr(10)) AS arr FROM t),
       l AS (SELECT doc_id, CAST(g.i AS INT) - 1 AS pos, arr[g.i] AS line
             FROM a CROSS JOIN
                  unnest(generate_series(1, len(arr))) AS g(i)),
       k AS (SELECT doc_id, pos, line,
                    row_number() OVER (PARTITION BY doc_id, line
                                       ORDER BY pos) > 1 AS dropped
             FROM l)
       SELECT doc_id,
              COALESCE(string_agg(CASE WHEN NOT dropped THEN line END,
                                  chr(10) ORDER BY pos), '')
                  AS text_deduped,
              CAST(count(*) AS BIGINT) AS n_lines,
              CAST(sum(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_dropped
       FROM k GROUP BY doc_id""",
    doc="within-document line dedup (keep-first repetition trim): the "
    "intra-page complement to the cross-doc C4 boilerplate filter — "
    "the query seeds a repeated line around every document so the "
    "keep-first provably fires; embarrassingly parallel over docs "
    "(operators/dedup.py::intra_doc_line_dedup)",
)
def q_intra_doc_line_dedup_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.dedup import intra_doc_line_dedup

    docs = _t(spark, sf_dir, "documents").withColumn(
        "text",
        F.concat(
            F.lit("AD BANNER\n"), F.col("text"), F.lit("\nAD BANNER")
        ),
    )
    return intra_doc_line_dedup(docs)


@_register(
    "readability_profile_docs",
    r"""WITH d AS (SELECT source,
                         len(list_filter(string_split_regex(trim(
                             coalesce(text, '')), '\s+'),
                             x -> x <> '')) AS w,
                         greatest(len(regexp_extract_all(
                             coalesce(text, ''), '[.!?]+')), 1) AS s,
                         len(regexp_extract_all(coalesce(text, ''),
                             '[aeiouyAEIOUY]+')) AS y
                  FROM documents),
       a AS (SELECT source, count(*) AS n_docs, sum(w) AS n_words,
                    sum(s) AS n_sentences, sum(y) AS n_syllables
             FROM d GROUP BY source)
       SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
              CAST(n_words AS BIGINT) AS n_words,
              CAST(n_sentences AS BIGINT) AS n_sentences,
              CAST(n_syllables AS BIGINT) AS n_syllables,
              round(n_words / CAST(n_sentences AS DOUBLE), 4)
                  AS words_per_sentence,
              round(n_syllables / CAST(n_words AS DOUBLE), 4)
                  AS syllables_per_word,
              round(206.835
                    - 1.015 * (n_words / CAST(n_sentences AS DOUBLE))
                    - 84.6 * (n_syllables / CAST(n_words AS DOUBLE)), 4)
                  AS flesch_reading_ease,
              round(0.39 * (n_words / CAST(n_sentences AS DOUBLE))
                    + 11.8 * (n_syllables / CAST(n_words AS DOUBLE))
                    - 15.59, 4) AS fk_grade
       FROM a""",
    doc="per-source Flesch reading ease / Flesch-Kincaid grade from "
    "exact regex surface counts (vowel-group syllable proxy, "
    "sentence runs floored at 1/doc) — the register-drift quality "
    "signal; map-only counts, one group aggregate "
    "(operators/textstats.py::readability_profile)",
)
def q_readability_profile_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.textstats import readability_profile

    return readability_profile(_t(spark, sf_dir, "documents"))


@_register(
    "source_diversity_profile_docs",
    r"""WITH per AS (SELECT source,
                          sum(len(list_filter(string_split_regex(trim(
                              coalesce(text, '')), '\s+'),
                              x -> x <> ''))) AS m
                   FROM documents GROUP BY source),
       tot AS (SELECT sum(m) AS tt, count(*) AS ns, max(m) AS mm
               FROM per),
       e AS (SELECT sum(CASE WHEN per.m > 0
                             THEN -(per.m / CAST(tot.tt AS DOUBLE))
                                  * ln(per.m / CAST(tot.tt AS DOUBLE))
                             ELSE 0.0 END) AS h,
                    sum((per.m / CAST(tot.tt AS DOUBLE))
                        * (per.m / CAST(tot.tt AS DOUBLE))) AS simpson,
                    max(tot.ns) AS ns,
                    max(tot.tt) AS tt,
                    max(tot.mm / CAST(tot.tt AS DOUBLE)) AS top
             FROM per, tot)
       SELECT CAST(ns AS BIGINT) AS n_sources,
              CAST(tt AS BIGINT) AS total_tokens,
              round(h, 6) AS shannon_entropy,
              round(exp(h), 6) AS effective_sources,
              round(simpson, 6) AS simpson,
              round(CASE WHEN simpson > 0 THEN 1.0 / simpson END, 6)
                  AS inv_simpson,
              round(top, 6) AS top_source_share
       FROM e""",
    doc="source-diversity indices over token mass: Shannon entropy, "
    "effective source count exp(H), Simpson collision index and "
    "inverse, top-source share — the mixture-governance dashboard "
    "row; aggregate-sized end to end "
    "(operators/textstats.py::source_diversity_profile)",
)
def q_source_diversity_profile_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.textstats import source_diversity_profile

    return source_diversity_profile(_t(spark, sf_dir, "documents"))


@_register(
    "banding_scurve_empirical_docs",
    r"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                  FROM documents),
       sh AS (SELECT DISTINCT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
              FROM t, UNNEST(generate_series(1, greatest(len(toks) - 2, 0)))
                   AS u(i)),
       sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                    count(*) AS n_common
             FROM sh a JOIN sh b
               ON a.shingle = b.shingle AND a.doc_id < b.doc_id
             GROUP BY 1, 2),
       truth AS (SELECT p.doc_a, p.doc_b,
                        floor(CAST(p.n_common AS DOUBLE)
                              / (sa.n_sh + sb.n_sh - p.n_common)
                              * 100) / 100.0 AS jb
                 FROM p JOIN sizes sa ON p.doc_a = sa.doc_id
                        JOIN sizes sb ON p.doc_b = sb.doc_id
                 WHERE CAST(p.n_common AS DOUBLE)
                       / (sa.n_sh + sb.n_sh - p.n_common) >= 0.3),
       sig AS (SELECT doc_id, s.i,
                      min(md5(CAST(s.i AS VARCHAR) || '-' || shingle)) AS mh
               FROM sh CROSS JOIN UNNEST(generate_series(0, 15)) AS s(i)
               GROUP BY doc_id, s.i),
       band AS (SELECT doc_id, CAST(i // 4 AS INT) AS band_idx,
                       string_agg(mh, '|' ORDER BY i) AS band_key
                FROM sig GROUP BY doc_id, CAST(i // 4 AS INT)),
       cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM band a JOIN band b
                  ON a.band_idx = b.band_idx AND a.band_key = b.band_key
                 AND a.doc_id < b.doc_id)
       SELECT truth.jb AS j_bucket,
              CAST(count(*) AS BIGINT) AS n_pairs,
              CAST(sum(CASE WHEN cand.doc_a IS NOT NULL
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_collided,
              round(sum(CASE WHEN cand.doc_a IS NOT NULL
                             THEN 1 ELSE 0 END)
                    / CAST(count(*) AS DOUBLE), 6) AS observed_rate,
              round(1.0 - pow(1.0 - pow(truth.jb, 4.0), 4.0), 6)
                  AS theoretical_rate
       FROM truth LEFT JOIN cand
         ON truth.doc_a = cand.doc_a AND truth.doc_b = cand.doc_b
       GROUP BY truth.jb""",
    doc="empirical banding S-curve: per exact-Jaccard bucket, the "
    "fraction of observable near-dup pairs the 4x4 md5-MinHash "
    "banding actually surfaces, next to the theoretical "
    "1-(1-j^r)^b — the measured check on lsh_banding_planner's "
    "theory before committing (b, r) at 100 TB "
    "(operators/dedup.py::banding_scurve_empirical)",
)
def q_banding_scurve_empirical_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.dedup import banding_scurve_empirical

    return banding_scurve_empirical(
        _t(spark, sf_dir, "documents"),
        jaccard_floor=0.3,
        n_hashes=16,
        bands=4,
    )


@_register(
    "reshard_movement_report_docs",
    """WITH h AS (SELECT CAST(CAST('0x' || substr(md5('42-'
                       || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                       AS BIGINT) AS hv
                 FROM documents),
       f AS (SELECT CAST(hv % 16 AS INT) AS shard_from,
                    CAST(hv % 24 AS INT) AS shard_to,
                    count(*) AS n_rows
             FROM h GROUP BY 1, 2),
       t AS (SELECT sum(n_rows) AS tot FROM f)
       SELECT shard_from, shard_to,
              CAST(n_rows AS BIGINT) AS n_rows,
              shard_from <> shard_to AS moved,
              round(n_rows / CAST(tot AS DOUBLE), 6) AS flow_share
       FROM f, t""",
    doc="reshard cost planner for the 16 -> 24 mod-hash resize: "
    "per-(from, to) row flows off the shared md5 shuffle key, moved "
    "flags, shares — the bytes-over-the-wire budget a 100 TB layout "
    "migration checks before resizing "
    "(operators/shard.py::reshard_movement_report)",
)
def q_reshard_movement_report_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.shard import reshard_movement_report

    return reshard_movement_report(
        _t(spark, sf_dir, "documents"), n_from=16, n_to=24, seed=42
    )


@_register(
    "hubness_profile_embeddings",
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
       p AS (SELECT a.vec_id AS qa, b.vec_id AS qb,
                    list_dot_product(a.v, b.v)
                    / (sqrt(list_dot_product(a.v, a.v))
                       * sqrt(list_dot_product(b.v, b.v))) AS c
             FROM v a JOIN v b ON a.vec_id <> b.vec_id),
       r AS (SELECT qb, count(*) AS ko
             FROM (SELECT qa, qb,
                          row_number() OVER (PARTITION BY qa
                                             ORDER BY c DESC, qb) AS rk
                   FROM p)
             WHERE rk <= 10 GROUP BY qb),
       pv AS (SELECT coalesce(r.ko, 0) AS ko
              FROM v LEFT JOIN r ON r.qb = v.vec_id),
       mom AS (SELECT avg(CAST(ko AS DOUBLE)) AS m1,
                      avg(CAST(ko AS DOUBLE) * ko) AS m2,
                      avg(CAST(ko AS DOUBLE) * ko * ko) AS m3
               FROM pv),
       h AS (SELECT ko AS k_occurrence, count(*) AS n_vectors
             FROM pv GROUP BY ko)
       SELECT CAST(k_occurrence AS INT) AS k_occurrence,
              CAST(n_vectors AS BIGINT) AS n_vectors,
              round(CASE WHEN m2 - m1 * m1 > 0
                         THEN (m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1)
                              / pow(m2 - m1 * m1, 1.5) END, 4)
                  AS skewness,
              round(m1, 4) AS mean_k_occurrence
       FROM h, mom""",
    doc="hubness profile (Radovanovic 2010): k-occurrence histogram "
    "of the cosine top-10 graph with its skewness — the "
    "high-dimensional hub pathology audit behind kNN/ANN recall; "
    "documented quadratic audit tier with an eager max_rows sample "
    "cap, E[N_k]=k self-check "
    "(operators/similarity.py::hubness_profile)",
)
def q_hubness_profile_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.similarity import hubness_profile

    return hubness_profile(_t(spark, sf_dir, "embeddings"), k=10)


@_register(
    "temperature_sweep_plan_docs",
    r"""WITH per AS (SELECT source,
                          sum(len(list_filter(string_split_regex(trim(
                              coalesce(text, '')), '\s+'),
                              x -> x <> ''))) AS token_mass
                   FROM documents GROUP BY source),
       g AS (SELECT UNNEST(CAST([0.5, 0.7, 1.0, 1.5, 2.0, 3.0]
                                AS DOUBLE[])) AS temperature),
       raw AS (SELECT g.temperature, per.source, per.token_mass,
                      pow(CAST(per.token_mass AS DOUBLE),
                          1.0 / g.temperature) AS u
               FROM per, g),
       w AS (SELECT temperature, source, token_mass,
                    u / sum(u) OVER (PARTITION BY temperature) AS p
             FROM raw)
       SELECT temperature, source,
              CAST(token_mass AS BIGINT) AS token_mass,
              round(p, 6) AS weight,
              round(sum(CASE WHEN p > 0 THEN -p * ln(p) ELSE 0.0 END)
                        OVER (PARTITION BY temperature), 6) AS entropy,
              round(exp(sum(CASE WHEN p > 0 THEN -p * ln(p)
                            ELSE 0.0 END)
                        OVER (PARTITION BY temperature)), 6)
                  AS effective_sources,
              round(max(p) OVER (PARTITION BY temperature), 6)
                  AS top_share
       FROM w""",
    doc="sampling-temperature sweep planner: per candidate tau, the "
    "m^(1/tau) flattened source mixture with entropy / effective "
    "source count / top share — the mT5/Gopher mixture-design grid "
    "run as one aggregate query before temperature_mixture_sample "
    "draws the chosen tau (operators/sample.py::temperature_sweep_plan)",
)
def q_temperature_sweep_plan_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.sample import temperature_sweep_plan

    return temperature_sweep_plan(_t(spark, sf_dir, "documents"))


@_register(
    "consistent_vs_mod_reshard_docs",
    """WITH h AS (SELECT doc_id,
                        CAST(CAST('0x' || substr(md5('42-'
                             || CAST(doc_id AS VARCHAR)), 1, 8)
                             AS BIGINT) AS BIGINT) AS hv
                 FROM documents),
       e AS (SELECT h.doc_id,
                    CAST(h.hv % 16 AS INT) AS mf,
                    CAST(h.hv % 17 AS INT) AS mt,
                    s.s AS s,
                    md5('42-' || CAST(s.s AS VARCHAR) || '-'
                        || CAST(h.doc_id AS VARCHAR)) AS shv
             FROM h, UNNEST(generate_series(0, 16)) AS s(s)),
       a AS (SELECT doc_id, mf, mt,
                    arg_max(s, CASE WHEN s < 16 THEN shv END) AS hf,
                    arg_max(s, shv) AS ht
             FROM e GROUP BY doc_id, mf, mt),
       c AS (SELECT count(*) AS n,
                    sum(CASE WHEN mf <> mt THEN 1 ELSE 0 END) AS modm,
                    sum(CASE WHEN hf <> ht THEN 1 ELSE 0 END) AS hrwm
             FROM a)
       SELECT 'mod' AS scheme, CAST(n AS BIGINT) AS n_rows,
              CAST(modm AS BIGINT) AS n_moved,
              round(modm / CAST(n AS DOUBLE), 6) AS moved_fraction,
              round(1.0 - 16.0 / 272.0, 6) AS expected_fraction
       FROM c
       UNION ALL
       SELECT 'hrw', CAST(n AS BIGINT), CAST(hrwm AS BIGINT),
              round(hrwm / CAST(n AS DOUBLE), 6),
              round(1.0 / 17.0, 6)
       FROM c""",
    doc="rendezvous (HRW) vs mod-hash movement under the 16 -> 17 "
    "resize: measured moved fractions vs closed-form expectations "
    "(HRW ~1/17, mod ~16/17) — the one-query justification for "
    "consistent placement before a 100 TB layout migration "
    "(operators/shard.py::consistent_vs_mod_reshard)",
)
def q_consistent_vs_mod_reshard_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.shard import consistent_vs_mod_reshard

    return consistent_vs_mod_reshard(
        _t(spark, sf_dir, "documents"), n_from=16, n_to=17, seed=42
    )


@_register(
    "dunn_index_embeddings",
    """WITH d AS (SELECT e.label AS l, CAST(u.i - 1 AS INT) AS dim,
                        CAST(e.embedding[u.i] AS DOUBLE) AS xd
                 FROM embeddings e,
                      UNNEST(generate_series(1, len(e.embedding)))
                          AS u(i)),
       a AS (SELECT l, dim, count(*) AS n,
                    sum(CAST(xd AS DECIMAL(13,10))) AS s1,
                    sum(CAST(CAST(xd AS DECIMAL(13,10))
                             * CAST(xd AS DECIMAL(13,10))
                             AS DECIMAL(26,20))) AS s2
             FROM d GROUP BY 1, 2),
       mom AS (SELECT l, dim,
                      CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / n AS mu,
                      CAST(CAST(s2 AS VARCHAR) AS DOUBLE) / n
                      - (CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / n)
                        * (CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / n)
                          AS var_d
               FROM a),
       diam AS (SELECT l, 2.0 * sqrt(greatest(sum(var_d), 0.0)) AS dm
                FROM mom GROUP BY l),
       dist AS (SELECT i.l AS li, j.l AS lj,
                       sqrt(sum((i.mu - j.mu) * (i.mu - j.mu))) AS dij
                FROM mom i JOIN mom j ON i.dim = j.dim AND i.l < j.l
                GROUP BY 1, 2),
       mn AS (SELECT min(dij) AS min_ic FROM dist),
       mx AS (SELECT max(dm) AS max_ia FROM diam),
       meta AS (SELECT count(*) AS nv, count(DISTINCT label) AS k
                FROM embeddings)
       SELECT CAST(nv AS BIGINT) AS n_vectors,
              CAST(k AS INT) AS n_clusters,
              round(min_ic, 4) AS min_intercluster,
              round(max_ia, 4) AS max_intracluster,
              round(CASE WHEN max_ia > 0 THEN min_ic / max_ia END, 4)
                  AS dunn_index
       FROM mn, mx, meta""",
    doc="Dunn index (centroid-linkage / 2-sigma diameter proxy) of "
    "the labeled embedding set — min inter-centroid distance over "
    "max intra-cluster spread; completes the cluster-validity trio "
    "on the shared per-(label, dim) decimal-exact moment base "
    "(operators/similarity.py::dunn_index)",
)
def q_dunn_index_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import dunn_index

    return dunn_index(_t(spark, sf_dir, "embeddings"))


@_register(
    "mann_kendall_daily_revenue",
    """WITH d AS (SELECT CAST(o_orderdate AS DATE) - DATE '1970-01-01'
                        AS x,
                      CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                           AS DOUBLE) AS y
               FROM orders GROUP BY CAST(o_orderdate AS DATE)),
       pr AS (SELECT CAST(sign(b.y - a.y) AS BIGINT) AS sgn
              FROM d a JOIN d b ON a.x < b.x),
       s AS (SELECT coalesce(sum(sgn), 0) AS s_stat,
                    count(*) AS n_pairs
             FROM pr),
       np AS (SELECT count(*) AS n FROM d),
       ties AS (SELECT coalesce(sum(CAST(t AS DOUBLE) * (t - 1)
                                    * (2 * t + 5)), 0.0) AS tie_term
                FROM (SELECT count(*) AS t FROM d GROUP BY y
                      HAVING count(*) > 1))
       SELECT CAST(n AS BIGINT) AS n_points,
              CAST(n_pairs AS BIGINT) AS n_pairs,
              CAST(s_stat AS BIGINT) AS s_statistic,
              round((CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5)
                     - tie_term) / 18.0, 4) AS var_s,
              round(CASE WHEN (CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5)
                               - tie_term) / 18.0 <= 0 THEN NULL
                         WHEN s_stat > 0
                         THEN (s_stat - 1)
                              / sqrt((CAST(n AS DOUBLE) * (n - 1)
                                      * (2 * n + 5) - tie_term) / 18.0)
                         WHEN s_stat < 0
                         THEN (s_stat + 1)
                              / sqrt((CAST(n AS DOUBLE) * (n - 1)
                                      * (2 * n + 5) - tie_term) / 18.0)
                         ELSE 0.0 END, 4) AS z
       FROM s, np, ties""",
    doc="Mann-Kendall monotone-trend test on daily revenue: exact "
    "integer S over the calendar-bounded day-pair join (quadratic in "
    "days, never facts — the theil_sen discipline), tie-corrected "
    "variance, continuity-corrected Z — the significance companion "
    "to the Theil-Sen slope "
    "(operators/profile.py::mann_kendall_trend)",
)
def q_mann_kendall_daily_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.profile import mann_kendall_trend

    d = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("y")
        )
        .select(
            F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
            .alias("x"),
            "y",
        )
    )
    return mann_kendall_trend(d)


@_register(
    "degree_powerlaw_fit_copurchase",
    """WITH e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
                  FROM lineitem a
                  JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                                 AND a.l_partkey <> b.l_partkey),
       deg AS (SELECT src, count(*) AS d FROM e GROUP BY 1),
       tot AS (SELECT count(*) AS n_nodes, max(d) AS max_degree
               FROM deg),
       tail AS (SELECT count(*) AS n_tail,
                       coalesce(sum(ln(CAST(d AS DOUBLE) / 5.0)), 0.0)
                           AS sln
                FROM deg WHERE d >= 5)
       SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
              CAST(max_degree AS BIGINT) AS max_degree,
              5 AS d_min,
              CAST(n_tail AS BIGINT) AS n_tail,
              round(n_tail / CAST(n_nodes AS DOUBLE), 6)
                  AS tail_fraction,
              round(CASE WHEN sln > 0 THEN 1.0 + n_tail / sln END, 4)
                  AS alpha
       FROM tot, tail""",
    doc="Hill power-law tail fit (alpha at fixed d_min=5) of the "
    "co-purchase degree distribution — the skew-triage number that "
    "decides whether graph ops need hub caps; two hash aggregates, "
    "1-row frames (operators/graph.py::degree_powerlaw_fit)",
)
def q_degree_powerlaw_fit_copurchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.graph import copurchase_edges, degree_powerlaw_fit

    return degree_powerlaw_fit(
        copurchase_edges(_t(spark, sf_dir, "lineitem")), d_min=5
    )


@_register(
    "loo_source_impact_docs",
    r"""WITH per AS (SELECT source, count(*) AS n_rows,
                          sum(len(list_filter(string_split_regex(trim(
                              coalesce(text, '')), '\s+'),
                              x -> x <> ''))) AS s
                   FROM documents GROUP BY source),
       tot AS (SELECT sum(n_rows) AS nt, sum(s) AS st FROM per)
       SELECT source, CAST(n_rows AS BIGINT) AS n_rows,
              round(s / CAST(n_rows AS DOUBLE), 6) AS group_mean,
              round(st / CAST(nt AS DOUBLE), 6) AS global_mean,
              round(CASE WHEN nt > n_rows
                         THEN (st - s) / CAST(nt - n_rows AS DOUBLE)
                         END, 6) AS loo_mean,
              round(st / CAST(nt AS DOUBLE)
                    - CASE WHEN nt > n_rows
                           THEN (st - s) / CAST(nt - n_rows AS DOUBLE)
                           END, 6) AS delta
       FROM per, tot""",
    doc="leave-one-source-out impact on the corpus mean tokens/doc: "
    "per source, the global mean without it and the delta its "
    "presence contributes — the one-pass data-valuation readout "
    "before dropping or capping a source "
    "(operators/curation.py::loo_group_impact)",
)
def q_loo_source_impact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import nonempty_token_count
    from ..operators.curation import loo_group_impact

    return loo_group_impact(
        _t(spark, sf_dir, "documents"),
        nonempty_token_count("text"),
        "source",
    )


@_register(
    "split_ks_report_orders",
    """WITH base AS (
         SELECT o_orderkey, o_totalprice, o_custkey,
                CAST(CAST('0x' || substr(md5('42-'
                     || CAST(o_orderkey AS VARCHAR)), 1, 8) AS BIGINT)
                     % 2 AS INT) AS side
         FROM orders),
       k1 AS (
         SELECT 'o_totalprice' AS col,
                max(abs(CAST(ca AS DOUBLE) / na
                        - CAST(cb AS DOUBLE) / nb)) AS ks,
                max(na) AS na, max(nb) AS nb
         FROM (SELECT v, max(ca) AS ca, max(cb) AS cb,
                      max(na) AS na, max(nb) AS nb
               FROM (SELECT o_totalprice AS v,
                            sum(CASE WHEN side = 0 THEN 1 ELSE 0 END)
                                OVER (ORDER BY o_totalprice, o_orderkey
                                      ROWS UNBOUNDED PRECEDING) AS ca,
                            sum(CASE WHEN side = 1 THEN 1 ELSE 0 END)
                                OVER (ORDER BY o_totalprice, o_orderkey
                                      ROWS UNBOUNDED PRECEDING) AS cb,
                            sum(CASE WHEN side = 0 THEN 1 ELSE 0 END)
                                OVER () AS na,
                            sum(CASE WHEN side = 1 THEN 1 ELSE 0 END)
                                OVER () AS nb
                     FROM base WHERE o_totalprice IS NOT NULL)
               GROUP BY v)),
       k2 AS (
         SELECT 'o_custkey' AS col,
                max(abs(CAST(ca AS DOUBLE) / na
                        - CAST(cb AS DOUBLE) / nb)) AS ks,
                max(na) AS na, max(nb) AS nb
         FROM (SELECT v, max(ca) AS ca, max(cb) AS cb,
                      max(na) AS na, max(nb) AS nb
               FROM (SELECT o_custkey AS v,
                            sum(CASE WHEN side = 0 THEN 1 ELSE 0 END)
                                OVER (ORDER BY o_custkey, o_orderkey
                                      ROWS UNBOUNDED PRECEDING) AS ca,
                            sum(CASE WHEN side = 1 THEN 1 ELSE 0 END)
                                OVER (ORDER BY o_custkey, o_orderkey
                                      ROWS UNBOUNDED PRECEDING) AS cb,
                            sum(CASE WHEN side = 0 THEN 1 ELSE 0 END)
                                OVER () AS na,
                            sum(CASE WHEN side = 1 THEN 1 ELSE 0 END)
                                OVER () AS nb
                     FROM base WHERE o_custkey IS NOT NULL)
               GROUP BY v))
       SELECT col AS column, CAST(na AS BIGINT) AS n_a,
              CAST(nb AS BIGINT) AS n_b, round(ks, 6) AS ks_stat
       FROM k1
       UNION ALL
       SELECT col, CAST(na AS BIGINT), CAST(nb AS BIGINT), round(ks, 6)
       FROM k2""",
    doc="per-column KS covariate-balance certificate for the md5 "
    "train/test split of orders (o_totalprice, o_custkey): the "
    "feature-level companion to srm_check — range-exchange running "
    "sums, never a single-partition window "
    "(operators/shard.py::split_ks_report)",
)
def q_split_ks_report_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.shard import split_ks_report

    return split_ks_report(
        _t(spark, sf_dir, "orders"),
        "o_orderkey",
        ["o_totalprice", "o_custkey"],
        seed=42,
    )


@_register(
    "dedup_growth_curve_docs",
    """WITH b AS (SELECT min(doc_id) AS min_id, max(doc_id) AS max_id
                 FROM documents),
       db AS (SELECT ((d.doc_id - b.min_id) * 10)
                     // (b.max_id - b.min_id + 1) + 1 AS bkt,
                     count(*) AS docs
              FROM documents d, b GROUP BY 1),
       fd AS (SELECT md5(coalesce(text, '')) AS h,
                     min(doc_id) AS first_doc
              FROM documents GROUP BY 1),
       vb AS (SELECT ((fd.first_doc - b.min_id) * 10)
                     // (b.max_id - b.min_id + 1) + 1 AS bkt,
                     count(*) AS dist
              FROM fd, b GROUP BY 1),
       cum AS (SELECT db.bkt,
                      sum(db.docs) OVER (ORDER BY db.bkt) AS cd,
                      sum(coalesce(vb.dist, 0)) OVER (ORDER BY db.bkt)
                          AS cu
               FROM db LEFT JOIN vb ON vb.bkt = db.bkt)
       SELECT CAST(bkt AS INT) AS checkpoint,
              CAST(cd AS BIGINT) AS cum_docs,
              CAST(cu AS BIGINT) AS cum_distinct,
              round(1.0 - cu / CAST(cd AS DOUBLE), 6) AS dup_fraction
       FROM cum""",
    doc="dedup-savings growth curve: cumulative docs vs cumulative "
    "distinct texts over 10 doc-range checkpoints (first-occurrence "
    "trick keyed on md5(text)) — the Heaps-law analog for "
    "duplication that forecasts post-dedup volume from a crawl "
    "prefix (operators/dedup.py::dedup_growth_curve)",
)
def q_dedup_growth_curve_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.dedup import dedup_growth_curve

    return dedup_growth_curve(
        _t(spark, sf_dir, "documents"), n_checkpoints=10
    )


@_register(
    "neyman_allocation_docs",
    r"""WITH per AS (SELECT source, count(*) AS n_rows,
                          sum(CAST(len(list_filter(string_split_regex(
                              trim(coalesce(text, '')), '\s+'),
                              x -> x <> '')) AS DECIMAL(18,0))) AS s1,
                          sum(CAST(CAST(len(list_filter(
                              string_split_regex(trim(coalesce(text,
                              '')), '\s+'), x -> x <> ''))
                              AS DECIMAL(18,0))
                              * CAST(len(list_filter(
                              string_split_regex(trim(coalesce(text,
                              '')), '\s+'), x -> x <> ''))
                              AS DECIMAL(18,0)) AS DECIMAL(38,0)))
                              AS s2
                   FROM documents GROUP BY source),
       m AS (SELECT source, n_rows,
                    sqrt(greatest(
                        CAST(CAST(s2 AS VARCHAR) AS DOUBLE) / n_rows
                        - (CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / n_rows)
                          * (CAST(CAST(s1 AS VARCHAR) AS DOUBLE)
                             / n_rows), 0.0)) AS sd
             FROM per),
       wq AS (SELECT source, n_rows, round(sd, 6) AS sd_tokens,
                     CAST(round(n_rows * sd * 1000000.0, 0) AS BIGINT)
                         AS wc
              FROM m),
       s AS (SELECT source, n_rows, sd_tokens,
                    10000.0 * wc / sum(wc) OVER () AS share,
                    CAST(floor(10000.0 * wc / sum(wc) OVER ())
                         AS BIGINT) AS base
             FROM wq),
       r AS (SELECT source, n_rows, sd_tokens, base,
                    10000 - sum(base) OVER () AS leftover,
                    row_number() OVER (ORDER BY share - base DESC,
                                       source) AS rk
             FROM s)
       SELECT source, CAST(n_rows AS BIGINT) AS n_rows, sd_tokens,
              CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                   AS BIGINT) AS alloc
       FROM r""",
    doc="Neyman-optimal stratified sampling allocation of a "
    "10000-row audit budget across sources (proportional to "
    "n_s*sd_s over per-doc token counts, decimal-exact moments, "
    "micro-unit quantized weights, largest-remainder integers) — "
    "audit more of the strata that are large AND noisy "
    "(operators/sample.py::neyman_allocation)",
)
def q_neyman_allocation_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sample import neyman_allocation

    return neyman_allocation(
        _t(spark, sf_dir, "documents"), "source", budget=10_000
    )


@_register(
    "source_modularity_neardup_docs",
    r"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                  FROM documents),
       sh AS (SELECT DISTINCT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
              FROM t, UNNEST(generate_series(1, greatest(len(toks) - 2, 0)))
                   AS u(i)),
       sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                    count(*) AS n_common
             FROM sh a JOIN sh b
               ON a.shingle = b.shingle AND a.doc_id < b.doc_id
             GROUP BY 1, 2),
       truth AS (SELECT p.doc_a, p.doc_b
                 FROM p JOIN sizes sa ON p.doc_a = sa.doc_id
                        JOIN sizes sb ON p.doc_b = sb.doc_id
                 WHERE CAST(p.n_common AS DOUBLE)
                       / (sa.n_sh + sb.n_sh - p.n_common) >= 0.3),
       tagged AS (SELECT truth.doc_a, truth.doc_b,
                         da.source AS sa, db.source AS sb
                  FROM truth
                  JOIN documents da ON da.doc_id = truth.doc_a
                  JOIN documents db ON db.doc_id = truth.doc_b),
       m1 AS (SELECT count(*) AS n_edges FROM tagged),
       deg AS (SELECT s, count(*) AS d FROM (
                 SELECT sa AS s FROM tagged
                 UNION ALL SELECT sb AS s FROM tagged) GROUP BY s),
       intra AS (SELECT sa AS s, count(*) AS e FROM tagged
                 WHERE sa = sb GROUP BY sa),
       per AS (SELECT deg.s, deg.d, coalesce(intra.e, 0) AS e
               FROM deg LEFT JOIN intra ON intra.s = deg.s),
       agg AS (SELECT sum(e / CAST(m1.n_edges AS DOUBLE)
                          - (d / (2.0 * m1.n_edges))
                            * (d / (2.0 * m1.n_edges))) AS mod,
                      sum(e) AS intra_e,
                      count(*) AS n_sources
               FROM per, m1)
       SELECT CAST(m1.n_edges AS BIGINT) AS n_edges,
              CAST(agg.n_sources AS BIGINT) AS n_sources,
              round(CASE WHEN m1.n_edges > 0
                         THEN intra_e / CAST(m1.n_edges AS DOUBLE) END,
                    6) AS intra_edge_fraction,
              round(CASE WHEN m1.n_edges > 0 THEN agg.mod END, 6)
                  AS modularity
       FROM agg, m1""",
    doc="Newman modularity of the source partition over the exact "
    "near-dup graph: Q near max -> duplication is intra-source "
    "(dedup shards by source); Q near 0 -> near-dups cross sources "
    "and the pass must be global. n_sources counts sources touching "
    "at least one edge (operators/dedup.py::source_modularity)",
)
def q_source_modularity_neardup_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.dedup import source_modularity

    return source_modularity(
        _t(spark, sf_dir, "documents"), threshold=0.3
    )


@_register(
    "ratio_metric_delta_ci_events",
    """WITH pu AS (SELECT user_id,
                   CAST(CAST('0x' || substr(md5('42-'
                        || CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT)
                        % 2 AS INT) AS arm,
                   CAST(sum(CASE WHEN event_type = 'purchase'
                            THEN 1 ELSE 0 END) AS DOUBLE) AS y,
                   CAST(count(*) AS DOUBLE) AS x
            FROM events GROUP BY user_id),
       m AS (SELECT arm, count(*) AS n, sum(y) AS sy, sum(x) AS sx,
                    avg(y) AS my, avg(x) AS mx,
                    var_samp(y) AS vy, var_samp(x) AS vx,
                    covar_samp(x, y) AS cxy
             FROM pu GROUP BY arm)
       SELECT arm, CAST(n AS BIGINT) AS n_users,
              round(sy, 4) AS sum_num, round(sx, 4) AS sum_den,
              round(sy / sx, 6) AS ratio,
              round(sqrt(greatest((vy + (sy / sx) * (sy / sx) * vx
                                   - 2.0 * (sy / sx) * cxy)
                                  / (n * mx * mx), 0.0)), 6) AS se,
              round(sy / sx - 1.959963984540054
                    * sqrt(greatest((vy + (sy / sx) * (sy / sx) * vx
                                     - 2.0 * (sy / sx) * cxy)
                                    / (n * mx * mx), 0.0)), 6)
                  AS ci_lo,
              round(sy / sx + 1.959963984540054
                    * sqrt(greatest((vy + (sy / sx) * (sy / sx) * vx
                                     - 2.0 * (sy / sx) * cxy)
                                    / (n * mx * mx), 0.0)), 6)
                  AS ci_hi
       FROM m""",
    doc="delta-method CI for the purchases-per-event ratio metric "
    "under user-level md5 randomization (Deng 2017): per-user "
    "(y, x) aggregates, per-arm moment frame, Var(R) = (Vy + R^2 Vx "
    "- 2R Cxy)/(n xbar^2) — the experimentation estimator when the "
    "analysis unit differs from the randomization unit "
    "(operators/profile.py::ratio_metric_delta_ci)",
)
def q_ratio_metric_delta_ci_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.profile import ratio_metric_delta_ci

    return ratio_metric_delta_ci(
        _t(spark, sf_dir, "events"),
        "user_id",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0),
        F.lit(1),
        seed=42,
    )


# Offline-learned unigram weights for the broadcast linear quality
# classifier, in integer micro-units (weight * 1e6). A literal frame,
# the way a fastText-style model's top-N features ship to the cluster.
_QC_WEIGHTS = [
    ("spark", 300000), ("query", 250000), ("vector", 220000),
    ("join", 200000), ("table", 180000), ("data", 150000),
    ("fast", 120000), ("stream", 110000), ("batch", 90000),
    ("hash", 70000), ("slow", -400000), ("small", -150000),
    ("scan", -80000), ("the", -60000), ("a", -50000),
    ("row", -30000),
]


@_register(
    "quality_classifier_docs",
    r"""WITH w(token, wm) AS (VALUES
            ('spark', 300000), ('query', 250000), ('vector', 220000),
            ('join', 200000), ('table', 180000), ('data', 150000),
            ('fast', 120000), ('stream', 110000), ('batch', 90000),
            ('hash', 70000), ('slow', -400000), ('small', -150000),
            ('scan', -80000), ('the', -60000), ('a', -50000),
            ('row', -30000)),
       t AS (SELECT doc_id, lower(u.t) AS tok
             FROM documents,
                  UNNEST(string_split_regex(trim(coalesce(text, '')),
                                            '\s+')) AS u(t)
             WHERE u.t <> ''),
       m AS (SELECT t.doc_id,
                    CAST(count(*) AS BIGINT) AS matched_tokens,
                    CAST(sum(w.wm) AS BIGINT) AS wsum
             FROM t JOIN w ON t.tok = w.token GROUP BY t.doc_id),
       z AS (SELECT d.doc_id,
                    CAST(COALESCE(m.matched_tokens, 0) AS BIGINT)
                        AS matched_tokens,
                    CAST(COALESCE(m.wsum, 0) - 1200000 AS BIGINT) AS lm
             FROM documents d LEFT JOIN m ON d.doc_id = m.doc_id)
       SELECT doc_id, matched_tokens, lm AS logit_micro,
              round(CAST(lm AS DOUBLE) / 1000000.0, 6) AS logit,
              round(1.0 / (1.0 + exp(-(CAST(lm AS DOUBLE) / 1000000.0))),
                    6) AS score,
              lm >= 0 AS keep
       FROM z""",
    doc="broadcast linear quality classifier (fastText/CCNet-style "
    "model-based curation stage): tokenize, broadcast-join a literal "
    "(token, micro-weight) table, per-doc BIGINT logit + sigmoid. "
    "Weights/bias in integer micro-units make the logit exact in any "
    "summation order; the keep cut compares the INTEGER logit, so "
    "the decision is bit-exact cross-engine; sigmoid is one exp "
    "rounded at 6 (operators/textstats.py::quality_classifier_score; "
    "composes with curate_corpus via classifier_weights)",
)
def q_quality_classifier_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textstats import quality_classifier_score

    w = spark.createDataFrame(
        _QC_WEIGHTS, "token string, weight_micro long"
    )
    return quality_classifier_score(
        _t(spark, sf_dir, "documents"), w, bias_micro=-1200000
    )


@_register(
    "multimodal_phash_pairs",
    r"""WITH d AS (SELECT doc_id, sha256(coalesce(text, '')) AS h
                  FROM documents),
       lanes AS (SELECT doc_id, CAST(i AS INTEGER) AS i,
                        CAST(CAST(concat('0x', substr(h, 2 * (i % 32) + 1, 2))
                             AS INTEGER) AS DOUBLE) / 256.0 AS f
                 FROM d, UNNEST(range(0, 60)) AS u(i)),
       m AS (SELECT doc_id, sum(f) / 60.0 AS mean
             FROM lanes GROUP BY doc_id),
       sig AS (SELECT l.doc_id,
                      CAST(sum(CASE WHEN l.f > m.mean
                               THEN CAST(1 AS BIGINT) << l.i
                               ELSE 0 END) AS BIGINT) AS s
               FROM lanes l JOIN m USING (doc_id)
               GROUP BY l.doc_id),
       blocks AS (SELECT doc_id, s, CAST(bi AS INTEGER) AS bi,
                         (s >> (CAST(bi AS INTEGER) * 10)) & 1023 AS bv
                  FROM sig, UNNEST(range(0, 6)) AS b(bi)),
       cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                                a.s AS sa, b.s AS sb
                FROM blocks a JOIN blocks b
                  ON a.bi = b.bi AND a.bv = b.bv
                 AND a.doc_id < b.doc_id)
       SELECT doc_a, doc_b,
              CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
       FROM cand WHERE bit_count(xor(sa, sb)) <= 5""",
    doc="perceptual image near-dup pairs: digest-fake decode -> 60-lane "
    "features -> aHash signature (bit = lane > mean; dyadic-exact) -> "
    "Hamming <= 5 pairs via the SimHash blocked-Hamming equi-join "
    "(pigeonhole recall 1, never all-pairs). Closes the image-dedup "
    "gap in the multimodal tier with zero codec dependencies; DuckDB "
    "replays every lane, bit and block from the sha256 hex "
    "(operators/multimodal.py::perceptual_near_dup_pairs, "
    "::ahash_signature; dedup.py::_blocked_hamming_pairs)",
)
def q_multimodal_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import perceptual_near_dup_pairs

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    return perceptual_near_dup_pairs(
        d, id_col="doc_id", dim=60, max_hamming=5, fake=True
    )


@_register(
    "streaming_stream_stream_left_outer",
    """SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id
       FROM events v LEFT JOIN events p
         ON v.user_id = p.user_id AND p.event_type = 'purchase'
        AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL '30 minutes'
       WHERE v.event_type = 'view'""",
    doc="STREAM-STREAM LEFT OUTER join with event-time range condition: "
    "every view emits, purchase-matched rows immediately, UNMATCHED "
    "views only when the global watermark passes view_ts + 30min + "
    "delay and their join state is EVICTED — the null-emission-on-"
    "eviction timing that distinguishes outer from inner streaming "
    "joins in production. On bounded input the batch LEFT JOIN is the "
    "oracle, which only holds because a far-future sentinel batch "
    "(mtime-ordered second micro-batch, maxFilesPerTrigger=1) advances "
    "both watermarks past every admissible match window and Spark's "
    "no-data final micro-batch flushes the evicted state; without the "
    "sentinel the last views' NULL rows would be withheld at stream "
    "end (eviction-timing pin: tests/test_streaming.py)",
)
def q_streaming_stream_stream_left_outer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import datetime as dt
    import shutil
    import tempfile
    import time as _time

    from ..streaming import parquet_stream_reader, run_windowed_batch
    from ..tuning import safe_collect

    raw = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        # withWatermark (EVENT_TIME) accepts only TIMESTAMP; the cast is
        # wall-clock-preserving because _t pins the session tz to UTC
        F.col("ts").cast("timestamp").alias("ts"),
    )
    t_max = raw.agg(F.max("ts")).first()[0]
    # sentinel rows (user_id -1, filtered from the result): one per
    # side so BOTH post-filter watermarks advance; 10h/20h offsets keep
    # the sentinels from matching anything incl. each other (20h-10h
    # and any real-row gap both exceed the 30min interval)
    sentinels = spark.createDataFrame(
        [
            (-1, -1, "view", t_max + dt.timedelta(hours=10)),
            (-1, -2, "purchase", t_max + dt.timedelta(hours=20)),
        ],
        raw.schema,
    )
    src = tempfile.mkdtemp(prefix="ss_louter_")
    try:
        raw.coalesce(1).write.mode("append").parquet(src)
        _time.sleep(1.1)  # distinct mtimes -> ordered micro-batches
        sentinels.coalesce(1).write.mode("append").parquet(src)
        schema = spark.read.parquet(src).schema

        def _src() -> DataFrame:
            return parquet_stream_reader(
                spark,
                src,
                schema,
                glob_filter="*.parquet",
                max_files_per_trigger=1,
            )

        views = (
            _src()
            .filter(F.col("event_type") == "view")
            .select(
                "user_id",
                F.col("event_id").alias("view_id"),
                F.col("ts").alias("view_ts"),
            )
            .withWatermark("view_ts", "2 hours")
        )
        purchases = (
            _src()
            .filter(F.col("event_type") == "purchase")
            .select(
                F.col("user_id").alias("p_user_id"),
                F.col("event_id").alias("purchase_id"),
                F.col("ts").alias("purchase_ts"),
            )
            .withWatermark("purchase_ts", "2 hours")
        )
        joined = views.join(
            purchases,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("purchase_ts") >= F.col("view_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("view_ts") + F.expr("INTERVAL 30 MINUTES")
            ),
            "leftOuter",
        )
        out = run_windowed_batch(
            joined,
            query_name="stream_stream_left_outer",
            output_mode="append",
        )
        res = out.filter(F.col("user_id") >= 0).select(
            "user_id", "view_id", "purchase_id"
        )
        # memory-sink lifetime: materialize via the guarded collect
        res = spark.createDataFrame(safe_collect(res, 500_000), res.schema)
    finally:
        shutil.rmtree(src, ignore_errors=True)
    return res
