"""Skew (salted aggregation) + bucketing co-located joins (SURVEY §4
partitioning improvements; the 100 TB levers the reference lacked)."""

from __future__ import annotations

from pyspark.sql import functions as F

from us_accidents_bigdata_pipeline_spark.tuning import salted_aggregate, write_bucketed

from .conftest import SF_ORACLE


def test_salted_aggregate_matches_plain(spark):
    # heavily skewed: 90% of rows share one key
    df = spark.range(20000).select(
        F.when(F.col("id") % 10 < 9, "hot").otherwise(
            F.concat(F.lit("k"), (F.col("id") % 100))
        ).alias("key"),
        (F.col("id") % 7).cast("double").alias("v"),
    )
    out = salted_aggregate(df, ["key"], {"v": "sum"}, n_salts=8)
    plain = df.groupBy("key").agg(F.sum("v").alias("sum_v"))
    a = {r.key: round(r.sum_v, 6) for r in out.collect()}
    b = {r.key: round(r.sum_v, 6) for r in plain.collect()}
    assert a == b

    cnt = salted_aggregate(df, ["key"], {"v": "count"}, n_salts=8)
    plain_cnt = df.groupBy("key").count()
    assert {r.key: r.count_v for r in cnt.collect()} == {
        r.key: r["count"] for r in plain_cnt.collect()
    }


def test_bucketed_join_skips_shuffle(spark):
    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    o = spark.read.parquet(f"{SF_ORACLE}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    write_bucketed(li, "li_b", ["l_orderkey"], n_buckets=8)
    write_bucketed(o, "o_b", ["o_orderkey"], n_buckets=8)
    try:
        a = spark.table("li_b")
        b = spark.table("o_b")
        # disable broadcast so the join strategy decision is about
        # bucketing, not table size
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = a.join(b, a.l_orderkey == b.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-bucketed join: no Exchange on either side
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")


def test_salted_join_matches_plain_inner_and_left(spark):
    from us_accidents_bigdata_pipeline_spark.tuning import salted_join

    # skewed left: 90% of rows carry key 7; right misses some keys so
    # left-join null padding is exercised
    left = spark.range(5000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7))
        .otherwise(F.col("id") % 50)
        .cast("long")
        .alias("k"),
        F.col("id").alias("lv"),
    )
    right = spark.range(0, 40).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("rv")
    )

    for how in ("inner", "left"):
        out = salted_join(left, right, on=["k"], how=how, n_salts=8)
        plain = left.join(right, ["k"], how)
        assert sorted(map(tuple, out.collect())) == sorted(
            map(tuple, plain.collect())
        ), how
        assert out.columns == plain.columns

    # unsupported modes refuse loudly rather than silently mis-joining
    import pytest as _pytest

    with _pytest.raises(ValueError):
        salted_join(left, right, on=["k"], how="full")
