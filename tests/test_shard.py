"""Deterministic training-export shuffle/shard tests (operators/shard)."""

from __future__ import annotations

from pyspark.sql import functions as F

from us_accidents_bigdata_pipeline_spark.operators.shard import (
    shard_assignment,
    write_training_shards,
)

from .conftest import SF_ORACLE


def test_shard_assignment_partition_layout_independent(spark):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    a = {
        (r.doc_id): (r.shard, r.pos)
        for r in shard_assignment(docs, n_shards=16, seed=42).collect()
    }
    # identical corpus in a different physical layout -> identical shards
    b = {
        (r.doc_id): (r.shard, r.pos)
        for r in shard_assignment(
            docs.repartition(7), n_shards=16, seed=42
        ).collect()
    }
    assert a == b
    assert {s for s, _ in a.values()} <= set(range(16))
    # every row assigned exactly once; positions are 1..n per shard
    n_docs = docs.count()
    assert len(a) == n_docs
    by_shard: dict = {}
    for s, p in a.values():
        by_shard.setdefault(s, []).append(p)
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # a different seed yields a different permutation
    c = {
        (r.doc_id): (r.shard, r.pos)
        for r in shard_assignment(docs, n_shards=16, seed=7).collect()
    }
    assert c != a


def test_write_training_shards_roundtrip(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, n_shards=8, seed=42)
    back = spark.read.parquet(out)
    # lossless: every doc exactly once, payload columns intact
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()
    assert set(back.columns) == set(docs.columns) | {"shard"}
    # shard dirs match the assignment operator
    expect = {
        r.doc_id: r.shard
        for r in shard_assignment(docs, n_shards=8, seed=42).collect()
    }
    got = {r.doc_id: r.shard for r in back.select("doc_id", "shard").collect()}
    assert got == expect
    # partition pruning works on the shard column
    one = back.filter(F.col("shard") == 3).select("doc_id").collect()
    assert {r.doc_id for r in one} == {d for d, s in expect.items() if s == 3}


def test_pack_assignment_properties(spark):
    from us_accidents_bigdata_pipeline_spark.operators.shard import (
        pack_assignment,
    )

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    budget = 128
    rows = pack_assignment(docs, budget=budget, n_shards=4, seed=42).collect()
    assert len(rows) == docs.count()
    # offsets live inside the window; packs are dense from 0 per shard
    assert all(0 <= r.tok_offset < budget for r in rows)
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append((r.pack, r.tok_offset))
    for packs in by_shard.values():
        packs.sort()
        assert packs[0][0] == 0
        # document starts are strictly increasing in the token stream:
        # no two docs share a (pack, offset) start slot
        assert len(set(packs)) == len(packs)


def test_mixture_sample_deterministic_and_proportional(spark):
    from us_accidents_bigdata_pipeline_spark.operators.sample import (
        mixture_sample,
    )

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    rates = {"src0": 1.0, "src1": 0.5}
    a = {
        r.doc_id
        for r in mixture_sample(
            docs, rates, default_rate=0.0, seed=42
        ).collect()
    }
    b = {
        r.doc_id
        for r in mixture_sample(
            docs.repartition(13), rates, default_rate=0.0, seed=42
        ).collect()
    }
    assert a == b  # membership is layout-independent
    kept = mixture_sample(docs, rates, default_rate=0.0, seed=42)
    by_src = {r.source: r.n for r in kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    tot = {r.source: r.n for r in docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    # rate-1.0 stratum keeps everything; rate-0 strata keep nothing
    assert by_src.get("src0", 0) == tot["src0"]
    assert set(by_src) <= {"src0", "src1"}
    # rate-0.5 stratum within binomial tolerance
    frac = by_src.get("src1", 0) / tot["src1"]
    assert 0.3 < frac < 0.7, frac


def test_byte_stats_arrow_matches_jvm(spark):
    """mapInArrow path must agree exactly with the JVM octet_length
    expression it accelerates, including empty and non-ASCII payloads."""
    from us_accidents_bigdata_pipeline_spark.operators.multimodal import (
        byte_stats_arrow,
    )

    rows = [
        (1, b"hello"),
        (2, b""),
        (3, "héllo wörld".encode("utf-8")),
        (4, bytes(range(256))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r.doc_id: (r.n_bytes, r.is_empty)
        for r in byte_stats_arrow(df).collect()
    }
    jvm = {
        r.doc_id: (r.n, r.n == 0)
        for r in df.select(
            "doc_id", F.octet_length("payload").alias("n")
        ).collect()
    }
    assert got == {k: (int(v[0]), v[1]) for k, v in jvm.items()}
    assert got[4][0] == 256 and got[2] == (0, True)


def test_weighted_sample_deterministic_and_weight_biased(spark):
    """A-ES weighted sampling: (a) deterministic — identical selection
    across reruns and repartitionings; (b) weight-proportional — rows
    with 10x the weight are strongly over-represented vs their count
    share; (c) excludes non-positive weights; (d) exactly k rows."""
    from us_accidents_bigdata_pipeline_spark.operators.sample import (
        weighted_sample,
    )

    df = (
        spark.range(0, 2000)
        .withColumn(
            "w",
            F.when(F.col("id") < 200, F.lit(10.0)).otherwise(F.lit(1.0)),
        )
        .withColumn(
            "w",
            F.when(F.col("id") >= 1990, F.lit(-1.0)).otherwise(F.col("w")),
        )
    )
    got = weighted_sample(df, "id", "w", k=300)
    ids = sorted(r["id"] for r in got.collect())
    assert len(ids) == 300 and len(set(ids)) == 300
    ids2 = sorted(
        r["id"] for r in weighted_sample(df.repartition(7), "id", "w", k=300).collect()
    )
    assert ids == ids2
    assert all(i < 1990 for i in ids)  # non-positive weights excluded
    # heavy rows are 200/1990 ~ 10% of eligible rows but carry ~53% of
    # total weight; expect far more than their count share in the sample
    heavy = sum(1 for i in ids if i < 200)
    assert heavy > 90

    # plan: top-k must be TakeOrderedAndProject, not a global sort
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_curriculum_phases_ordering_and_balance(spark):
    """Within every shard: phases are contiguous easy->hard tiles
    (every phase-p doc is <= every phase-p+1 doc under the
    (order_col, id) order) and tile sizes differ by at most 1."""
    from us_accidents_bigdata_pipeline_spark.operators.shard import (
        curriculum_phases,
    )

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    rows = curriculum_phases(
        docs, n_shards=16, n_phases=4, seed=42
    ).collect()
    assert len(rows) == docs.count()
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(
            (r["n_chars"], r["doc_id"], r["phase"])
        )
    for shard, items in by_shard.items():
        items.sort()
        phases = [p for _, _, p in items]
        assert phases == sorted(phases), f"phase order broken in {shard}"
        from collections import Counter

        sizes = Counter(phases)
        assert max(sizes.values()) - min(sizes.values()) <= 1, (
            shard, sizes,
        )


def test_curriculum_phases_layout_independent(spark):
    from us_accidents_bigdata_pipeline_spark.operators.shard import (
        curriculum_phases,
    )

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    a = {
        (r["doc_id"], r["shard"], r["phase"])
        for r in curriculum_phases(docs, seed=7).collect()
    }
    b = {
        (r["doc_id"], r["shard"], r["phase"])
        for r in curriculum_phases(
            docs.repartition(13, "source"), seed=7
        ).collect()
    }
    assert a == b and a


def test_shard_balance_report_exact_shares(spark):
    from us_accidents_bigdata_pipeline_spark.operators.shard import (
        shard_balance_report,
    )

    df = spark.createDataFrame(
        [(i, 10 + i) for i in range(200)], "doc_id long, n_toks long"
    )
    rows = shard_balance_report(df, n_shards=16, seed=42).collect()
    assert sum(r["n_docs"] for r in rows) == 200
    total = sum(r["n_toks"] for r in rows)
    assert total == sum(10 + i for i in range(200))
    for r in rows:
        assert r["toks_per_10k"] == (r["n_toks"] * 10000) // total
    # floor shares can undershoot 10000 by at most n_shards - 1
    s = sum(r["toks_per_10k"] for r in rows)
    assert 10000 - len(rows) < s <= 10000
