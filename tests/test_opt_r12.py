"""Round-12 optimization pins: the restructured shingle builder and the
shared-subtree materialization must preserve semantics and the improved
plan shape (OPTIMIZATION_r12.md)."""

from pyspark.sql import functions as F

from us_accidents_bigdata_pipeline_spark.operators.dedup import (
    _doc_shingles,
    _positional_grams,
    _shared,
    minhash_banded_pairs,
)


def _edge_docs(spark):
    return spark.createDataFrame(
        [
            (1, None),
            (2, ""),
            (3, "a b"),
            (4, "a b c"),
            (5, "a  b \t c d"),
            (6, "x y z x y z x y z"),
        ],
        "doc_id int, text string",
    )


def test_doc_shingles_matches_positional_formulation(spark):
    # the array formulation must be row-identical to the positional
    # (posexplode + lead window) formulation it replaced, including
    # NULL text, empty text, short docs and repeated shingles
    docs = _edge_docs(spark)
    for n in (2, 3, 5):
        new = _doc_shingles(docs, "doc_id", "text", n)
        old = (
            _positional_grams(docs, "doc_id", "text", n)
            .select("doc_id", F.col("gram").alias("shingle"))
            .distinct()
        )
        assert new.exceptAll(old).count() == 0
        assert old.exceptAll(new).count() == 0


def test_doc_shingles_plan_is_map_only_before_distinct(spark):
    # the optimization's point: shingle GENERATION carries no window
    # and no extra exchange — the only exchange is the distinct; and
    # the let-bound token array keeps exactly ONE regex split in the
    # plan (an inlined split would re-execute per generated shingle)
    docs = _edge_docs(spark)
    plan = (
        _doc_shingles(docs, "doc_id", "text", 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan, plan
    assert plan.count("split(trim(") == 1, plan
    assert plan.count("Exchange") <= 1, plan


def test_shared_subtree_is_computed_once(spark):
    # _shared must collapse the N-consumer re-derivation: the banded
    # pair query's plan re-read the corpus 12x before; with the shared
    # shingle/signature frames the parquet scan appears in no consumer
    # branch (all branches read the one checkpointed RDD)
    docs = _edge_docs(spark).filter(F.col("text").isNotNull())
    plan = (
        minhash_banded_pairs(docs, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Scan parquet" not in plan
    assert "Scan ExistingRDD" in plan


def test_shared_preserves_rows(spark):
    docs = _edge_docs(spark)
    sh = _doc_shingles(docs, "doc_id", "text", 3)
    a = sorted(map(tuple, sh.collect()))
    b = sorted(map(tuple, _shared(sh).collect()))
    assert a == b
