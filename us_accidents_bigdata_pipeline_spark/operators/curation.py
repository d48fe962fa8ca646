"""End-to-end corpus curation funnel — the composition every
LLM-training-data pipeline runs before export, assembled from this
package's individually-oracled stages:

raw → rule-based quality filter (``textstats.quality_score``)
    → repetition filter (``textstats.repetition_stats``, Gopher-style)
    → exact dedup (``dedup.exact_dedup``, deterministic keeper)
    → near-dup prune (``dedup.ngram_jaccard_pairs``: every qualifying
      (a < b) pair drops b — the pair-local rule; component-resolution
      survivors are the ``near_dup_resolve`` operator's job)
    → benchmark decontamination (``dedup.benchmark_decontaminate``)

Returns the per-stage survivor counts (the funnel report), and
optionally the curated frame itself. Because every stage is
deterministic and SQL-expressible, the WHOLE funnel carries a DuckDB
oracle (plans/queries.py::corpus_curation_funnel) — end-to-end
composition is checked, not just the stages.

Reference scope: the reference's clean pipeline is the
severity-analytics analog (data_cleaning.py keeps a row-count funnel in
its logs); this module is its training-corpus counterpart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def curate_corpus(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_min: float = 0.8,
    jaccard_n: int = 3,
    jaccard_threshold: float = 0.5,
    decontam_n: int = 5,
) -> tuple[DataFrame, DataFrame]:
    """Run the funnel; returns (curated_docs, funnel_counts) where
    funnel_counts is (stage_idx, stage, n_docs) with one row per stage.

    Each survivor frame is persisted while its count materializes, so
    every stage chain executes exactly ONCE (a lazy union-of-counts
    would re-derive the whole prefix chain per branch — at corpus
    scale that multiplies the expensive near-dup join by the number of
    downstream stages). The funnel frame itself is six driver rows.
    """
    from .dedup import (
        benchmark_decontaminate,
        exact_dedup,
        ngram_jaccard_pairs,
    )
    from .textstats import quality_score, repetition_flag

    spark = docs.sparkSession
    persisted: list[DataFrame] = []

    def _p(frame: DataFrame) -> DataFrame:
        frame = frame.persist()
        persisted.append(frame)
        return frame

    try:
        # Stages 1-2 are ROW-LOCAL predicates (the quality score and
        # the repetition flag are both pure column expressions —
        # textstats.repetition_flag), so annotate both in ONE pass
        # over the corpus: the text is tokenized once, no filter-stage
        # chain, no token-stream join, and the first three funnel
        # counts come from a single conditional aggregate. Empty-token
        # docs count as repetitive (inner-join parity with the
        # repetition_stats formulation, which omits them).
        ann = _p(
            docs.withColumn("_q_ok", quality_score(text_col) >= quality_min)
            .withColumn("_rep_ok", ~repetition_flag(text_col))
        )
        stage_counts = ann.agg(
            F.count(F.lit(1)).alias("raw"),
            F.sum(F.when(F.col("_q_ok"), 1).otherwise(0)).alias("q"),
            F.sum(
                F.when(F.col("_q_ok") & F.col("_rep_ok"), 1).otherwise(0)
            ).alias("qr"),
        ).first()
        s2 = _p(
            ann.filter(F.col("_q_ok") & F.col("_rep_ok")).drop(
                "_q_ok", "_rep_ok"
            )
        )
        keepers = exact_dedup(s2, [text_col], id_col).select(id_col)
        s3 = _p(s2.join(keepers, id_col))
        pairs = ngram_jaccard_pairs(
            s3, id_col, text_col, n=jaccard_n, threshold=jaccard_threshold
        )
        drop_b = pairs.select(F.col("doc_b").alias(id_col)).distinct()
        s4 = _p(s3.join(drop_b, id_col, "left_anti"))
        dec = benchmark_decontaminate(
            s4, bench, id_col=id_col, text_col=text_col, n=decontam_n
        )
        s5 = s4.join(
            dec.filter(~F.col("contaminated")).select(id_col), id_col
        )
        counts = [
            (0, "raw", stage_counts["raw"]),
            (1, "quality", int(stage_counts["q"])),
            (2, "repetition", int(stage_counts["qr"])),
            (3, "exact_dedup", s3.count()),
            (4, "near_dup", s4.count()),
            (5, "decontaminated", s5.count()),
        ]
    finally:
        for f in persisted:
            f.unpersist()
    funnel = spark.createDataFrame(
        counts, "stage_idx int, stage string, n_docs bigint"
    )
    return s5, funnel
