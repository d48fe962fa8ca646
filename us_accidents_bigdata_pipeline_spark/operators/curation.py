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

    Each stage's frame derives lazily from the previous one — at real
    scale persist the survivor frames between stages (the counts frame
    evaluates every stage chain once per count otherwise).
    """
    from .dedup import (
        benchmark_decontaminate,
        exact_dedup,
        ngram_jaccard_pairs,
    )
    from .textstats import quality_score, repetition_stats

    s1 = docs.filter(quality_score(text_col) >= quality_min)
    non_rep = (
        repetition_stats(s1, id_col, text_col)
        .filter(~F.col("is_repetitive"))
        .select(id_col)
    )
    s2 = s1.join(non_rep, id_col)
    keepers = exact_dedup(s2, [text_col], id_col).select(id_col)
    s3 = s2.join(keepers, id_col)
    pairs = ngram_jaccard_pairs(
        s3, id_col, text_col, n=jaccard_n, threshold=jaccard_threshold
    )
    drop_b = pairs.select(F.col("doc_b").alias(id_col)).distinct()
    s4 = s3.join(drop_b, id_col, "left_anti")
    dec = benchmark_decontaminate(
        s4, bench, id_col=id_col, text_col=text_col, n=decontam_n
    )
    s5 = s4.join(
        dec.filter(~F.col("contaminated")).select(id_col), id_col
    )

    def _cnt(frame: DataFrame, idx: int, name: str) -> DataFrame:
        return frame.agg(F.count(F.lit(1)).alias("n_docs")).select(
            F.lit(idx).alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.col("n_docs"),
        )

    funnel = (
        _cnt(docs, 0, "raw")
        .unionByName(_cnt(s1, 1, "quality"))
        .unionByName(_cnt(s2, 2, "repetition"))
        .unionByName(_cnt(s3, 3, "exact_dedup"))
        .unionByName(_cnt(s4, 4, "near_dup"))
        .unionByName(_cnt(s5, 5, "decontaminated"))
    )
    return s5, funnel
