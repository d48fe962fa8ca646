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


def token_budget_select(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    order_col: str = "n_chars",
    tokens_col: str = "n_toks",
) -> DataFrame:
    """Greedy token-budget corpus selection: rank documents by
    (``order_col`` DESC, ``id_col`` ASC) — quality-proxy first,
    deterministic tiebreak — and keep the longest prefix whose
    cumulative ``tokens_col`` stays within ``budget``. The operation a
    trainer runs to pick "the best N-token corpus" from a larger pool.

    Scale shape: the naive form is one GLOBAL-sort window cumsum — a
    total order over 100 TB. Instead:

    1. one distributed groupBy(``order_col``) pass aggregates token
       sums per ranking value (cardinality bounded by distinct
       document lengths/quality levels, thousands not billions);
    2. the driver walks that histogram (guarded collect) to find the
       CUTOFF value: every rank strictly above it is fully in-budget,
       and one partial bin holds the boundary;
    3. full bins come back as a plain filter (no sort, no shuffle);
       only the single cutoff bin — bounded by how many docs share one
       exact rank value — pays a window cumsum, partitioned on the
       cutoff value.

    The greedy prefix property (token counts are non-negative, so the
    cumulative sum is monotone) makes this exactly equal to the global
    window form, which is what the DuckDB oracle runs.
    """
    from ..tuning import safe_collect

    bins = (
        df.groupBy(order_col)
        .agg(F.sum(tokens_col).alias("_tok"))
        .orderBy(F.col(order_col).desc())
    )
    taken = 0
    cutoff = None
    remaining = 0
    for r in safe_collect(bins, max_rows=1_000_000):
        t = int(r["_tok"] or 0)
        if taken + t <= budget:
            taken += t
            continue
        cutoff = r[order_col]
        remaining = budget - taken
        break
    out_cols = [id_col, order_col, tokens_col]
    if cutoff is None:
        # the whole corpus fits the budget
        return df.select(*out_cols)
    from pyspark.sql import Window as W

    full = df.filter(F.col(order_col) > cutoff).select(*out_cols)
    w = (
        W.partitionBy(order_col)
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    part = (
        df.filter(F.col(order_col) == cutoff)
        .withColumn("_cum", F.sum(tokens_col).over(w))
        .filter(F.col("_cum") <= remaining)
        .select(*out_cols)
    )
    return full.unionByName(part)


def source_quota_cap(
    df: DataFrame,
    cap: int,
    id_col: str = "doc_id",
    group_col: str = "source",
    order_col: str = "n_chars",
) -> DataFrame:
    """Frequency capping: keep at most ``cap`` documents per
    ``group_col`` (domain/source), preferring high ``order_col`` with
    a deterministic ``id_col`` tiebreak — the standard defense against
    one crawl domain dominating a training mixture.

    One partitioned window (row_number per group) — shuffles once on
    the group key; no global order, no skew beyond the group sizes
    themselves."""
    from pyspark.sql import Window as W

    w = W.partitionBy(group_col).orderBy(
        F.col(order_col).desc(), F.col(id_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .select(id_col, group_col, order_col)
    )
