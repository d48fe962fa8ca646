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

from pyspark.sql import Column, DataFrame
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
    classifier_weights: DataFrame | None = None,
    classifier_bias_micro: int = 0,
    classifier_keep_logit_micro: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """Run the funnel; returns (curated_docs, funnel_counts) where
    funnel_counts is (stage_idx, stage, n_docs) with one row per stage.

    ``classifier_weights`` (optional) appends the model-based quality
    stage a GPT-3/CCNet-style funnel ends with: the broadcast linear
    classifier (``textstats.quality_classifier_score``) scores each
    decontaminated survivor and only ``keep`` docs pass — heuristics
    first (cheap, row-local), near-dup and decontamination next,
    classifier last where the candidate set is smallest.

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
        # r12: the token array is LET-BOUND in its own Project and fed
        # to both predicates — the inline forms re-executed the regex
        # split 10x per doc (CollapseProject keeps multi-referenced
        # non-cheap aliases bound, so the split runs once).
        from ..functions import word_tokens

        base = docs.select("*", word_tokens(text_col).alias("_toks"))
        ann = _p(
            base.select(
                *docs.columns,
                (
                    quality_score(text_col, toks=F.col("_toks"))
                    >= quality_min
                ).alias("_q_ok"),
                (~repetition_flag(text_col, toks=F.col("_toks"))).alias(
                    "_rep_ok"
                ),
            )
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
        ]
        if classifier_weights is not None:
            from .textstats import quality_classifier_score

            s5 = _p(s5)
            scored = quality_classifier_score(
                s5,
                classifier_weights,
                id_col=id_col,
                text_col=text_col,
                bias_micro=classifier_bias_micro,
                keep_logit_micro=classifier_keep_logit_micro,
            )
            s6 = s5.join(
                scored.filter(F.col("keep")).select(id_col), id_col
            )
            counts += [
                (5, "decontaminated", s5.count()),
                (6, "classifier", s6.count()),
            ]
            s_out = s6
        else:
            counts.append((5, "decontaminated", s5.count()))
            s_out = s5
    finally:
        for f in persisted:
            f.unpersist()
    funnel = spark.createDataFrame(
        counts, "stage_idx int, stage string, n_docs bigint"
    )
    return s_out, funnel


def token_budget_select(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    order_col: str = "n_chars",
    tokens_col: str = "n_toks",
    cutoff_bin_max_docs: int = 2_000_000,
) -> DataFrame:
    """Greedy token-budget corpus selection: rank documents by
    (``order_col`` DESC, ``id_col`` ASC) — quality-proxy first,
    deterministic tiebreak — and keep the longest prefix whose
    cumulative ``tokens_col`` stays within ``budget``. The operation a
    trainer runs to pick "the best N-token corpus" from a larger pool.

    Scale shape: the naive form is one GLOBAL-sort window cumsum — a
    total order over 100 TB. Instead:

    1. one distributed groupBy(``order_col``) pass aggregates token
       sums + doc counts per ranking value (cardinality bounded by
       distinct document lengths/quality levels, thousands not
       billions; the guarded collect rejects above 1M distinct rank
       values — bucket/round the rank column first if yours is
       continuous);
    2. the driver walks that histogram (guarded collect) to find the
       CUTOFF value: every rank strictly above it is fully in-budget,
       and one partial bin holds the boundary;
    3. full bins come back as a plain filter (no sort, no shuffle);
       only the single cutoff bin pays a window cumsum, partitioned on
       the cutoff value.

    Skew guard: the cutoff-bin window is single-task (one partition
    value), fine for real corpora where one exact rank value holds
    thousands of docs — but a pathological corpus (every doc the same
    length) would put the whole dataset in that task. When the
    histogram shows the cutoff bin holds more than
    ``cutoff_bin_max_docs`` docs, the bin is sub-bucketed into
    contiguous ``id_col`` ranges (approxQuantile boundaries — numeric
    ``id_col`` required on that path), each sub-bucket pays its own
    parallel window, and a second driver walk over the per-bucket token
    sums supplies exact prefix offsets — still exactly the global
    greedy prefix.

    NULL ``order_col`` rows are REJECTED (ValueError): a NULL rank has
    no position in the greedy order, and silently dropping rows from a
    budget selection is the kind of quiet data loss a curation pipeline
    must never do. Filter or impute upstream.

    The greedy prefix property (token counts are non-negative, so the
    cumulative sum is monotone) makes this exactly equal to the global
    window form, which is what the DuckDB oracle runs.
    """
    from ..tuning import safe_collect

    bins = (
        df.groupBy(order_col)
        .agg(
            F.sum(tokens_col).alias("_tok"),
            F.count(F.lit(1)).alias("_n"),
        )
        .orderBy(F.col(order_col).desc())
    )
    bin_rows = safe_collect(bins, max_rows=1_000_000)
    if any(r[order_col] is None for r in bin_rows):
        raise ValueError(
            f"token_budget_select: NULL values in order_col "
            f"{order_col!r} have no greedy rank — filter or impute "
            "them upstream"
        )
    taken = 0
    cutoff = None
    remaining = 0
    cutoff_bin_docs = 0
    for r in bin_rows:
        t = int(r["_tok"] or 0)
        if taken + t <= budget:
            taken += t
            continue
        cutoff = r[order_col]
        remaining = budget - taken
        cutoff_bin_docs = int(r["_n"])
        break
    out_cols = [id_col, order_col, tokens_col]
    if cutoff is None:
        # the whole corpus fits the budget
        return df.select(*out_cols)
    from pyspark.sql import Window as W

    full = df.filter(F.col(order_col) > cutoff).select(*out_cols)
    bin_df = df.filter(F.col(order_col) == cutoff)
    if cutoff_bin_docs <= cutoff_bin_max_docs:
        w = (
            W.partitionBy(order_col)
            .orderBy(id_col)
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        part = (
            bin_df.withColumn("_cum", F.sum(tokens_col).over(w))
            .filter(F.col("_cum") <= remaining)
            .select(*out_cols)
        )
        return full.unionByName(part)
    part = _cutoff_bin_prefix_bucketed(
        bin_df, remaining, id_col, tokens_col, out_cols,
        cutoff_bin_docs, cutoff_bin_max_docs,
    )
    return full.unionByName(part)


def _cutoff_bin_prefix_bucketed(
    bin_df: DataFrame,
    remaining: int,
    id_col: str,
    tokens_col: str,
    out_cols: list,
    bin_docs: int,
    max_docs: int,
) -> DataFrame:
    """Exact greedy prefix (by ``id_col`` ASC) over a single oversized
    cutoff bin, without a single-task window: split the bin into
    contiguous ``id_col`` ranges at approxQuantile boundaries (order-
    preserving, so range k's ids all precede range k+1's), run one
    PARALLEL window per range, and add each range's exact token-sum
    offset (second driver walk over ~n_buckets rows). A row is in the
    prefix iff offset(bucket) + within-bucket cumsum <= remaining —
    identical to the global cumsum because the buckets tile the id
    order."""
    import math

    from pyspark.sql import Window as W

    id_type = dict(bin_df.dtypes).get(id_col, "")
    if id_type not in (
        "tinyint", "smallint", "int", "bigint", "float", "double",
        "decimal",
    ) and not id_type.startswith("decimal"):
        raise ValueError(
            "token_budget_select: cutoff bin holds "
            f"{bin_docs} docs (> cutoff_bin_max_docs={max_docs}) and "
            f"id_col {id_col!r} is {id_type or 'unknown'} — the "
            "sub-bucketed path needs a numeric id for range "
            "boundaries. Raise cutoff_bin_max_docs or add a numeric "
            "surrogate id."
        )
    n_sub = min(max(2, math.ceil(bin_docs / max_docs)), 512)
    qs = [i / n_sub for i in range(1, n_sub)]
    boundaries = bin_df.stat.approxQuantile(id_col, qs, 0.001)
    # bucket = #boundaries strictly below id — order-preserving even if
    # approxQuantile returned duplicate/imprecise boundaries
    barr = F.array(*[F.lit(float(b)) for b in boundaries])
    bucketed = bin_df.withColumn(
        "_bkt",
        F.size(F.filter(barr, lambda b: b < F.col(id_col).cast("double"))),
    )
    bucket_sums = (
        bucketed.groupBy("_bkt")
        .agg(F.sum(tokens_col).alias("_tok"))
        .orderBy("_bkt")
        .collect()  # <= 512 rows by construction
    )
    offsets = {}
    acc = 0
    for r in bucket_sums:
        offsets[int(r["_bkt"])] = acc
        acc += int(r["_tok"] or 0)
    off_expr = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )[F.col("_bkt")]
    w = (
        W.partitionBy("_bkt")
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        bucketed.withColumn("_cum", F.sum(tokens_col).over(w) + off_expr)
        .filter(F.col("_cum") <= remaining)
        .select(*out_cols)
    )


def epoch_upsample_assign(
    df: DataFrame,
    budget: int,
    max_epochs: int = 4,
    id_col: str = "doc_id",
    order_col: str = "n_chars",
    tokens_col: str = "n_toks",
) -> DataFrame:
    """Epoch-aware upsampling: assign each document a deterministic
    REPEAT COUNT (``n_epochs``) so the replayed corpus fills a token
    ``budget`` — the standard move when the high-quality pool is
    smaller than the training budget (repeat the good data a few times
    rather than admit worse data), bounded by ``max_epochs`` (returns
    diminish and memorization risk grows with repetition).

    Semantics (exactly the greedy prefix over the corpus repeated
    ``max_epochs`` times, ordered by epoch then quality):

    1. every doc earns ``full = min(budget // total_tokens,
       max_epochs)`` epochs — whole-corpus passes that fit outright;
    2. if ``full < max_epochs``, the leftover budget buys ONE extra
       epoch for the best prefix by (``order_col`` DESC, ``id_col``) —
       delegated to :func:`token_budget_select` (histogram-cutoff
       plan, no global sort);
    3. docs with 0 epochs (budget smaller than one full pass and doc
       outside the boundary prefix) are dropped.

    Output: (id, order, tokens, n_epochs) — the repeat table a shard
    writer materializes with deterministic repetition. Scale shape:
    one scalar agg (total), the token_budget_select histogram walk,
    and one id-keyed left join — no global sort, one shuffle beyond
    the selector's own.
    """
    total = int(df.agg(F.sum(tokens_col)).first()[0] or 0)
    out = df.select(id_col, order_col, tokens_col)
    if total <= 0:
        # zero-cost corpus: every doc replays to the epoch cap
        return out.withColumn(
            "n_epochs", F.lit(max_epochs).cast("int")
        )
    full = min(budget // total, max_epochs)
    if full >= max_epochs:
        return out.withColumn(
            "n_epochs", F.lit(max_epochs).cast("int")
        )
    rem = budget - full * total
    boundary = token_budget_select(
        df, rem, id_col=id_col, order_col=order_col,
        tokens_col=tokens_col,
    ).select(id_col, F.lit(1).alias("_extra"))
    return (
        out.join(boundary, id_col, "left")
        .withColumn(
            "n_epochs",
            (F.lit(full) + F.coalesce(F.col("_extra"), F.lit(0))).cast(
                "int"
            ),
        )
        .filter(F.col("n_epochs") > 0)
        .drop("_extra")
    )


def mixture_epoch_plan(
    df: DataFrame,
    budget: int,
    max_epochs: int = 4,
    group_col: str = "source",
    tokens_col: str = "n_toks",
) -> DataFrame:
    """Per-source mixture plan under a global token budget: allocate
    the budget across sources proportional to their DOC counts (the
    doc-balanced mixture — every document deserves equal replay mass,
    so short-doc sources get more tokens per doc), then convert each
    source's allocation into whole epochs capped at ``max_epochs``.

    The apportionment is the integer largest-remainder method, kept
    EXACT end-to-end: ``base_s = (budget * docs_s) div total_docs``,
    remainders ``(budget * docs_s) mod total_docs`` rank the leftover
    units (ties → source name), so allocations sum to ``budget``
    exactly and every value is a pure integer both engines agree on —
    no float shares anywhere (``budget * docs_s`` must stay inside
    int64; at 10^13-token budgets pre-divide or widen to decimal).

    Output per source: ``n_docs``, ``n_toks`` (source token mass),
    ``alloc_toks`` (budget share), ``n_epochs`` (whole passes, capped),
    ``residual_toks`` (allocation the cap or granularity leaves
    unspent — the signal to re-apportion toward under-capped sources).

    Scale shape: one per-source hash aggregate, then windows over the
    SOURCE-level frame (tens to thousands of rows at any corpus size
    — aggregate-sized by construction, like the other apportionment
    queries)."""
    from pyspark.sql import Window as W

    agg = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tokens_col).alias("n_toks"),
    )
    wall = W.partitionBy()
    rk = W.partitionBy().orderBy(F.col("_rem").desc(), F.col(group_col))
    return (
        agg.withColumn("_total_docs", F.sum("n_docs").over(wall))
        .withColumn(
            "_base",
            F.expr(f"(CAST({budget} AS BIGINT) * n_docs) div _total_docs"),
        )
        .withColumn(
            "_rem",
            F.expr(f"(CAST({budget} AS BIGINT) * n_docs) % _total_docs"),
        )
        .withColumn(
            "_leftover", F.lit(budget) - F.sum("_base").over(wall)
        )
        .withColumn("_rk", F.row_number().over(rk))
        .withColumn(
            "alloc_toks",
            F.col("_base")
            + F.when(F.col("_rk") <= F.col("_leftover"), 1).otherwise(0),
        )
        .withColumn(
            "n_epochs",
            F.least(
                F.expr("alloc_toks div n_toks"), F.lit(max_epochs)
            ).cast("int"),
        )
        .withColumn(
            "residual_toks",
            F.col("alloc_toks") - F.col("n_epochs") * F.col("n_toks"),
        )
        .select(
            group_col, "n_docs", "n_toks", "alloc_toks", "n_epochs",
            "residual_toks",
        )
    )


def source_dedup_quota_report(
    df: DataFrame,
    cap: int,
    id_col: str = "doc_id",
    group_col: str = "source",
    order_col: str = "n_chars",
    text_col: str = "text",
) -> DataFrame:
    """Per-source dedup-rate-vs-quota diagnostics: join the exact-dup
    profile of each source against what :func:`source_quota_cap` keeps
    — the readout that tells a mixture owner WHICH sources blow their
    quota with duplicated content (high dup rate + full quota = the
    cap is mostly protecting against copies, not diversity).

    Columns per source: ``n_docs``, ``n_unique_texts`` (exact distinct
    content), ``n_dup_docs`` (= docs minus uniques), ``dup_per_10k``
    (dup share in basis-points-of-10k, floor integer — exact cross-
    engine, no float rounding), ``n_kept`` (quota survivor count),
    ``fill_per_10k`` (kept/cap in the same integer scale),
    ``over_quota`` (docs beyond the cap).

    Scale shape: two per-source hash aggregates plus the quota window,
    then one join on the tiny source-level frames. The distinct-content
    count runs on md5(text), NOT the text itself — Spark expands
    count(DISTINCT x) into a two-level agg keyed by (source, x), and
    at 100 TB that key must be a 16-byte digest, never the payload
    (same discipline as the dedup tier's hash-first groupBy; md5 also
    keeps the DuckDB oracle engine-exact). Integer ratios keep it
    hash-exact: float division of counts lands on .xxxx5 half-points
    (n a power of two) where Spark HALF_UP and DuckDB disagree.
    """
    prof = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5(F.col(text_col))).alias("n_unique_texts"),
    )
    kept = (
        source_quota_cap(
            df, cap=cap, id_col=id_col, group_col=group_col,
            order_col=order_col,
        )
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        prof.join(kept, group_col)
        .select(
            group_col,
            "n_docs",
            "n_unique_texts",
            (F.col("n_docs") - F.col("n_unique_texts")).alias(
                "n_dup_docs"
            ),
            F.expr(
                "((n_docs - n_unique_texts) * 10000) div n_docs"
            ).alias("dup_per_10k"),
            "n_kept",
            F.expr(f"(n_kept * 10000) div {cap}").alias("fill_per_10k"),
            F.greatest(
                F.col("n_docs") - F.lit(cap), F.lit(0).cast("long")
            ).alias("over_quota"),
        )
    )


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


def class_balanced_weights(
    df: DataFrame,
    class_col: str,
    beta: float = 0.999,
) -> DataFrame:
    """Class-balanced loss weights from the effective number of
    samples (Cui et al. 2019, "Class-Balanced Loss Based on Effective
    Number of Samples"): w_c ∝ (1 − β)/(1 − β^{n_c}) — the reweighting
    a skewed label distribution needs during training; β → 1
    approaches inverse-frequency, β = 0 is uniform.

    Weights are normalized so Σ_c w_c·n_c equals the total row count
    (the convention that keeps the expected loss scale unchanged).
    ``pow(β, n)`` is the one libm step — computed identically from
    exact integer n on both engines and rounded at 6 (underflow to 0
    for huge classes is the correct limit: w → 1−β).

    One class-keyed count aggregate, then a 1-row normalizer
    broadcast back over the |classes|-row frame. Output per class:
    (class, n, weight) with Σ w·n = N.
    """
    from pyspark.sql import Window as W

    counts = df.groupBy(class_col).agg(F.count(F.lit(1)).alias("n"))
    b = F.lit(float(beta))
    raw = (F.lit(1.0) - b) / (
        F.lit(1.0) - F.pow(b, F.col("n").cast("double"))
    )
    withraw = counts.select(F.col(class_col), "n", raw.alias("_w"))
    # the normalizer Σw·n is a FLOAT sum: fold it in class order (a
    # sequential window, both engines add identically) rather than a
    # plain aggregate whose addition order is partition-dependent —
    # the cramers_v/cmh discipline
    wf = W.orderBy(F.col(class_col)).rowsBetween(
        W.unboundedPreceding, 0
    )
    run = withraw.select(
        F.sum(F.col("_w") * F.col("n")).over(wf).alias("_z"),
        F.sum("n").over(wf).alias("_tot"),
        F.row_number()
        .over(W.orderBy(F.col(class_col).desc()))
        .alias("_rev"),
    )
    norm = run.filter(F.col("_rev") == 1).select("_z", "_tot")
    return withraw.crossJoin(F.broadcast(norm)).select(
        F.col(class_col),
        F.col("n").cast("long").alias("n"),
        F.round(
            F.col("_w") * F.col("_tot").cast("double") / F.col("_z"),
            6,
        ).alias("weight"),
    )


def domain_reweight_step(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    eta: float = 1.0,
) -> DataFrame:
    """One DoReMi-style exponentiated-gradient domain-weight update
    (Xie et al. 2023, simplified): starting from token-share weights
    w_s, each domain's weight multiplies by exp(eta·loss_s) and
    renormalizes — domains with higher proxy loss (here 1 − mean
    quality score, the rule-based stand-in for a reference-model
    excess loss) gain mixture share for the next training round.

    Output per domain: (group, n_docs, n_tokens, proxy_loss,
    weight_old, weight_new) — weight columns round-6, always summing
    to ~1 each.

    Scale shape: one map-only quality/token pass, one group-keyed
    aggregate, then all arithmetic on the |domains|-row frame (the
    normalization windows are aggregate-sized, audit-whitelisted).
    exp() is libm on both engines fed identical doubles — same class
    as the oracled A&S normal-CDF path.
    """
    from pyspark.sql import Window

    from ..functions import token_count
    from ..operators.textstats import quality_score

    per = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(text_col)).alias("n_tokens"),
        F.sum(quality_score(F.col(text_col))).alias("_qsum"),
    )
    wall = Window.partitionBy()
    loss = F.lit(1.0) - F.col("_qsum") / F.col("n_docs")
    w_old = F.col("n_tokens") / F.sum("n_tokens").over(wall)
    upd = per.select(
        group_col,
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        loss.alias("_loss"),
        w_old.alias("_w_old"),
        (w_old * F.exp(F.lit(float(eta)) * loss)).alias("_w_upd"),
    )
    z = F.sum("_w_upd").over(Window.partitionBy())
    return upd.select(
        group_col,
        "n_docs",
        "n_tokens",
        F.round("_loss", 6).alias("proxy_loss"),
        F.round("_w_old", 6).alias("weight_old"),
        F.round(F.col("_w_upd") / z, 6).alias("weight_new"),
    )


def loo_group_impact(
    df: DataFrame,
    metric: Column,
    group_col: str = "source",
) -> DataFrame:
    """Leave-one-group-out impact of each group on a corpus-level
    mean metric: for every group g, the global mean WITHOUT g's rows
    — loo_mean = (Σ − Σ_g)/(N − n_g) — and the delta the group's
    presence contributes. The cheapest honest "data valuation"
    readout a mixture owner gets before dropping or capping a source:
    one aggregate pass, exact algebra, no retraining, no resampling.

    Exactness: per-group sums and counts are exact (the caller
    supplies an integer-valued or decimal-quantized metric column);
    the means are single divisions rounded at 6.

    Scale shape: ONE group-keyed aggregate with map-side partials;
    the global totals are the 1-row rollup of that frame broadcast
    back — the fact table is touched once.

    Output: one row per group — (group, n_rows, group_mean,
    global_mean, loo_mean, delta).
    """
    # count rows WHERE the metric is present (avg semantics): a NULL
    # metric row must not dilute the means as a silent zero
    per = df.groupBy(group_col).agg(
        F.count(metric).cast("long").alias("n_rows"),
        F.sum(metric).alias("_s"),
    )
    tot = per.agg(
        F.sum("n_rows").alias("_nt"), F.sum("_s").alias("_st")
    )
    g_mean = F.col("_s") / F.col("n_rows").cast("double")
    glob = F.col("_st") / F.col("_nt").cast("double")
    loo = F.when(
        F.col("_nt") > F.col("n_rows"),
        (F.col("_st") - F.col("_s"))
        / (F.col("_nt") - F.col("n_rows")).cast("double"),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        group_col,
        "n_rows",
        F.round(g_mean, 6).alias("group_mean"),
        F.round(glob, 6).alias("global_mean"),
        F.round(loo, 6).alias("loo_mean"),
        F.round(glob - loo, 6).alias("delta"),
    )
