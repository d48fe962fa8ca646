"""Deterministic shuffle + sharding for training-data export.

Trainers want data (a) globally shuffled so batches are i.i.d.-ish,
(b) split into fixed shards for parallel loading, and (c) REPRODUCIBLE
— the same corpus + seed must yield byte-identical shards on any
cluster layout. Random shuffles fail (c); this module derives both the
shard and the intra-shard order from ``md5(seed || '-' || id)``, so
the permutation is a pure function of (id, seed): partition-layout
independent, re-runnable, and resumable.

Scale shape: one shuffle keyed by the shard expression (every row
moves once), sort within partitions only (no global sort barrier), and
the writer emits one directory per shard via ``partitionBy`` so
loaders address shards by path. md5 (not xxhash64) is deliberate:
every engine agrees on it, which is what makes the DuckDB oracle (and
any cross-system re-validation) exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _shuffle_key(id_col: str, seed: int) -> Column:
    return F.md5(F.concat(F.lit(f"{seed}-"), F.col(id_col).cast("string")))


def _shard_of(key: Column, n_shards: int) -> Column:
    # first 8 hex chars -> 32-bit int -> modulo. Stays in [0, n_shards).
    return (
        F.conv(F.substring(key, 1, 8), 16, 10).cast("long") % n_shards
    ).cast("int")


def shard_assignment(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 16,
    seed: int = 42,
) -> DataFrame:
    """(id, shard, pos): the deterministic shard and 1-based position
    within the shard for every row. ``pos`` orders by the shuffle key
    (ties broken by id — unreachable for md5 but makes determinism
    unconditional)."""
    from pyspark.sql import Window as W

    key = _shuffle_key(id_col, seed)
    w = W.partitionBy("shard").orderBy("_key", id_col)
    return (
        df.select(F.col(id_col), key.alias("_key"))
        .withColumn("shard", _shard_of(F.col("_key"), n_shards))
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .select(id_col, "shard", "pos")
    )


def pack_assignment(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 512,
    n_shards: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Concat-then-chunk sequence packing: documents are laid out in
    the deterministic shuffle order within each shard and the token
    stream is cut into fixed ``budget``-token context windows. Returns
    (id, shard, pack, tok_offset): the window a document STARTS in and
    its token offset inside that window — what a loader needs to
    assemble packed training sequences without padding waste.

    Expressible entirely as prefix sums (no stateful fold): a
    document's start offset is the exclusive running sum of token
    counts in shuffle order, ``pack = start div budget``,
    ``tok_offset = start mod budget``. One shuffle (the per-shard
    window), JVM-side token counting, and — unlike greedy next-fit
    bin packing — a pure window expression any SQL engine reproduces
    exactly, which is what makes the oracle possible."""
    from pyspark.sql import Window as W

    from ..functions import token_count

    key = _shuffle_key(id_col, seed)
    w = W.partitionBy("shard").orderBy("_key", id_col)
    start = (
        F.sum("n_tokens").over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        - F.col("n_tokens")
    )
    return (
        df.select(
            F.col(id_col),
            key.alias("_key"),
            token_count(text_col).cast("bigint").alias("n_tokens"),
        )
        .withColumn("shard", _shard_of(F.col("_key"), n_shards))
        .withColumn("pack", F.floor(start / budget).cast("bigint"))
        .withColumn("tok_offset", (start % budget).cast("bigint"))
        .select(id_col, "shard", "pack", "tok_offset")
    )


def curriculum_phases(
    df: DataFrame,
    id_col: str = "doc_id",
    order_col: str = "n_chars",
    n_shards: int = 16,
    n_phases: int = 4,
    seed: int = 42,
) -> DataFrame:
    """(id, shard, phase): curriculum-learning phase assignment —
    within each deterministic training shard, split documents into
    ``n_phases`` equal tiles ordered easy→hard (``order_col`` ASC,
    short/simple first; ``id_col`` tiebreak), so a loader can feed
    phase 1 before phase 2 within every shard and the curriculum
    survives shard-parallel loading.

    Per-shard ``ntile`` (SQL-standard: first ``n mod b`` tiles take
    the extra row — identical in every engine) over the md5-derived
    shard, so the whole assignment is a pure function of
    (id, order_col, seed): layout-independent and re-runnable. One
    hash shuffle on the shard key, windows run shard-parallel — no
    global sort."""
    from pyspark.sql import Window as W

    key = _shuffle_key(id_col, seed)
    w = W.partitionBy("shard").orderBy(order_col, id_col)
    return (
        df.select(F.col(id_col), F.col(order_col), key.alias("_key"))
        .withColumn("shard", _shard_of(F.col("_key"), n_shards))
        .withColumn("phase", F.ntile(n_phases).over(w).cast("int"))
        .select(id_col, "shard", F.col(order_col), "phase")
    )


def shard_balance_report(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_toks",
    n_shards: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Per-shard load report for the deterministic training shards:
    (shard, n_docs, n_toks, toks_per_10k) — token share in integer
    basis-points-of-10k (floor; exact cross-engine, no float
    rounding). The diagnostic a loader owner reads before an epoch: a
    shard holding 2x its share of tokens is the straggler that
    stretches every training step.

    One groupBy over the md5 shard key plus a single-partition window
    over the N_SHARDS-row aggregate (aggregate-sized by construction).
    """
    from pyspark.sql import Window as W

    key = _shuffle_key(id_col, seed)
    per = (
        df.select(
            _shard_of(key, n_shards).alias("shard"),
            F.col(tokens_col),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(tokens_col).alias("n_toks"),
        )
    )
    return (
        per.withColumn(
            "_total", F.sum("n_toks").over(W.partitionBy())
        )
        .withColumn(
            "toks_per_10k", F.expr("(n_toks * 10000) div _total")
        )
        .select("shard", "n_docs", "n_toks", "toks_per_10k")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    n_shards: int = 16,
    seed: int = 42,
) -> None:
    """Write ``df`` as ``path/shard=K/`` parquet directories, rows
    deterministically shuffled within each shard. One hash shuffle
    (repartition on shard) + in-partition sort — no global sort."""
    key = _shuffle_key(id_col, seed)
    out = (
        df.withColumn("_key", key)
        .withColumn("shard", _shard_of(F.col("_key"), n_shards))
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "_key", id_col)
        .drop("_key")
    )
    out.write.mode("overwrite").partitionBy("shard").parquet(path)


def split_leakage_report(
    rows: DataFrame,
    entity_col: str,
    split_col,
) -> DataFrame:
    """Entity-level train/eval leakage audit — the check that catches
    the classic split mistake: assigning ROWS to splits when the unit
    of generalization is an ENTITY (user, customer, document source).
    A row-level hash split puts some of almost every multi-row
    entity's data on BOTH sides, so eval measures memorization, not
    generalization; the fix is hashing the ENTITY key
    (``shard_assignment``'s md5-on-id discipline applied to the
    entity, not the row).

    Output: one row per split-membership pattern an entity exhibits
    (the sorted distinct-split set, as a string), with entity counts
    — plus the 'LEAKED' aggregate rows a dashboard alerts on:
    entities present in more than one split.

    Determinism: membership sets are sorted concatenations of exact
    distinct values; counts exact. One (entity, split) distinct pass
    (slim rows), one entity-keyed agg, one pattern-keyed agg — the
    fact table shuffles twice as narrow keys, never wide rows.
    """
    es = rows.select(
        F.col(entity_col).alias("_e"),
        (split_col if not isinstance(split_col, str) else F.col(split_col))
        .cast("string")
        .alias("_s"),
    ).distinct()
    per_entity = es.groupBy("_e").agg(
        F.array_join(
            F.sort_array(F.collect_list("_s")), "+"
        ).alias("splits"),
        F.count(F.lit(1)).alias("_k"),
    )
    return (
        per_entity.groupBy("splits")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_entities"),
            F.max(F.col("_k") > 1).alias("leaked"),
        )
        .orderBy("splits")
    )


def padding_waste_planner(
    df: DataFrame,
    text_col: str = "text",
    strategies: tuple = (
        ("pow2_16_128", (16, 32, 64, 128)),
        ("pow2_32_128", (32, 64, 128)),
        ("fixed_128", (128,)),
    ),
) -> DataFrame:
    """Length-bucketed batching planner — the padding-waste readout
    that sizes a training loader's bucket boundaries BEFORE a 100 TB
    tokenization pass: for each candidate strategy (a sorted tuple of
    context-length boundaries), every document lands in the smallest
    boundary that fits its token count (documents longer than the
    largest boundary are TRUNCATED to it), and the per-(strategy,
    bucket) report shows document count, kept-token mass, pad mass
    (bucket width − length), truncated-token mass, and packing
    efficiency kept/(kept+pad). Compare against ``pack_assignment``
    (concat-then-chunk, zero padding) to price the padding a
    bucketed-batching loader actually pays.

    All sums are exact integers (whitespace token counts); efficiency
    is one division, rounded at 6 — fully value-oracle-able.

    Scale shape: one map-only token count over the corpus, a
    |strategies|-row literal broadcast (tiny fanout), then a
    (strategy, bucket)-keyed aggregate with map-side partial —
    aggregate-sized output, corpus touched once.
    """
    from ..functions import token_count

    spark = df.sparkSession
    sdf = spark.createDataFrame(
        [(name, list(map(int, bounds))) for name, bounds in strategies],
        "strategy string, bounds array<int>",
    )
    lens = df.select(token_count(text_col).cast("long").alias("_len"))
    j = lens.crossJoin(F.broadcast(sdf))
    fit = F.array_min(F.filter("bounds", lambda b: b >= F.col("_len")))
    bucket = F.coalesce(fit, F.array_max("bounds")).cast("long")
    kept = F.least(F.col("_len"), bucket)
    return (
        j.select(
            "strategy",
            bucket.alias("bucket"),
            kept.alias("_kept"),
            (bucket - kept).alias("_pad"),
            (F.col("_len") - kept).alias("_trunc"),
        )
        .groupBy("strategy", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_kept").cast("long").alias("tokens_kept"),
            F.sum("_pad").cast("long").alias("tokens_pad"),
            F.sum("_trunc").cast("long").alias("tokens_truncated"),
        )
        .select(
            "strategy",
            "bucket",
            "n_docs",
            "tokens_kept",
            "tokens_pad",
            "tokens_truncated",
            F.round(
                F.col("tokens_kept")
                / (F.col("tokens_kept") + F.col("tokens_pad")).cast("double"),
                6,
            ).alias("efficiency"),
        )
    )


def reshard_movement_report(
    df: DataFrame,
    id_col: str = "doc_id",
    n_from: int = 16,
    n_to: int = 24,
    seed: int = 42,
) -> DataFrame:
    """Reshard cost planner: when the shard count changes n_from →
    n_to under the mod-hash scheme (``_shard_of``), what fraction of
    rows MOVES, and how the moved mass distributes over destination
    shards. Mod-hash moves ~(1 − 1/lcm-ish) of keys on most resizes —
    this report is the number a 100 TB layout migration budgets
    (bytes over the wire = moved_fraction × corpus) before choosing
    between in-place resize and a consistent-hashing scheme.

    Both assignments derive from the SAME md5 shuffle key, so the
    report is layout-independent and engine-exact (integer hash,
    modulo, counts; the fractions are single divisions).

    Scale shape: one map-only projection computing both shard ids,
    one (from, to)-keyed count aggregate (≤ n_from·n_to rows), a
    1-row total broadcast back — the corpus is touched once.

    Output: one row per (shard_from, shard_to) flow with moved mass,
    plus per-row moved flag aggregates: (shard_from, shard_to,
    n_rows, moved, flow_share).
    """
    key = _shuffle_key(id_col, seed)
    h = F.conv(F.substring(key, 1, 8), 16, 10).cast("long")
    flows = (
        df.select(
            (h % n_from).cast("int").alias("shard_from"),
            (h % n_to).cast("int").alias("shard_to"),
        )
        .groupBy("shard_from", "shard_to")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )
    tot = flows.agg(F.sum("n_rows").alias("_tot"))
    return (
        flows.crossJoin(F.broadcast(tot))
        .select(
            "shard_from",
            "shard_to",
            "n_rows",
            (F.col("shard_from") != F.col("shard_to")).alias("moved"),
            F.round(
                F.col("n_rows") / F.col("_tot").cast("double"), 6
            ).alias("flow_share"),
        )
    )


def consistent_vs_mod_reshard(
    df: DataFrame,
    id_col: str = "doc_id",
    n_from: int = 16,
    n_to: int = 17,
    seed: int = 42,
) -> DataFrame:
    """Rendezvous (highest-random-weight) hashing vs mod-hash under a
    shard-count change n_from → n_to: per scheme, the measured moved
    fraction next to its closed-form expectation. HRW assigns each id
    to argmax_s md5(seed-s-id), so adding shards moves only the ids
    the NEW shards win — expectation (n_to − n_from)/n_to — while
    mod-hash moves everything whose residue changes — expectation
    1 − gcd·…/lcm (for 16→17, stay = lcm⁻¹·n_from = 1/17, move =
    16/17). This is the one-query justification for consistent
    placement before a 100 TB layout migration; the flow-level mod
    detail lives in ``reshard_movement_report``.

    Exactness: both schemes derive from md5 (hex-string argmax for
    HRW — ties impossible, md5 is injective on the tiny input set in
    practice and the tie-break on shard id is deterministic anyway);
    counts are exact integers, fractions one division.

    Scale shape: HRW explodes n_to slim (id, shard) rows per id and
    reduces with ONE max_by aggregate keyed on id (map-side partial);
    the from-assignment is the same aggregate filtered to the first
    n_from shards — no second pass. Mod shards are map-only. One
    1-row count aggregate per scheme, unpivoted to two rows.

    Output: 2 rows — (scheme, n_rows, n_moved, moved_fraction,
    expected_fraction).
    """
    if int(n_to) <= int(n_from):
        raise ValueError(
            "consistent_vs_mod_reshard: n_to must exceed n_from (the "
            "HRW from-assignment is the to-grid filtered to the first "
            "n_from shards — growth only)"
        )
    spark = df.sparkSession
    shards = spark.range(int(n_to)).select(
        F.col("id").cast("int").alias("_s")
    )
    key = _shuffle_key(id_col, seed)
    h = F.conv(F.substring(key, 1, 8), 16, 10).cast("long")
    base = df.select(
        F.col(id_col).alias("_id"),
        (h % n_from).cast("int").alias("_mf"),
        (h % n_to).cast("int").alias("_mt"),
    )
    hv = F.md5(
        F.concat(
            F.lit(f"{seed}-"),
            F.col("_s").cast("string"),
            F.lit("-"),
            F.col("_id").cast("string"),
        )
    )
    hrw = (
        base.join(F.broadcast(shards))
        .select("_id", "_mf", "_mt", "_s", hv.alias("_hv"))
        .groupBy("_id", "_mf", "_mt")
        .agg(
            F.max_by("_s", F.when(F.col("_s") < n_from, F.col("_hv"))).alias(
                "_hf"
            ),
            F.max_by("_s", "_hv").alias("_ht"),
        )
    )
    counts = hrw.agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum((F.col("_mf") != F.col("_mt")).cast("int"))
        .cast("long")
        .alias("_mod_moved"),
        F.sum((F.col("_hf") != F.col("_ht")).cast("int"))
        .cast("long")
        .alias("_hrw_moved"),
    )
    import math

    lcm = math.lcm(int(n_from), int(n_to))
    mod_exp = 1.0 - float(n_from) / float(lcm)
    hrw_exp = float(n_to - n_from) / float(n_to)
    rows = F.array(
        F.struct(
            F.lit("mod").alias("scheme"),
            F.col("_mod_moved").alias("n_moved"),
            F.lit(mod_exp).alias("expected_fraction"),
        ),
        F.struct(
            F.lit("hrw").alias("scheme"),
            F.col("_hrw_moved").alias("n_moved"),
            F.lit(hrw_exp).alias("expected_fraction"),
        ),
    )
    return counts.select(
        F.explode(rows).alias("_r"), F.col("_n").alias("n_rows")
    ).select(
        F.col("_r.scheme").alias("scheme"),
        "n_rows",
        F.col("_r.n_moved").alias("n_moved"),
        F.round(
            F.col("_r.n_moved") / F.col("n_rows").cast("double"), 6
        ).alias("moved_fraction"),
        F.round(F.col("_r.expected_fraction"), 6).alias(
            "expected_fraction"
        ),
    )


def split_ks_report(
    df: DataFrame,
    id_col: str,
    cols: list,
    seed: int = 42,
    n_partitions: int = 16,
) -> DataFrame:
    """Covariate-balance certificate for a deterministic md5 split:
    for each numeric column, the two-sample KS statistic between the
    split halves — the check that a train/test split didn't land
    skewed on any feature (the per-COLUMN companion to
    ``srm_check``'s per-COUNT guardrail). KS over the exact empirical
    CDFs, no binning.

    Split assignment is the engine-portable md5 parity of the id (the
    same seeded-hash discipline as ``shard_assignment``), so the
    report is layout-independent and the oracle replays it exactly.

    Scale shape: per column, ONE range-exchange global running sum
    (``layout.global_running_sums`` — the no-single-partition
    ordered cumsum) and a 1-row max reduction; columns are a literal
    list, so the whole report is |cols| linear passes. No window ever
    sees more than its range-exchange slice.

    Output: one row per column — (column, n_a, n_b, ks_stat).
    """
    from ..operators.layout import global_running_sums

    key = _shuffle_key(id_col, seed)
    side = (
        F.conv(F.substring(key, 1, 8), 16, 10).cast("long") % 2
    ).cast("int")
    frames = []
    for c in cols:
        pooled = df.select(
            F.col(c).alias("_v"),
            F.col(id_col).alias("_id"),
            (side == 0).cast("int").alias("_a"),
            (side == 1).cast("int").alias("_b"),
        ).filter(F.col("_v").isNotNull())
        run = global_running_sums(
            pooled,
            ["_v", "_id"],
            ["_a", "_b"],
            ["_ca", "_cb"],
            n_partitions=n_partitions,
        )
        # KS evaluates the CDF gap at VALUE boundaries only: within a
        # tie block the running counts depend on the id tie-break, so
        # the per-value max (= end-of-block cumulative) is the correct
        # empirical CDF point — without this a constant column reads
        # KS ~ |n_a-n_b|/n instead of 0.
        run = run.groupBy("_v").agg(
            F.max("_ca").alias("_ca"), F.max("_cb").alias("_cb")
        )
        # the split totals ARE the final running sums — no second
        # scan of the source table
        tot = run.agg(
            F.max("_ca").cast("long").alias("n_a"),
            F.max("_cb").cast("long").alias("n_b"),
        )
        frames.append(
            run.select("_ca", "_cb")
            .crossJoin(F.broadcast(tot))
            .agg(
                F.lit(str(c)).alias("column"),
                F.max("n_a").alias("n_a"),
                F.max("n_b").alias("n_b"),
                F.round(
                    F.max(
                        F.abs(
                            F.col("_ca").cast("double") / F.col("n_a")
                            - F.col("_cb").cast("double") / F.col("n_b")
                        )
                    ),
                    6,
                ).alias("ks_stat"),
            )
            .select("column", "n_a", "n_b", "ks_stat")
        )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out
