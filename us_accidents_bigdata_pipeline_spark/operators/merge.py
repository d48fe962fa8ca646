"""Incremental-snapshot operators: upsert merge and change capture.

The reference pipeline is overwrite-only (every run rewrites its
parquet outputs). Production tables are incremental: a base snapshot
plus a (much smaller) batch of updates, merged by key — the batch
``MERGE INTO`` shape — and pipelines downstream want to know WHAT
changed between two snapshots. Without a table format (Delta/Iceberg)
the primitive is snapshot-functional: both operators are pure
DataFrame expressions producing the next snapshot / the change set,
writable with ``write_parquet`` partition-overwrite.

Scale shape: ``merge_upsert`` is an anti-join on the key (the updates
side is typically small → broadcast; the base never shuffles when the
anti-join broadcasts) plus a union. ``snapshot_diff`` is one full-outer
join on the key with null-safe column comparison — a single co-shuffle
of the two snapshots, no row-at-a-time logic.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame, updates: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Next snapshot after applying ``updates`` to ``base``: rows whose
    key appears in updates are REPLACED, unmatched update rows are
    INSERTED, everything else is carried over. Columns must align
    (``unionByName``). Updates must be key-unique — enforce upstream
    (e.g. a window dedup) so a double-update cannot fan out."""
    survivors = base.join(
        F.broadcast(updates.select(*key_cols).distinct()),
        key_cols,
        "left_anti",
    )
    return survivors.unionByName(updates)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Change capture between snapshots: (key..., change_type) for
    every key that was added, removed, or changed (null-safe compare
    over ``compare_cols``); unchanged keys are not emitted. One
    full-outer join on the key."""
    o = old.select(
        *key_cols,
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
        F.lit(True).alias("_in_o"),
    )
    n = new.select(
        *key_cols,
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
        F.lit(True).alias("_in_n"),
    )
    j = o.join(n, key_cols, "full_outer")
    differs = reduce(
        lambda a, b: a | b,
        [
            ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
            for c in compare_cols
        ],
    )
    change = (
        F.when(F.col("_in_o").isNull(), F.lit("added"))
        .when(F.col("_in_n").isNull(), F.lit("removed"))
        .when(differs, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(*key_cols, change.alias("change_type"))
        .filter(F.col("change_type") != "unchanged")
    )


def incremental_agg_merge(
    summary: DataFrame,
    delta_summary: DataFrame,
    keys: list[str],
    add_cols: list[str],
) -> DataFrame:
    """Incremental materialized-aggregate maintenance: fold a DELTA
    batch's partial aggregate into an existing summary table without
    recomputing from base data — the refresh step of every
    summary-table pipeline at 100 TB (recompute cost scales with
    HISTORY; this scales with the delta).

    Requires the aggregate to be a commutative monoid per column
    (sum/count — avg must be carried as sum+count and derived at read
    time). merged = FULL OUTER join on keys, each measure
    coalesce(old,0) + coalesce(delta,0): keys only in the delta appear,
    keys untouched by the delta pass through, shared keys add. Oracled
    end-to-end in the catalog: summary(old half) ⊕ delta(new half)
    must equal the from-scratch aggregate over everything.

    Plan shape: one key shuffle of two ALREADY-AGGREGATED frames
    (summary-sized, not fact-sized); with both sides bucketed by key
    the exchange disappears entirely (tuning.write_bucketed).
    """
    d = delta_summary.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"_d_{c}") for c in add_cols],
    )
    merged = summary.join(d, keys, "full_outer")
    out_cols = [F.col(k) for k in keys]
    for c in add_cols:
        out_cols.append(
            (
                F.coalesce(F.col(c), F.lit(0))
                + F.coalesce(F.col(f"_d_{c}"), F.lit(0))
            ).alias(c)
        )
    return merged.select(*out_cols)


def cdc_apply(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC changelog (I/U/D ops with a monotone sequence
    number) to a base snapshot — the Debezium-feed/materialized-view
    shape ``merge_upsert`` can't express: multiple ops per key in one
    batch, LATEST-WINS ordering, and delete tombstones.

    ``changes`` carries the base's columns plus ``op`` ('I'|'U'|'D';
    deletes may leave payload columns NULL) and ``seq``. The base is
    treated as sequence 0, so any change outranks it. Per key, only
    the highest-sequence row survives; if that row is a tombstone the
    key disappears. Returns the next snapshot (base columns only).

    Scale: ONE hash shuffle on the key for the window (base and
    changelog co-partition), no driver logic, idempotent under replay
    (re-applying the same changelog yields the same snapshot — the
    property CDC consumers must have).
    """
    payload = base.columns
    base_tagged = base.select(
        *payload,
        F.lit(0).cast("long").alias(seq_col),
        F.lit("I").alias(op_col),
    )
    all_rows = base_tagged.unionByName(
        changes.select(
            *payload, F.col(seq_col).cast("long"), F.col(op_col)
        )
    )
    # Deterministic total order even on degenerate changelogs with
    # duplicate (key, seq) pairs: tombstones outrank same-seq upserts
    # (the conservative read of an ambiguous feed), and a payload hash
    # breaks any remaining tie so the winner never depends on
    # partition layout. Well-formed feeds (unique seq per key) are
    # unaffected.
    op_rank = (
        F.when(F.col(op_col) == "D", 2)
        .when(F.col(op_col) == "U", 1)
        .otherwise(0)
    )
    w = W.partitionBy(*key_cols).orderBy(
        F.col(seq_col).desc(),
        op_rank.desc(),
        F.xxhash64(*payload).desc(),
    )
    return (
        all_rows.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col(op_col) != "D"))
        .select(*payload)
    )
