"""Iterative graph analytics on DataFrames: PageRank.

Companion to the pointer-jumping connected components in
``operators/dedup.py`` (near-dup resolution): same execution discipline
— key-partitioned joins per round, ``localCheckpoint`` lineage
truncation — applied to a numeric fixed-point iteration instead of a
label fixed-point.

Scale shape per iteration: one join of the edge list against the rank
frame (both partitioned by the source key — co-partitioned after the
first shuffle), one groupBy on the destination key with map-side
partial sums, plus two driver-tiny aggregates (dangling mass, total
nodes). Nothing driver-side grows with the graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 8,
) -> DataFrame:
    """PageRank over a directed edge list; returns (node, rank) summing
    to 1.0 (±float error). Dangling-node mass is redistributed
    uniformly each iteration (the standard stochastic-matrix fix), so
    the result matches the textbook power iteration exactly —
    tests pin it against a NumPy reference.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # weighted edges: each src spreads rank/out_deg to its targets
    we = (
        e.join(out_deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("w"))
        .persist()
    )
    we.count()
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    # Dangling nodes are a ONE-TIME structural property — detect them
    # once, not per iteration. Dangling-free graphs (e.g. symmetric
    # co-purchase edges) then run the whole iteration as a single lazy
    # plan: zero per-round jobs, just periodic localCheckpoints to
    # bound plan depth. Graphs WITH dangling nodes need one tiny scalar
    # aggregate per round (the respread mass depends on current ranks).
    has_dangling = (
        nodes.join(out_deg, nodes.node == out_deg.src, "left_anti")
        .limit(1)
        .count()
        > 0
    )
    try:
        for it in range(n_iter):
            contribs = (
                we.join(ranks, we.src == ranks.node)
                .select("dst", (F.col("rank") * F.col("w")).alias("c"))
                .groupBy("dst")
                .agg(F.sum("c").alias("contrib"))
            )
            base = (1.0 - damping) / n
            if has_dangling:
                ranks = ranks.localCheckpoint(eager=True)
                dangling = (
                    ranks.join(
                        out_deg, ranks.node == out_deg.src, "left_anti"
                    )
                    .agg(F.sum("rank"))
                    .first()[0]
                    or 0.0
                )
                base += damping * dangling / n
                contribs = (
                    we.join(ranks, we.src == ranks.node)
                    .select("dst", (F.col("rank") * F.col("w")).alias("c"))
                    .groupBy("dst")
                    .agg(F.sum("c").alias("contrib"))
                )
            new_ranks = nodes.join(
                contribs, nodes.node == contribs.dst, "left"
            ).select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
            )
            if not has_dangling and (it + 1) % checkpoint_every == 0:
                new_ranks = new_ranks.localCheckpoint(eager=True)
            ranks = new_ranks
        return ranks
    finally:
        nodes.unpersist()
        we.unpersist()


def copurchase_edges(lineitem: DataFrame) -> DataFrame:
    """Undirected co-purchase edge list from lineitem: parts appearing
    in the same order, both directions (symmetric graph → no dangling
    nodes). One self-equi-join on the order key."""
    a = lineitem.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src")
    )
    b = lineitem.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst")
    )
    return (
        a.join(b, "ok")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
