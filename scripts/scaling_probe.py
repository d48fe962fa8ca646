#!/usr/bin/env python3
"""Scaling probes for the heavyweight operators.

Two questions a 100 TB deployment asks that a single-SF benchmark
cannot answer:

1. DATA scaling — multiply the input N× (union of re-keyed copies so
   key cardinality grows with data, not just row multiplicity) and
   check wall time grows ~linearly. Superlinear growth exposes a
   hidden quadratic (all-pairs joins) or a spill cliff.
2. CORE scaling — same input on local[4] vs local[16] vs local[32];
   the speedup curve shows whether plans actually parallelize or
   serialize on a single partition/driver step.

Prints one JSON line per probe. Not part of bench.py (these runs cost
minutes); results are recorded in README's scaling section.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from us_accidents_bigdata_pipeline_spark.functions import token_count
from us_accidents_bigdata_pipeline_spark.operators.curation import (
    epoch_upsample_assign,
    mixture_epoch_plan,
    source_quota_cap,
    token_budget_select,
)
from us_accidents_bigdata_pipeline_spark.operators.graph import (
    copurchase_edges,
    pagerank_mass,
)
from us_accidents_bigdata_pipeline_spark.operators.shard import (
    curriculum_phases,
)
from us_accidents_bigdata_pipeline_spark.operators.dedup import (
    exact_dedup,
    minhash_banded_pairs,
)
from us_accidents_bigdata_pipeline_spark.operators.sketches import (
    count_min_heavy_hitters,
)
from us_accidents_bigdata_pipeline_spark.operators.similarity import (
    label_centroid_distances,
)
from us_accidents_bigdata_pipeline_spark.operators.textstats import (
    dup_ngram_char_fraction,
    gopher_rules,
)
from us_accidents_bigdata_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicate(df, times: int, key: str, text_col: str | None = None):
    """N re-keyed copies; if ``text_col`` is given each copy's text is
    tagged with its copy index so copies are NOT exact duplicates of
    each other — otherwise a dedup probe measures a pathological
    corpus where every doc has N-1 identical twins (candidate pairs
    grow N² instead of N) rather than a bigger corpus."""
    n = df.count()
    parts = []
    for i in range(times):
        p = df.withColumn(key, F.col(key) + F.lit(i * n * 10))
        if text_col is not None and i > 0:
            p = p.withColumn(
                text_col, F.concat(F.col(text_col), F.lit(f" copytag{i}"))
            )
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def timed(fn) -> float:
    """min-of-2: this host's sustained throughput swings up to 4x, so a
    single sample mostly measures ambient contention."""
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 2)


def data_scaling(spark) -> dict:
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    out: dict[str, dict] = {}
    for mult in (1, 4, 8):
        d = replicate(docs, mult, "doc_id", text_col="text").persist()
        e = replicate(events, mult, "event_id").persist()
        d.count(), e.count()
        out[f"x{mult}"] = {
            "exact_dedup_docs": timed(
                lambda: exact_dedup(d, ["text"], "doc_id").count()
            ),
            "minhash_banded_pairs": timed(
                lambda: minhash_banded_pairs(d).count()
            ),
            "hourly_event_agg": timed(
                lambda: e.groupBy(
                    F.hour("ts").alias("h"), "event_type"
                )
                .agg(F.count("*"), F.sum("value"))
                .collect()
            ),
            # round-8 mixture ops: the budget scales with the corpus so
            # the cutoff stays mid-distribution (a fixed budget would
            # degenerate to "select almost nothing" at x8)
            "token_budget_selection": timed(
                lambda: token_budget_select(
                    d.select(
                        "doc_id",
                        "n_chars",
                        token_count("text").cast("long").alias("n_toks"),
                    ),
                    budget=100_000 * mult,
                ).count()
            ),
            "source_quota_cap": timed(
                lambda: source_quota_cap(d, cap=15 * mult).count()
            ),
            # round-9 mixture/graph ops, budgets scaled like above
            "epoch_upsample_assignment": timed(
                lambda: epoch_upsample_assign(
                    d.select(
                        "doc_id",
                        "n_chars",
                        token_count("text").cast("long").alias("n_toks"),
                    ),
                    budget=700_000 * mult,
                ).count()
            ),
            "mixture_epoch_plan": timed(
                lambda: mixture_epoch_plan(
                    d.select(
                        "source",
                        token_count("text").cast("long").alias("n_toks"),
                    ),
                    budget=2_000_000 * mult,
                ).count()
            ),
            "curriculum_phases": timed(
                lambda: curriculum_phases(d).count()
            ),
            # round-9b text ops: map-only panel, gram-agg fraction,
            # sketch build+probe — all should ride shuffled bytes
            "gopher_quality_rules": timed(
                lambda: gopher_rules(d).count()
            ),
            "dup_ngram_char_fraction": timed(
                lambda: dup_ngram_char_fraction(d, n=2).count()
            ),
            "count_min_heavy_hitters": timed(
                lambda: count_min_heavy_hitters(d, width=16).count()
            ),
        }
        d.unpersist(), e.unpersist()

    # graph scaling rides lineitem (the copurchase edge source). BOTH
    # keys must shift per copy: re-keying only l_orderkey would leave
    # every copy emitting the same (partkey, partkey) edges, which
    # copurchase_edges' distinct collapses — the graph has to GROW.
    # round-9b embedding op rides the embeddings table (vec_id rekey;
    # labels unchanged so per-label strata grow with the data)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    for mult in (1, 4, 8):
        er = replicate(emb, mult, "vec_id").persist()
        er.count()
        out.setdefault(f"x{mult}", {})["label_centroid_distances"] = timed(
            lambda: label_centroid_distances(er).count()
        )
        er.unpersist()

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").filter(
        F.col("l_orderkey") < 2000
    )
    n_li = li.count()
    for mult in (1, 4, 8):
        parts = [
            li.withColumn(
                "l_orderkey", F.col("l_orderkey") + F.lit(i * n_li * 10)
            ).withColumn(
                "l_partkey", F.col("l_partkey") + F.lit(i * 10_000_000)
            )
            for i in range(mult)
        ]
        lr = parts[0]
        for p in parts[1:]:
            lr = lr.union(p)
        lr = lr.persist()
        lr.count()
        out.setdefault(f"x{mult}", {})["pagerank_mass_3iter"] = timed(
            lambda: pagerank_mass(copurchase_edges(lr), n_iter=3).count()
        )
        lr.unpersist()
    return out


def core_scaling() -> dict:
    out: dict[str, dict] = {}
    for cores in (4, 16, 32):
        spark = get_spark(
            app_name=f"scale{cores}",
            master=f"local[{cores}]",
            shuffle_partitions=max(cores, 8),
        )
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        docs = replicate(docs, 8, "doc_id", text_col="text").persist()
        docs.count()
        out[f"cores{cores}"] = {
            "exact_dedup_docs_x8": timed(
                lambda: exact_dedup(docs, ["text"], "doc_id").count()
            ),
            "minhash_banded_x8": timed(
                lambda: minhash_banded_pairs(docs).count()
            ),
        }
        docs.unpersist()
        spark.stop()
    return out


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "data"
    if which == "data":
        spark = get_spark(app_name="scaling", master="local[32]")
        print(json.dumps({"data_scaling": data_scaling(spark)}))
    else:
        print(json.dumps({"core_scaling": core_scaling()}))
