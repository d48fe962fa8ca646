#!/usr/bin/env python3
"""Benchmark the engine's headline queries.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {name: sec},
"sf": ...}``.

Each query is timed end-to-end (plan + execute + collect) after a small
session warm-up, mirroring how the reference measures its pipeline stages
(wall-clock per stage, BigDataPipeline/spark/complete_pipeline.py logs).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from us_accidents_bigdata_pipeline_spark.plans import REGISTRY
from us_accidents_bigdata_pipeline_spark.session import get_spark

# Headline set: scan-heavy agg, fact-fact join, windows, broadcast-dim
# join, plus the LLM-pipeline operators once registered. Names absent
# from the registry are skipped so bench.py never breaks mid-round.
HEADLINE = [
    "pricing_summary",
    "join_revenue_topk",
    "join_region_stats",
    "window_topk_per_group",
    "window_running_sum",
    "priority_distribution",
    "hourly_event_stats",
    "median_exact",
    "exact_dedup_docs",
    "text_quality_scores",
    "minhash_near_dup_pairs",
    "knn_cosine_topk",
    "knn_cosine_batch",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(app_name="bench")
    # Warm up the JVM/codegen path so query timings measure the engine,
    # not session startup.
    spark.range(1000).selectExpr("sum(id)").collect()

    times: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        spec = REGISTRY.get(name)
        if spec is None:
            continue
        t0 = time.perf_counter()
        spec.builder(spark, sf_dir).collect()
        dt = time.perf_counter() - t0
        times[name] = round(dt, 3)
        total += dt

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
