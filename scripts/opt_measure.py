#!/usr/bin/env python3
"""Round-12 optimization measurement harness.

For each query name given on argv (or a default hot list), build the
query at $SPARK_GRAFT_SF_DIR (default sf0.1), time it with the noop
sink (guide §1.4 — computes every column, no sink cost), and write
`.explain("formatted")` to plans/r12/<name>_<tag>.txt.

Usage:
    python scripts/opt_measure.py [--tag before|after] [names...]

The session mirrors bench.py (get_spark + warmups) so timings are
comparable; jobs are labelled with setJobDescription per guide §1.5.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from us_accidents_bigdata_pipeline_spark.plans import REGISTRY
from us_accidents_bigdata_pipeline_spark.session import get_spark

HOT = [
    "minhash_lsh_verified_pairs",
    "corpus_curation_funnel",
    "lsh_ann_batch",
    "fpgrowth_itemsets",
    "chi2_event_type_bucket",
    "locf_hourly_values",
    "simhash_near_dup_pairs_md5",
    "blocking_quality_report_docs",
    "near_dup_resolve_banded",
    "minhash_estimate_calibration",
    "lsh_banding_planner_docs",
    "pagerank_mass_bounded",
    "ivf_recall_curve",
    "ngram_novelty_by_source_docs",
    "supplier_cnt_by_part_attrs",
    "product_profit_by_nation_year",
    "clustering_coef_copurchase",
    "lsh_ann_verified_topk",
    "ols_normal_equations_lineitem",
    "session_overlap_pairs",
    "substring_dup_runs",
    "minhash_banded_pairs",
    "embedding_near_dup_pairs_blas",
    "semantic_dedup_pairs",
    "rolling_30d_revenue",
    "ivf_assignment_drift",
    "knn_cosine_batch",
    "knn_cosine_topk",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    names = args.names or HOT

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plans_dir = os.path.join(here, "plans", "r12")
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark(app_name="opt_measure")
    spark.range(1000).selectExpr("sum(id)").collect()
    import pandas as _pd  # noqa: F401
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("double")
    def _warm(s):
        return s * 1.0

    spark.range(128, numPartitions=32).select(
        _warm(col("id").cast("double"))
    ).collect()

    out: dict[str, float] = {}
    for name in names:
        spec = REGISTRY.get(name)
        if spec is None:
            print(f"!! {name}: not in registry", file=sys.stderr)
            continue
        sc = spark.sparkContext
        sc.setJobDescription(f"opt_measure:{name}")
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            df = spec.builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        sc.setJobDescription(None)
        out[name] = round(best, 3)
        if not args.no_plans:
            df = spec.builder(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(
                os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w"
            ) as f:
                f.write(buf.getvalue())
        print(f"{out[name]:8.3f}  {name}", flush=True)

    print(json.dumps({"tag": args.tag, "noop_best_sec": out}))
    spark.stop()


if __name__ == "__main__":
    main()
