#!/usr/bin/env python3
"""Dump a registered query's .explain("formatted") plan to a file.

Usage: python scripts/dump_plan.py <query_name> <out_file> [sf_dir]

Used to commit plans/r13/<query>_{before,after}.txt evidence (guide
§1: capture plan shape before and after each change).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from us_accidents_bigdata_pipeline_spark.plans import REGISTRY
from us_accidents_bigdata_pipeline_spark.session import get_spark


def main() -> None:
    name, out = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark(app_name=f"plan:{name}")
    df = REGISTRY[name].builder(spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(out, "w") as f:
        f.write(plan)
    print(f"{name}: {plan.count('Exchange')} Exchange, "
          f"{plan.count('Scan parquet')} parquet scans -> {out}")
    spark.stop()


if __name__ == "__main__":
    main()
