#!/usr/bin/env python3
"""Dump a registered query's .explain("formatted") plan with
``dedup._shared`` monkeypatched to identity, so subtrees that the lazy
localCheckpoints would hide behind `Scan ExistingRDD` stay visible.

The plan shown is the UNSHARED derivation (what each consumer would
re-derive without the checkpoint); use dump_plan.py for the plan as
executed. Usage mirrors dump_plan.py.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from us_accidents_bigdata_pipeline_spark.operators import dedup
from us_accidents_bigdata_pipeline_spark.plans import REGISTRY
from us_accidents_bigdata_pipeline_spark.session import get_spark


def main() -> None:
    name, out = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    dedup._shared = lambda frame: frame
    spark = get_spark(app_name=f"plan-nockpt:{name}")
    df = REGISTRY[name].builder(spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(out, "w") as f:
        f.write(plan)
    print(f"{name} (nockpt): {plan.count('Exchange')} Exchange, "
          f"{plan.count('Scan parquet')} parquet scans -> {out}")
    spark.stop()


if __name__ == "__main__":
    main()
