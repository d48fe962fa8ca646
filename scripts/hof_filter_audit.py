#!/usr/bin/env python3
"""Registry-wide audit for the round-13 filter-under-Project trap.

When a .filter() references a column computed by an expensive
expression (HOF / regex split / lambda) in the Project directly below
it, PushDownPredicate substitutes the full expression into the
predicate: the expression then evaluates TWICE per row (filter +
project), and HOF-bearing predicates fall off whole-stage codegen —
measured 10x on the minhash shingle generator at sf0.1.

This scans every registered query's executed plan for Filter nodes
whose condition embeds a higher-order-function marker, and reports
them for manual triage (a HOF in a filter is fine when the filter is
the only consumer — it flags DUPLICATION candidates, not violations).

    python scripts/hof_filter_audit.py [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HOF_MARKERS = re.compile(
    r"lambdafunction|transform\(|aggregate\(|zip_with\(|array_join\("
)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from us_accidents_bigdata_pipeline_spark.plans import REGISTRY

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.showConsoleProgress", "false")
        .appName("hof_filter_audit")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    hits: dict[str, list[str]] = {}
    errors = 0
    for name, spec in sorted(REGISTRY.items()):
        try:
            plan = (
                spec.builder(spark, args.sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception:
            errors += 1
            continue
        flagged = []
        for line in plan.splitlines():
            s = line.strip()
            if s.startswith(("+- Filter", ":- Filter", "Filter")) or (
                "Filter (" in s and "PushedFilters" not in s
            ):
                if HOF_MARKERS.search(s):
                    flagged.append(s[:160])
        # formatted-mode plans put the condition in a detail block;
        # fall back to scanning "Condition :" lines too
        for m in re.finditer(r"Condition : (.*)", plan):
            if HOF_MARKERS.search(m.group(1)):
                flagged.append(("Condition: " + m.group(1))[:160])
        if flagged:
            hits[name] = sorted(set(flagged))
    print(json.dumps({"n_flagged": len(hits), "errors": errors}, indent=0))
    for name, lines in sorted(hits.items()):
        print(f"\n== {name}")
        for ln in lines:
            print("   " + ln)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
