#!/usr/bin/env python3
"""Emit PLANAUDIT.json: per-registry-query executed-plan red flags.

For every catalog entry, build the frame at a small SF and record the
plan auditor's findings (cartesian products, broadcast nested loops,
row-at-a-time Python evals, SinglePartition-fed windows) plus whether
the flag is whitelisted (with the justification class from
tests/test_oracle.py::_AUDIT_ALLOW). The pytest oracle sweep already
FAILS on non-whitelisted flags; this artifact makes the full audit
readable without running the suite.

    python scripts/plan_audit_report.py [--sf-dir DIR] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from us_accidents_bigdata_pipeline_spark.plans import REGISTRY
    from us_accidents_bigdata_pipeline_spark.plans.audit import audit_plan

    # the whitelist (and its per-name justification comments) lives
    # with the test that enforces it — reuse, don't duplicate
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from tests.test_oracle import _AUDIT_ALLOW

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.showConsoleProgress", "false")
        .appName("plan_audit_report")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    report: dict[str, dict] = {}
    n_clean = n_allowed = n_violations = 0
    for name, spec in sorted(REGISTRY.items()):
        try:
            flags = set(audit_plan(spec.builder(spark, args.sf_dir)))
        except Exception as e:  # plan build failed — record, don't die
            report[name] = {"error": str(e).split("\n")[0][:200]}
            continue
        allowed = _AUDIT_ALLOW.get(name, set())
        violations = sorted(flags - allowed)
        report[name] = {
            "flags": sorted(flags),
            "whitelisted": sorted(flags & allowed),
            "violations": violations,
        }
        if not flags:
            n_clean += 1
        elif not violations:
            n_allowed += 1
        else:
            n_violations += 1

    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PLANAUDIT.json",
    )
    payload = {
        "sf_dir": args.sf_dir,
        "n_queries": len(report),
        "clean": n_clean,
        "flagged_whitelisted": n_allowed,
        "violations": n_violations,
        "queries": report,
    }
    with open(out, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(
        json.dumps(
            {k: payload[k] for k in
             ("n_queries", "clean", "flagged_whitelisted", "violations")}
        )
    )
    return 1 if n_violations else 0


if __name__ == "__main__":
    raise SystemExit(main())
