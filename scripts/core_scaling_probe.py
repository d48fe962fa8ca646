#!/usr/bin/env python3
"""Core-scaling probe (round 13, VERDICT item 3).

The driver's 8-vs-32-core bench comparison at sf0.1 is uninformative:
the headline queries are 2-6 s of mostly fixed overhead there, so the
ratio measures job setup + the host's sustained-multicore throttle,
not plan parallelism. This probe times the shuffle-heavy headliners on
the 10x-replicated documents tier (built/reused by scaling_probe.py —
key-shifted, token-suffixed disjoint replicas), where per-query work
is tens of seconds and the plan's parallel fraction dominates.

Method: for each query, alternate local[8] / local[32] runs in fresh
child processes (clean JVM core budget each), REPS times, keep the
minimum per (query, cores) — the interleave is the throttle-robust
protocol (OPTIMIZATION_r12.md wave 14). A single-thread probe brackets
every child so a throttled window is visible in the artifact.

Writes SCALING_CORES.json: per query {sec_8, sec_32, speedup}, plus
probes. Target per VERDICT: speedup >= 2.5 at 4x cores for the
shuffle-heavy set, or a named serial bottleneck.

Usage: python scripts/core_scaling_probe.py  (env:
SPARK_GRAFT_SCALE_DIR base, default /tmp/spark_graft_scale10x;
SPARK_GRAFT_CORE_REPS default 2; SPARK_GRAFT_CORE_OPS subset)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SCALED = os.environ.get(
    "SPARK_GRAFT_SCALE_DIR", "/tmp/spark_graft_scale10x"
)
REPS = int(os.environ.get("SPARK_GRAFT_CORE_REPS", "2"))

# shuffle-heavy, documents-only headliners (the VERDICT-named set)
QUERIES = [
    "minhash_banded_pairs",
    "simhash_near_dup_pairs_md5",
    "corpus_curation_funnel",
    "near_dup_resolve_banded",
]

_WORKER = r"""
import json, sys, time
sys.path.insert(0, {here!r})
from us_accidents_bigdata_pipeline_spark.plans import REGISTRY
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[{cpus}]")
    .config("spark.driver.memory", "16g")
    # FIXED shuffle-partition count for BOTH core counts: scaling the
    # partition count with cores (4x cpus) confounded the probe — at
    # this tier 128 sub-MB partitions cost more per shuffle than 32
    # (guide 2.2 block growth), masking plan parallelism. 64 is sized
    # to the tier (~1 MB/partition), identical on both sides.
    .config("spark.sql.shuffle.partitions", "{shuffle}")
    .config("spark.ui.showConsoleProgress", "false")
    .appName("core_scaling_{cpus}")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1000).selectExpr("sum(id)").collect()
t0 = time.perf_counter()
REGISTRY[{name!r}].builder(spark, {sf_dir!r}).count()
print(json.dumps({{"sec": time.perf_counter() - t0}}))
spark.stop()
"""


def _probe_miters(iters: int = 20_000_000) -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(iters):
        x += i
    return (iters / 1e6) / (time.perf_counter() - t0)


def _run_child(name: str, cpus: int) -> float:
    code = _WORKER.format(
        here=HERE, cpus=cpus, shuffle=64, name=name, sf_dir=SCALED
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    line = [
        ln for ln in out.stdout.splitlines() if ln.startswith('{"sec"')
    ]
    if not line:
        raise RuntimeError(
            f"{name}@{cpus}: no result; stderr tail: {out.stderr[-400:]}"
        )
    return float(json.loads(line[-1])["sec"])


def main() -> None:
    if not os.path.exists(os.path.join(SCALED, "documents.parquet")):
        print(
            f"{SCALED}/documents.parquet missing — run "
            "scripts/scaling_probe.py first to build the replica tier",
            file=sys.stderr,
        )
        sys.exit(2)
    subset = os.environ.get("SPARK_GRAFT_CORE_OPS")
    queries = subset.split(",") if subset else QUERIES
    results: dict[str, dict] = {}
    probes: list[float] = []
    for name in queries:
        best = {8: float("inf"), 32: float("inf")}
        for rep in range(REPS):
            for cpus in (8, 32):
                probes.append(round(_probe_miters(), 1))
                sec = _run_child(name, cpus)
                best[cpus] = min(best[cpus], sec)
                print(
                    f"{name}@{cpus} rep{rep}: {sec:.1f}s "
                    f"(probe {probes[-1]})",
                    flush=True,
                )
        results[name] = {
            "sec_8": round(best[8], 2),
            "sec_32": round(best[32], 2),
            "speedup_8_to_32": round(best[8] / best[32], 2),
        }
    payload = {
        "scaled_dir": SCALED,
        "reps": REPS,
        "cpu_probe_miters": {
            "min": min(probes),
            "max": max(probes),
        },
        "queries": results,
    }
    out_path = os.path.join(HERE, "SCALING_CORES.json")
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
