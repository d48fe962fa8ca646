#!/usr/bin/env python3
"""_shared lifetime stress (round 13, VERDICT item 7).

`_shared` (operators/dedup.py) materializes multi-consumer subtrees as
LAZY localCheckpoints whose blocks are released by Spark's
ContextCleaner when the frame is garbage collected. Within one query
that is fine; this script stresses the LONG-LIVED-session story: run
the ENTIRE registry (387 queries) through one session at sf0.01 and
sample executor storage as we go — checkpoint blocks must be reclaimed
under pressure, storage returning to ~baseline once references die.

Samples every SAMPLE_EVERY queries:
- persistent-RDD count (localCheckpoint RDDs live here until cleaned),
- storage memory used = sum(max - remaining) over executors.

Ends with an explicit driver gc + JVM System.gc() and a settled
re-sample. Writes SHARED_LIFETIME.json.

Usage: python scripts/shared_lifetime_stress.py
(env: SF_DIR default /root/testdata/sf0.01, SAMPLE_EVERY default 25)
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from us_accidents_bigdata_pipeline_spark.plans import REGISTRY
from us_accidents_bigdata_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
SAMPLE_EVERY = int(os.environ.get("SAMPLE_EVERY", "25"))


def _storage(spark) -> dict:
    sc = spark.sparkContext
    jsc = sc._jsc.sc()
    n_rdds = jsc.getPersistentRDDs().size()
    mem = jsc.getExecutorMemoryStatus()
    it = mem.iterator()
    used = 0
    while it.hasNext():
        kv = it.next()
        t = kv._2()
        used += int(t._1()) - int(t._2())
    return {"persistent_rdds": int(n_rdds), "storage_used_bytes": used}


def main() -> None:
    spark = get_spark(app_name="shared_lifetime_stress")
    spark.range(1000).selectExpr("sum(id)").collect()
    baseline = _storage(spark)
    samples = [{"after": 0, **baseline}]
    peak = dict(baseline)
    failures = []
    t0 = time.time()
    for i, (name, spec) in enumerate(sorted(REGISTRY.items()), start=1):
        try:
            spec.builder(spark, SF_DIR).collect()
        except Exception as e:
            failures.append(f"{name}: {str(e).splitlines()[0][:120]}")
        if i % SAMPLE_EVERY == 0:
            s = _storage(spark)
            samples.append({"after": i, **s})
            peak["persistent_rdds"] = max(
                peak["persistent_rdds"], s["persistent_rdds"]
            )
            peak["storage_used_bytes"] = max(
                peak["storage_used_bytes"], s["storage_used_bytes"]
            )
            print(f"after {i}: {s}", flush=True)
    # drop python references, then collect both runtimes and let the
    # ContextCleaner drain
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    time.sleep(5)
    settled = _storage(spark)
    payload = {
        "sf_dir": SF_DIR,
        "n_queries": len(REGISTRY),
        "n_failures": len(failures),
        "failures": failures[:10],
        "baseline": baseline,
        "peak": peak,
        "settled_after_gc": settled,
        "samples": samples,
        "wall_sec": round(time.time() - t0, 1),
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "SHARED_LIFETIME.json"), "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps({k: payload[k] for k in (
        "n_queries", "n_failures", "baseline", "peak", "settled_after_gc",
        "wall_sec")}))
    spark.stop()


if __name__ == "__main__":
    main()
