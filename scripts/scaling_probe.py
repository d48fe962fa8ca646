#!/usr/bin/env python3
"""Scaling probe for the statistics tier: runs the heaviest
round-9b/10/11 operators at the base SF and at a FACTOR× row-replicated
scale-up, and records the wall-clock growth factor per operator into
``SCALING.json`` at the repo root.

Why replication (not a bigger TPC-H fixture): these operators promise
sub-linear *aggregate* shapes — per-DISTINCT-VALUE windows, bounded
cell/bin frames, hub-capped wedges. Replicating rows FACTOR× with
key-shifted replicas grows n by FACTOR while keeping the value domain
(and, with shifted graph/user keys, the per-key structure) fixed —
exactly the regime the 100 TB claims are about. An operator whose time
grows ≲ FACTOR is shuffle/scan-bound (fine); anything clearly
super-linear is a scale defect worth a round item.

Key shifting: ``events.event_id``/``user_id``, ``lineitem.l_orderkey``
and ``documents.doc_id`` are offset per replica so graphs/sessions
become FACTOR disjoint copies instead of FACTOR× denser ones (density
growth would measure a different asymptotic than data growth).

Usage: ``python3 scripts/scaling_probe.py`` (env:
``SPARK_GRAFT_SF_DIR`` base, default sf0.1; ``SPARK_GRAFT_SCALE_FACTOR``
default 10; ``SPARK_GRAFT_SCALE_DIR`` scratch, default under /tmp).
The scaled parquet is built once and reused if present.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from us_accidents_bigdata_pipeline_spark.plans.queries import (  # noqa: E402
    REGISTRY,
    _t,
)
from us_accidents_bigdata_pipeline_spark.session import get_spark  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTOR = int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "10"))
SCALED = os.environ.get(
    "SPARK_GRAFT_SCALE_DIR", f"/tmp/spark_graft_scale{FACTOR}x"
)

# operator -> tables it reads (only those get scaled replicas)
OPS: dict[str, tuple[str, ...]] = {
    "energy_distance_click_purchase": ("events",),
    "wasserstein_click_purchase": ("events",),
    "mann_whitney_value_click_purchase": ("events",),
    "spearman_quantity_price": ("lineitem",),
    "isotonic_calibration_value_purchase": ("events",),
    "qte_value_click_purchase": ("events",),
    "clustering_coef_copurchase": ("lineitem",),
    "token_coverage_curve": ("documents",),
    "lsh_banding_planner_docs": ("documents",),
    "ivf_assignment_drift": ("embeddings",),
}

# table -> integer key columns shifted per replica (disjoint copies)
KEY_SHIFT: dict[str, tuple[str, ...]] = {
    "events": ("event_id", "user_id"),
    "lineitem": ("l_orderkey",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}


def _build_scaled(spark, tables: set) -> None:
    os.makedirs(SCALED, exist_ok=True)
    for name in sorted(tables):
        out = f"{SCALED}/{name}.parquet"
        if os.path.exists(out):
            continue
        df = _t(spark, BASE, name)
        keys = KEY_SHIFT.get(name, ())
        offs = {
            c: df.agg(F.max(c)).first()[0] + 1 for c in keys
        }
        rep = spark.range(FACTOR).withColumnRenamed("id", "_rep")
        scaled = df.crossJoin(F.broadcast(rep))
        for c in keys:
            scaled = scaled.withColumn(
                c, F.col(c) + F.col("_rep") * F.lit(int(offs[c]))
            )
        if name == "documents":
            # suffix every token with the replica id so replicas are
            # DISJOINT in shingle space — otherwise each doc gains
            # FACTOR-1 exact twins and the near-dup pair set grows
            # ~FACTOR^2, measuring data semantics instead of plan shape
            toks = F.split(F.coalesce(F.col("text"), F.lit("")), r"\s+")
            scaled = scaled.withColumn(
                "text",
                F.array_join(
                    F.transform(
                        toks,
                        lambda t: F.concat(
                            t, F.lit("r"), F.col("_rep").cast("string")
                        ),
                    ),
                    " ",
                ),
            )
        scaled.drop("_rep").write.mode("overwrite").parquet(out)
        print(f"built {out}", flush=True)


def _probe_miters(iters: int = 20_000_000) -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(iters):
        x += i
    return (iters / 1e6) / (time.perf_counter() - t0)


def _run(spark, name: str, sf_dir: str) -> float:
    t0 = time.perf_counter()
    REGISTRY[name].builder(spark, sf_dir).count()
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark(app_name="scaling_probe")
    spark.range(1000).selectExpr("sum(id)").collect()  # warm-up
    needed = {t for ts in OPS.values() for t in ts}
    _build_scaled(spark, needed)

    results: dict[str, dict] = {}
    for name in OPS:
        _run(spark, name, BASE)  # warm both code paths
        t_base = min(_run(spark, name, BASE) for _ in range(2))
        t_scaled = min(_run(spark, name, SCALED) for _ in range(2))
        results[name] = {
            "t_base_sec": round(t_base, 3),
            "t_scaled_sec": round(t_scaled, 3),
            "growth": round(t_scaled / t_base, 2) if t_base > 0 else None,
        }
        print(f"{name}: {t_base:.2f}s -> {t_scaled:.2f}s "
              f"(x{t_scaled / t_base:.2f})", flush=True)

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    payload = {
        "base_sf_dir": BASE,
        "scale_factor": FACTOR,
        "cpu_probe_miters_per_sec": round(_probe_miters(), 1),
        "ops": results,
    }
    with open(os.path.join(here, "SCALING.json"), "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps(payload["ops"], sort_keys=True))


if __name__ == "__main__":
    main()
