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

Re-probe mode (round-12): ``SPARK_GRAFT_SCALE_OPS`` restricts the run
to a comma-separated op subset and ``SPARK_GRAFT_SCALE_TAG`` (e.g.
``100x``) MERGES the results into the existing SCALING.json under
``ops_<tag>`` instead of overwriting the main ``ops`` section — used
to chain a second 10x step on top of the 10x dir (base=scale10x,
scaled=scale100x) so fixed per-job overhead stops dominating the
ratios of sub-second ops.
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
    # round-11 second wave
    "blocking_quality_report_docs": ("documents",),
    "banding_scurve_empirical_docs": ("documents",),
    "heaps_law_fit_docs": ("documents",),
    "krippendorff_alpha_docs": ("documents",),
    "calinski_harabasz_embeddings": ("embeddings",),
    "davies_bouldin_embeddings": ("embeddings",),
    "intra_doc_line_dedup_docs": ("documents",),
    "dp_user_bounded_counts": ("events",),
}

# table -> integer key columns shifted per replica (disjoint copies)
KEY_SHIFT: dict[str, tuple[str, ...]] = {
    "events": ("event_id", "user_id"),
    # l_partkey must shift too: with only the orderkey re-keyed, every
    # replica emits the SAME (partkey, partkey) co-purchase edges and
    # copurchase_edges' distinct collapses them — the graph has to GROW
    "lineitem": ("l_orderkey", "l_partkey"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}

# offsets used per key column when the scaled tables were built, so
# probe-specific builders can address individual replicas
_OFFS: dict[str, int] = {}


def _build_scaled(spark, tables: set) -> None:
    os.makedirs(SCALED, exist_ok=True)
    meta = os.path.join(SCALED, "_offsets.json")
    if os.path.exists(meta):
        with open(meta) as fh:
            _OFFS.update({k: int(v) for k, v in json.load(fh).items()})
    for name in sorted(tables):
        out = f"{SCALED}/{name}.parquet"
        if os.path.exists(out):
            continue
        df = _t(spark, BASE, name)
        keys = KEY_SHIFT.get(name, ())
        offs = {}
        for kc in keys:
            mx = df.agg(F.max(kc)).first()[0]
            offs[kc] = int(mx) + 1 if mx is not None else 1
        _OFFS.update(offs)
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
            # ~FACTOR^2, measuring data semantics instead of plan shape.
            # Replica 0 keeps the PRISTINE base text: the x1 slice of
            # the scaled corpus must match what the base run tokenizes
            toks = F.split(F.coalesce(F.col("text"), F.lit("")), r"\s+")
            suffixed = F.array_join(
                F.transform(
                    toks,
                    lambda t: F.concat(
                        t, F.lit("r"), F.col("_rep").cast("string")
                    ),
                ),
                " ",
            )
            scaled = scaled.withColumn(
                "text",
                F.when(F.col("_rep") == 0, F.col("text")).otherwise(suffixed),
            )
        scaled.drop("_rep").write.mode("overwrite").parquet(out)
        with open(meta, "w") as fh:
            json.dump(_OFFS, fh)
        print(f"built {out}", flush=True)


def _probe_miters(iters: int = 20_000_000) -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(iters):
        x += i
    return (iters / 1e6) / (time.perf_counter() - t0)


def _cc_scaled(spark, sf_dir: str):
    """clustering_coef_copurchase's registry builder filters
    l_orderkey < 2000, which would exclude every key-shifted replica —
    the scaled run would silently time the BASE subgraph. This probe
    builder takes the same 2000-orderkey block from EACH replica
    (modulo the build offset), so the hub-capped wedge count really
    sees a FACTOR× graph."""
    from us_accidents_bigdata_pipeline_spark.operators.graph import (
        copurchase_edges,
        local_clustering_coefficient,
    )

    off = int(_OFFS["l_orderkey"])
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_orderkey") % off) < 2000
    )
    return local_clustering_coefficient(copurchase_edges(li), max_degree=40)


# probe-specific builders used ONLY for the scaled run, where the
# registry builder's literal filters would defeat the replication
_SCALED_BUILDERS = {"clustering_coef_copurchase": _cc_scaled}


def _run(spark, name: str, sf_dir: str) -> float:
    builder = REGISTRY[name].builder
    if sf_dir == SCALED and name in _SCALED_BUILDERS:
        builder = _SCALED_BUILDERS[name]
    t0 = time.perf_counter()
    builder(spark, sf_dir).count()
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark(app_name="scaling_probe")
    spark.range(1000).selectExpr("sum(id)").collect()  # warm-up
    subset_env = os.environ.get("SPARK_GRAFT_SCALE_OPS")
    ops = (
        {n: OPS[n] for n in subset_env.split(",") if n}
        if subset_env
        else OPS
    )
    tag = os.environ.get("SPARK_GRAFT_SCALE_TAG")
    needed = {t for ts in ops.values() for t in ts}
    _build_scaled(spark, needed)

    results: dict[str, dict] = {}
    for name in ops:
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
    out_path = os.path.join(here, "SCALING.json")
    if tag:
        with open(out_path) as fh:
            payload = json.load(fh)
        payload[f"ops_{tag}"] = results
        payload[f"base_sf_dir_{tag}"] = BASE
        payload[f"cpu_probe_miters_per_sec_{tag}"] = round(
            _probe_miters(), 1
        )
    else:
        payload = {
            "base_sf_dir": BASE,
            "scale_factor": FACTOR,
            "cpu_probe_miters_per_sec": round(_probe_miters(), 1),
            "ops": results,
        }
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps(results, sort_keys=True))


if __name__ == "__main__":
    main()
