#!/usr/bin/env python3
"""Profile RandomForest fit throughput at the bench tier.

Grid over the MLlib training knobs that plausibly explain the round-1
rows/s gap (12.5K vs the reference notebook's 77K rows/s,
Pipeline_Collab/outputs/rf_results.json): maxMemoryInMB (node-group
batching per pass), input partition count (per-iteration task
overhead), cacheNodeIds, maxBins, and feature count. Prints one JSON
line per config: {"cfg": ..., "fit_sec": ..., "rows_per_sec": ...}.

Usage: python scripts/profile_rf.py [n_rows]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.ml.classification import RandomForestClassifier
from pyspark.sql import functions as F

from us_accidents_bigdata_pipeline_spark.operators.clean import (
    ACCIDENTS_CLEAN_SPEC,
    clean,
)
from us_accidents_bigdata_pipeline_spark.ml.features import assemble_and_scale
from us_accidents_bigdata_pipeline_spark.operators.sample import deterministic_split
from us_accidents_bigdata_pipeline_spark.session import get_spark
from us_accidents_bigdata_pipeline_spark.sources.accidents import (
    generate_accidents_raw_distributed,
)

FEATURES_6 = [
    "Distance_mi",
    "Temperature_F",
    "Humidity_Percent",
    "Visibility_mi",
    "Wind_Speed_mph",
    "Traffic_Signal",
]


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark(app_name="profile_rf")
    spark.sparkContext.setLogLevel("ERROR")

    fixture = tempfile.mkdtemp(prefix="profile_rf_")
    generate_accidents_raw_distributed(spark, n_rows=n_rows, seed=42).write.mode(
        "overwrite"
    ).parquet(fixture)
    raw = spark.read.parquet(fixture)

    cleaned = clean(raw, ACCIDENTS_CLEAN_SPEC)
    labeled = cleaned.withColumn("label", (F.col("Severity") - 1).cast("double"))
    feat, _ = assemble_and_scale(labeled, FEATURES_6, with_mean=False)
    train_all, _ = deterministic_split(feat, "ID", 0.2)
    train_all = train_all.select("label", "features")

    grid = [
        {"name": "baseline_p8"},
        {"name": "p2", "parts": 2},
        {"name": "p4", "parts": 4},
        {"name": "p16", "parts": 16},
        {"name": "p32", "parts": 32},
        {"name": "mem1024", "maxMemoryInMB": 1024},
        {"name": "mem1024_p4", "maxMemoryInMB": 1024, "parts": 4},
        {"name": "mem2048_p2", "maxMemoryInMB": 2048, "parts": 2},
        {"name": "cacheNodeIds", "cacheNodeIds": True},
        {"name": "bins32", "maxBins": 32},
        {"name": "bins32_mem1024_p4", "maxBins": 32, "maxMemoryInMB": 1024, "parts": 4},
        {"name": "subsample1.0", "subsamplingRate": 1.0},
        {"name": "fsAll", "featureSubsetStrategy": "all"},
    ]

    for cfg in grid:
        parts = cfg.get("parts", 8)
        train = train_all.coalesce(parts).cache()
        n_train = train.count()
        rf = RandomForestClassifier(
            featuresCol="features",
            labelCol="label",
            numTrees=50,
            maxDepth=8,
            minInstancesPerNode=20,
            maxBins=cfg.get("maxBins", 64),
            subsamplingRate=cfg.get("subsamplingRate", 0.7),
            featureSubsetStrategy=cfg.get("featureSubsetStrategy", "sqrt"),
            seed=42,
            maxMemoryInMB=cfg.get("maxMemoryInMB", 256),
            cacheNodeIds=cfg.get("cacheNodeIds", False),
        )
        t0 = time.perf_counter()
        model = rf.fit(train)
        fit_sec = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "cfg": cfg["name"],
                    "n_train": n_train,
                    "fit_sec": round(fit_sec, 2),
                    "rows_per_sec": round(n_train / fit_sec),
                    "n_nodes": model.totalNumNodes,
                }
            ),
            flush=True,
        )
        train.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
