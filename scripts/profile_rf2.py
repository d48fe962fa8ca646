#!/usr/bin/env python3
"""Focused RF-fit grid: combinations of the three winning knobs from
profile_rf.py (partitions=16, cacheNodeIds, maxMemoryInMB), best-of-N
to beat host noise. Usage: python scripts/profile_rf2.py [n_rows] [reps]"""

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
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="profile_rf2")
    spark.sparkContext.setLogLevel("ERROR")

    fixture = tempfile.mkdtemp(prefix="profile_rf2_")
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
        {"name": "baseline_p8", "parts": 8},
        {"name": "p16_cache_mem1024", "parts": 16, "cacheNodeIds": True, "maxMemoryInMB": 1024},
        {"name": "p16_cache", "parts": 16, "cacheNodeIds": True},
        {"name": "p16_mem1024", "parts": 16, "maxMemoryInMB": 1024},
        {"name": "p8_cache_mem1024", "parts": 8, "cacheNodeIds": True, "maxMemoryInMB": 1024},
        {"name": "p32_cache_mem1024", "parts": 32, "cacheNodeIds": True, "maxMemoryInMB": 1024},
    ]

    for cfg in grid:
        train = train_all.coalesce(cfg["parts"]).cache()
        n_train = train.count()
        rf = RandomForestClassifier(
            featuresCol="features",
            labelCol="label",
            numTrees=50,
            maxDepth=8,
            minInstancesPerNode=20,
            maxBins=64,
            subsamplingRate=0.7,
            featureSubsetStrategy="sqrt",
            seed=42,
            maxMemoryInMB=cfg.get("maxMemoryInMB", 256),
            cacheNodeIds=cfg.get("cacheNodeIds", False),
        )
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            rf.fit(train)
            best = min(best, time.perf_counter() - t0)
        print(
            json.dumps(
                {
                    "cfg": cfg["name"],
                    "n_train": n_train,
                    "best_fit_sec": round(best, 2),
                    "rows_per_sec": round(n_train / best),
                }
            ),
            flush=True,
        )
        train.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
