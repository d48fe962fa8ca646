#!/usr/bin/env python3
"""End-to-end training-corpus export CLI — the LLM-data counterpart of
``run_pipeline.py`` (which covers the reference's accidents analytics,
``BigDataPipeline/scripts/run_pipeline.sh``): curate → deterministic
shard/shuffle → audited parquet export, runnable under spark-submit or
plain python.

    python scripts/export_corpus.py --sf-dir /root/testdata/sf0.01 \
        --out /tmp/corpus_export --shards 8 --quality-min 0.8

Stages (each an individually-oracled operator in the catalog):
1. ``curation.curate_corpus`` — quality/repetition filters, exact +
   near-dup dedup, benchmark decontamination; prints the funnel.
2. ``shard.shard_assignment`` + ``write_training_shards`` — md5-keyed
   deterministic shuffle into ``shard=K/`` directories (byte-identical
   on any cluster layout).
3. ``tuning.write_with_metrics`` — the export itself carries its audit
   aggregates (row/token counts) on the SAME job via df.observe; the
   audit JSON lands next to the data.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from us_accidents_bigdata_pipeline_spark.operators.curation import (  # noqa: E402
    curate_corpus,
)
from us_accidents_bigdata_pipeline_spark.operators.shard import (  # noqa: E402
    write_training_shards,
)
from us_accidents_bigdata_pipeline_spark.session import get_spark  # noqa: E402
from us_accidents_bigdata_pipeline_spark.tuning import (  # noqa: E402
    write_with_metrics,
)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", required=True)
    ap.add_argument("--shards", type=int, default=16)
    ap.add_argument("--quality-min", type=float, default=0.8)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    spark = get_spark(app_name="export_corpus", master=args.master)
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    # benchmark set for decontamination: the synthetic fixture carries
    # no external benchmark, so use a held-out slice (every 97th doc)
    bench = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")

    curated, funnel = curate_corpus(
        docs, bench, quality_min=args.quality_min
    )
    funnel_rows = [
        (r["stage_idx"], r["stage"], r["n_docs"]) for r in funnel.collect()
    ]
    for idx, stage, n in funnel_rows:
        print(f"funnel[{idx}] {stage:>15}: {n}", flush=True)

    curated = curated.persist()
    shards_dir = os.path.join(args.out, "shards")
    write_training_shards(
        curated, shards_dir, n_shards=args.shards, seed=args.seed
    )

    from us_accidents_bigdata_pipeline_spark.functions import token_count

    audit = write_with_metrics(
        curated.withColumn("n_tokens", token_count("text")),
        os.path.join(args.out, "curated"),
        {
            "n_docs": F.count(F.lit(1)),
            "n_tokens": F.sum("n_tokens"),
            "n_null_text": F.sum(
                F.when(F.col("text").isNull(), 1).otherwise(0)
            ),
        },
    )
    curated.unpersist()
    report = {
        "funnel": [
            {"stage_idx": i, "stage": s, "n_docs": n}
            for i, s, n in funnel_rows
        ],
        "audit": {k: int(v) for k, v in audit.items()},
        "shards": args.shards,
        "seed": args.seed,
    }
    with open(os.path.join(args.out, "export_report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report["audit"]), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
