#!/usr/bin/env python3
"""Drive the repo's driver contract end-to-end with a PLAIN SparkSession,
mirroring the correctness driver: entry() smoke, then each queries() entry
vs its DuckDB oracle at sf0.01 (column names + row count + order-insensitive
values). Pass query names as argv for a subset; no args = full sweep."""

import math
import os
import sys

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as e

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    return v


def norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out


def main():
    # Env overrides enable layout-robustness sweeps: results must be
    # identical under any core count / shuffle-partition count / AQE
    # setting (a dependence on partition layout is a correctness bug —
    # e.g. a collect-order assumption or a non-deterministic tiebreak).
    spark = (
        SparkSession.builder.master(
            os.environ.get("DRIVE_MASTER", "local[8]")
        )
        .config(
            "spark.sql.shuffle.partitions",
            os.environ.get("DRIVE_SHUFFLE_PARTITIONS", "8"),
        )
        .config(
            "spark.sql.adaptive.enabled",
            os.environ.get("DRIVE_AQE", "true"),
        )
        .appName("drive_contract")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    res = e.entry(spark)
    n = len(res.collect())
    print(f"entry(): {n} rows, schema={[f.name for f in res.schema]}")
    assert n >= 0

    qs = e.queries()
    oracles = e.oracle_sql()
    subset = sys.argv[1:] or list(qs)
    n_pass = n_rows_only = 0
    failures = []
    for name in subset:
        fn = qs[name]
        try:
            sdf = fn(spark, SF_DIR)
            scols = list(sdf.columns)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            failures.append((name, f"spark error: {ex}"))
            continue
        if name not in oracles:
            n_rows_only += 1
            print(f"  {name}: rows-only, {len(srows)} rows")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as ex:
            failures.append((name, f"oracle error: {ex}"))
            continue
        sc, sr = norm(scols, srows)
        oc, orr = norm(ocols, orows)
        if sc != oc:
            failures.append((name, f"cols {sc} != {oc}"))
        elif len(sr) != len(orr):
            failures.append((name, f"rows {len(sr)} != {len(orr)}"))
        elif sr != orr:
            diff = next(
                (i for i, (a, b) in enumerate(zip(sr, orr)) if a != b), -1
            )
            failures.append(
                (name, f"values differ at sorted row {diff}: "
                       f"{sr[diff] if diff >= 0 else ''} vs "
                       f"{orr[diff] if diff >= 0 else ''}")
            )
        else:
            n_pass += 1
            print(f"  {name}: PASS ({len(sr)} rows)")
    print(
        f"\n{n_pass} oracle-pass, {n_rows_only} rows-only, "
        f"{len(failures)} failures of {len(subset)}"
    )
    for name, why in failures:
        print(f"  FAIL {name}: {why}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
