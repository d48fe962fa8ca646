"""Custom stateful streaming operators (SURVEY §2.10 extension).

Two shapes the built-in windowed aggregations can't express:

- **Arbitrary per-key state** (``running_totals_stateful``): an
  ``applyInPandasWithState`` operator holding (count, sum) per key
  across micro-batches — the template for custom accumulators,
  anomaly detectors, or enrichment caches. Arrow-batched; state lives
  in the state store, partitioned by key, so it scales with key
  cardinality, never with stream length.
- **Streaming deduplication** (``dedup_stream``):
  ``dropDuplicatesWithinWatermark`` — the bounded-state form. Plain
  ``dropDuplicates`` on a stream keys state forever (unbounded at
  100 TB/day); the within-watermark variant evicts ids older than the
  delay, which is the only shape that runs forever. The reference has
  no streaming consumer at all (its kafka_producer.py is write-only);
  these complete the capability Spark-natively.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _totals_func(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this batch's rows for one key into (n, total) state and emit
    the updated running totals. Runs once per key per micro-batch on
    Arrow-transferred pandas chunks."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["_v"].sum())
    state.update((n, total))
    yield pd.DataFrame({"key": [key[0]], "n_events": [n], "total_value": [total]})


def running_totals_stateful(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running (count, sum) maintained in the state store across
    micro-batches; emits the updated totals for every key seen in each
    trigger. Output: (key, n_events, total_value).

    ``n_events`` is STRICTLY monotone over a key's emissions (a key
    only emits when new rows arrived), so a bounded smoke run can
    recover finals per key by taking the emission with the highest
    ``n_events`` — e.g. ``max(struct(n_events, total_value))`` — no
    matter how the source was split into batches. That is what makes
    this oracle-comparable to the batch groupBy. (``total_value``
    itself is NOT monotone when values can be negative — recover it
    via the argmax, never with a bare ``max``.)
    """
    out_schema = T.StructType(
        [
            T.StructField("key", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )
    slim = events.selectExpr(f"{key_col} as _k", f"{value_col} as _v")
    return slim.groupBy("_k").applyInPandasWithState(
        _totals_func,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_stream(
    events: DataFrame,
    id_cols: list[str],
    ts_col: str = "ts",
    delay: str = "1 hour",
) -> DataFrame:
    """Streaming exact deduplication with bounded state:
    ``dropDuplicatesWithinWatermark`` keeps only ids newer than the
    watermark delay, so two copies of an event arriving within
    ``delay`` of each other collapse to one, and state for older ids is
    evicted. Use append output mode (rows pass through once)."""
    return events.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(id_cols)
