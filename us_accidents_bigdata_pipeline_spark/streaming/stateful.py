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


def counts_with_timeout(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    idle_gap_ms: int = 5 * 60 * 1000,
) -> DataFrame:
    """Stateful per-key count whose state EXPIRES after ``idle_gap_ms``
    of EVENT-TIME inactivity (``GroupStateTimeout.EventTimeTimeout``):
    when the watermark passes a key's last-event time + gap, the key is
    invoked once with ``hasTimedOut``, emits a ``final=true`` row, and
    its state is evicted. Output: (key, n_events, final).

    This is the state-lifecycle twin of ``running_totals_stateful``
    (which holds state forever): at 100 TB/day with an unbounded key
    universe, timeout-based eviction is what keeps the state store from
    growing without bound. Event-time (not processing-time) timers are
    the scale-correct choice — deterministic under reprocessing and
    backfill, driven by the same watermark that bounds the windowed
    operators, and they cannot re-arm into an endless cleanup loop on
    an idle stream. Timers fire on the first trigger whose watermark
    passed them, so bounded smoke tests must force multi-batch
    execution (``max_files_per_trigger=1``) to advance the watermark
    between batches."""
    out_schema = T.StructType(
        [
            T.StructField("key", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("final", T.BooleanType()),
        ]
    )
    state_schema = T.StructType([T.StructField("n", T.LongType())])

    def func(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            (n,) = state.get
            state.remove()
            yield pd.DataFrame(
                {"key": [key[0]], "n_events": [n], "final": [True]}
            )
            return
        n = state.get[0] if state.exists else 0
        last_ms = 0
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                batch_max = pdf["_ts"].max()
                last_ms = max(last_ms, int(batch_max.value // 1_000_000))
        state.update((n,))
        # arm the event-time timer at last-seen + gap; the watermark
        # crossing it is what declares the key idle
        state.setTimeoutTimestamp(last_ms + idle_gap_ms)
        yield pd.DataFrame({"key": [key[0]], "n_events": [n], "final": [False]})

    slim = events.selectExpr(
        f"{key_col} as _k", f"CAST({ts_col} AS TIMESTAMP) as _ts"
    ).withWatermark("_ts", watermark)
    return slim.groupBy("_k").applyInPandasWithState(
        func,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
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
