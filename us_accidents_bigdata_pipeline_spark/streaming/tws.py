"""transformWithStateInPandas operators (Spark 4 state-v2 API).

``transformWithStateInPandas`` is the successor to
``applyInPandasWithState`` (stateful.py): an object-oriented
``StatefulProcessor`` with named, independently-typed state handles
(ValueState / ListState / MapState), optional per-state TTL, and
event/processing-time timers — the API Spark is converging on for
custom stateful streaming. This module provides the running-totals
operator in that form, twin to ``stateful.running_totals_stateful``,
so both state APIs are exercised against the same batch oracle.

Runtime requirement: the TWS driver worker speaks a protobuf protocol
to the JVM state server (``pyspark/sql/streaming/proto``), so the
``google.protobuf`` runtime must be importable IN THE WORKER
PROCESSES — which inherit the JVM's environment, so ``PYTHONPATH``
must be right BEFORE the SparkSession (hence JVM) starts. On a
production cluster ``pip install protobuf`` is the answer;
``ensure_protobuf_runtime`` below additionally probes conventional
system locations (e.g. the Google Cloud SDK's bundled copy) so the
capability can run on hosts where installation isn't possible. When
only an older runtime than pyspark's gencode is available, the
protobuf project's own escape hatch
(``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK``) is set — acceptable
for a demo/test runner, not production policy.

Everything degrades cleanly: ``tws_runtime_available()`` gates tests
and demos, and the applyInPandasWithState twin remains the
always-available path.
"""

from __future__ import annotations

import os
import sys

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# Conventional locations where a google.protobuf runtime may already
# exist on hosts without pip access. Public, documented packages only.
_PROTOBUF_FALLBACK_PATHS = [
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
]


def ensure_protobuf_runtime() -> bool:
    """Make ``google.protobuf`` importable for this process AND for the
    Python workers Spark will spawn (via PYTHONPATH), returning whether
    the runtime is available. MUST run before the SparkSession is
    created — workers inherit the JVM's environment, which is frozen at
    JVM launch."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        pass
    for path in _PROTOBUF_FALLBACK_PATHS:
        if os.path.isdir(os.path.join(path, "google", "protobuf")):
            if path not in sys.path:
                sys.path.insert(0, path)
            existing = os.environ.get("PYTHONPATH", "")
            if path not in existing.split(os.pathsep):
                os.environ["PYTHONPATH"] = (
                    path + (os.pathsep + existing if existing else "")
                )
            # the system copy may trail pyspark's gencode by a minor
            # version; protobuf's own escape hatch accepts that for
            # non-production use
            os.environ.setdefault(
                "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true"
            )
            try:
                from google.protobuf import descriptor  # noqa: F401

                return True
            except ImportError:
                continue
    return False


def tws_runtime_available() -> bool:
    """True when the transformWithState protobuf protocol can load."""
    if not ensure_protobuf_runtime():
        return False
    try:
        from pyspark.sql.streaming.proto import (  # noqa: F401
            StateMessage_pb2,
        )

        return True
    except Exception:
        return False


TOTALS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _make_totals_processor():
    """Build the StatefulProcessor class lazily (its base class import
    pulls streaming internals that need no protobuf, but keeping it
    lazy means importing this module never fails)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TotalsProcessor(StatefulProcessor):
        """Per-key running (count, sum) in a named ValueState — the
        state-v2 twin of stateful._totals_func. Input batches arrive
        with POSITIONAL column names (_0 = key, _1 = value) in Spark
        4.1's TWS Arrow protocol, hence iloc access."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals",
                T.StructType(
                    [
                        T.StructField("n", T.LongType()),
                        T.StructField("total", T.DoubleType()),
                    ]
                ),
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total = (
                self._totals.get() if self._totals.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf.iloc[:, 1].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                }
            )

        def close(self) -> None:
            pass

    return TotalsProcessor()


def running_totals_tws(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running (count, sum) through transformWithStateInPandas.

    Output, semantics, and the monotone-``n_events`` final-recovery
    contract are identical to ``stateful.running_totals_stateful`` —
    the two operators share the batch groupBy oracle, which is what
    pins API parity. State lives in the state store keyed by
    ``key_col``; use the RocksDB provider (session.py default confs
    leave this to the caller) for spill-safe state at scale.
    """
    slim = events.selectExpr(f"{key_col} as _k", f"{value_col} as _v")
    return slim.groupBy("_k").transformWithStateInPandas(
        statefulProcessor=_make_totals_processor(),
        outputStructType=TOTALS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
