"""Spark 4 Python Data Source API: a custom partitioned batch source.

The reference reads CSV/parquet only; this demonstrates the engine's
EXTENSIBLE source surface (SURVEY §2.1 family) with the new
``pyspark.sql.datasource`` API: a deterministic arithmetic source whose
rows are fully defined by (start, n, partitions) options — which is
exactly what makes it SQL-oracle-checkable (generate_series) even
though the rows never touch storage.

Scale shape: `partitions()` splits the range into independent
InputPartitions, each read entirely on its executor — the same
contract a real custom source (REST paginator, message-queue snapshot,
proprietary format) would implement.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SquaresDataSource(DataSource):
    """``spark.read.format("squares")`` → (i, i_squared) over
    [start, start + n), split across ``partitions`` input splits."""

    @classmethod
    def name(cls) -> str:
        return "squares"

    def schema(self) -> str:
        return "i bigint, i_squared bigint"

    def reader(self, schema) -> "SquaresReader":
        return SquaresReader(self.options)


class SquaresReader(DataSourceReader):
    def __init__(self, options):
        self.start = int(options.get("start", 0))
        self.n = int(options.get("n", 1000))
        self.n_parts = max(1, int(options.get("partitions", 4)))

    def partitions(self):
        step = -(-self.n // self.n_parts)  # ceil div
        out = []
        lo = self.start
        end = self.start + self.n
        while lo < end:
            hi = min(lo + step, end)
            out.append(_RangePartition(lo, hi))
            lo = hi
        return out

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield (i, i * i)


def register(spark) -> None:
    """Idempotent registration of the custom source on a session."""
    spark.dataSource.register(SquaresDataSource)


# --- streaming variant (SimpleDataSourceStreamReader) -----------------


class SquaresStreamDataSource(DataSource):
    """``spark.readStream.format("squares_stream")`` — the streaming
    member of the custom-source pair: each micro-batch advances the
    offset by ``batch_rows`` until ``n`` total rows are emitted, then
    the source idles (empty batches). Offsets are plain dicts, giving
    exactly-once replay between checkpointed offsets
    (``readBetweenOffsets``) like any production streaming source."""

    @classmethod
    def name(cls) -> str:
        return "squares_stream"

    def schema(self) -> str:
        return "i bigint, i_squared bigint"

    def simpleStreamReader(self, schema) -> "SquaresStreamReader":
        return SquaresStreamReader(self.options)


class SquaresStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.batch_rows = int(options.get("batch_rows", 100))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        lo = int(start["pos"])
        hi = min(lo + self.batch_rows, self.n)
        # a LIST iterator, not a generator: the runtime drains it into
        # its prefetch cache with next() (so it must be an iterator)
        # and pickles the cached rows (so a generator would fail)
        return (iter([(i, i * i) for i in range(lo, hi)]), {"pos": hi})

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [(i, i * i) for i in range(int(start["pos"]), int(end["pos"]))]
        )

    def commit(self, end: dict) -> None:
        pass


def register_stream(spark) -> None:
    """Register the streaming source with BY-VALUE class pickling.

    The streaming-source runner is a fresh driver-side Python process
    that unpickles the DataSource; unlike executors it does NOT see
    ``addPyFile`` archives, so a by-reference pickle breaks whenever
    the driver's cwd isn't the repo root. Marking this module for
    by-value pickling ships the class bodies inside the pickle itself.
    """
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(SquaresStreamDataSource)
