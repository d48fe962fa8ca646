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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


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
