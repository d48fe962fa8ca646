"""Python user-defined table functions (Spark 4 UDTF surface).

Completes the U-family (SURVEY §2.11): scalar → Arrow ``pandas_udf``
(ml/knn), grouped-map → ``applyInPandas`` (operators/profile OLS),
stateful → ``applyInPandasWithState`` (streaming/stateful), and
table-valued → this module. UDTFs run row-at-a-time in Python, so they
are NOT the hot path for corpus-scale n-gram work (the JVM
explode/slice formulation in operators/dedup is) — the point here is
the lateral-join surface itself: `SELECT ... FROM t, LATERAL f(col)`.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, gram string")
class WordNgrams:
    """Lateral table function: whitespace-token trigrams with their
    starting position. Python ``str.split()`` ≡ trim + split-on-
    whitespace-runs, matching the engine's ``word_tokens``."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        toks = text.split()
        for i in range(len(toks) - 2):
            yield i, " ".join(toks[i : i + 3])


def register_udtfs(spark) -> None:
    """Register the module's UDTFs for SQL LATERAL use (idempotent)."""
    spark.udtf.register("word_trigrams", WordNgrams)


# --- dynamic-schema UDTF (Spark 4 `analyze` static method) -------------
# The second half of the UDTF surface: output schema computed at PLAN
# time from the call's literal arguments, so one function serves any
# width — `unpivot_columns(struct(*), 'a', 'b')` yields rows tagged by
# whichever measure names the CALLER listed. Schema resolution happens
# once on the driver inside Catalyst's analysis phase (AnalyzeResult),
# never per row.

from pyspark.sql.functions import AnalyzeArgument, AnalyzeResult  # noqa: E402
from pyspark.sql.types import (  # noqa: E402
    DoubleType,
    StringType,
    StructType,
)


@udtf
class UnpivotColumns:
    """Dynamic-width unpivot: ``UnpivotColumns(row_struct, lit(c1),
    lit(c2), ...)`` emits one (measure, value) row per requested
    column. The `analyze` hook validates that every requested name is
    a literal string and exists in the struct, failing ANALYSIS (plan
    time), not execution — the Spark-4 contract that makes UDTFs
    behave like real table functions instead of runtime dice rolls."""

    @staticmethod
    def analyze(row: AnalyzeArgument, *names: AnalyzeArgument) -> AnalyzeResult:
        if not isinstance(row.dataType, StructType):
            raise ValueError("first argument must be a struct of the row")
        fields = {f.name for f in row.dataType.fields}
        for n in names:
            if n.value is None or not isinstance(n.value, str):
                raise ValueError("column names must be literal strings")
            if n.value not in fields:
                raise ValueError(f"unknown column {n.value!r}")
        return AnalyzeResult(
            schema=StructType()
            .add("measure", StringType())
            .add("value", DoubleType())
        )

    def eval(self, row, *names):  # noqa: D102
        for n in names:
            v = row[n]
            yield n, (float(v) if v is not None else None)
