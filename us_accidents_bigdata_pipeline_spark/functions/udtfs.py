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
