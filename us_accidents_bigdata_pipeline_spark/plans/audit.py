"""Physical-plan auditor: automated red-flag linting.

The 100 TB failure modes are visible in the executed plan long before
they are visible in a wall-clock regression: a cartesian product, a
nested-loop join of two large inputs, or a row-at-a-time Python eval
each turn a query that "passes" at sf0.01 into one that never finishes
at scale. ``audit_plan`` walks a DataFrame's executed plan string and
returns the red flags found; ``tests/test_plans.py`` sweeps it across
every registered catalog query so a new query (or a Catalyst upgrade
changing join selection) cannot silently introduce a scale-killer.

Flags:

- ``cartesian``: CartesianProduct — the all-pairs shuffle, never
  acceptable.
- ``nested_loop``: BroadcastNestedLoopJoin — acceptable ONLY for
  1-row scalar-subquery broadcasts (callers whitelist those queries
  explicitly; the auditor cannot see cardinalities in the plan text).
- ``python_row_udf``: BatchEvalPython — pickled row-at-a-time Python,
  the reference's kNN-UDF anti-pattern. Arrow-batched evals
  (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas) are the
  sanctioned Python path and are NOT flagged.
- ``single_partition_window``: an ``Exchange SinglePartition`` feeding
  a ``Window`` — the everything-through-one-reducer global sort.
  Acceptable ONLY when the windowed frame is aggregate-sized (daily
  rollups, deciles, per-customer summaries — the whitelisted cases);
  over a fact-sized input the right tool is
  ``layout.global_running_sum``'s range-exchange formulation. Like
  ``nested_loop``, the auditor cannot see cardinalities, so callers
  whitelist the aggregate-frame queries explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

FLAG_MARKERS: dict[str, tuple[str, ...]] = {
    "cartesian": ("CartesianProduct",),
    "nested_loop": ("BroadcastNestedLoopJoin",),
    "python_row_udf": ("BatchEvalPython",),
}


def audit_plan(df: DataFrame) -> list[str]:
    """Red-flag names present in the frame's executed plan (initial
    AQE plan — join strategy and eval operators are already decided
    there). Empty list = clean."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    flags = [
        flag
        for flag, markers in FLAG_MARKERS.items()
        if any(m in plan for m in markers)
    ]
    if _window_over_single_partition(plan):
        flags.append("single_partition_window")
    return flags


def _window_over_single_partition(plan: str) -> bool:
    """True when some Window node's OWN input is the single-partition
    exchange. Plain marker co-occurrence false-positives whenever a
    query has both a keyed window and an unrelated scalar aggregate
    (whose final agg also exchanges to one partition), so walk the
    linearized tree text instead: a WindowExec's child subtree prints
    immediately below it, and the first Exchange line in it is the
    window's partitioning — SinglePartition there means the window
    sorts everything through one reducer."""
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Window" not in line or "WindowGroupLimit" in line:
            continue
        for below in lines[i + 1 :]:
            if "Exchange" in below:
                if "SinglePartition" in below:
                    return True
                break
    return False
