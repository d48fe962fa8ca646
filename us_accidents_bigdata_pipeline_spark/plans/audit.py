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


def _tree_depth(line: str) -> int:
    """Structural depth of a plan-tree line: the column where its
    branch marker (``+-`` or ``:-``) starts. Continuation prefixes
    (``:  ``) keep earlier colons, so scan for the first colon/plus
    that is immediately followed by a dash. Root lines (no marker)
    are depth -1; each tree level indents by 3 columns."""
    for j in range(len(line) - 1):
        if line[j] in "+:" and line[j + 1] == "-":
            return j
    return -1


def _window_over_single_partition(plan: str) -> bool:
    """True when some Window node's OWN input chain repartitions to
    SinglePartition. Plain marker co-occurrence false-positives
    whenever a query has both a keyed window and an unrelated scalar
    aggregate (whose final agg also exchanges to one partition) — and
    so does taking the first Exchange ANYWHERE below the Window line,
    which can be a deep descendant under a join. So walk the
    linearized tree text by indentation: follow only the Window's
    direct single-child chain (each level +3 columns); the first
    Exchange on that chain is the window's partitioning. Stop at a
    branching node (a join/union child appears at the same depth as a
    sibling or with a ``:-`` marker) — past one, an Exchange belongs
    to someone else."""
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Window" not in line or "WindowGroupLimit" in line:
            continue
        expect = _tree_depth(line) + 3
        for below in lines[i + 1 :]:
            d = _tree_depth(below)
            if d != expect:
                # sibling/ancestor (d < expect) ends the subtree; a
                # deeper line without passing through the chain means
                # our direct child branched — either way, stop.
                break
            if below[d : d + 2] == ":-":
                # first child of a multi-child node: the chain ends —
                # the window inherits partitioning from a join, whose
                # exchanges (even an Exchange right here) are its own
                # business, not the window's.
                break
            if "Exchange" in below:
                if "SinglePartition" in below:
                    return True
                break
            expect = d + 3
    return False
