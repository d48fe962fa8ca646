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
- ``low_cardinality_keyed_window``: a ``Window`` whose feeding
  Exchange hash-partitions on a single column whose DEFINITION in the
  plan text declares a tiny domain — a boolean comparison
  (``(x = lit) AS _k``) or a short two-branch CASE. Structurally the
  same scale-killer as ``single_partition_window`` (the whole input
  funnels through |domain| tasks) but invisible to that check because
  the exchange is keyed, not SinglePartition — the shape that hid
  quantile_treatment_effect's 2-task rank window from the r9 audit.
  Same whitelist discipline: a keyed window over an aggregate-sized
  frame is fine; over a fact slice it is not.
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
    if _window_over_low_cardinality_key(plan):
        flags.append("low_cardinality_keyed_window")
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


def _chain_exchange_of(lines: list[str], i: int) -> str | None:
    """The Exchange line on the Window-at-``lines[i]``'s OWN direct
    single-child chain, or None. Same walk as
    ``_window_over_single_partition`` (see its docstring for why
    marker co-occurrence and first-Exchange-below are both wrong)."""
    expect = _tree_depth(lines[i]) + 3
    for below in lines[i + 1 :]:
        d = _tree_depth(below)
        if d != expect:
            break
        if below[d : d + 2] == ":-":
            break
        if "Exchange" in below:
            return below
        expect = d + 3
    return None


def _defining_expr(plan: str, col_token: str) -> str | None:
    """The expression text that defines ``col_token`` (``name#id``) in
    the plan — the paren-balanced segment preceding its first
    `` AS name#id`` alias. The executed plan's toString shows no
    column types, so the defining Project expression is the only
    place a column's domain is visible."""
    marker = " AS " + col_token
    for line in plan.splitlines():
        idx = line.find(marker)
        if idx == -1:
            continue
        j = idx - 1
        if j >= 0 and line[j] == ")":
            depth = 0
            while j >= 0:
                if line[j] == ")":
                    depth += 1
                elif line[j] == "(":
                    depth -= 1
                    if depth == 0:
                        return line[j : idx]
                j -= 1
            return None
        # unparenthesized (CASE ... END, function-less literals):
        # take back to the enclosing comma/bracket
        k = max(line.rfind(",", 0, idx), line.rfind("[", 0, idx))
        return line[k + 1 : idx].strip()
    return None


def _top_level_find(expr: str, token: str) -> int:
    """Index of the first occurrence of ``token`` at parenthesis depth
    0 in ``expr``, or -1. Depth-0 is what makes the expression itself
    boolean-valued — an ``=``/``IN`` buried inside a wider expression
    (``CASE WHEN x = 1 THEN y ...``, ``hash(a = b)``) does NOT make
    the defined column two-valued."""
    depth = 0
    i, n = 0, len(expr)
    while i < n:
        c = expr[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and expr.startswith(token, i):
            return i
        i += 1
    return -1


def _declares_tiny_domain(plan: str, col_token: str) -> bool:
    """True when ``col_token`` is DEFINED by an expression whose
    domain is declaredly tiny: a TOP-LEVEL boolean comparison /
    bounded IN / isnull (two values + NULL), or a CASE of at most two
    WHEN branches whose result arms are all literals (no ``#`` column
    refs). Top-level means at parenthesis depth 0 after stripping the
    outer wrapper — so equalities/INs nested inside a wider
    non-boolean expression no longer misclassify a genuinely wide key
    as tiny (false positives only cost whitelist churn, but this check
    has to age well)."""
    import re

    expr = _defining_expr(plan, col_token)
    if not expr:
        return False
    expr = expr.strip()
    # strip balanced outer paren pairs: "(x#1 = 5)" → "x#1 = 5", but
    # NOT "(a) = (b)" whose outer parens are not one wrapper
    while expr.startswith("(") and expr.endswith(")"):
        depth = 0
        wraps = True
        for i, c in enumerate(expr):
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0 and i != len(expr) - 1:
                    wraps = False
                    break
        if not wraps or depth != 0:
            break
        expr = expr[1:-1].strip()
    if _top_level_find(expr, " = ") >= 0 or expr.startswith("isnull("):
        return True
    in_at = _top_level_find(expr, " IN ")
    if in_at >= 0:
        # bound the IN list: a top-level IN is boolean regardless, but
        # keep the declared-tiny claim conservative (≤ 8 literals)
        tail = expr[in_at + 4 :].strip()
        if tail.startswith("(") and tail.count(",") <= 7:
            return True
        return False
    if expr.startswith("CASE WHEN") and expr.count("WHEN") <= 2:
        arms = re.findall(
            r"(?:THEN|ELSE) (.*?)(?= WHEN | ELSE | END)", expr
        )
        if arms and all("#" not in a for a in arms):
            return True
    return False


def _window_over_low_cardinality_key(plan: str) -> bool:
    """True when some Window's own feeding Exchange hash-partitions on
    exactly one column whose definition declares a tiny domain (see
    ``_declares_tiny_domain``) — the keyed twin of the
    single-partition window: every input row funnels through |domain|
    tasks no matter how many executors exist."""
    import re

    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Window" not in line or "WindowGroupLimit" in line:
            continue
        ex = _chain_exchange_of(lines, i)
        if ex is None:
            continue
        m = re.search(
            r"hashpartitioning\((\w+#\d+)(?:,\s*\d+)?\)", ex
        )
        if m and _declares_tiny_domain(plan, m.group(1)):
            return True
    return False


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
    to someone else. (Chain walk factored into
    ``_chain_exchange_of``, shared with the low-cardinality check.)"""
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Window" not in line or "WindowGroupLimit" in line:
            continue
        ex = _chain_exchange_of(lines, i)
        if ex is not None and "SinglePartition" in ex:
            return True
    return False
