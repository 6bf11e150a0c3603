"""Physical-plan introspection helpers (py4j node walk).

Textual plan greps (tools/plan_audit.py, tests/test_plan_quality.py) are
fine for node COUNTS, but the bounded-window invariant needs node
ATTRIBUTES: a ``WindowExec`` with an empty ``partitionSpec`` moves every
row to one task — acceptable only when its input is bounded by
construction (a post-limit top-k, a partition-count offsets frame, a
10-row decile table), catastrophic on anything data-sized at 100 TB.
The single-partition WindowExec WARNING Spark prints is exactly that
signal, but warnings scroll away; this walk makes the invariant a test
(VERDICT r12 "What's wrong #3" / task #6).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame

#: physical operators that window over a partitionSpec
_WINDOW_NODES = ("WindowExec", "WindowInPandasExec", "WindowGroupLimitExec")


def iter_physical_nodes(jnode) -> Iterator:
    """Depth-first walk of a JVM SparkPlan, descending through the AQE
    wrapper (``AdaptiveSparkPlanExec`` is a leaf node whose real tree
    hangs off ``initialPlan``) and query-stage wrappers."""
    stack = [jnode]
    while stack:
        node = stack.pop()
        name = node.getClass().getSimpleName()
        if name == "AdaptiveSparkPlanExec":
            stack.append(node.initialPlan())
            continue
        if name.endswith("QueryStageExec"):
            stack.append(node.plan())
            continue
        yield node
        children = node.children()
        for i in range(children.length()):
            stack.append(children.apply(i))


def unpartitioned_window_count(df: DataFrame) -> int:
    """Number of window physical nodes in ``df``'s compiled plan whose
    partitionSpec is empty (i.e. Spark will move ALL rows to a single
    task for that window)."""
    plan = df._jdf.queryExecution().executedPlan()
    count = 0
    for node in iter_physical_nodes(plan):
        if node.getClass().getSimpleName() in _WINDOW_NODES:
            if node.partitionSpec().isEmpty():
                count += 1
    return count
