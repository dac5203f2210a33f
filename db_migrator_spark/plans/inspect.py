"""Physical-plan introspection for plan-quality assertions.

``.explain()`` only prints; this returns the explain text so tests can
assert the plan properties the 100 TB design depends on: predicate
pushdown reaching the parquet scan (``PushedFilters``), column pruning
(``ReadSchema``), broadcast joins on dimensions, TakeOrderedAndProject for
top-k, partial aggregation, and whole-stage codegen coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The text ``df.explain(mode)`` would print."""
    jvm = df.sparkSession._jvm
    explain_mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(explain_mode)


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema entries of every file scan in the plan (column pruning)."""
    return [
        line.split("ReadSchema:", 1)[1].strip()
        for line in plan_string(df).splitlines()
        if "ReadSchema:" in line
    ]


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every file scan in the plan."""
    return [
        line.split("PushedFilters:", 1)[1].strip()
        for line in plan_string(df).splitlines()
        if "PushedFilters:" in line
    ]


def unbounded_global_windows(df: DataFrame) -> list[str]:
    """Window nodes with an EMPTY partition spec and no Limit below them.

    A partitionless window funnels its whole input through one task — the
    classic silent scale-killer. It is acceptable ONLY above a bounded
    frame (a GlobalLimit/LocalLimit somewhere beneath it: top-k results,
    never corpus-sized data). Returns a simple-string description per
    offender so tests can pin "global windows only on bounded frames".
    Walks the optimized LOGICAL plan: limits are still explicit nodes
    there (the physical plan may fuse them into TakeOrderedAndProject).
    """

    def children(node):
        seq = node.children()
        return [seq.apply(i) for i in range(seq.size())]

    def bounded(node) -> bool:
        """Is this subtree's row count bounded by plan constants?

        A Limit bounds its subtree; row-preserving/reducing single-child
        nodes (Project/Filter/Sort/...) propagate the property; a join is
        bounded only when EVERY side is (k x m rows is still a plan
        constant); a union when all branches are. Generators (explode)
        and aggregates are conservatively unbounded — a Limit further
        below them does NOT bound their output, which is exactly the
        false negative a naive "Limit anywhere beneath" check has.
        """
        name = node.getClass().getSimpleName()
        if name in ("GlobalLimit", "LocalLimit"):
            return True
        if name in ("Generate", "Expand", "Aggregate"):
            return False
        kids = children(node)
        if not kids:
            return False  # leaf relation: corpus-sized
        if name == "Join":
            return all(bounded(c) for c in kids)
        return all(bounded(c) for c in kids) if name == "Union" else bounded(kids[0])

    bad: list[str] = []

    def walk(node) -> None:
        if (
            node.getClass().getSimpleName() == "Window"
            and node.partitionSpec().isEmpty()
            and not all(bounded(c) for c in children(node))
        ):
            bad.append(node.simpleString(120))
        for c in children(node):
            walk(c)

    walk(df._jdf.queryExecution().optimizedPlan())
    return bad
