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


def _children(node):
    seq = node.children()
    return [seq.apply(i) for i in range(seq.size())]


def _bounded(node) -> bool:
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
    kids = _children(node)
    if not kids:
        return False  # leaf relation: corpus-sized
    if name == "Join":
        return all(_bounded(c) for c in kids)
    return all(_bounded(c) for c in kids) if name == "Union" else _bounded(kids[0])


def constant_domain_keyed_windows(
    df: DataFrame, domain_names: set[str]
) -> list[str]:
    """Window nodes whose ENTIRE partition spec is constant-domain
    attributes, over input not provably constant-bounded.

    The tier-2 hazard class (round 11): a window keyed ONLY by a
    fixed-domain dimension column (order priority: 5 values, nation: 25,
    lang: ~5) over data-sized input caps parallelism at |domain| tasks,
    each data/|domain| rows — linear growth through a constant number of
    sorts. Such sites must use ``operators.distributed_rank`` with
    ``partition_by`` (adds a value-bin to the partition key) or carry a
    justified whitelist entry. A partition spec that includes ANY
    non-constant-domain expression (a bin id, an entity key, a derived
    column) already subdivides further and is not flagged; matching is
    by attribute NAME (lowercased), so the domain set must list the
    column aliases queries actually use.
    """
    import re

    bad: list[str] = []
    lowered = {n.lower() for n in domain_names}

    def attr_name(expr) -> str | None:
        m = re.match(r"^([A-Za-z_][A-Za-z0-9_]*)#\d+", expr.toString())
        return m.group(1).lower() if m else None

    def walk(node) -> None:
        if node.getClass().getSimpleName() == "Window":
            spec = node.partitionSpec()
            exprs = [spec.apply(i) for i in range(spec.size())]
            names = [attr_name(e) for e in exprs]
            if (
                exprs
                and all(n is not None and n in lowered for n in names)
                and not all(_bounded(c) for c in _children(node))
            ):
                bad.append(node.simpleString(160))
        for c in _children(node):
            walk(c)

    walk(df._jdf.queryExecution().optimizedPlan())
    return bad


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
    bad: list[str] = []

    def walk(node) -> None:
        if (
            node.getClass().getSimpleName() == "Window"
            and node.partitionSpec().isEmpty()
            and not all(_bounded(c) for c in _children(node))
        ):
            bad.append(node.simpleString(120))
        for c in _children(node):
            walk(c)

    walk(df._jdf.queryExecution().optimizedPlan())
    return bad
