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
