"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()``   — every implemented operator: (spark, sf_dir) -> DataFrame.
``oracle_sql()`` — DuckDB-runnable ANSI SQL twin for each query (keys absent
here are non-SQL-expressible ops that get a rows-only check).

Implementation lives in ``db_migrator_spark/``; this file only aggregates
the QUERIES/ORACLES dicts each operator module exports.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from db_migrator_spark.session import configure  # noqa: E402

_MODULES = [
    "db_migrator_spark.operators.relational",
    "db_migrator_spark.operators.relational2",
    "db_migrator_spark.operators.relational3",
    "db_migrator_spark.operators.dedup",
    "db_migrator_spark.operators.text",
    "db_migrator_spark.operators.similarity",
    "db_migrator_spark.operators.similarity_ivf",
    "db_migrator_spark.operators.multimodal",
    "db_migrator_spark.operators.incremental",
    "db_migrator_spark.operators.grouped",
    "db_migrator_spark.operators.events",
    "db_migrator_spark.migrate.queries",
    "db_migrator_spark.streaming.windows",
    "db_migrator_spark.streaming.joins",
]


def _collect() -> tuple[dict, dict]:
    import importlib

    qs: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    os_: dict[str, str] = {}
    for modname in _MODULES:
        try:
            mod = importlib.import_module(modname)
        except ModuleNotFoundError:
            continue
        qs.update(getattr(mod, "QUERIES", {}))
        os_.update(getattr(mod, "ORACLES", {}))
    return qs, os_


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 analog) on /root/testdata/sf0.001."""
    from db_migrator_spark.operators.relational import q1_pricing_summary

    configure(spark)
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    qs, _ = _collect()

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure(spark)
            return fn(spark, sf_dir)

        run.__name__ = getattr(fn, "__name__", "query")
        run.__doc__ = fn.__doc__
        return run

    return {name: wrap(fn) for name, fn in qs.items()}


def oracle_sql() -> dict[str, str]:
    _, os_ = _collect()
    return os_
