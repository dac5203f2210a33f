"""Grouped-map operators: applyInPandas per-group computation.

For per-group logic that built-in aggregates can't express (robust
statistics, per-group model fits), ``groupBy().applyInPandas`` hands each
group to a pandas function as an Arrow batch. One shuffle on the group key;
group size must fit an executor's memory — for the 100 TB case that means
pre-aggregating or salting monster groups first (see operators/skew.py),
never handing a whole hot key to one worker.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from ..io import load_table

_MAD_SCHEMA = "o_custkey bigint, n bigint, median_price double, mad double"


def _mad(pdf: pd.DataFrame) -> pd.DataFrame:
    """Median absolute deviation of order value per customer — the robust
    spread statistic; needs two dependent medians, not expressible as a
    built-in aggregate."""
    prices = pdf["o_totalprice"]
    med = prices.median()
    return pd.DataFrame(
        {
            "o_custkey": [pdf["o_custkey"].iloc[0]],
            "n": [len(pdf)],
            "median_price": [med],
            "mad": [(prices - med).abs().median()],
        }
    )


def q_grouped_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_custkey", "o_totalprice")
        .groupBy("o_custkey")
        .applyInPandas(_mad, schema=_MAD_SCHEMA)
        .orderBy("o_custkey")
    )


QUERIES = {"q_grouped_mad": q_grouped_mad}

# pandas .median() == quantile_cont(0.5) (linear midpoint interpolation)
ORACLES = {
    "q_grouped_mad": """
        WITH med AS (
            SELECT o_custkey, COUNT(*) AS n,
                   quantile_cont(o_totalprice, 0.5) AS median_price
            FROM orders GROUP BY o_custkey)
        SELECT m.o_custkey, m.n, m.median_price,
               (SELECT quantile_cont(abs(o.o_totalprice - m.median_price), 0.5)
                FROM orders o WHERE o.o_custkey = m.o_custkey) AS mad
        FROM med m
        ORDER BY m.o_custkey
    """,
}
