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


def _mad_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
    """Median absolute deviation of order value per customer — the robust
    spread statistic; needs two dependent medians, not expressible as a
    built-in aggregate. Each call receives a BUCKET of customers and
    vectorizes across them with a pandas groupby (see q_grouped_mad)."""
    g = pdf.groupby("o_custkey")["o_totalprice"]
    med = g.median()
    dev = (pdf["o_totalprice"] - pdf["o_custkey"].map(med)).abs()
    mad = dev.groupby(pdf["o_custkey"]).median()
    return pd.DataFrame(
        {
            "o_custkey": med.index.to_numpy(),
            "n": g.size().to_numpy(),
            "median_price": med.to_numpy(),
            "mad": mad.to_numpy(),
        }
    )


def q_grouped_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer MAD via applyInPandas — bucketed.

    Grouping applyInPandas directly by o_custkey is the many-tiny-groups
    pathology: one Python call + pandas frame per customer (~1 ms each;
    measured 22 s for 15k customers at sf0.1). Instead the shuffle key is
    a hash BUCKET of the customer key (#buckets = 8x parallelism, so each
    call amortizes the per-call overhead over ~|keys|/buckets customers
    and stays Arrow-batch-sized), and the pandas function computes every
    customer in the bucket vectorized (0.9 s at sf0.1, same rows). Same
    one-shuffle plan; bucket count scales with the cluster, per-call
    memory stays bounded by |rows|/buckets."""
    orders = load_table(spark, sf_dir, "orders")
    buckets = max(32, spark.sparkContext.defaultParallelism * 8)
    from pyspark.sql import functions as F

    return (
        orders.select("o_custkey", "o_totalprice")
        .withColumn("bucket", F.pmod(F.col("o_custkey"), F.lit(buckets)))
        .groupBy("bucket")
        .applyInPandas(_mad_bucket, schema=_MAD_SCHEMA)
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
