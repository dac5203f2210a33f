"""Binary-segmentation changepoint (round 11d, events5).

The reference has no event analytics (1:1 table copier,
/root/reference/src/migrate/table_migrator.rs:43-114); this extends
the changepoint tier (per-user CUSUM in events2.py) with the SERIES-
level detector a metrics platform runs nightly: the single best
mean-shift split of each event type's daily-revenue series — the
first step of binary segmentation.

For a series x_1..x_m (daily value cents), split after day t:
the between-segment cost reduction is
Delta(t) = n1*n2/m * (mean1 - mean2)^2, maximized exactly by
maximizing A(t)^2 / (t*(m-t)*m) with
A(t) = S1(t)*(m-t) - (S-S1(t))*t  — all integers, no division until
the final surfaced score (truncating, documented; ties break to the
EARLIEST day). delta fits BIGINT through ~sf10 and the ORDERING is on
the exact DECIMAL square and integer denominator via the truncated
quotient, identical in both engines.

Scale notes (100 TB): rows collapse to (event_type, day) cells first
(map-side combined); everything after — the prefix-sum window, the
argmax rank — runs on calendar-bounded cells (days x types, a plan
constant), the t-closeness/Mann-Kendall regime. One data-sized
shuffle total (the cells groupBy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from ..io import load_table


def events_best_split_changepoint(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Best single mean-shift split per event type over the daily
    value-cents series (module doc): split day, segment sizes and
    means, exact truncated Delta score."""
    ev = load_table(spark, sf_dir, "events")
    cells = (
        ev.select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.floor(F.col("value") * 100).cast("bigint").alias("v"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("v").cast("decimal(38,0)").alias("x"))
    )
    wo = W.partitionBy("event_type").orderBy("day")
    wall = W.partitionBy("event_type")
    pre = cells.select(
        "event_type",
        "day",
        F.row_number().over(wo).alias("t"),
        F.sum("x").over(wo.rowsBetween(W.unboundedPreceding, 0)).alias("s1"),
        F.count(F.lit(1)).over(wall).alias("m"),
        F.sum("x").over(wall).alias("s"),
    ).filter(F.col("t") < F.col("m"))
    scored = pre.select(
        "event_type",
        "day",
        "t",
        "m",
        F.expr(
            "CAST(s1 * (m - t) - (s - s1) * t AS DECIMAL(38,0))"
        ).alias("a"),
        F.expr("CAST(s1 div t AS BIGINT)").alias("mean1_cents"),
        F.expr("CAST((s - s1) div (m - t) AS BIGINT)").alias(
            "mean2_cents"
        ),
    ).select(
        "event_type",
        "day",
        "t",
        "m",
        "mean1_cents",
        "mean2_cents",
        F.expr(
            "CAST(a * a div (CAST(t AS DECIMAL(38,0)) * (m - t) * m)"
            " AS DECIMAL(38,0))"
        ).alias("_delta"),
    )
    pick = W.partitionBy("event_type").orderBy(F.desc("_delta"), "t")
    return (
        scored.withColumn("rk", F.row_number().over(pick))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("m").cast("bigint").alias("m_days"),
            F.col("day").alias("split_day"),
            F.col("t").cast("bigint").alias("n1_days"),
            "mean1_cents",
            "mean2_cents",
            F.col("_delta").cast("string").alias("delta_cents2"),
        )
        .orderBy("event_type")
    )


QUERIES = {
    "events_best_split_changepoint": events_best_split_changepoint,
}

ORACLES = {
    "events_best_split_changepoint": """
        WITH cells AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(SUM(CAST(FLOOR(value * 100) AS HUGEINT))
                        AS HUGEINT) AS x
            FROM events GROUP BY 1, 2),
        pre AS (
            SELECT event_type, day,
                   CAST(ROW_NUMBER() OVER w AS BIGINT) AS t,
                   SUM(x) OVER (w ROWS UNBOUNDED PRECEDING) AS s1,
                   CAST(COUNT(*) OVER (PARTITION BY event_type)
                        AS BIGINT) AS m,
                   SUM(x) OVER (PARTITION BY event_type) AS s
            FROM cells
            WINDOW w AS (PARTITION BY event_type ORDER BY day)
            QUALIFY t < m),
        scored AS (
            SELECT event_type, day, t, m,
                   s1 * (m - t) - (s - s1) * t AS a,
                   CAST(s1 // t AS BIGINT) AS mean1_cents,
                   CAST((s - s1) // (m - t) AS BIGINT) AS mean2_cents,
                   (s1 * (m - t) - (s - s1) * t)
                       * (s1 * (m - t) - (s - s1) * t)
                       // (CAST(t AS HUGEINT) * (m - t) * m) AS delta
            FROM pre),
        pick AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                         ORDER BY delta DESC, t) AS rk
            FROM scored)
        SELECT event_type,
               m AS m_days,
               day AS split_day,
               t AS n1_days,
               mean1_cents, mean2_cents,
               CAST(delta AS VARCHAR) AS delta_cents2
        FROM pick WHERE rk = 1
        ORDER BY event_type
    """,
}
