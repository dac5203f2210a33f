"""Conversion-latency analytics (round 8).

The reference has no event analytics (its data path is a 1:1 table
copy, /root/reference/src/migrate/table_migrator.rs:43-114); this
extends the events family (funnel, retention, attribution, sessions)
with the funnel-LATENCY histogram: how long signup -> first purchase
takes, the growth metric behind activation dashboards.

Scale notes (100 TB): two conditional MINs in ONE user-keyed aggregate
(never two scans), a day-bucket histogram (output is bucket-count-
sized), and a broadcast one-row total for the share ppm. Exact integer
end-to-end: microsecond deltas, truncating-div day buckets, ppm shares
via the repo `div` contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table


def events_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup-to-first-purchase latency, bucketed by whole days.

    Per user: first ``signup`` ts and first ``purchase`` ts (one
    aggregate with two conditional MINs). Converters are users whose
    first purchase is at or after their first signup; their lag in
    whole days (truncating) buckets the histogram. Output: one row per
    lag-day bucket with the converter count and its exact-ppm share of
    all converters, plus a summary row (lag_days = -1) carrying the
    signup population and the overall conversion rate ppm.
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    per_user = (
        ev.filter(F.col("event_type").isin("signup", "purchase"))
        .select("user_id", "event_type", us.alias("us"))
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "signup", F.col("us"))).alias(
                "signup_us"
            ),
            F.min(
                F.when(F.col("event_type") == "purchase", F.col("us"))
            ).alias("purchase_us"),
        )
        .filter(F.col("signup_us").isNotNull())
    )
    converters = per_user.filter(
        F.col("purchase_us") >= F.col("signup_us")
    ).select(
        F.expr("(purchase_us - signup_us) div 86400000000").alias("lag_days")
    )
    hist = converters.groupBy("lag_days").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    tot = per_user.agg(
        F.count(F.lit(1)).alias("n_signup"),
        F.sum(
            F.when(F.col("purchase_us") >= F.col("signup_us"), 1).otherwise(0)
        ).alias("n_conv"),
    )
    buckets = hist.crossJoin(F.broadcast(tot)).select(
        "lag_days",
        "n_users",
        F.expr("n_users * 1000000 div n_conv").alias("share_ppm"),
    )
    summary = tot.select(
        F.lit(-1).cast("bigint").alias("lag_days"),
        F.col("n_signup").cast("bigint").alias("n_users"),
        F.expr("n_conv * 1000000 div n_signup").alias("share_ppm"),
    )
    return buckets.unionByName(summary).orderBy("lag_days")


QUERIES = {"events_conversion_lag": events_conversion_lag}

ORACLES = {
    "events_conversion_lag": """
        WITH per_user AS (
            SELECT user_id,
                   MIN(epoch_us(CAST(ts AS TIMESTAMP)))
                       FILTER (event_type = 'signup') AS signup_us,
                   MIN(epoch_us(CAST(ts AS TIMESTAMP)))
                       FILTER (event_type = 'purchase') AS purchase_us
            FROM events
            WHERE event_type IN ('signup', 'purchase')
            GROUP BY user_id
            HAVING signup_us IS NOT NULL),
        conv AS (
            SELECT (purchase_us - signup_us) // 86400000000 AS lag_days
            FROM per_user WHERE purchase_us >= signup_us),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_signup,
                   CAST(COUNT(*) FILTER (purchase_us >= signup_us) AS BIGINT)
                       AS n_conv
            FROM per_user),
        hist AS (
            SELECT lag_days, CAST(COUNT(*) AS BIGINT) AS n_users
            FROM conv GROUP BY lag_days)
        SELECT CAST(h.lag_days AS BIGINT) AS lag_days, h.n_users,
               h.n_users * 1000000 // t.n_conv AS share_ppm
        FROM hist h, tot t
        UNION ALL
        SELECT CAST(-1 AS BIGINT), n_signup,
               n_conv * 1000000 // n_signup
        FROM tot
        ORDER BY lag_days
    """,
}
