"""Interpolated (PERCENTILE_CONT-style) exact quantiles (round 8).

The reference has no analytics surface (scope:
/root/reference/src/migrate/table_migrator.rs:43-114); this completes
the engine's percentile family: ``q_exact_percentiles`` is type-1
(selection — a value from the data), this is type-7 (linear
interpolation between the two bracketing order statistics — ANSI
PERCENTILE_CONT). Neither engine's built-in is used: their float
interpolation differs in the last ulp, so the interpolation is done in
EXACT integer micros on both sides — position p*(n-1) split as
``idx = (p*(n-1)) div 100`` and remainder, then
``(v_lo*(100-rem) + v_hi*rem) div 100`` — the repo's truncating-div
contract end-to-end.

Scale notes (100 TB): one keyed shuffle for the per-group ordered
row_number, a groups-x-percentiles spine (constant-sized) joined back
on (group, rank) — two keyed equi-joins probing exactly one row per
spine entry. Same giant-group caveat and bin-selection fallback notes
as ``q_exact_percentiles``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from ..io import load_table

CONT_PCTS = (25, 50, 75)


def q_percentile_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated p25/p50/p75 of o_totalprice per order priority, in
    exact micros (module doc)."""
    orders = load_table(spark, sf_dir, "orders")
    v = F.floor(F.col("o_totalprice") * 1_000_000).cast("bigint")
    ranked = orders.select(
        "o_orderpriority",
        v.alias("v_micro"),
        F.col("o_orderkey"),
    ).select(
        "o_orderpriority",
        "v_micro",
        F.row_number()
        .over(
            W.partitionBy("o_orderpriority").orderBy("v_micro", "o_orderkey")
        )
        .alias("rn"),
    )
    counts = ranked.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    spine = counts.select(
        "o_orderpriority",
        "n",
        F.explode(F.array(*[F.lit(p) for p in CONT_PCTS])).alias("pct"),
    ).select(
        "o_orderpriority",
        "pct",
        F.expr("(pct * (n - 1)) div 100 + 1").alias("rn_lo"),
        F.expr("(pct * (n - 1)) % 100").alias("rem"),
    )
    lo = ranked.select(
        "o_orderpriority",
        F.col("rn").alias("rn_lo"),
        F.col("v_micro").alias("v_lo"),
    )
    hi = ranked.select(
        "o_orderpriority",
        (F.col("rn") - 1).alias("rn_lo"),
        F.col("v_micro").alias("v_hi"),
    )
    return (
        spine.join(lo, ["o_orderpriority", "rn_lo"])
        .join(hi, ["o_orderpriority", "rn_lo"], "left")
        .select(
            "o_orderpriority",
            "pct",
            F.expr(
                "(v_lo * (100 - rem) + coalesce(v_hi, v_lo) * rem) div 100"
            ).alias("value_micro"),
        )
        .orderBy("o_orderpriority", "pct")
    )


QUERIES = {"q_percentile_cont": q_percentile_cont}

ORACLES = {
    "q_percentile_cont": f"""
        WITH ranked AS (
            SELECT o_orderpriority,
                   CAST(FLOOR(o_totalprice * 1000000) AS BIGINT) AS v_micro,
                   ROW_NUMBER() OVER (
                       PARTITION BY o_orderpriority
                       ORDER BY CAST(FLOOR(o_totalprice * 1000000) AS BIGINT),
                                o_orderkey) AS rn
            FROM orders),
        counts AS (
            SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
            FROM ranked GROUP BY o_orderpriority),
        spine AS (
            SELECT o_orderpriority, pct,
                   (pct * (n - 1)) // 100 + 1 AS rn_lo,
                   (pct * (n - 1)) % 100 AS rem
            FROM counts,
                 (SELECT unnest([{", ".join(str(p) for p in CONT_PCTS)}])
                      AS pct)),
        j AS (
            SELECT s.o_orderpriority, s.pct, s.rem,
                   l.v_micro AS v_lo, h.v_micro AS v_hi
            FROM spine s
            JOIN ranked l ON l.o_orderpriority = s.o_orderpriority
                         AND l.rn = s.rn_lo
            LEFT JOIN ranked h ON h.o_orderpriority = s.o_orderpriority
                              AND h.rn = s.rn_lo + 1)
        SELECT o_orderpriority, CAST(pct AS INTEGER) AS pct,
               (v_lo * (100 - rem) + COALESCE(v_hi, v_lo) * rem) // 100
                   AS value_micro
        FROM j
        ORDER BY o_orderpriority, pct
    """,
}
