"""Exact outlier and effect-size statistics (round 8, batch c).

The reference has no statistics surface (scope:
/root/reference/src/migrate/table_migrator.rs:43-114); these extend
the inferential drift tier (KS, chi-square, runs test in stats.py)
with the two audits a data-quality pipeline runs next: WHERE are the
outliers, and HOW BIG is the drift — both in exact integer arithmetic
so the cross-engine hash match is bit-for-bit:

- ``q_outlier_iqr``: per-priority Tukey-fence outlier audit of order
  totals. Quartiles are type-1 (ceil-rank order statistics) picked by
  one rank window; fences at q1 - 3*(q3-q1) div 2 and
  q3 + 3*(q3-q1) div 2 in micros (the 1.5*IQR rule with the factor
  kept rational); low/high outlier counts by a broadcast join of the
  5-row fence table back onto the base.
- ``q_drift_effect_size``: per-priority effect size of the
  pre/post-``DRIFT_PIVOT`` shift, complementing the KS test's
  significance with MAGNITUDE: exact mean gap via integer
  cross-multiplication (S1*n2 - S2*n1 over n1*n2) and each half's
  squared coefficient of variation cv2 = (n*SS - S^2) / S^2 — the
  variance-to-mean-squared ratio whose numerator and denominator are
  both integers, so no division happens until the final micro-scaled
  truncating ``div``. The cv2 sums run at CENT precision (micros
  overflow DECIMAL(38,0) at sf1 already — measured: 4.2e38 on the
  (n*SS - S^2)*1e6 product); cents keep the same product near 7e29
  at sf1 with ~1e8x row headroom. Means and the gap stay at micro
  precision (no squares there).

Scale notes (100 TB): q_outlier_iqr ranks via the keyed distributed
exact-rank pass (``operators.distributed_rank``, (priority, value-bin)
parallel units — round 11; same shape as q_exact_percentiles), one
broadcast of a groups-sized fence table, one counting aggregate —
no global sort, no collect. q_drift_effect_size is a single map-side
combinable aggregate producing five sums per (priority, half); the
final arithmetic runs on a groups-sized relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table
from .quality import DRIFT_PIVOT


def q_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier audit per order priority (module doc).
    Output: n, q1/q3/iqr/lo/hi fences in micros, low/high outlier
    counts, and the total outlier share in ppm.

    Scale shape (round 11): the 5 priority groups grow linearly with
    data, so the quartile ranks come from the keyed distributed
    exact-rank pattern (``distributed_rank``, ``partition_by=priority``)
    — every (priority, value-bin) ranks independently — instead of a
    5-task keyed window; the quartile picks stay row-local rank
    comparisons and the oracle keeps the plain window SQL.
    """
    from .distributed_rank import quantile_cuts, with_global_rank

    orders = load_table(spark, sf_dir, "orders")
    v = F.floor(F.col("o_totalprice") * 1_000_000).cast("bigint")
    base = orders.select(
        "o_orderpriority", v.alias("v"), "o_orderkey"
    )
    cuts = quantile_cuts(base, ["v"])["v"]
    ranked = with_global_rank(
        base, "v", ["o_orderkey"], cuts=cuts,
        partition_by=["o_orderpriority"], rank_col="rn", total_col="n",
    )
    quart = (
        ranked.filter(
            (F.col("rn") == F.expr("(n + 3) div 4"))
            | (F.col("rn") == F.expr("(3 * n + 3) div 4"))
        )
        .groupBy("o_orderpriority")
        .agg(
            F.max("n").cast("bigint").alias("n"),
            F.min("v").alias("q1_micro"),
            F.max("v").alias("q3_micro"),
        )
        .select(
            "o_orderpriority",
            "n",
            "q1_micro",
            "q3_micro",
            (F.col("q3_micro") - F.col("q1_micro")).alias("iqr_micro"),
            F.expr("q1_micro - (3 * (q3_micro - q1_micro)) div 2").alias(
                "lo_fence_micro"
            ),
            F.expr("q3_micro + (3 * (q3_micro - q1_micro)) div 2").alias(
                "hi_fence_micro"
            ),
        )
    )
    counted = (
        base.join(F.broadcast(quart), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.max("n").alias("n"),
            F.max("q1_micro").alias("q1_micro"),
            F.max("q3_micro").alias("q3_micro"),
            F.max("iqr_micro").alias("iqr_micro"),
            F.max("lo_fence_micro").alias("lo_fence_micro"),
            F.max("hi_fence_micro").alias("hi_fence_micro"),
            F.sum(
                (F.col("v") < F.col("lo_fence_micro")).cast("bigint")
            ).alias("n_low_outliers"),
            F.sum(
                (F.col("v") > F.col("hi_fence_micro")).cast("bigint")
            ).alias("n_high_outliers"),
        )
    )
    return counted.select(
        "*",
        F.expr(
            "CAST(CAST((n_low_outliers + n_high_outliers) AS DECIMAL(38,0))"
            " * 1000000 div n AS BIGINT)"
        ).alias("outlier_ppm"),
    ).orderBy("o_orderpriority")


def q_drift_effect_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre/post-pivot drift magnitude per order priority (module doc).
    Output: n1, n2, mean1_micro, mean2_micro, gap_micro (signed exact
    cross-multiplied mean difference), cv2_pre_micro, cv2_post_micro."""
    orders = load_table(spark, sf_dir, "orders")
    half = F.when(
        F.col("o_orderdate") < F.lit(DRIFT_PIVOT).cast("timestamp"), 1
    ).otherwise(2)
    v = F.floor(F.col("o_totalprice") * 1_000_000).cast("bigint")
    vc = F.floor(F.col("o_totalprice") * 100).cast("bigint")
    sums = (
        orders.select(
            "o_orderpriority", half.alias("half"), v.alias("v"), vc.alias("vc")
        )
        .groupBy("o_orderpriority", "half")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("v").cast("bigint").alias("s"),
            F.sum("vc").cast("bigint").alias("sc"),
            F.sum(
                F.col("vc").cast("decimal(38,0)") * F.col("vc")
            ).alias("ssc"),
        )
    )
    # cv2 = (n*SS - S^2) / S^2 at cent precision (module doc), scaled to
    # micros with the repo's truncating-div contract; NULL on empty/zero.
    cv2 = (
        "CASE WHEN sc = 0 OR sc IS NULL THEN NULL"
        " ELSE CAST((CAST(n AS DECIMAL(38,0)) * ssc"
        " - CAST(sc AS DECIMAL(38,0)) * sc) * 1000000"
        " div (CAST(sc AS DECIMAL(38,0)) * sc) AS BIGINT) END"
    )
    halves = sums.groupBy("o_orderpriority").agg(
        F.max(F.when(F.col("half") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("half") == 2, F.col("n"))).alias("n2"),
        F.max(F.when(F.col("half") == 1, F.col("s"))).alias("s1"),
        F.max(F.when(F.col("half") == 2, F.col("s"))).alias("s2"),
        F.max(F.when(F.col("half") == 1, F.expr(cv2))).alias(
            "cv2_pre_micro"
        ),
        F.max(F.when(F.col("half") == 2, F.expr(cv2))).alias(
            "cv2_post_micro"
        ),
    )
    return halves.select(
        "o_orderpriority",
        "n1",
        "n2",
        F.expr("CAST(CAST(s1 AS DECIMAL(38,0)) div n1 AS BIGINT)").alias(
            "mean1_micro"
        ),
        F.expr("CAST(CAST(s2 AS DECIMAL(38,0)) div n2 AS BIGINT)").alias(
            "mean2_micro"
        ),
        F.expr(
            "CAST((CAST(s2 AS DECIMAL(38,0)) * n1"
            " - CAST(s1 AS DECIMAL(38,0)) * n2)"
            " div (CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT)"
        ).alias("gap_micro"),
        "cv2_pre_micro",
        "cv2_post_micro",
    ).orderBy("o_orderpriority")


# Privacy audit thresholds: a quasi-identifier equivalence class is
# k-anonymous at K_ANON and l-diverse when its sensitive attribute
# takes at least L_DIVERSE distinct values (Sweeney 2002; Machanavajjhala
# et al. 2007 — public foundations of release auditing).
K_ANON = 5
L_DIVERSE = 2


def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release-readiness privacy audit of the customer table: group by
    the quasi-identifier pair (nation, market segment), report each
    equivalence class's size and the diversity of the sensitive
    attribute (account-balance thousand-bucket), flag k-anonymity
    (size >= K_ANON) and l-diversity (distinct >= L_DIVERSE), plus a
    total row (c_nationkey = -1, c_mktsegment = '*') carrying the
    record total, the WORST-class diversity, and flags that hold only
    if EVERY class passes — the one-glance gate before sharing a
    dataset derived from this table.

    Scale notes (100 TB): one (QI, sensitive) aggregate collapses rows
    to distinct cells, one QI rollup — both map-side combinable; the
    audit relation is classes-sized (|nations| x |segments|).
    """
    cust = load_table(spark, sf_dir, "customer")
    sens = F.floor(F.col("c_acctbal") / 1000).cast("bigint")
    cells = (
        cust.select(
            "c_nationkey", "c_mktsegment", sens.alias("s")
        )
        .groupBy("c_nationkey", "c_mktsegment", "s")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    classes = cells.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("n").cast("bigint").alias("class_size"),
        F.count(F.lit(1)).cast("bigint").alias("distinct_sensitive"),
    ).select(
        "*",
        (F.col("class_size") >= K_ANON).alias("is_k_anon"),
        (F.col("distinct_sensitive") >= L_DIVERSE).alias("is_l_diverse"),
    )
    total = (
        classes.agg(
            F.sum("class_size").cast("bigint").alias("class_size"),
            F.min("distinct_sensitive").cast("bigint").alias(
                "distinct_sensitive"
            ),
            F.min(F.col("is_k_anon").cast("int")).cast("boolean").alias(
                "is_k_anon"
            ),
            F.min(F.col("is_l_diverse").cast("int")).cast("boolean").alias(
                "is_l_diverse"
            ),
        )
        .select(
            F.lit(-1).cast("int").alias("c_nationkey"),
            F.lit("*").alias("c_mktsegment"),
            "class_size",
            "distinct_sensitive",
            "is_k_anon",
            "is_l_diverse",
        )
    )
    return classes.unionByName(total).orderBy("c_nationkey", "c_mktsegment")


def q_multiple_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-feature OLS by Cramer's rule: fit
    price_dollars ~ b0 + b1*quantity + b2*discount_pct over lineitem,
    solving the 3x3 normal equations with integer determinants — the
    multi-feature sibling of events_user_trend's closed-form slope.
    Coefficients surface in micro-dollars on the decimal `div` contract.

    Precision ledger (the drift_effect_size discipline): y runs at
    WHOLE-DOLLAR scale and discount at whole PERCENT — the Cramer
    numerators scale as n^3 and the micro-scaled quotient product
    reaches ~1e36 at sf1 (10M rows), inside DECIMAL(38,0)/HUGEINT
    with ~100x row headroom; CENT-scale y crosses 1e38 at sf1
    already (the ANSI overflow canary fires loudly there). One
    nine-sum map-side-combinable aggregate -> a one-row 3x3 solve in
    plain column arithmetic; no matrix library, no floats, nothing
    iterative.
    """
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_quantity").cast("bigint").alias("x1"),
        F.floor(F.col("l_discount") * 100).cast("bigint").alias("x2"),
        F.floor(F.col("l_extendedprice")).cast("bigint").alias("y"),
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    s = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x1").cast("bigint").alias("sx1"),
        F.sum("x2").cast("bigint").alias("sx2"),
        F.sum(F.col("x1") * F.col("x1")).cast("bigint").alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).cast("bigint").alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).cast("bigint").alias("s22"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x1") * F.col("y")).cast("decimal(38,0)").alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).cast("decimal(38,0)").alias("s2y"),
    )
    # 3x3 determinant of [[n,sx1,sx2],[sx1,s11,s12],[sx2,s12,s22]] and
    # the three Cramer numerators (RHS column [sy,s1y,s2y] swapped in).
    det = (
        "(CAST(n AS DECIMAL(38,0)) * (CAST(s11 AS DECIMAL(38,0)) * s22 - CAST(s12 AS DECIMAL(38,0)) * s12)"
        " - CAST(sx1 AS DECIMAL(38,0)) * (CAST(sx1 AS DECIMAL(38,0)) * s22 - CAST(s12 AS DECIMAL(38,0)) * sx2)"
        " + CAST(sx2 AS DECIMAL(38,0)) * (CAST(sx1 AS DECIMAL(38,0)) * s12 - CAST(s11 AS DECIMAL(38,0)) * sx2))"
    )
    n0 = (
        "(sy * (CAST(s11 AS DECIMAL(38,0)) * s22 - CAST(s12 AS DECIMAL(38,0)) * s12)"
        " - CAST(sx1 AS DECIMAL(38,0)) * (s1y * s22 - s2y * s12)"
        " + CAST(sx2 AS DECIMAL(38,0)) * (s1y * s12 - s2y * s11))"
    )
    n1 = (
        "(CAST(n AS DECIMAL(38,0)) * (s1y * s22 - s2y * s12)"
        " - sy * (CAST(sx1 AS DECIMAL(38,0)) * s22 - CAST(s12 AS DECIMAL(38,0)) * sx2)"
        " + CAST(sx2 AS DECIMAL(38,0)) * (CAST(sx1 AS DECIMAL(38,0)) * s2y - s1y * sx2))"
    )
    n2 = (
        "(CAST(n AS DECIMAL(38,0)) * (CAST(s11 AS DECIMAL(38,0)) * s2y - s1y * s12)"
        " - CAST(sx1 AS DECIMAL(38,0)) * (CAST(sx1 AS DECIMAL(38,0)) * s2y - s1y * sx2)"
        " + sy * (CAST(sx1 AS DECIMAL(38,0)) * s12 - CAST(s11 AS DECIMAL(38,0)) * sx2))"
    )
    return s.select(
        "n",
        F.expr(
            f"CASE WHEN {det} = 0 THEN NULL"
            f" ELSE CAST({n0} * 1000000 div {det} AS BIGINT) END"
        ).alias("b0_microdollars"),
        F.expr(
            f"CASE WHEN {det} = 0 THEN NULL"
            f" ELSE CAST({n1} * 1000000 div {det} AS BIGINT) END"
        ).alias("b1_microdollars"),
        F.expr(
            f"CASE WHEN {det} = 0 THEN NULL"
            f" ELSE CAST({n2} * 1000000 div {det} AS BIGINT) END"
        ).alias("b2_microdollars"),
    )


QUERIES = {
    "q_multiple_regression": q_multiple_regression,
    "q_outlier_iqr": q_outlier_iqr,
    "q_drift_effect_size": q_drift_effect_size,
    "q_k_anonymity_audit": q_k_anonymity_audit,
}

ORACLES = {
    "q_multiple_regression": """
        WITH base AS (
            SELECT CAST(l_quantity AS BIGINT) AS x1,
                   CAST(FLOOR(l_discount * 100) AS BIGINT) AS x2,
                   CAST(FLOOR(l_extendedprice) AS BIGINT) AS y
            FROM lineitem),
        s AS (
            SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                   CAST(SUM(x1) AS HUGEINT) AS sx1,
                   CAST(SUM(x2) AS HUGEINT) AS sx2,
                   CAST(SUM(x1 * x1) AS HUGEINT) AS s11,
                   CAST(SUM(x1 * x2) AS HUGEINT) AS s12,
                   CAST(SUM(x2 * x2) AS HUGEINT) AS s22,
                   CAST(SUM(y) AS HUGEINT) AS sy,
                   CAST(SUM(x1 * y) AS HUGEINT) AS s1y,
                   CAST(SUM(x2 * y) AS HUGEINT) AS s2y
            FROM base),
        dets AS (
            SELECT CAST(n AS BIGINT) AS n,
                   (n * (s11 * s22 - s12 * s12)
                    - sx1 * (sx1 * s22 - s12 * sx2)
                    + sx2 * (sx1 * s12 - s11 * sx2)) AS det,
                   (sy * (s11 * s22 - s12 * s12)
                    - sx1 * (s1y * s22 - s2y * s12)
                    + sx2 * (s1y * s12 - s2y * s11)) AS n0,
                   (n * (s1y * s22 - s2y * s12)
                    - sy * (sx1 * s22 - s12 * sx2)
                    + sx2 * (sx1 * s2y - s1y * sx2)) AS n1,
                   (n * (s11 * s2y - s1y * s12)
                    - sx1 * (sx1 * s2y - s1y * sx2)
                    + sy * (sx1 * s12 - s11 * sx2)) AS n2
            FROM s)
        SELECT n,
               CASE WHEN det = 0 THEN NULL
                    ELSE CAST(n0 * 1000000 // det AS BIGINT)
                    END AS b0_microdollars,
               CASE WHEN det = 0 THEN NULL
                    ELSE CAST(n1 * 1000000 // det AS BIGINT)
                    END AS b1_microdollars,
               CASE WHEN det = 0 THEN NULL
                    ELSE CAST(n2 * 1000000 // det AS BIGINT)
                    END AS b2_microdollars
        FROM dets
    """,
    "q_k_anonymity_audit": f"""
        WITH cells AS (
            SELECT c_nationkey, c_mktsegment,
                   CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS s,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM customer GROUP BY 1, 2, 3),
        classes AS (
            SELECT c_nationkey, c_mktsegment,
                   CAST(SUM(n) AS BIGINT) AS class_size,
                   CAST(COUNT(*) AS BIGINT) AS distinct_sensitive
            FROM cells GROUP BY 1, 2),
        flagged AS (
            SELECT *, class_size >= {K_ANON} AS is_k_anon,
                   distinct_sensitive >= {L_DIVERSE} AS is_l_diverse
            FROM classes)
        SELECT c_nationkey, c_mktsegment, class_size, distinct_sensitive,
               is_k_anon, is_l_diverse
        FROM flagged
        UNION ALL
        SELECT -1, '*', CAST(SUM(class_size) AS BIGINT),
               CAST(MIN(distinct_sensitive) AS BIGINT),
               CAST(MIN(CAST(is_k_anon AS INTEGER)) AS BOOLEAN),
               CAST(MIN(CAST(is_l_diverse AS INTEGER)) AS BOOLEAN)
        FROM flagged
        ORDER BY c_nationkey, c_mktsegment
    """,
    "q_outlier_iqr": """
        WITH base AS (
            SELECT o_orderpriority, o_orderkey,
                   CAST(FLOOR(o_totalprice * 1000000) AS BIGINT) AS v
            FROM orders),
        ranked AS (
            SELECT o_orderpriority, v,
                   ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                      ORDER BY v, o_orderkey) AS rn,
                   COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
            FROM base),
        quart AS (
            SELECT o_orderpriority,
                   CAST(MAX(n) AS BIGINT) AS n,
                   MIN(v) AS q1_micro,
                   MAX(v) AS q3_micro
            FROM ranked
            WHERE rn = (n + 3) // 4 OR rn = (3 * n + 3) // 4
            GROUP BY o_orderpriority),
        fences AS (
            SELECT *, q3_micro - q1_micro AS iqr_micro,
                   q1_micro - (3 * (q3_micro - q1_micro)) // 2
                       AS lo_fence_micro,
                   q3_micro + (3 * (q3_micro - q1_micro)) // 2
                       AS hi_fence_micro
            FROM quart),
        counted AS (
            SELECT b.o_orderpriority,
                   MAX(f.n) AS n,
                   MAX(f.q1_micro) AS q1_micro,
                   MAX(f.q3_micro) AS q3_micro,
                   MAX(f.iqr_micro) AS iqr_micro,
                   MAX(f.lo_fence_micro) AS lo_fence_micro,
                   MAX(f.hi_fence_micro) AS hi_fence_micro,
                   CAST(SUM(CASE WHEN b.v < f.lo_fence_micro
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_low_outliers,
                   CAST(SUM(CASE WHEN b.v > f.hi_fence_micro
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_high_outliers
            FROM base b
            JOIN fences f ON f.o_orderpriority = b.o_orderpriority
            GROUP BY b.o_orderpriority)
        SELECT *, CAST(CAST((n_low_outliers + n_high_outliers) AS HUGEINT)
                       * 1000000 // n AS BIGINT) AS outlier_ppm
        FROM counted
        ORDER BY o_orderpriority
    """,
    "q_drift_effect_size": f"""
        WITH sums AS (
            SELECT o_orderpriority,
                   CASE WHEN o_orderdate < TIMESTAMP '{DRIFT_PIVOT}'
                        THEN 1 ELSE 2 END AS half,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(FLOOR(o_totalprice * 1000000) AS BIGINT))
                        AS BIGINT) AS s,
                   CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS sc,
                   SUM(CAST(CAST(FLOOR(o_totalprice * 100) AS BIGINT)
                            AS HUGEINT)
                       * CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS ssc
            FROM orders GROUP BY 1, 2),
        cv AS (
            SELECT *,
                   CASE WHEN sc = 0 OR sc IS NULL THEN NULL
                        ELSE CAST((CAST(n AS HUGEINT) * ssc
                                   - CAST(sc AS HUGEINT) * sc) * 1000000
                                  // (CAST(sc AS HUGEINT) * sc) AS BIGINT) END
                       AS cv2_micro
            FROM sums),
        halves AS (
            SELECT o_orderpriority,
                   MAX(CASE WHEN half = 1 THEN n END) AS n1,
                   MAX(CASE WHEN half = 2 THEN n END) AS n2,
                   MAX(CASE WHEN half = 1 THEN s END) AS s1,
                   MAX(CASE WHEN half = 2 THEN s END) AS s2,
                   MAX(CASE WHEN half = 1 THEN cv2_micro END)
                       AS cv2_pre_micro,
                   MAX(CASE WHEN half = 2 THEN cv2_micro END)
                       AS cv2_post_micro
            FROM cv GROUP BY o_orderpriority)
        SELECT o_orderpriority, n1, n2,
               CAST(CAST(s1 AS HUGEINT) // n1 AS BIGINT) AS mean1_micro,
               CAST(CAST(s2 AS HUGEINT) // n2 AS BIGINT) AS mean2_micro,
               -- gap CAN be negative; negative ``//`` drifts across
               -- DuckDB versions (1.0 truncates, later floor) while
               -- Spark's div truncates — divide magnitudes, reapply the
               -- sign (r14 floordiv_probe).
               CASE WHEN CAST(s2 AS HUGEINT) * n1
                         - CAST(s1 AS HUGEINT) * n2 < 0
                    THEN CAST(-((CAST(s1 AS HUGEINT) * n2
                                 - CAST(s2 AS HUGEINT) * n1)
                                // (CAST(n1 AS HUGEINT) * n2)) AS BIGINT)
                    ELSE CAST((CAST(s2 AS HUGEINT) * n1
                               - CAST(s1 AS HUGEINT) * n2)
                              // (CAST(n1 AS HUGEINT) * n2) AS BIGINT)
               END AS gap_micro,
               cv2_pre_micro, cv2_post_micro
        FROM halves
        ORDER BY o_orderpriority
    """,
}
