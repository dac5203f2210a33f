"""Inequality, distribution-alignment and privacy-distance audits
(round 11, quality5).

The reference has no analytics surface (1:1 table copier,
/root/reference/src/migrate/table_migrator.rs:43-114); these extend
three existing tiers with the operator a practitioner reaches for
next, each in EXACT integer arithmetic (bit-for-bit cross-engine):

- ``q_palma_ratio``: the Palma inequality ratio per nation — top-10%
  customer-revenue share over bottom-40% share, the measure that
  replaced Gini in the inequality literature when the middle 50% was
  shown to be stable. Rides ONE keyed distributed exact-rank pass
  (rank + running sum + group total via ``cum_cols``); population
  cuts are floor counts (n div 10, 2n div 5), documented convention.
- ``q_quantile_normalize``: cross-group distribution alignment — each
  order's total is replaced by the POOLED distribution's value at the
  equivalent within-group rank position (ceil(rk * N / n), type-1),
  the batch-effect-removal transform of bioinformatics/feature
  pipelines. Two distributed exact-rank passes over the SAME base
  relation (keyed + global — not nested, so both stay in plan mode)
  and one positional equi-join into the pooled order statistics.
- ``q_t_closeness_audit``: the privacy tier after k-anonymity and
  l-diversity (both in ``q_k_anonymity_audit``): per quasi-identifier
  class (nation, segment), the exact Earth-Mover's Distance between
  the class's sensitive-attribute distribution (acctbal thousand
  buckets, ordered) and the global one —
  EMD = sum_i |cumP_i - cumQ_i| / (m - 1) — by integer
  cross-multiplication: sum |cum_c * N - cum_g * n_c| * 1e6
  div (n_c * N * (m - 1)). Classes with t above T_CLOSE_PPM flag.

Scale notes (100 TB): Palma and quantile-normalize are
distributed_rank shapes (one keyed shuffle per ordering, no keyed
window over data-sized input); t-closeness collapses rows to the
(class, bucket) cell aggregate first — the cumulative walk runs over
|nations| x |segments| x |thousand-buckets| cells, a plan constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from ..io import load_table

# t-closeness threshold: flag classes whose EMD to the global sensitive
# distribution exceeds 0.2 (200k ppm) — the paper's canonical example t.
T_CLOSE_PPM = 200_000


def q_palma_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Palma ratio of customer revenue per nation (module doc).
    Output: c_nationkey, n_customers, top10_micros, bottom40_micros,
    palma_ppm (-1 where the bottom mass is zero)."""
    from .distributed_rank import quantile_cuts, with_global_rank

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    rev = (
        orders.groupBy("o_custkey")
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 1_000_000).cast("bigint"))
            .alias("y")
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_nationkey", "o_custkey", "y")
        # customer-grain aggregate feeding THREE consumers (quantile
        # action + the rank pass's two plan sides): checkpoint the
        # entity-sized relation so the orders groupBy+join runs once
        # (the q_rank_suppliers r11 rule; round-12b A/B in BENCH_NOTES).
        .localCheckpoint(eager=False)
    )
    cuts = quantile_cuts(rev, ["y"])["y"]
    ranked = with_global_rank(
        rev, "y", ["o_custkey"], cuts=cuts, descending=True,
        partition_by=["c_nationkey"], rank_col="rk", total_col="n",
        cum_cols=("y",),
    )
    per = ranked.groupBy("c_nationkey").agg(
        F.max("n").cast("bigint").alias("n_customers"),
        F.coalesce(
            F.max(F.when(F.col("rk") == F.expr("n div 10"), F.col("cum_y"))),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("_top"),
        F.coalesce(
            F.max(
                F.when(
                    F.col("rk") == F.expr("n - (2 * n) div 5"), F.col("cum_y")
                )
            ),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("_upper"),
        F.max("tot_y").alias("_tot"),
    )
    return per.select(
        "c_nationkey",
        "n_customers",
        F.col("_top").cast("bigint").alias("top10_micros"),
        (F.col("_tot") - F.col("_upper")).cast("bigint").alias(
            "bottom40_micros"
        ),
        F.expr(
            "CASE WHEN _tot - _upper <= 0 THEN -1"
            " ELSE CAST(_top * 1000000 div (_tot - _upper) AS BIGINT) END"
        ).alias("palma_ppm"),
    ).orderBy("c_nationkey")


def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-normalize order totals across priorities (module doc).
    Output per order: o_orderpriority, o_orderkey, v_micro,
    qnorm_micro (the pooled value at the equivalent rank)."""
    from .distributed_rank import quantile_cuts, with_global_rank

    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderpriority",
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 1_000_000)
        .cast("bigint")
        .alias("v_micro"),
    )
    cuts = quantile_cuts(base, ["v_micro"])["v_micro"]
    grouped = with_global_rank(
        base, "v_micro", ["o_orderkey"], cuts=cuts,
        partition_by=["o_orderpriority"], rank_col="rk", total_col="n",
    )
    pooled = with_global_rank(
        base, "v_micro", ["o_orderkey"], cuts=cuts,
        rank_col="prk", total_col="n_all",
    ).select(
        F.col("prk").alias("__target"),
        F.col("v_micro").alias("qnorm_micro"),
    )
    n_all = base.agg(F.count(F.lit(1)).cast("bigint").alias("__N"))
    # ceil(rk * N / n) in integers; rk * N stays in BIGINT through
    # ~3e9 x 3e9 = 9e18 < 2^63 at the documented fixture magnitudes —
    # past that, promote through DECIMAL(38,0) (ANSI errors loudly).
    targeted = grouped.crossJoin(F.broadcast(n_all)).select(
        "o_orderpriority",
        "o_orderkey",
        "v_micro",
        F.expr("(rk * __N + n - 1) div n").alias("__target"),
    )
    return (
        targeted.join(pooled, "__target")
        .select("o_orderpriority", "o_orderkey", "v_micro", "qnorm_micro")
        .orderBy("o_orderpriority", "o_orderkey")
    )


def q_t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness of (nation, segment) classes on the acctbal
    thousand-bucket sensitive attribute (module doc). Output per class:
    n_rows, emd_ppm, t_close_ok."""
    cust = load_table(spark, sf_dir, "customer")
    sens = F.floor(F.col("c_acctbal") / 1000).cast("bigint")
    rows = cust.select("c_nationkey", "c_mktsegment", sens.alias("s"))
    # (class, bucket) cells on the FULL bucket spine per class (a class
    # missing a bucket still accumulates the global mass there).
    cells = rows.groupBy("c_nationkey", "c_mktsegment", "s").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    classes = cells.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("c").cast("bigint").alias("n_class")
    )
    glob = rows.groupBy("s").agg(F.count(F.lit(1)).cast("bigint").alias("g"))
    spine = classes.crossJoin(F.broadcast(glob)).join(
        cells, ["c_nationkey", "c_mktsegment", "s"], "left"
    ).select(
        "c_nationkey",
        "c_mktsegment",
        "s",
        "n_class",
        "g",
        F.coalesce("c", F.lit(0)).cast("bigint").alias("c"),
    )
    m = glob.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    n_tot = glob.agg(F.sum("g").cast("bigint").alias("n_tot"))
    wcum = (
        W.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy("s")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = spine.select(
        "c_nationkey",
        "c_mktsegment",
        "n_class",
        "s",
        F.sum("c").over(wcum).alias("cum_c"),
        F.sum("g").over(wcum).alias("cum_g"),
    )
    scored = (
        cum.crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(n_tot))
        # the LAST bucket's cumulative diff is exactly 0 by construction
        # (cum_c*N - cum_g*n_class = n_class*N - N*n_class), so summing
        # over ALL buckets equals the EMD's m-1 interior prefix gaps —
        # no last-bucket filter needed.
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.max("n_class").alias("n_rows"),
            F.expr(
                "CAST(SUM(ABS(CAST(cum_c AS DECIMAL(38,0)) * n_tot"
                " - CAST(cum_g AS DECIMAL(38,0)) * n_class)) * 1000000"
                " div (CAST(MAX(n_class) AS DECIMAL(38,0)) * MAX(n_tot)"
                " * (MAX(m) - 1)) AS BIGINT)"
            ).alias("emd_ppm"),
        )
    )
    return scored.select(
        "c_nationkey",
        "c_mktsegment",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        "emd_ppm",
        (F.col("emd_ppm") <= T_CLOSE_PPM).alias("t_close_ok"),
    ).orderBy("c_nationkey", "c_mktsegment")


QUERIES = {
    "q_palma_ratio": q_palma_ratio,
    "q_quantile_normalize": q_quantile_normalize,
    "q_t_closeness_audit": q_t_closeness_audit,
}

ORACLES = {
    "q_palma_ratio": """
        WITH rev AS (
            SELECT c.c_nationkey, o.o_custkey,
                   CAST(SUM(CAST(FLOOR(o.o_totalprice * 1000000) AS BIGINT))
                        AS BIGINT) AS y
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
            GROUP BY c.c_nationkey, o.o_custkey),
        ranked AS (
            SELECT c_nationkey, y,
                   ROW_NUMBER() OVER w AS rk,
                   COUNT(*) OVER (PARTITION BY c_nationkey) AS n,
                   SUM(CAST(y AS HUGEINT)) OVER
                       (PARTITION BY c_nationkey ORDER BY y DESC, o_custkey
                        ROWS UNBOUNDED PRECEDING) AS cum_y,
                   SUM(CAST(y AS HUGEINT)) OVER
                       (PARTITION BY c_nationkey) AS tot_y
            FROM rev
            WINDOW w AS (PARTITION BY c_nationkey
                         ORDER BY y DESC, o_custkey)),
        per AS (
            SELECT c_nationkey,
                   CAST(MAX(n) AS BIGINT) AS n_customers,
                   COALESCE(MAX(CASE WHEN rk = n // 10 THEN cum_y END),
                            0::HUGEINT) AS top_m,
                   COALESCE(MAX(CASE WHEN rk = n - (2 * n) // 5
                                     THEN cum_y END), 0::HUGEINT) AS upper_m,
                   MAX(tot_y) AS tot_m
            FROM ranked GROUP BY c_nationkey)
        SELECT c_nationkey, n_customers,
               CAST(top_m AS BIGINT) AS top10_micros,
               CAST(tot_m - upper_m AS BIGINT) AS bottom40_micros,
               CASE WHEN tot_m - upper_m <= 0 THEN -1
                    ELSE CAST(top_m * 1000000 // (tot_m - upper_m)
                              AS BIGINT) END AS palma_ppm
        FROM per
        ORDER BY c_nationkey
    """,
    "q_quantile_normalize": """
        WITH base AS (
            SELECT o_orderpriority, o_orderkey,
                   CAST(FLOOR(o_totalprice * 1000000) AS BIGINT) AS v_micro
            FROM orders),
        g AS (
            SELECT o_orderpriority, o_orderkey, v_micro,
                   ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                      ORDER BY v_micro, o_orderkey) AS rk,
                   COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
            FROM base),
        p AS (
            SELECT v_micro AS qnorm_micro,
                   ROW_NUMBER() OVER (ORDER BY v_micro, o_orderkey) AS prk
            FROM base),
        na AS (SELECT COUNT(*) AS c FROM base),
        t AS (
            SELECT g.o_orderpriority, g.o_orderkey, g.v_micro,
                   (g.rk * na.c + g.n - 1) // g.n AS target
            FROM g, na)
        SELECT t.o_orderpriority, t.o_orderkey, t.v_micro, p.qnorm_micro
        FROM t JOIN p ON p.prk = t.target
        ORDER BY t.o_orderpriority, t.o_orderkey
    """,
    "q_t_closeness_audit": f"""
        WITH rows_s AS (
            SELECT c_nationkey, c_mktsegment,
                   CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS s
            FROM customer),
        cells AS (
            SELECT c_nationkey, c_mktsegment, s,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM rows_s GROUP BY 1, 2, 3),
        classes AS (
            SELECT c_nationkey, c_mktsegment,
                   CAST(SUM(c) AS BIGINT) AS n_class
            FROM cells GROUP BY 1, 2),
        gdist AS (
            SELECT s, CAST(COUNT(*) AS BIGINT) AS g
            FROM rows_s GROUP BY s),
        spine AS (
            SELECT cl.c_nationkey, cl.c_mktsegment, gl.s, cl.n_class, gl.g,
                   COALESCE(ce.c, 0) AS c
            FROM classes cl CROSS JOIN gdist gl
            LEFT JOIN cells ce
              ON ce.c_nationkey = cl.c_nationkey
             AND ce.c_mktsegment = cl.c_mktsegment
             AND ce.s = gl.s),
        m AS (SELECT COUNT(*) AS m FROM gdist),
        nt AS (SELECT CAST(SUM(g) AS BIGINT) AS n_tot FROM gdist),
        cum AS (
            SELECT c_nationkey, c_mktsegment, n_class, s,
                   SUM(c) OVER w AS cum_c,
                   SUM(g) OVER w AS cum_g
            FROM spine
            WINDOW w AS (PARTITION BY c_nationkey, c_mktsegment
                         ORDER BY s ROWS UNBOUNDED PRECEDING)),
        scored AS (
            SELECT c_nationkey, c_mktsegment,
                   CAST(MAX(n_class) AS BIGINT) AS n_rows,
                   CAST(SUM(ABS(CAST(cum_c AS HUGEINT) * nt.n_tot
                                - CAST(cum_g AS HUGEINT) * n_class))
                        * 1000000
                        // (CAST(MAX(n_class) AS HUGEINT) * MAX(nt.n_tot)
                            * (MAX(m.m) - 1)) AS BIGINT) AS emd_ppm
            FROM cum, m, nt
            GROUP BY c_nationkey, c_mktsegment)
        SELECT c_nationkey, c_mktsegment, n_rows, emd_ppm,
               emd_ppm <= {T_CLOSE_PPM} AS t_close_ok
        FROM scored
        ORDER BY c_nationkey, c_mktsegment
    """,
}
