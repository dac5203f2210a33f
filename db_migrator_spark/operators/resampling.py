"""Deterministic resampling inference (round 11b).

The reference has no statistics surface (1:1 table copier,
/root/reference/src/migrate/table_migrator.rs:43-114); this adds the
estimator a pipeline reaches for when a closed-form interval does not
exist: the bootstrap — in its DISTRIBUTED form, the Poisson bootstrap
(each row independently draws its multiplicity per replicate, so no
global n-out-of-n coordination exists; the standard large-scale
formulation). Everything is exact and engine-neutral:

- the per-(row, replicate) uniform comes from the repo's md5 32-bit
  lottery (``conv(substring(md5(key:r),1,8),16,10)`` ==
  ``from_hex(...)::BIT::UINTEGER``),
- the Poisson(1) multiplicity is the count of PINNED cumulative
  thresholds (floor(F(k) * 2^32) integer literals below) at or below
  the uniform — no float pmf evaluation in-plan, the same
  literal-pinning contract as the Benford/NDCG constants. Multiplicity
  caps at 8 (P[m > 8] < 1.2e-6, bias invisible at ppm scale and
  IDENTICALLY pinned on both engines),
- replicate means are exact integer micros (truncating div), and the
  percentile CI is type-1 selection over the sorted B-element
  replicate array — ``sort_array(collect_list(...))`` per group, a
  constant-sized in-codegen array, no window at all.

Scale notes (100 TB): the replicate fan-out is an in-codegen explode
of a CONSTANT factor B; the only shuffle carries B partial sums per
(group, replicate) per input partition (map-side combined). Nothing
data-sized crosses a single task; B is a knob, not a function of data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import fan_out, load_table

BOOT_B = 100  # replicates
# floor(2^32 * P[Poisson(1) <= k]) for k = 0..7 — multiplicity m is the
# count of thresholds <= u (u uniform 32-bit), i.e. m = k+1 iff u lands
# past F(k). Pinned integers; both engines compare against the same.
POISSON1_CUM_2_32 = (
    1580030168,
    3160060337,
    3950075421,
    4213413783,
    4279248373,
    4292415291,
    4294609777,
    4294923276,
)
# type-1 selection ranks for the 2.5% / 97.5% percentile CI at B=100
BOOT_LO_RANK = 3   # max(1, ceil(0.025 * B))
BOOT_HI_RANK = 98  # ceil(0.975 * B)


def eval_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority Poisson-bootstrap 95% CI of the mean order total,
    exact micros (module doc). Output: o_orderpriority, b_replicates,
    point_mean_micro, ci_lo_micro, ci_hi_micro."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderpriority",
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 1_000_000).cast("bigint").alias("v"),
    )
    # fan_out (round 14, guide §2.5): the B-fold replicate explode and
    # its per-(row, replicate) md5 lottery fuse into the SCAN stage, so
    # the heaviest map work in this module ran at the input's row-group
    # parallelism — 1 task at sf0.1, 6 at sf1 (measured 103s Spark-side
    # at sf1 with 26 idle cores; the sweep's one Spark-side outlier).
    # One shuffle of the narrow (priority, key, v) base rows unlocks
    # full parallelism; identity on any production-sized input.
    reps = fan_out(base, "o_orderkey").select(
        "*",
        F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("r"),
    )
    u = F.expr(
        "CAST(conv(substring(md5(concat(CAST(o_orderkey AS STRING), ':',"
        " CAST(r AS STRING))), 1, 8), 16, 10) AS BIGINT)"
    )
    mult = None
    for t in POISSON1_CUM_2_32:
        term = (u >= F.lit(t)).cast("int")
        mult = term if mult is None else mult + term
    per = (
        reps.select(
            "o_orderpriority", "r", "v", mult.alias("m")
        )
        .groupBy("o_orderpriority", "r")
        .agg(
            F.sum("m").cast("bigint").alias("n_eff"),
            F.sum(F.col("m").cast("decimal(38,0)") * F.col("v")).alias("s"),
        )
    )
    # n_eff = 0 would need every row of a group to draw multiplicity 0
    # (P = e^-n) — structurally impossible at any real group size; the
    # guard keeps the plan total anyway.
    means = per.select(
        "o_orderpriority",
        F.expr(
            "CASE WHEN n_eff = 0 THEN NULL"
            " ELSE CAST(s div n_eff AS BIGINT) END"
        ).alias("mean_micro"),
    )
    sel = means.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("b_replicates"),
        F.sort_array(F.collect_list("mean_micro")).alias("__arr"),
    )
    point = base.groupBy("o_orderpriority").agg(
        F.expr(
            "CAST(SUM(CAST(v AS DECIMAL(38,0))) div COUNT(*) AS BIGINT)"
        ).alias("point_mean_micro")
    )
    return (
        sel.join(F.broadcast(point), "o_orderpriority")
        .select(
            "o_orderpriority",
            "b_replicates",
            "point_mean_micro",
            F.element_at("__arr", BOOT_LO_RANK).alias("ci_lo_micro"),
            F.element_at("__arr", BOOT_HI_RANK).alias("ci_hi_micro"),
        )
        .orderBy("o_orderpriority")
    )


QUERIES = {"eval_bootstrap_ci": eval_bootstrap_ci}

_MULT_SQL = " + ".join(
    f"CAST(u >= {t} AS INT)" for t in POISSON1_CUM_2_32
)

ORACLES = {
    "eval_bootstrap_ci": f"""
        WITH base AS (
            SELECT o_orderpriority, o_orderkey,
                   CAST(FLOOR(o_totalprice * 1000000) AS BIGINT) AS v
            FROM orders),
        reps AS (
            SELECT b.o_orderpriority, b.o_orderkey, b.v, t.r
            FROM base b, range({BOOT_B}) t(r)),
        withu AS (
            SELECT o_orderpriority, r, v,
                   CAST(from_hex(substr(md5(CAST(o_orderkey AS VARCHAR)
                        || ':' || CAST(r AS VARCHAR)), 1, 8))
                        ::BIT::UINTEGER AS BIGINT) AS u
            FROM reps),
        per AS (
            SELECT o_orderpriority, r,
                   CAST(SUM({_MULT_SQL}) AS BIGINT) AS n_eff,
                   SUM(CAST(({_MULT_SQL}) AS HUGEINT) * v) AS s
            FROM withu
            GROUP BY o_orderpriority, r),
        means AS (
            SELECT o_orderpriority,
                   CASE WHEN n_eff = 0 THEN NULL
                        ELSE CAST(s // n_eff AS BIGINT) END AS mean_micro
            FROM per),
        sel AS (
            SELECT o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS b_replicates,
                   list_sort(list(mean_micro)) AS arr
            FROM means GROUP BY o_orderpriority),
        pt AS (
            SELECT o_orderpriority,
                   CAST(SUM(CAST(v AS HUGEINT)) // COUNT(*) AS BIGINT)
                       AS point_mean_micro
            FROM base GROUP BY o_orderpriority)
        SELECT s.o_orderpriority, s.b_replicates, pt.point_mean_micro,
               arr[{BOOT_LO_RANK}] AS ci_lo_micro,
               arr[{BOOT_HI_RANK}] AS ci_hi_micro
        FROM sel s JOIN pt ON pt.o_orderpriority = s.o_orderpriority
        ORDER BY s.o_orderpriority
    """,
}
