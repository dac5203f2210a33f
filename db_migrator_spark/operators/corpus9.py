"""Data-constrained epoch allocation by exact water-filling
(round 11d, corpus9).

The reference has no corpus tooling (1:1 table copier,
/root/reference/src/migrate/table_migrator.rs:43-114); this extends
the corpus-assembly tier (temperature mix, DSIR, token budget) with
the allocation question a data-constrained training run actually
poses: given a token budget B larger than the corpus, how many EPOCHS
of each domain do we take when domains carry different repeat caps
(higher-quality domains tolerate more epochs before repetition hurts).

Formulation: domain d has s_d tokens and an epoch cap R_d
(EPOCH_CAP_HI for langs whose mean tokens/doc is >= the corpus mean,
EPOCH_CAP_LO otherwise — the deterministic quality-tier stand-in).
Water-filling finds the uniform epoch level e with
sum_d s_d * min(e, R_d) = B: domains below their cap share one exact
rational e = num/den; capped domains contribute R_d * s_d. The solve
sorts domains by cap and scans the K+1 breakpoint segments — the
consistent segment k (smallest k with
R_(k) * den_k <= num_k < R_(k+1) * den_k, where num_k = B - the
saturated prefix and den_k = the unsaturated token suffix) is exact
integer arithmetic end to end; no floats, no iteration.

Per-domain output: epochs in ppm (capped domains surface R_d * 1e6;
the rest num*1e6 div den — one shared truncation), allocated tokens
s_d * num div den (truncating — the sum undershoots B by < K tokens,
documented), and the saturated flag. If B >= sum R_d s_d the budget
cannot be spent: everyone caps and ``budget_left`` reports the excess.

Scale notes (100 TB): one token-count scan (map-side combined into
lang cells), then EVERYTHING — sort, prefix sums, segment scan — runs
on |langs| rows (bounded domain; the whitelisted cells regime). One
data-sized shuffle total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from ..io import load_table

EPOCH_BUDGET_PCT = 250  # B = 2.50x the corpus token count
EPOCH_CAP_HI = 4
EPOCH_CAP_LO = 2


def corpus_epoch_waterfill(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact water-filled epoch allocation per lang under per-domain
    repeat caps (module doc)."""
    docs = load_table(spark, sf_dir, "documents")
    doms = (
        docs.select(
            "lang",
            F.size(F.split(F.col("text"), " ")).cast("bigint").alias("tk"),
        )
        .groupBy("lang")
        .agg(
            F.sum("tk").cast("bigint").alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        )
    )
    tot = doms.agg(
        F.sum("s").cast("bigint").alias("s_all"),
        F.sum("n_docs").cast("bigint").alias("docs_all"),
    )
    # Quality tier: mean tokens/doc vs corpus mean, exact cross-mult.
    tiered = doms.crossJoin(F.broadcast(tot)).select(
        "lang",
        "s",
        F.when(
            F.col("s") * F.col("docs_all")
            >= F.col("n_docs") * F.col("s_all"),
            F.lit(EPOCH_CAP_HI),
        )
        .otherwise(F.lit(EPOCH_CAP_LO))
        .cast("bigint")
        .alias("r"),
        F.expr(
            f"CAST(s_all AS DECIMAL(38,0)) * {EPOCH_BUDGET_PCT} div 100"
        ).alias("b"),
    )
    wo = W.orderBy("r", "lang")
    pre = tiered.select(
        "lang",
        "s",
        "r",
        "b",
        F.row_number().over(wo).alias("rk"),
        F.sum(F.expr("CAST(r AS DECIMAL(38,0)) * s"))
        .over(wo.rowsBetween(W.unboundedPreceding, 0))
        .alias("pref_rs"),
        F.sum("s").over(wo.rowsBetween(W.unboundedPreceding, 0)).alias(
            "pref_s"
        ),
        F.sum("s").over(W.orderBy(F.lit(1)).rowsBetween(
            W.unboundedPreceding, W.unboundedFollowing
        )).alias("s_tot"),
        F.count(F.lit(1)).over(W.orderBy(F.lit(1)).rowsBetween(
            W.unboundedPreceding, W.unboundedFollowing
        )).alias("k_doms"),
    )
    # Candidate segments k = 0..K: k domains saturated. Represent k by
    # the sorted relation shifted (k = rk means rows 1..rk saturated);
    # k = 0 is the unshifted virtual row. Each candidate carries
    # num_k = B - pref_rs_k and den_k = s_tot - pref_s_k, plus the
    # bracketing caps r_k (this row's r; 0 for k=0) and r_next
    # (next row's r; +inf sentinel for k=K via NULL).
    cand = pre.select(
        F.col("rk").alias("k"),
        F.col("b"),
        (F.col("b") - F.col("pref_rs")).alias("num"),
        (F.col("s_tot") - F.col("pref_s"))
        .cast("decimal(38,0)")
        .alias("den"),
        F.col("r").alias("r_k"),
        F.lead("r").over(wo).alias("r_next"),
        "k_doms",
    ).unionByName(
        pre.filter(F.col("rk") == 1).select(
            F.lit(0).alias("k"),
            F.col("b"),
            F.col("b").alias("num"),
            F.col("s_tot").cast("decimal(38,0)").alias("den"),
            F.lit(0).cast("bigint").alias("r_k"),
            F.col("r").alias("r_next"),
            "k_doms",
        )
    )
    ok = cand.filter(
        (F.col("num") >= F.col("r_k") * F.col("den"))
        & (
            F.col("r_next").isNull()
            | (F.col("num") < F.col("r_next") * F.col("den"))
        )
        & (F.col("num") >= 0)
    )
    chosen = (
        ok.withColumn("pick", F.row_number().over(W.orderBy("k")))
        .filter(F.col("pick") == 1)
        .select("k", "num", "den")
    )
    return (
        pre.crossJoin(F.broadcast(chosen))
        .select(
            "lang",
            "s",
            "r",
            (F.col("rk") <= F.col("k")).alias("saturated"),
            F.expr(
                "CAST(CASE WHEN rk <= k THEN r * 1000000"
                " ELSE num * 1000000 div den END AS BIGINT)"
            ).alias("epochs_ppm"),
            F.expr(
                "CAST(CASE WHEN rk <= k THEN CAST(r AS DECIMAL(38,0)) * s"
                " ELSE CAST(s AS DECIMAL(38,0)) * num div den END"
                " AS BIGINT)"
            ).alias("alloc_tokens"),
            F.expr(
                "CAST(CASE WHEN den = 0 THEN num ELSE 0 END AS BIGINT)"
            ).alias("budget_left"),
        )
        .orderBy("lang")
    )


QUERIES = {"corpus_epoch_waterfill": corpus_epoch_waterfill}

ORACLES = {
    "corpus_epoch_waterfill": f"""
        WITH doms AS (
            SELECT lang,
                   CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                       AS s,
                   CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM documents GROUP BY 1),
        tot AS (
            SELECT CAST(SUM(s) AS BIGINT) AS s_all,
                   CAST(SUM(n_docs) AS BIGINT) AS docs_all
            FROM doms),
        tiered AS (
            SELECT lang, s,
                   CAST(CASE WHEN s * docs_all >= n_docs * s_all
                             THEN {EPOCH_CAP_HI}
                             ELSE {EPOCH_CAP_LO} END AS BIGINT) AS r,
                   CAST(s_all AS HUGEINT) * {EPOCH_BUDGET_PCT} // 100
                       AS b
            FROM doms, tot),
        pre AS (
            SELECT lang, s, r, b,
                   CAST(ROW_NUMBER() OVER wo AS BIGINT) AS rk,
                   SUM(CAST(r AS HUGEINT) * s)
                       OVER (wo ROWS UNBOUNDED PRECEDING) AS pref_rs,
                   CAST(SUM(s) OVER (wo ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS pref_s,
                   CAST(SUM(s) OVER () AS BIGINT) AS s_tot,
                   CAST(COUNT(*) OVER () AS BIGINT) AS k_doms,
                   LEAD(r) OVER wo AS r_next
            FROM tiered
            WINDOW wo AS (ORDER BY r, lang)),
        cand AS (
            SELECT rk AS k, b, b - pref_rs AS num,
                   CAST(s_tot - pref_s AS HUGEINT) AS den,
                   r AS r_k, r_next
            FROM pre
            UNION ALL
            SELECT 0, b, b, CAST(s_tot AS HUGEINT),
                   CAST(0 AS BIGINT), r
            FROM pre WHERE rk = 1),
        ok AS (
            SELECT * FROM cand
            WHERE num >= r_k * den
              AND (r_next IS NULL OR num < r_next * den)
              AND num >= 0),
        chosen AS (
            SELECT k, num, den FROM ok ORDER BY k LIMIT 1)
        SELECT p.lang, p.s, p.r,
               p.rk <= c.k AS saturated,
               CAST(CASE WHEN p.rk <= c.k THEN p.r * 1000000
                         ELSE c.num * 1000000 // c.den END AS BIGINT)
                   AS epochs_ppm,
               CAST(CASE WHEN p.rk <= c.k
                         THEN CAST(p.r AS HUGEINT) * p.s
                         ELSE CAST(p.s AS HUGEINT) * c.num // c.den
                    END AS BIGINT) AS alloc_tokens,
               CAST(CASE WHEN c.den = 0 THEN c.num ELSE 0 END
                    AS BIGINT) AS budget_left
        FROM pre p, chosen c
        ORDER BY p.lang
    """,
}
