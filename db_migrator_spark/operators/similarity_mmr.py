"""Maximal Marginal Relevance diversified top-k (round 8).

The reference has no similarity surface (scope:
/root/reference/src/migrate/table_migrator.rs:43-114); this extends the
retrieval family (brute top-k, kNN join, range search, hybrid RRF) with
the standard DIVERSIFIED re-ranker (Carbonell & Goldstein, SIGIR 1998):
greedily pick K results maximizing
``mmr = lambda*rel - (1-lambda)*max_sim_to_already_selected`` — the
anti-redundancy step between retrieval and a RAG context window.

Determinism: lambda = 1/2, so mmr = 0.5*(rel - max_sim) — one IEEE
multiply of a difference of pinned cosines (the repo's fold-ordered
`_dot` contract, hash-proven by the kNN family); ties break on vec_id.
The greedy loop is K - 1 unrolled DataFrame steps; the DuckDB twin
unrolls the identical chain, so the full trajectory hash-matches.

Scale notes (100 TB): the greedy runs on the per-query SHORTLIST (top
``MMR_SHORTLIST`` by relevance — the kNN-join plan: broadcast query
side, linear scan, bounded per-query windows), so every relation after
the scan is queries x shortlist rows. Pairwise candidate sims are
shortlist^2 per query — bounded by constants, never corpus-sized. The
unrolled step count is K - 1 small hash joins; nothing iterates over
data-dependent rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from ..io import load_table
from .similarity import _cosine

MMR_QUERIES = 5
MMR_SHORTLIST = 10
MMR_K = 5


def similarity_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR selection trajectory: for each of the first ``MMR_QUERIES``
    query vectors, the ``MMR_K`` diversified picks from its
    ``MMR_SHORTLIST``-deep relevance shortlist, with selection step,
    relevance cosine, and the mmr score at pick time (step 1's score is
    its relevance — nothing selected yet)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < MMR_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("query_vec")
    )
    scored = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            "embedding",
            _cosine(F.col("embedding"), F.col("query_vec")).alias("rel"),
        )
    )
    wrel = W.partitionBy("q_id").orderBy(F.desc("rel"), "vec_id")
    short = (
        scored.withColumn("rn", F.row_number().over(wrel))
        .filter(F.col("rn") <= MMR_SHORTLIST)
        .select("q_id", "vec_id", "embedding", "rel")
        .localCheckpoint()  # feeds pairs + K greedy steps
    )
    a = short.select(
        "q_id", F.col("vec_id").alias("a_id"), F.col("embedding").alias("ea")
    )
    b = short.select(
        "q_id", F.col("vec_id").alias("b_id"), F.col("embedding").alias("eb")
    )
    pairs = (
        a.join(b, "q_id")
        .filter(F.col("a_id") != F.col("b_id"))
        .select(
            "q_id",
            "a_id",
            "b_id",
            _cosine(F.col("ea"), F.col("eb")).alias("sim"),
        )
        .localCheckpoint()  # feeds K - 1 max-sim updates
    )
    # Step 1: plain argmax relevance.
    pick = short.withColumn("rn", F.row_number().over(wrel)).filter(
        F.col("rn") == 1
    )
    selected = pick.select(
        "q_id",
        F.lit(1).alias("step"),
        "vec_id",
        "rel",
        F.col("rel").alias("mmr_score"),
    )
    # pairs' key columns are renamed before every probe join: pairs
    # derives from `short`, so a raw `pairs.q_id == short.q_id` predicate
    # can resolve both sides to the SAME attribute (trivially true) and
    # silently drop the per-query scoping.
    def _sim_to(picked: DataFrame, base: DataFrame) -> DataFrame:
        p = pairs.select(
            F.col("q_id").alias("pq"),
            F.col("a_id"),
            F.col("b_id"),
            "sim",
        )
        return (
            base.join(picked.select("q_id", F.col("vec_id").alias("p_id")), "q_id")
            .filter(F.col("vec_id") != F.col("p_id"))
            .join(
                p,
                (F.col("pq") == F.col("q_id"))
                & (F.col("a_id") == F.col("vec_id"))
                & (F.col("b_id") == F.col("p_id")),
            )
        )

    cand = _sim_to(pick, short).select(
        "q_id", "vec_id", "rel", F.col("sim").alias("cur_max")
    )
    for step in range(2, MMR_K + 1):
        mmr = F.lit(0.5) * (F.col("rel") - F.col("cur_max"))
        wm = W.partitionBy("q_id").orderBy(F.desc("mmr"), "vec_id")
        scored_c = cand.withColumn("mmr", mmr).localCheckpoint()
        # localCheckpoint: scored_c feeds the pick window AND the next
        # cur_max update; pick feeds the selected union AND the next
        # similarity probe — without the cuts each step re-derives the
        # whole prior greedy lineage (the PCA 2^rounds lesson), which
        # at shortlist size is pure scheduling overhead.
        pick = (
            scored_c.withColumn("rn", F.row_number().over(wm))
            .filter(F.col("rn") == 1)
            .localCheckpoint()
        )
        selected = selected.unionByName(
            pick.select(
                "q_id",
                F.lit(step).alias("step"),
                "vec_id",
                "rel",
                F.col("mmr").alias("mmr_score"),
            )
        )
        if step == MMR_K:
            break
        cand = _sim_to(pick, scored_c).select(
            "q_id",
            "vec_id",
            "rel",
            F.greatest(F.col("cur_max"), F.col("sim")).alias("cur_max"),
        )
    return selected.orderBy("q_id", "step")


def _mmr_oracle() -> str:
    cos = (
        "list_dot_product({a}, {b})"
        " / sqrt(list_dot_product({a}, {a}) * list_dot_product({b}, {b}))"
    )
    steps = []
    prev_cand = "cand1"
    for step in range(2, MMR_K + 1):
        steps.append(
            f"""pick{step} AS (
                SELECT q_id, vec_id, rel, 0.5 * (rel - cur_max) AS mmr
                FROM (SELECT *, ROW_NUMBER() OVER (
                          PARTITION BY q_id
                          ORDER BY 0.5 * (rel - cur_max) DESC, vec_id) AS rn
                      FROM {prev_cand})
                WHERE rn = 1)"""
        )
        if step < MMR_K:
            steps.append(
                f"""cand{step} AS (
                SELECT c.q_id, c.vec_id, c.rel,
                       GREATEST(c.cur_max, p.sim) AS cur_max
                FROM {prev_cand} c
                JOIN pick{step} x ON x.q_id = c.q_id
                                 AND c.vec_id != x.vec_id
                JOIN pairs p ON p.q_id = c.q_id AND p.a_id = c.vec_id
                             AND p.b_id = x.vec_id)"""
            )
            prev_cand = f"cand{step}"
    unions = "\n            UNION ALL\n            ".join(
        f"SELECT q_id, {s} AS step, vec_id, rel, mmr AS mmr_score"
        f" FROM pick{s}"
        for s in range(2, MMR_K + 1)
    )
    joined = ",\n        ".join(steps)
    return f"""
        WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qe
                   FROM embeddings WHERE vec_id < {MMR_QUERIES}),
        e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ae
              FROM embeddings),
        scored AS (
            SELECT q.q_id, e.vec_id, e.ae,
                   {cos.format(a="ae", b="qe")} AS rel
            FROM e, q WHERE e.vec_id != q.q_id),
        short AS (
            SELECT q_id, vec_id, ae, rel
            FROM (SELECT *, ROW_NUMBER() OVER (
                      PARTITION BY q_id ORDER BY rel DESC, vec_id) AS rn
                  FROM scored)
            WHERE rn <= {MMR_SHORTLIST}),
        pairs AS (
            SELECT s1.q_id, s1.vec_id AS a_id, s2.vec_id AS b_id,
                   {cos.format(a="s1.ae", b="s2.ae")} AS sim
            FROM short s1 JOIN short s2
              ON s2.q_id = s1.q_id AND s1.vec_id != s2.vec_id),
        pick1 AS (
            SELECT q_id, vec_id, rel
            FROM (SELECT *, ROW_NUMBER() OVER (
                      PARTITION BY q_id ORDER BY rel DESC, vec_id) AS rn
                  FROM short)
            WHERE rn = 1),
        cand1 AS (
            SELECT s.q_id, s.vec_id, s.rel, p.sim AS cur_max
            FROM short s
            JOIN pick1 x ON x.q_id = s.q_id AND s.vec_id != x.vec_id
            JOIN pairs p ON p.q_id = s.q_id AND p.a_id = s.vec_id
                         AND p.b_id = x.vec_id),
        {joined}
        SELECT CAST(q_id AS BIGINT) AS q_id, CAST(step AS INTEGER) AS step,
               CAST(vec_id AS BIGINT) AS vec_id, rel, mmr_score
        FROM (
            SELECT q_id, 1 AS step, vec_id, rel, rel AS mmr_score FROM pick1
            UNION ALL
            {unions})
        ORDER BY q_id, step
    """


QUERIES = {"similarity_mmr": similarity_mmr}
ORACLES = {"similarity_mmr": _mmr_oracle()}
