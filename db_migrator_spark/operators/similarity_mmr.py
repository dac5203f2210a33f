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
    )
    # The greedy K-step fold runs as ONE cogrouped applyInPandas stage
    # (round 9): each q_id group is shortlist-sized (S rel rows
    # cogrouped with S*(S-1) pair sims), the selection loop is plain
    # Python floats — bit-identical to the former unrolled DataFrame
    # chain because every arithmetic step (0.5 * (rel - cur_max),
    # max(cur_max, sim), float comparisons) is the same IEEE binary64
    # operation on the same Spark-computed cosines, and Arrow transfers
    # the doubles bit-exactly. The r8 version unrolled K-1 joins with
    # 2(K-1) localCheckpoints — ~15 scheduler round-trips of pure
    # overhead at shortlist size (the PCA driver-side-fold lesson,
    # kept DISTRIBUTED here because the relation scales with the
    # number of queries, unlike PCA's constant 4096 cells). Scale: one
    # exchange keyed by q_id; per-group state is S floats + S^2 sims —
    # constants. The DuckDB oracle keeps the unrolled-CTE chain.
    import pandas as pd

    def _greedy_fold(key, short_pdf, pairs_pdf):
        qid = int(key[0])
        rel = {int(v): float(r)
               for v, r in zip(short_pdf["vec_id"], short_pdf["rel"])}
        sim = {(int(a), int(b)): float(s)
               for a, b, s in zip(pairs_pdf["a_id"], pairs_pdf["b_id"],
                                  pairs_pdf["sim"])}
        # Step 1: argmax relevance (desc), tie on lowest vec_id.
        pick = min(rel, key=lambda v: (-rel[v], v))
        rows = [(qid, 1, pick, rel[pick], rel[pick])]
        cur = {v: sim[(v, pick)] for v in rel if v != pick}
        for step in range(2, MMR_K + 1):
            if not cur:
                break
            mmr = {v: 0.5 * (rel[v] - cur[v]) for v in cur}
            pick = min(mmr, key=lambda v: (-mmr[v], v))
            rows.append((qid, step, pick, rel[pick], mmr[pick]))
            if step == MMR_K:
                break
            cur = {v: max(cur[v], sim[(v, pick)])
                   for v in cur if v != pick}
        return pd.DataFrame(
            rows, columns=["q_id", "step", "vec_id", "rel", "mmr_score"]
        )

    # pairs derives from `short` (self-join), so its q_id is the SAME
    # attribute — rename it before the cogroup or the analyzer rejects
    # the plan as an ambiguous self-join (the module's standing rule).
    pairs_g = pairs.select(
        F.col("q_id").alias("pq"), "a_id", "b_id", "sim"
    )
    selected = (
        short.select("q_id", "vec_id", "rel")
        .groupBy("q_id")
        .cogroup(pairs_g.groupBy("pq"))
        .applyInPandas(
            _greedy_fold,
            "q_id bigint, step int, vec_id bigint, rel double, "
            "mmr_score double",
        )
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
