"""Schema-inference and pipeline-diagnostic audits (round 8).

The reference migrates foreign keys it is TOLD about
(/root/reference/src/schema/constraint.rs — FK metadata read from
INFORMATION_SCHEMA); ``q_fk_discovery`` is the inference twin a
migration of an undocumented schema needs: for each candidate
(child.column -> parent.column) pair, the distinct-value containment
ratio — 1e6 ppm containment over a non-trivial child domain is the
classic FK signal. Candidates cover the star schema's four real FKs,
one reverse direction, and one deliberate negative.

``corpus_quality_ablation`` is the cleaning-pipeline funnel: every
document graded by three independent keep/drop signals (token-length
quality, Gopher word-count rule, exact-duplicate loser) and counted per
flag combination — the 2^3-row report that says which filters overlap
and what survives them all.

Scale notes (100 TB): FK containment is per-pair two DISTINCT
aggregates + one semi-join on the distinct sets (shuffles keyed on the
candidate column, never row-level joins); the ablation is one scan for
the flags (the dup flag joins the content-hash keep table — one
map-side-combined shuffle) and one 8-row aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table

# (child_table, child_col, parent_table, parent_col)
FK_CANDIDATES = [
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    # reverse direction: containment only if every order has a line
    ("orders", "o_orderkey", "lineitem", "l_orderkey"),
    # deliberate negative
    ("part", "p_partkey", "supplier", "s_suppkey"),
]

# Ablation bits must be INDEPENDENT signals or the funnel degenerates
# (a token-count quality bit implies the Gopher word-count bit): the
# quality bit is mean word length in [4, 12] chars via integer
# cross-multiplication (4*words <= chars <= 12*words — no division),
# the Gopher bit is the word-count rule, the dedup bit the exact-dup
# keeper.
ABLATION_MIN_MEAN_WL = 4
ABLATION_MAX_MEAN_WL = 12
ABLATION_MIN_WORDS = 50  # corpus4.GOPHER_MIN_WORDS, the Gopher bit


def q_fk_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment profile per candidate FK pair: child distinct count,
    contained distinct count, exact-ppm containment, and the FK verdict
    (full containment)."""
    rows = []
    for child_t, child_c, parent_t, parent_c in FK_CANDIDATES:
        child = (
            load_table(spark, sf_dir, child_t)
            .select(F.col(child_c).alias("k"))
            .filter(F.col("k").isNotNull())
            .distinct()
        )
        parent = (
            load_table(spark, sf_dir, parent_t)
            .select(F.col(parent_c).alias("k"))
            .distinct()
        )
        n_child = child.agg(F.count(F.lit(1)).alias("n_child"))
        n_cont = child.join(parent, "k", "left_semi").agg(
            F.count(F.lit(1)).alias("n_contained")
        )
        rows.append(
            n_child.crossJoin(n_cont).select(
                F.lit(f"{child_t}.{child_c}").alias("child"),
                F.lit(f"{parent_t}.{parent_c}").alias("parent"),
                F.col("n_child").cast("bigint").alias("n_child"),
                F.col("n_contained").cast("bigint").alias("n_contained"),
                F.expr("n_contained * 1000000 div n_child").alias(
                    "containment_ppm"
                ),
                (F.col("n_contained") == F.col("n_child")).alias("is_fk"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("child", "parent")


def corpus_quality_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor counts per filter combination: quality bit (>= token
    threshold), Gopher word-count bit, and exact-dup keeper bit, with
    each combination's doc count, token volume, and corpus share ppm."""
    docs = load_table(spark, sf_dir, "documents")
    keep = (
        docs.groupBy(F.md5(F.col("text").cast("binary")).alias("h"))
        .agg(F.min("doc_id").alias("keep_doc_id"))
    )
    flagged = (
        docs.select(
            "doc_id",
            F.md5(F.col("text").cast("binary")).alias("h"),
            F.size(F.split(F.col("text"), " ")).alias("n_tok"),
        )
        .join(keep, "h")
        .join(docs.select("doc_id", "n_chars"), "doc_id")
        .select(
            (
                (ABLATION_MIN_MEAN_WL * F.col("n_tok") <= F.col("n_chars"))
                & (F.col("n_chars") <= ABLATION_MAX_MEAN_WL * F.col("n_tok"))
            ).alias("quality_pass"),
            (F.col("n_tok") >= ABLATION_MIN_WORDS).alias("gopher_pass"),
            (F.col("doc_id") == F.col("keep_doc_id")).alias("dedup_keep"),
            "n_tok",
        )
    )
    tot = docs.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        flagged.groupBy("quality_pass", "gopher_pass", "dedup_keep")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "quality_pass",
            "gopher_pass",
            "dedup_keep",
            "n_docs",
            "n_tokens",
            F.expr("n_docs * 1000000 div n_total").alias("share_ppm"),
        )
        .orderBy("quality_pass", "gopher_pass", "dedup_keep")
    )


QUERIES = {
    "q_fk_discovery": q_fk_discovery,
    "corpus_quality_ablation": corpus_quality_ablation,
}

_FK_UNION = "\n        UNION ALL\n        ".join(
    f"""SELECT '{ct}.{cc}' AS child, '{pt}.{pc}' AS parent,
               (SELECT CAST(COUNT(DISTINCT {cc}) AS BIGINT) FROM {ct}
                WHERE {cc} IS NOT NULL) AS n_child,
               (SELECT CAST(COUNT(DISTINCT c.{cc}) AS BIGINT)
                FROM {ct} c
                WHERE c.{cc} IS NOT NULL
                  AND c.{cc} IN (SELECT {pc} FROM {pt})) AS n_contained"""
    for ct, cc, pt, pc in FK_CANDIDATES
)

ORACLES = {
    "q_fk_discovery": f"""
        WITH pairs AS (
        {_FK_UNION})
        SELECT child, parent, n_child, n_contained,
               n_contained * 1000000 // n_child AS containment_ppm,
               n_contained = n_child AS is_fk
        FROM pairs
        ORDER BY child, parent
    """,
    "corpus_quality_ablation": f"""
        WITH keep AS (
            SELECT md5(text) AS h, MIN(doc_id) AS keep_doc_id
            FROM documents GROUP BY md5(text)),
        flagged AS (
            SELECT {ABLATION_MIN_MEAN_WL} * len(string_split(d.text, ' '))
                       <= d.n_chars
                   AND d.n_chars
                       <= {ABLATION_MAX_MEAN_WL} * len(string_split(d.text, ' '))
                       AS quality_pass,
                   len(string_split(d.text, ' ')) >= {ABLATION_MIN_WORDS}
                       AS gopher_pass,
                   d.doc_id = k.keep_doc_id AS dedup_keep,
                   len(string_split(d.text, ' ')) AS n_tok
            FROM documents d JOIN keep k ON k.h = md5(d.text)),
        tot AS (SELECT COUNT(*) AS n_total FROM documents)
        SELECT quality_pass, gopher_pass, dedup_keep,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) * 1000000
                   // (SELECT n_total FROM tot) AS share_ppm
        FROM flagged
        GROUP BY quality_pass, gopher_pass, dedup_keep
        ORDER BY quality_pass, gopher_pass, dedup_keep
    """,
}
