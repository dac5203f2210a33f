"""Token-budget water-filling allocator (round 8).

The reference has no corpus surface (scope:
/root/reference/src/migrate/table_migrator.rs:43-114); this extends the
training-mix family (temperature mix, mix plan, curriculum) with the
BUDGETED allocation step: given per-language available token counts and
a total training budget, give every language an equal share — but a
language cannot contribute more than it has, so its surplus is
REDISTRIBUTED to the rest (classic water-filling). The output is the
per-language token quota a sampler then draws.

Deterministic fixed-round semantics (the ``graph_kcore`` /
``graph_pagerank`` precedent): ``WF_ROUNDS`` capping rounds — each
round computes the fair share of the remaining budget over uncapped
languages (truncating integer division) and freezes every language
whose supply is at most that share — then one final fair share for the
survivors. Every step is integer; the DuckDB twin unrolls the same
chain.

Scale notes (100 TB): the corpus scan is ONE map-side-combined
(lang, token-count) aggregate; everything after runs on the
|languages|-row relation (broadcast one-row aggregates per round,
constants-sized joins). Output is |languages| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table

WF_ROUNDS = 3
# Budget as an exact rational fraction of the corpus: 4/5 of all tokens
# (high enough that the smallest language is supply-capped at every
# fixture scale, so the redistribution rounds actually exercise).
WF_BUDGET_NUM, WF_BUDGET_DEN = 4, 5


def corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language token quota under the water-filled equal-share
    budget: available tokens, allocated tokens, whether the language is
    supply-capped, and the exact-ppm fill rate of its supply."""
    docs = load_table(spark, sf_dir, "documents")
    avail = docs.groupBy("lang").agg(
        F.sum(F.size(F.split(F.col("text"), " ")))
        .cast("bigint")
        .alias("avail")
    )
    budget = avail.agg(
        F.expr(
            f"CAST(SUM(avail) * {WF_BUDGET_NUM} div {WF_BUDGET_DEN}"
            " AS BIGINT)"
        ).alias("budget")
    )
    # state: (lang, avail, capped, alloc) — alloc set only when capped.
    state = avail.crossJoin(F.broadcast(budget)).select(
        "lang",
        "avail",
        "budget",
        F.lit(False).alias("capped"),
        F.lit(None).cast("bigint").alias("alloc"),
    )
    for _ in range(WF_ROUNDS):
        tots = state.agg(
            F.sum(F.when(~F.col("capped"), 1).otherwise(0)).alias("k"),
            F.coalesce(
                F.sum(F.when(F.col("capped"), F.col("alloc"))), F.lit(0)
            ).alias("spent"),
        )
        state = (
            state.crossJoin(F.broadcast(tots))
            .select(
                "lang",
                "avail",
                "budget",
                F.expr(
                    "CASE WHEN k = 0 THEN 0"
                    " ELSE (budget - spent) div k END"
                ).alias("fair"),
                "capped",
                "alloc",
            )
            .select(
                "lang",
                "avail",
                "budget",
                (F.col("capped") | (F.col("avail") <= F.col("fair"))).alias(
                    "capped"
                ),
                F.when(F.col("capped"), F.col("alloc"))
                .when(F.col("avail") <= F.col("fair"), F.col("avail"))
                .alias("alloc"),
            )
        )
    finals = state.agg(
        F.sum(F.when(~F.col("capped"), 1).otherwise(0)).alias("k"),
        F.coalesce(
            F.sum(F.when(F.col("capped"), F.col("alloc"))), F.lit(0)
        ).alias("spent"),
    )
    return (
        state.crossJoin(F.broadcast(finals))
        .select(
            "lang",
            F.col("avail").alias("avail_tokens"),
            F.when(F.col("capped"), F.col("alloc"))
            .otherwise(
                F.expr(
                    "CASE WHEN k = 0 THEN 0"
                    " ELSE least(avail, (budget - spent) div k) END"
                )
            )
            .cast("bigint")
            .alias("allocated_tokens"),
            "capped",
        )
        .select(
            "lang",
            "avail_tokens",
            "allocated_tokens",
            "capped",
            F.expr(
                "allocated_tokens * 1000000 div avail_tokens"
            ).alias("fill_ppm"),
        )
        .orderBy("lang")
    )


def _wf_oracle() -> str:
    rounds = []
    prev = "s0"
    for r in range(1, WF_ROUNDS + 1):
        rounds.append(
            f"""t{r} AS (
                SELECT CAST(COUNT(*) FILTER (NOT capped) AS BIGINT) AS k,
                       CAST(COALESCE(SUM(alloc) FILTER (capped), 0)
                            AS BIGINT) AS spent
                FROM {prev}),
            s{r} AS (
                SELECT lang, avail, budget,
                       capped OR avail <= f.fair AS capped,
                       CASE WHEN capped THEN alloc
                            WHEN avail <= f.fair THEN avail END AS alloc
                FROM {prev},
                     (SELECT CASE WHEN k = 0 THEN 0
                                  ELSE (s.budget - spent) // k END AS fair
                      FROM t{r}, (SELECT DISTINCT budget FROM {prev}) s(budget))
                         f)"""
        )
        prev = f"s{r}"
    joined = ",\n        ".join(rounds)
    return f"""
        WITH avail AS (
            SELECT lang,
                   CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS avail
            FROM documents GROUP BY lang),
        b AS (
            SELECT CAST(SUM(avail) * {WF_BUDGET_NUM} // {WF_BUDGET_DEN}
                        AS BIGINT) AS budget
            FROM avail),
        s0 AS (
            SELECT lang, avail, budget, FALSE AS capped,
                   CAST(NULL AS BIGINT) AS alloc
            FROM avail, b),
        {joined},
        fin AS (
            SELECT CAST(COUNT(*) FILTER (NOT capped) AS BIGINT) AS k,
                   CAST(COALESCE(SUM(alloc) FILTER (capped), 0) AS BIGINT)
                       AS spent
            FROM {prev})
        SELECT lang, avail AS avail_tokens,
               CAST(CASE WHEN capped THEN alloc
                         WHEN k = 0 THEN 0
                         ELSE LEAST(avail, (budget - spent) // k) END
                    AS BIGINT) AS allocated_tokens,
               capped,
               CAST(CASE WHEN capped THEN alloc
                         WHEN k = 0 THEN 0
                         ELSE LEAST(avail, (budget - spent) // k) END
                    AS BIGINT) * 1000000 // avail AS fill_ppm
        FROM {prev}, fin
        ORDER BY lang
    """


def corpus_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail partition (Wenzek et al. 2020): per
    language, documents ranked by the unigram-LM score (the corpus's
    exact-rational perplexity stand-in, ``text_unigram_score``) and cut
    into score terciles; per (lang, bucket) the doc count and token
    volume — the report deciding which tercile feeds training.

    NTILE semantics via the keyed distributed exact-rank pattern
    (round 10: language partitions are docs/|langs| — linear, so the
    lang-keyed ntile window was a |langs|-way parallelism ceiling);
    the closed-form integer NTILE reproduces SQL ntile's floor-
    distribution exactly, and the score double is engine-exact (one
    division of exact integer sums), so the ranking is too.

    Scale shape: rides the unigram-score plan (term-keyed shuffle
    join), one (lang, score-bin)-keyed rank pass, one 3|langs|-row
    aggregate.
    """
    from .corpus import text_unigram_score
    from .distributed_rank import ntile_expr, quantile_cuts, with_global_rank

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    # doc-grain aggregate with an expensive upstream (the term-keyed
    # unigram-score join) feeding THREE consumers (quantile action +
    # the rank pass's two plan sides): checkpoint it once
    # (the q_rank_suppliers r11 rule; round-12b A/B in BENCH_NOTES).
    scored = (
        text_unigram_score(spark, sf_dir)
        .join(docs, "doc_id")
        .localCheckpoint(eager=False)
    )
    cuts = quantile_cuts(scored, ["avg_token_freq"])["avg_token_freq"]
    ranked = with_global_rank(
        scored, "avg_token_freq", ["doc_id"], cuts=cuts, descending=True,
        partition_by=["lang"], rank_col="__rk", total_col="__nt",
    )
    binned = ranked.select(
        "lang",
        "n_tok",
        ntile_expr("__rk", "__nt", 3).alias("bucket"),
    )
    return (
        binned.groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
        )
        .select(
            "lang",
            F.expr(
                "CASE bucket WHEN 1 THEN 'head' WHEN 2 THEN 'middle'"
                " ELSE 'tail' END"
            ).alias("bucket"),
            "n_docs",
            "n_tokens",
        )
        .orderBy("lang", "bucket")
    )


QUERIES = {
    "corpus_token_budget": corpus_token_budget,
    "corpus_perplexity_buckets": corpus_perplexity_buckets,
}
ORACLES = {
    "corpus_token_budget": _wf_oracle(),
    # Mirrors corpus.text_unigram_score's oracle arithmetic, then the
    # lang-keyed ntile and the tercile report.
    "corpus_perplexity_buckets": """
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents),
        toks_f AS (SELECT * FROM toks WHERE term != ''),
        vocab AS (
            SELECT term, COUNT(*) AS cnt FROM toks_f GROUP BY term),
        total AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_corpus FROM toks_f),
        per_doc AS (
            SELECT t.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_tok,
                   CAST(SUM(v.cnt) AS BIGINT) AS sum_cnt
            FROM toks_f t JOIN vocab v ON v.term = t.term
            GROUP BY t.doc_id),
        scored AS (
            SELECT d.lang, p.n_tok,
                   CAST(p.sum_cnt AS DOUBLE)
                       / (p.n_tok * (SELECT n_corpus FROM total))
                       AS avg_token_freq,
                   p.doc_id
            FROM per_doc p JOIN documents d ON d.doc_id = p.doc_id),
        binned AS (
            SELECT lang, n_tok,
                   NTILE(3) OVER (PARTITION BY lang
                                  ORDER BY avg_token_freq DESC, doc_id)
                       AS bucket
            FROM scored)
        SELECT lang,
               CASE bucket WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                    ELSE 'tail' END AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS n_tokens
        FROM binned
        GROUP BY lang, bucket
        ORDER BY lang, bucket
    """,
}
