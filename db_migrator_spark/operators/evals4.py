"""Generation-overlap evals: ROUGE-N and corpus BLEU (round 11b).

The reference has no eval surface (1:1 table copier,
/root/reference/src/migrate/table_migrator.rs:43-114); these extend
the eval tier (ROC/NDCG/kappa/MRR in evals*.py) with the two standard
n-gram overlap metrics every generation pipeline reports. The fixture
has no (reference, candidate) alignment, so pairs are the
deterministic stand-in used by the dedup twins: ADJACENT-ID SAME-LANG
document pairs (ref = doc_id, cand = doc_id + 1) — the metric
machinery (clipped counts, micro/macro pooling, geometric mean) is
the deliverable, not the pairing.

- ``eval_rouge_n``: recall-oriented overlap per (lang, n) for n=1,2.
  Clipped match count sum_g min(c_ref(g), c_cand(g)); micro pools
  numerators/denominators corpus-wide, macro averages per-pair ppm
  ratios (both truncating integer division — documented contract).
- ``eval_bleu_corpus``: corpus-level modified n-gram precisions
  p1..p4 (clipped counts over CANDIDATE totals), plus
  BLEU-without-brevity-penalty = (p1*p2*p3*p4)^(1/4) in exact ppm via
  two nested adjusted integer sqrts (the product of four ppm values
  is <= 1e24, inside the DECIMAL(38,0)-safe isqrt envelope; double
  rounding stays correctable-by-one below 2^108). The brevity penalty
  needs exp() (irrational) — surfaced instead as the exact inputs
  (ref/cand token totals) plus ``bp_is_one`` so a reader applies it
  downstream; the standard "BLEU-nbp" caveat, documented here.

Scale notes (100 TB): one token-split pass explodes each doc into its
1..4-grams (constant 4x token fan-out), map-side-combined into
(doc, n, gram) counts. The pair overlap is ONE shuffle join keyed
(cand_id, n, gram) — same shape as the bigram-novelty join; hot grams
are bounded per pair by the per-doc count, and pooling is a
lang-keyed (bounded-domain) aggregate. No window, no driver loop;
the nested isqrt runs on lang-grain rows (plan-constant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import fan_out, load_table

NGRAM_MAX = 4


def _pair_overlap(
    spark: SparkSession, sf_dir: str, n_max: int
) -> DataFrame:
    """Per (ref, cand, lang, n): clipped match count + both totals.

    Round 14 rewrite (guide §2.3 shuffle-fewer-bytes / §2.4 remove the
    join). The old shape materialized an eager (doc, n, gram, count)
    checkpoint, then JOINED it against itself on (pair, n, gram) to
    clip — the gram STRINGS crossed a shuffle three times (the count
    groupBy + both join sides) and the join paid SortMergeJoin sorts
    over gram-string keys (sf1 Spark-side probe: 103s -> 34s was
    fan_out alone; the join remained the wall). Because the pairing is
    ADJACENT-ID (ref = d, cand = d+1), the join key is a function of
    the row's own doc_id, so the clip is expressible as ONE aggregate:
    each gram occurrence is emitted twice — once for the pair it
    references (pid = doc_id, role ref) and once for the pair it is
    candidate of (pid = doc_id - 1, role cand) — and per (pid, n, g)
    the clipped count is LEAST(ref-occurrences, cand-occurrences).
    Gram strings now cross the wire exactly once (map-side combined),
    no join, no sort, no checkpoint. Invalid pids (lang mismatch,
    boundary ids) fold to zero overlap and are dropped by the grid
    join, which now runs at doc grain on slim (id, lang, len) rows;
    per-doc gram totals are the closed form max(len - n + 1, 0) —
    identical to counting the generated grams, so no totals relation
    is materialized at all.
    """
    docs = load_table(spark, sf_dir, "documents")
    # fan_out (guide §2.5): the gram build is heavy per-row map work
    # (split + n_max gram-array transforms + array_join per gram +
    # double explode) fused into the documents SCAN stage, which
    # carries row-group parallelism (1 task at sf0.1, ~6 at sf1).
    ws = fan_out(docs.select("doc_id", "lang", "text"), "doc_id").select(
        "doc_id", "lang", F.split(F.col("text"), " ").alias("ws")
    )
    meta = ws.select("doc_id", "lang", F.size("ws").alias("len"))
    pairs = (
        meta.alias("a")
        .join(
            meta.alias("b"),
            (F.col("b.doc_id") == F.col("a.doc_id") + 1)
            & (F.col("b.lang") == F.col("a.lang")),
        )
        .select(
            F.col("a.doc_id").alias("ref_id"),
            F.col("b.doc_id").alias("cand_id"),
            F.col("a.lang").alias("lang"),
            F.col("a.len").alias("ref_len"),
            F.col("b.len").alias("cand_len"),
        )
    )
    per_n = [
        F.when(
            F.size("ws") >= n,
            F.expr(
                f"transform(sequence(1, size(ws) - {n} + 1),"
                f" i -> array_join(slice(ws, i, {n}), ' '))"
            ),
        ).otherwise(F.array().cast("array<string>"))
        for n in range(1, n_max + 1)
    ]
    occ = ws.select(
        "doc_id", F.posexplode(F.array(*per_n)).alias("n0", "gs")
    ).select(
        "doc_id", (F.col("n0") + 1).alias("n"), F.explode("gs").alias("g")
    )
    roled = occ.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("doc_id").alias("pid"), F.lit(1).alias("ir")
                ),
                F.struct(
                    (F.col("doc_id") - 1).alias("pid"),
                    F.lit(0).alias("ir"),
                ),
            )
        ).alias("r"),
        "n",
        "g",
    ).select(F.col("r.pid").alias("ref_id"), F.col("r.ir").alias("ir"), "n", "g")
    num = (
        roled.groupBy("ref_id", "n", "g")
        .agg(
            F.sum("ir").alias("cr"),
            F.sum(F.lit(1) - F.col("ir")).alias("cc"),
        )
        .groupBy("ref_id", "n")
        .agg(F.sum(F.least("cr", "cc")).cast("bigint").alias("num"))
    )
    grid = pairs.crossJoin(
        pairs.sparkSession.range(1, n_max + 1).select(
            F.col("id").cast("int").alias("n")
        )
    )
    return grid.join(num, ["ref_id", "n"], "left").select(
        "lang",
        "n",
        "ref_id",
        F.greatest(F.col("ref_len") - F.col("n") + 1, F.lit(0))
        .cast("bigint")
        .alias("ref_tot"),
        F.greatest(F.col("cand_len") - F.col("n") + 1, F.lit(0))
        .cast("bigint")
        .alias("cand_tot"),
        F.coalesce("num", F.lit(0)).alias("num"),
    )


def eval_rouge_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-1/2 per lang over adjacent-id same-lang pairs: micro
    (pooled counts) and macro (mean of per-pair ppm) recall
    (module doc)."""
    po = _pair_overlap(spark, sf_dir, 2)
    ppm = F.when(
        F.col("ref_tot") > 0,
        F.expr("num * 1000000 div ref_tot"),
    )
    return (
        po.select("lang", "n", "num", "ref_tot", ppm.alias("ppm"))
        .groupBy("lang", "n")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.expr(
                "CAST(CASE WHEN SUM(ref_tot) = 0 THEN 0"
                " ELSE SUM(num) * 1000000 div SUM(ref_tot) END"
                " AS BIGINT)"
            ).alias("rouge_micro_ppm"),
            F.expr(
                "CAST(CASE WHEN COUNT(ppm) = 0 THEN 0"
                " ELSE SUM(ppm) div COUNT(ppm) END AS BIGINT)"
            ).alias("rouge_macro_ppm"),
        )
        .orderBy("lang", "n")
    )


def eval_bleu_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus BLEU precisions p1..p4 and the exact integer
    BLEU-without-brevity-penalty per lang (module doc)."""
    po = _pair_overlap(spark, sf_dir, NGRAM_MAX)
    wide = po.groupBy("lang").agg(
        (F.count(F.lit(1)) / NGRAM_MAX).cast("bigint").alias("n_pairs"),
        *[
            F.expr(
                f"CAST(CASE WHEN SUM(CASE WHEN n = {n} THEN cand_tot"
                f" ELSE 0 END) = 0 THEN 0 ELSE"
                f" SUM(CASE WHEN n = {n} THEN num ELSE 0 END) * 1000000"
                f" div SUM(CASE WHEN n = {n} THEN cand_tot ELSE 0 END)"
                f" END AS BIGINT)"
            ).alias(f"p{n}_ppm")
            for n in range(1, NGRAM_MAX + 1)
        ],
        F.expr(
            "CAST(SUM(CASE WHEN n = 1 THEN ref_tot ELSE 0 END)"
            " AS BIGINT)"
        ).alias("ref_tokens"),
        F.expr(
            "CAST(SUM(CASE WHEN n = 1 THEN cand_tot ELSE 0 END)"
            " AS BIGINT)"
        ).alias("cand_tokens"),
    )
    # (p1*p2*p3*p4)^(1/4) via two nested adjusted isqrts; the inner
    # one squares its candidate in DECIMAL (s ~ 1e12 would overflow a
    # BIGINT square).
    return (
        wide.withColumn(
            "_prod",
            F.expr(
                "CAST(p1_ppm AS DECIMAL(38,0)) * p2_ppm * p3_ppm"
                " * p4_ppm"
            ),
        )
        .withColumn(
            "_s0",
            F.expr(
                "CAST(FLOOR(SQRT(CAST(_prod AS DOUBLE))) AS BIGINT)"
            ),
        )
        .withColumn(
            "_r2",
            F.expr(
                "CASE WHEN (CAST(_s0 AS DECIMAL(38,0)) + 1)"
                " * (_s0 + 1) <= _prod THEN _s0 + 1"
                " WHEN CAST(_s0 AS DECIMAL(38,0)) * _s0 > _prod"
                " THEN _s0 - 1 ELSE _s0 END"
            ),
        )
        .withColumn(
            "_t0",
            F.expr("CAST(FLOOR(SQRT(CAST(_r2 AS DOUBLE))) AS BIGINT)"),
        )
        .select(
            "lang",
            "n_pairs",
            "p1_ppm",
            "p2_ppm",
            "p3_ppm",
            "p4_ppm",
            "ref_tokens",
            "cand_tokens",
            F.expr(
                "CAST(CASE WHEN (_t0 + 1) * (_t0 + 1) <= _r2"
                " THEN _t0 + 1 WHEN _t0 * _t0 > _r2 THEN _t0 - 1"
                " ELSE _t0 END AS BIGINT)"
            ).alias("bleu_nbp_ppm"),
            (F.col("cand_tokens") >= F.col("ref_tokens")).alias(
                "bp_is_one"
            ),
        )
        .orderBy("lang")
    )


def eval_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected / maximum calibration error — the one-number rollup of
    ``evals.eval_calibration_bins``'s reliability diagram:
    ECE = sum_b n_b * |mean_score_b - pos_rate_b| / N (bin-count-
    weighted gap), MCE = max_b gap. Same deterministic pseudo-
    probability and decile binning as the bins query (evals.py:142),
    exact truncating integer arithmetic end to end. One scan into a
    10-row bin aggregate into one summary row — no window, map-side
    combinable."""
    from .evals import CAL_BINS, CAL_SOFT, PR_LABEL_MIN_TOKENS

    docs = load_table(spark, sf_dir, "documents")
    score = F.expr(
        f"CAST(n_chars AS BIGINT) * 1000000 div (n_chars + {CAL_SOFT})"
    )
    base = docs.select(
        score.alias("score_ppm"),
        (F.size(F.split(F.col("text"), " ")) >= PR_LABEL_MIN_TOKENS)
        .cast("int")
        .alias("label"),
    )
    bins = (
        base.select(
            F.expr(
                f"CAST(score_ppm * {CAL_BINS} div 1000000 AS INT)"
            ).alias("bin"),
            "score_ppm",
            "label",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("score_ppm").alias("sum_score"),
            F.sum("label").cast("bigint").alias("n_pos"),
        )
        .select(
            "n",
            F.expr(
                "abs(sum_score div n - n_pos * 1000000 div n)"
            ).alias("gap"),
        )
    )
    return bins.agg(
        F.sum("n").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.expr(
            "CAST(SUM(n * gap) div SUM(n) AS BIGINT)"
        ).alias("ece_ppm"),
        F.max("gap").cast("bigint").alias("mce_ppm"),
    )


QUERIES = {
    "eval_rouge_n": eval_rouge_n,
    "eval_bleu_corpus": eval_bleu_corpus,
    "eval_ece": eval_ece,
}


def _pair_overlap_sql(n_max: int) -> str:
    """Shared CTE prefix: pair x n grain clipped counts + totals."""
    return f"""
        ws AS (
            SELECT doc_id, string_split(text, ' ') AS w
            FROM documents),
        grams AS (
            SELECT doc_id, n,
                   array_to_string(w[i:i + n - 1], ' ') AS g,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM (
                SELECT doc_id, n.n AS n, w,
                       unnest(generate_series(1, len(w) - n.n + 1)) AS i
                FROM ws,
                     (SELECT unnest(generate_series(1, {n_max})) AS n) n
                WHERE len(w) >= n.n)
            GROUP BY doc_id, n, g),
        tot AS (
            SELECT doc_id, n, CAST(SUM(c) AS BIGINT) AS tot
            FROM grams GROUP BY doc_id, n),
        pairs AS (
            SELECT a.doc_id AS ref_id, b.doc_id AS cand_id,
                   a.lang AS lang
            FROM documents a
            JOIN documents b
              ON b.doc_id = a.doc_id + 1 AND b.lang = a.lang),
        ov AS (
            -- the gram-gram join carries the doc_id arithmetic
            -- (cand = ref + 1) so EVERY join order the optimizer picks
            -- is doc-selective; joining the two gram relations on
            -- (n, g) alone first would blow up quadratically on hot
            -- unigrams (observed: an 80 GB DuckDB spill at sf1)
            SELECT p.ref_id, p.cand_id, p.lang, r.n,
                   CAST(SUM(LEAST(r.c, cnd.c)) AS BIGINT) AS num
            FROM grams r
            JOIN grams cnd ON cnd.doc_id = r.doc_id + 1
                          AND cnd.n = r.n AND cnd.g = r.g
            JOIN pairs p ON p.ref_id = r.doc_id
            GROUP BY 1, 2, 3, 4),
        grid AS (
            SELECT p.*, n.n
            FROM pairs p,
                 (SELECT unnest(generate_series(1, {n_max})) AS n) n),
        po AS (
            SELECT g.lang, g.n, g.ref_id,
                   COALESCE(rt.tot, 0) AS ref_tot,
                   COALESCE(ct.tot, 0) AS cand_tot,
                   COALESCE(o.num, 0) AS num
            FROM grid g
            LEFT JOIN tot rt ON rt.doc_id = g.ref_id AND rt.n = g.n
            LEFT JOIN tot ct ON ct.doc_id = g.cand_id AND ct.n = g.n
            LEFT JOIN ov o ON o.ref_id = g.ref_id
                          AND o.cand_id = g.cand_id AND o.n = g.n)
    """


ORACLES = {
    "eval_rouge_n": (
        "WITH "
        + _pair_overlap_sql(2)
        + """
        SELECT lang, n,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(CASE WHEN SUM(ref_tot) = 0 THEN 0
                         ELSE SUM(num) * 1000000 // SUM(ref_tot)
                    END AS BIGINT) AS rouge_micro_ppm,
               CAST(CASE WHEN COUNT(*) FILTER (ref_tot > 0) = 0 THEN 0
                         ELSE SUM(num * 1000000 // ref_tot)
                                  FILTER (ref_tot > 0)
                              // COUNT(*) FILTER (ref_tot > 0)
                    END AS BIGINT) AS rouge_macro_ppm
        FROM po
        GROUP BY lang, n
        ORDER BY lang, n
    """
    ),
    "eval_bleu_corpus": (
        "WITH "
        + _pair_overlap_sql(NGRAM_MAX)
        + f"""
        , wide AS (
            SELECT lang,
                   CAST(COUNT(*) / {NGRAM_MAX} AS BIGINT) AS n_pairs,
    """
        + ",".join(
            f"""
                   CAST(CASE WHEN SUM(CASE WHEN n = {n} THEN cand_tot
                                  ELSE 0 END) = 0 THEN 0 ELSE
                        SUM(CASE WHEN n = {n} THEN num ELSE 0 END)
                            * 1000000
                            // SUM(CASE WHEN n = {n} THEN cand_tot
                                   ELSE 0 END)
                        END AS BIGINT) AS p{n}_ppm"""
            for n in range(1, NGRAM_MAX + 1)
        )
        + """,
                   CAST(SUM(CASE WHEN n = 1 THEN ref_tot ELSE 0 END)
                        AS BIGINT) AS ref_tokens,
                   CAST(SUM(CASE WHEN n = 1 THEN cand_tot ELSE 0 END)
                        AS BIGINT) AS cand_tokens
            FROM po GROUP BY lang),
        pr AS (
            SELECT *,
                   CAST(p1_ppm AS HUGEINT) * p2_ppm * p3_ppm * p4_ppm
                       AS prod,
                   CAST(FLOOR(SQRT(CAST(CAST(p1_ppm AS HUGEINT)
                        * p2_ppm * p3_ppm * p4_ppm AS DOUBLE)))
                        AS BIGINT) AS s0
            FROM wide),
        r2 AS (
            SELECT *,
                   CASE WHEN (CAST(s0 AS HUGEINT) + 1) * (s0 + 1)
                             <= prod THEN s0 + 1
                        WHEN CAST(s0 AS HUGEINT) * s0 > prod
                             THEN s0 - 1
                        ELSE s0 END AS rt2
            FROM pr),
        r4 AS (
            SELECT *,
                   CAST(FLOOR(SQRT(CAST(rt2 AS DOUBLE))) AS BIGINT)
                       AS t0
            FROM r2)
        SELECT lang, n_pairs, p1_ppm, p2_ppm, p3_ppm, p4_ppm,
               ref_tokens, cand_tokens,
               CAST(CASE WHEN (t0 + 1) * (t0 + 1) <= rt2 THEN t0 + 1
                         WHEN t0 * t0 > rt2 THEN t0 - 1
                         ELSE t0 END AS BIGINT) AS bleu_nbp_ppm,
               cand_tokens >= ref_tokens AS bp_is_one
        FROM r4
        ORDER BY lang
    """
    ),
}


def _ece_oracle() -> str:
    from .evals import CAL_BINS, CAL_SOFT, PR_LABEL_MIN_TOKENS

    return f"""
        WITH base AS (
            SELECT CAST(n_chars AS HUGEINT) * 1000000
                       // (n_chars + {CAL_SOFT}) AS score_ppm,
                   CAST(len(string_split(text, ' '))
                        >= {PR_LABEL_MIN_TOKENS} AS INTEGER) AS label
            FROM documents),
        g AS (
            SELECT CAST(score_ppm * {CAL_BINS} // 1000000 AS INTEGER)
                       AS bin,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(score_ppm) AS sum_score,
                   CAST(SUM(label) AS BIGINT) AS n_pos
            FROM base GROUP BY 1),
        gaps AS (
            SELECT n, ABS(sum_score // n - n_pos * 1000000 // n) AS gap
            FROM g)
        SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
               CAST(COUNT(*) AS BIGINT) AS n_bins,
               CAST(SUM(n * gap) // SUM(n) AS BIGINT) AS ece_ppm,
               CAST(MAX(gap) AS BIGINT) AS mce_ppm
        FROM gaps
    """


ORACLES["eval_ece"] = _ece_oracle()


# McNemar classifier pair: two cheap deterministic document-quality
# rules judged against the token-count label the PR/calibration evals
# use. A = long-word rule, B = char-length rule.
MCNEMAR_MAXWORD = 8
MCNEMAR_CHARS = 300


def eval_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar paired-classifier test per lang: discordant counts
    b (A right, B wrong) / c (A wrong, B right) and the continuity-
    corrected statistic (|b - c| - 1)^2 / (b + c) in milli — the
    standard "is classifier A actually better than B on the SAME
    examples" readout. One scan, lang-grain aggregate, exact integer
    arithmetic (module constants define the two rules)."""
    from .evals import PR_LABEL_MIN_TOKENS

    docs = load_table(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    truth = (F.size(ws) >= PR_LABEL_MIN_TOKENS).cast("int")
    a = (
        F.expr("array_max(transform(split(text, ' '), w -> length(w)))")
        >= MCNEMAR_MAXWORD
    ).cast("int")
    b = (F.col("n_chars") >= MCNEMAR_CHARS).cast("int")
    base = docs.select(
        "lang",
        (a == truth).cast("bigint").alias("a_ok"),
        (b == truth).cast("bigint").alias("b_ok"),
    )
    return (
        base.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(
                F.when(
                    (F.col("a_ok") == 1) & (F.col("b_ok") == 0), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("b_disc"),
            F.sum(
                F.when(
                    (F.col("a_ok") == 0) & (F.col("b_ok") == 1), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("c_disc"),
        )
        .select(
            "lang",
            "n_docs",
            "b_disc",
            "c_disc",
            F.expr(
                "CAST(CASE WHEN b_disc + c_disc = 0 THEN 0 ELSE"
                " CASE WHEN ABS(b_disc - c_disc) >= 1 THEN"
                " (ABS(b_disc - c_disc) - 1) * (ABS(b_disc - c_disc) - 1)"
                " * 1000 div (b_disc + c_disc) ELSE 0 END END AS BIGINT)"
            ).alias("mcnemar_milli"),
        )
        .orderBy("lang")
    )


QUERIES["eval_mcnemar"] = eval_mcnemar


def _mcnemar_oracle() -> str:
    from .evals import PR_LABEL_MIN_TOKENS

    return f"""
        WITH base AS (
            SELECT lang,
                   CAST((CAST(list_max(list_transform(
                             string_split(text, ' '),
                             w -> length(w))) >= {MCNEMAR_MAXWORD}
                         AS INTEGER)
                        = CAST(len(string_split(text, ' '))
                               >= {PR_LABEL_MIN_TOKENS} AS INTEGER))
                        AS BIGINT) AS a_ok,
                   CAST((CAST(n_chars >= {MCNEMAR_CHARS} AS INTEGER)
                        = CAST(len(string_split(text, ' '))
                               >= {PR_LABEL_MIN_TOKENS} AS INTEGER))
                        AS BIGINT) AS b_ok
            FROM documents)
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(*) FILTER (a_ok = 1 AND b_ok = 0) AS BIGINT)
                   AS b_disc,
               CAST(COUNT(*) FILTER (a_ok = 0 AND b_ok = 1) AS BIGINT)
                   AS c_disc,
               CAST(CASE WHEN COUNT(*) FILTER (a_ok = 1 AND b_ok = 0)
                              + COUNT(*) FILTER (a_ok = 0 AND b_ok = 1)
                              = 0 THEN 0 ELSE
                    CASE WHEN ABS(COUNT(*) FILTER (a_ok = 1 AND b_ok = 0)
                                  - COUNT(*) FILTER (a_ok = 0 AND b_ok = 1))
                              >= 1 THEN
                    (ABS(COUNT(*) FILTER (a_ok = 1 AND b_ok = 0)
                         - COUNT(*) FILTER (a_ok = 0 AND b_ok = 1)) - 1)
                    * (ABS(COUNT(*) FILTER (a_ok = 1 AND b_ok = 0)
                           - COUNT(*) FILTER (a_ok = 0 AND b_ok = 1)) - 1)
                    * 1000 // (COUNT(*) FILTER (a_ok = 1 AND b_ok = 0)
                               + COUNT(*) FILTER (a_ok = 0 AND b_ok = 1))
                    ELSE 0 END END AS BIGINT) AS mcnemar_milli
        FROM base
        GROUP BY lang
        ORDER BY lang
    """


ORACLES["eval_mcnemar"] = _mcnemar_oracle()


def eval_auc_delong(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeLong variance and 95% CI for the tie-aware ROC AUC
    (same score/label as ``evals2.eval_roc_auc``), per lang — the
    "is this AUC actually above chance" readout, exact end to end.

    Placement values stay integral by the doubled convention:
    per (lang, score) cell with p positives / q negatives,
    W10 = 2*cumneg_lt + q (so V10 = W10 / 2n0) and
    W01 = 2*cumpos_gt + p. With A = sum p*W10, B = sum p*W10^2,
    C = sum q*W01^2:  AUC = A / (2 n0 n1),
    Var = (B n1 - A^2) / (4 n0^2 n1^2 (n1-1))
        + (C n0 - A^2) / (4 n0^2 n1^2 (n0-1)),
    staged as T = (B n1 - A^2)*1e12 div (n1-1)
                + (C n0 - A^2)*1e12 div (n0-1);
    var_e12 = T div (4 n0^2 n1^2); se_ppm = isqrt(var_e12);
    ci = auc_ppm -/+ 196 * se_ppm div 100. Every division is
    non-negative (Cauchy-Schwarz gives B n1 >= A^2); NULL when either
    class has < 2 members. Overflow: B*n1*1e12 < 1e38 through ~sf30.

    Scale shape (100 TB): one scan to (lang, score) cells; both prefix
    windows run over the DISTINCT score support per lang (bounded by
    the n_chars domain — the eval_roc_auc regime); the final algebra
    is lang-grain."""
    from .evals import PR_LABEL_MIN_TOKENS
    from .corpus5 import _isqrt
    from .stats3 import _ddiv
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "lang",
        F.col("n_chars").alias("score"),
        (F.size(F.split(F.col("text"), " ")) >= PR_LABEL_MIN_TOKENS)
        .cast("int")
        .alias("label"),
    )
    cells = base.groupBy("lang", "score").agg(
        F.sum("label").cast("bigint").alias("p"),
        F.sum(1 - F.col("label")).cast("bigint").alias("q"),
    )
    w_lt = (
        W.partitionBy("lang")
        .orderBy("score")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    w_gt = (
        W.partitionBy("lang")
        .orderBy(F.desc("score"))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    placed = cells.select(
        "lang",
        "p",
        "q",
        (
            2 * F.coalesce(F.sum("q").over(w_lt), F.lit(0)) + F.col("q")
        ).alias("w10"),
        (
            2 * F.coalesce(F.sum("p").over(w_gt), F.lit(0)) + F.col("p")
        ).alias("w01"),
    )
    dd = "decimal(38,0)"
    agg = placed.groupBy("lang").agg(
        F.sum("p").cast("bigint").alias("n1"),
        F.sum("q").cast("bigint").alias("n0"),
        F.sum(F.col("p").cast(dd) * F.col("w10")).alias("a"),
        F.sum(
            F.col("p").cast(dd) * F.col("w10") * F.col("w10")
        ).alias("b"),
        F.sum(
            F.col("q").cast(dd) * F.col("w01") * F.col("w01")
        ).alias("c"),
    )
    staged = agg.select(
        "lang",
        "n1",
        "n0",
        F.expr(
            "CASE WHEN n1 = 0 OR n0 = 0 THEN NULL ELSE"
            " CAST(a * 1000000 div (2 * CAST(n0 AS DECIMAL(38,0)) * n1)"
            " AS BIGINT) END"
        ).alias("auc_ppm"),
        # Spark's ``div`` on DECIMAL returns LONG — these quotients pass
        # 2^63 at sf1, so each stage uses the stats3 _ddiv identity
        # ((x - x%y)/y stays DECIMAL; all operands positive here by
        # Cauchy-Schwarz).
        F.expr(
            "CASE WHEN n1 < 2 OR n0 < 2 THEN NULL ELSE CAST("
            + _ddiv(
                _ddiv("(b * n1 - a * a) * 1000000000000", "n1 - 1")
                + " + "
                + _ddiv("(c * n0 - a * a) * 1000000000000", "n0 - 1"),
                "4 * CAST(n0 AS DECIMAL(38,0)) * n0 * n1 * n1",
            )
            + " AS BIGINT) END"
        ).alias("var_e12"),
    )
    return (
        staged.withColumn("se_ppm", _isqrt(F.col("var_e12")))
        .select(
            "lang",
            F.col("n1").alias("n_pos"),
            F.col("n0").alias("n_neg"),
            "auc_ppm",
            "var_e12",
            "se_ppm",
            F.expr(
                "CASE WHEN var_e12 IS NULL THEN NULL"
                " ELSE auc_ppm - 196 * se_ppm div 100 END"
            ).alias("ci_lo_ppm"),
            F.expr(
                "CASE WHEN var_e12 IS NULL THEN NULL"
                " ELSE auc_ppm + 196 * se_ppm div 100 END"
            ).alias("ci_hi_ppm"),
        )
        .orderBy("lang")
    )


QUERIES["eval_auc_delong"] = eval_auc_delong


def _delong_oracle() -> str:
    from .evals import PR_LABEL_MIN_TOKENS

    return f"""
        WITH base AS (
            SELECT lang, n_chars AS score,
                   CAST(len(string_split(text, ' '))
                        >= {PR_LABEL_MIN_TOKENS} AS INTEGER) AS label
            FROM documents),
        cells AS (
            SELECT lang, score,
                   CAST(SUM(label) AS BIGINT) AS p,
                   CAST(SUM(1 - label) AS BIGINT) AS q
            FROM base GROUP BY 1, 2),
        placed AS (
            SELECT lang, p, q,
                   2 * COALESCE(SUM(q) OVER (PARTITION BY lang
                       ORDER BY score
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) + q AS w10,
                   2 * COALESCE(SUM(p) OVER (PARTITION BY lang
                       ORDER BY score DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) + p AS w01
            FROM cells),
        agg AS (
            SELECT lang,
                   CAST(SUM(p) AS BIGINT) AS n1,
                   CAST(SUM(q) AS BIGINT) AS n0,
                   SUM(CAST(p AS HUGEINT) * w10) AS a,
                   SUM(CAST(p AS HUGEINT) * w10 * w10) AS b,
                   SUM(CAST(q AS HUGEINT) * w01 * w01) AS c
            FROM placed GROUP BY 1),
        staged AS (
            SELECT lang, n1, n0,
                   CASE WHEN n1 = 0 OR n0 = 0 THEN NULL ELSE
                        CAST(a * 1000000
                             // (2 * CAST(n0 AS HUGEINT) * n1)
                             AS BIGINT) END AS auc_ppm,
                   CASE WHEN n1 < 2 OR n0 < 2 THEN NULL ELSE
                        CAST(((b * n1 - a * a) * 1000000000000
                              // (n1 - 1)
                              + (c * n0 - a * a) * 1000000000000
                              // (n0 - 1))
                             // (4 * CAST(n0 AS HUGEINT) * n0
                                 * n1 * n1) AS BIGINT) END AS var_e12
            FROM agg),
        sq AS (
            SELECT *, CAST(FLOOR(SQRT(CAST(var_e12 AS DOUBLE)))
                           AS BIGINT) AS s0
            FROM staged),
        root AS (
            SELECT *, CASE WHEN var_e12 IS NULL THEN NULL
                           WHEN (s0 + 1) * (s0 + 1) <= var_e12
                               THEN s0 + 1
                           WHEN s0 * s0 > var_e12 THEN s0 - 1
                           ELSE s0 END AS se_ppm
            FROM sq)
        SELECT lang, n1 AS n_pos, n0 AS n_neg, auc_ppm, var_e12,
               se_ppm,
               CASE WHEN var_e12 IS NULL THEN NULL
                    ELSE auc_ppm - 196 * se_ppm // 100 END AS ci_lo_ppm,
               CASE WHEN var_e12 IS NULL THEN NULL
                    ELSE auc_ppm + 196 * se_ppm // 100 END AS ci_hi_ppm
        FROM root
        ORDER BY lang
    """


ORACLES["eval_auc_delong"] = _delong_oracle()


BT_ITERS = 4


def eval_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry strength fit over pairwise cross-lang "matches" —
    the arena-style ranking readout. Matches are adjacent-id DIFFERENT-
    lang document pairs; the longer document (whitespace tokens) wins,
    exact ties are discarded (pinned convention). ``BT_ITERS`` Zermelo
    minorization steps in exact staged integers:

    d_i = sum_j n_ij * 1e12 div (p_i + p_j)   (one truncation per
    opponent), p_i' = W_i * 1e12 div d_i — strengths stay on the ppm
    scale (uniform 1e6 start). The item domain (langs) is a plan
    constant, so the fit folds on the DRIVER over the bounded win
    matrix (the KM/Markov bounded-driver-read class); the expensive
    part — building the match results — is one doc-pair join plus a
    matrix-sized aggregate. The oracle unrolls the same iterations as
    a CTE chain. Items with zero wins fix at 0 (their d would still
    be positive; W=0 ends them at 0 — documented degenerate case).

    Reference scope note: the reference has no analytics surface
    (src/migrate/table_migrator.rs:43-114).
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(F.split(F.col("text"), " ")).alias("nt")
    )
    matches = (
        docs.alias("a")
        .join(
            docs.alias("b"),
            (F.col("b.doc_id") == F.col("a.doc_id") + 1)
            & (F.col("b.lang") != F.col("a.lang")),
        )
        .filter(F.col("a.nt") != F.col("b.nt"))
        .select(
            F.when(
                F.col("a.nt") > F.col("b.nt"), F.col("a.lang")
            )
            .otherwise(F.col("b.lang"))
            .alias("winner"),
            F.when(
                F.col("a.nt") > F.col("b.nt"), F.col("b.lang")
            )
            .otherwise(F.col("a.lang"))
            .alias("loser"),
        )
    )
    cells = matches.groupBy("winner", "loser").agg(
        F.count(F.lit(1)).cast("bigint").alias("w")
    )
    rows = cells.collect()  # bounded: |langs|^2 cells
    wins = {}
    for r in rows:
        wins[(r.winner, r.loser)] = r.w
    items = sorted({a for a, _ in wins} | {b for _, b in wins})
    n_ij = {
        (i, j): wins.get((i, j), 0) + wins.get((j, i), 0)
        for i in items
        for j in items
        if i != j
    }
    w_tot = {
        i: sum(wins.get((i, j), 0) for j in items if j != i)
        for i in items
    }
    p = {i: 1_000_000 for i in items}
    for _ in range(BT_ITERS):
        d = {
            i: sum(
                n_ij[(i, j)] * 10**12 // (p[i] + p[j])
                for j in items
                if j != i and n_ij[(i, j)] > 0 and p[i] + p[j] > 0
            )
            for i in items
        }
        p = {
            i: (w_tot[i] * 10**12 // d[i]) if d[i] > 0 else 0
            for i in items
        }
    out = [
        (
            i,
            w_tot[i],
            sum(wins.get((j, i), 0) for j in items if j != i),
            p[i],
        )
        for i in items
    ]
    return spark.createDataFrame(
        out,
        "lang string, n_wins bigint, n_losses bigint,"
        " bt_strength_ppm bigint",
    ).orderBy("lang")


QUERIES["eval_bradley_terry"] = eval_bradley_terry


def _bt_oracle() -> str:
    steps = []
    for t in range(1, BT_ITERS + 1):
        steps.append(f"""
        d{t} AS (
            SELECT n.i,
                   CAST(SUM(n.n * 1000000000000
                            // (pi.v + pj.v)) AS HUGEINT) AS d
            FROM nmat n
            JOIN p{t - 1} pi ON pi.lang = n.i
            JOIN p{t - 1} pj ON pj.lang = n.j
            WHERE pi.v + pj.v > 0
            GROUP BY n.i),
        p{t} AS (
            SELECT w.lang,
                   CAST(CASE WHEN d.d > 0
                        THEN w.w_tot * 1000000000000 // d.d
                        ELSE 0 END AS BIGINT) AS v
            FROM wtot w
            LEFT JOIN d{t} d ON d.i = w.lang)""")
    k = BT_ITERS
    return (
        """
        WITH docs AS (
            SELECT doc_id, lang,
                   len(string_split(text, ' ')) AS nt
            FROM documents),
        matches AS (
            SELECT CASE WHEN a.nt > b.nt THEN a.lang ELSE b.lang END
                       AS winner,
                   CASE WHEN a.nt > b.nt THEN b.lang ELSE a.lang END
                       AS loser
            FROM docs a
            JOIN docs b ON b.doc_id = a.doc_id + 1
                       AND b.lang != a.lang
            WHERE a.nt != b.nt),
        wins AS (
            SELECT winner, loser, CAST(COUNT(*) AS BIGINT) AS w
            FROM matches GROUP BY 1, 2),
        items AS (
            SELECT DISTINCT lang FROM (
                SELECT winner AS lang FROM wins
                UNION SELECT loser FROM wins)),
        nmat AS (
            SELECT a.lang AS i, b.lang AS j,
                   COALESCE(w1.w, 0) + COALESCE(w2.w, 0) AS n
            FROM items a JOIN items b ON a.lang != b.lang
            LEFT JOIN wins w1 ON w1.winner = a.lang
                             AND w1.loser = b.lang
            LEFT JOIN wins w2 ON w2.winner = b.lang
                             AND w2.loser = a.lang
            WHERE COALESCE(w1.w, 0) + COALESCE(w2.w, 0) > 0),
        wtot AS (
            SELECT i.lang,
                   CAST(COALESCE(SUM(w.w), 0) AS BIGINT) AS w_tot
            FROM items i LEFT JOIN wins w ON w.winner = i.lang
            GROUP BY i.lang),
        p0 AS (
            SELECT lang, CAST(1000000 AS BIGINT) AS v FROM items),"""
        + ",".join(steps)
        + f"""
        SELECT i.lang,
               wt.w_tot AS n_wins,
               CAST(COALESCE((SELECT SUM(w) FROM wins
                              WHERE loser = i.lang), 0) AS BIGINT)
                   AS n_losses,
               p.v AS bt_strength_ppm
        FROM items i
        JOIN wtot wt ON wt.lang = i.lang
        JOIN p{k} p ON p.lang = i.lang
        ORDER BY i.lang
    """
    )


ORACLES["eval_bradley_terry"] = _bt_oracle()
