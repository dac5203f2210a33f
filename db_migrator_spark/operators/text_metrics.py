"""Readability scoring (round 8).

The reference has no text surface (scope:
/root/reference/src/migrate/table_migrator.rs:43-114); this extends the
text-analysis family (stats, lang-id, quality, tokens, Gopher/C4) with
the standard readability grade a corpus-quality pipeline bins documents
by.

Coleman-Liau is chosen over Flesch precisely because it needs NO
syllable counting and NO logarithms: CLI = 0.0588*L - 0.296*S - 15.8
with L = letters per 100 words and S = sentences per 100 words — a
single rational function of three counts, so the whole metric is exact
integer micros: cli_micro = (5880000*letters - 29600000*sents
- 15800000*words) div words. Both engines truncate integer division
identically (Spark `div` == DuckDB `//`, verified on negatives in
tests/test_exact_primitives.py), so even negative grades (degenerate
docs) hash-match.

Scale notes (100 TB): pure per-row column expressions (length /
translate / split) — whole-stage codegen, zero shuffle for the per-doc
scores; the grade histogram is one map-side-combined groupBy with
bucket-count output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table

# Coleman-Liau coefficients scaled to micros (0.0588*100, 0.296*100,
# 15.8 — exact decimal literals, no floats anywhere).
CLI_L_MICRO = 5_880_000
CLI_S_MICRO = 29_600_000
CLI_C_MICRO = 15_800_000


def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Coleman-Liau readability: letter/word/sentence
    counts, the exact micro grade, and the whole-grade band (clamped to
    [0, 20], the conventional dashboard range)."""
    docs = load_table(spark, sf_dir, "documents")
    letters = F.length(F.translate(F.col("text"), " .,!?;:'\"", ""))
    words = F.size(F.split(F.col("text"), " "))
    sents = F.greatest(
        F.lit(1),
        F.length(F.col("text"))
        - F.length(F.translate(F.col("text"), ".!?", "")),
    )
    base = docs.select(
        "doc_id",
        letters.cast("bigint").alias("n_letters"),
        words.cast("bigint").alias("n_words"),
        sents.cast("bigint").alias("n_sentences"),
    )
    scored = base.select(
        "*",
        F.expr(
            f"({CLI_L_MICRO} * n_letters - {CLI_S_MICRO} * n_sentences"
            f" - {CLI_C_MICRO} * n_words) div n_words"
        ).alias("cli_micro"),
    )
    return scored.select(
        "*",
        F.greatest(
            F.lit(0).cast("bigint"),
            F.least(
                F.lit(20).cast("bigint"), F.expr("cli_micro div 1000000")
            ),
        ).alias("grade_band"),
    ).orderBy("doc_id")


ZIPF_TOP_K = 20


def text_zipf_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law audit of the corpus vocabulary: the top
    ``ZIPF_TOP_K`` terms with frequency rank (ties to the
    lexicographically smaller term), count, the rank x count product
    (constant under ideal Zipf), and its exact-ppm deviation from the
    rank-1 product. A corpus whose products collapse or explode has a
    degenerate token distribution (boilerplate floods or shattered
    vocab) — the one-glance tokenizer-health check.

    One term-count aggregate, a TakeOrdered top-K, and a broadcast
    rank-1 scalar — log-free by construction (products, not slopes).
    """
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .orderBy(F.desc("cnt"), "term")
        .limit(ZIPF_TOP_K)
    )
    ranked = counts.select(
        "term",
        "cnt",
        F.row_number()
        .over(W.orderBy(F.desc("cnt"), "term"))
        .cast("bigint")
        .alias("rank"),
    ).select("term", "rank", "cnt", (F.col("rank") * F.col("cnt")).alias("rank_cnt"))
    base = ranked.filter(F.col("rank") == 1).select(
        F.col("rank_cnt").alias("base_product")
    )
    return (
        ranked.crossJoin(F.broadcast(base))
        .select(
            "rank",
            "term",
            "cnt",
            "rank_cnt",
            F.expr(
                "(rank_cnt - base_product) * 1000000 div base_product"
            ).alias("zipf_dev_ppm"),
        )
        .orderBy("rank")
    )


def text_word_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document lexical diversity, log-free: token count, distinct
    vocabulary, type-token ratio in ppm, and the Gini-Simpson index
    1 - sum(p_w^2) — the diversity measure that stays RATIONAL
    (entropy needs log; Simpson is pure count arithmetic):
    simpson_ppm = (n^2 - sum(c_w^2)) * 1e6 div n^2. A low value flags
    boilerplate/repetition floods per doc — the per-document
    counterpart of the corpus-level Zipf audit above.

    Plan: one (doc_id, word) count aggregate, one doc rollup — both
    map-side combinable; the squared-count sum rides DECIMAL(38,0) so
    a pathological one-word giant doc can't wrap (c^2 <= 1e12 at a
    million-token doc, summed ~1e12 per doc, 1e6-scaled ~1e24).
    """
    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    per_doc = wc.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("sq"),
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        F.expr("n_distinct * 1000000 div n_tokens").alias("ttr_ppm"),
        F.expr(
            "CAST((CAST(n_tokens AS DECIMAL(38,0)) * n_tokens - sq)"
            " * 1000000 div (CAST(n_tokens AS DECIMAL(38,0)) * n_tokens)"
            " AS BIGINT)"
        ).alias("simpson_ppm"),
    ).orderBy("doc_id")


QUERIES = {
    "text_readability": text_readability,
    "text_zipf_check": text_zipf_check,
    "text_word_diversity": text_word_diversity,
}

ORACLES = {
    "text_word_diversity": """
        WITH wc AS (
            SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c
            FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS w
                  FROM documents)
            WHERE w != ''
            GROUP BY doc_id, w),
        per_doc AS (
            SELECT doc_id,
                   CAST(SUM(c) AS BIGINT) AS n_tokens,
                   CAST(COUNT(*) AS BIGINT) AS n_distinct,
                   SUM(CAST(c AS HUGEINT) * c) AS sq
            FROM wc GROUP BY doc_id)
        SELECT doc_id, n_tokens, n_distinct,
               n_distinct * 1000000 // n_tokens AS ttr_ppm,
               CAST((CAST(n_tokens AS HUGEINT) * n_tokens - sq) * 1000000
                    // (CAST(n_tokens AS HUGEINT) * n_tokens) AS BIGINT)
                   AS simpson_ppm
        FROM per_doc
        ORDER BY doc_id
    """,
    "text_zipf_check": f"""
        WITH counts AS (
            SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM (SELECT unnest(string_split(text, ' ')) AS term
                  FROM documents)
            WHERE term != ''
            GROUP BY term
            ORDER BY cnt DESC, term
            LIMIT {ZIPF_TOP_K}),
        ranked AS (
            SELECT term, cnt,
                   CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, term)
                        AS BIGINT) AS rank
            FROM counts),
        prod AS (
            SELECT term, rank, cnt, rank * cnt AS rank_cnt FROM ranked),
        base AS (
            SELECT rank_cnt AS base_product FROM prod WHERE rank = 1)
        SELECT rank, term, cnt, rank_cnt,
               (rank_cnt - base_product) * 1000000 // base_product
                   AS zipf_dev_ppm
        FROM prod, base
        ORDER BY rank
    """,
    "text_readability": f"""
        WITH base AS (
            SELECT doc_id,
                   CAST(len(translate(text, ' .,!?;:''"', '')) AS BIGINT)
                       AS n_letters,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
                   CAST(GREATEST(1, len(text) - len(translate(text, '.!?', '')))
                        AS BIGINT) AS n_sentences
            FROM documents)
        SELECT doc_id, n_letters, n_words, n_sentences,
               ({CLI_L_MICRO} * n_letters - {CLI_S_MICRO} * n_sentences
                - {CLI_C_MICRO} * n_words) // n_words AS cli_micro,
               GREATEST(CAST(0 AS BIGINT), LEAST(CAST(20 AS BIGINT),
                   (({CLI_L_MICRO} * n_letters - {CLI_S_MICRO} * n_sentences
                     - {CLI_C_MICRO} * n_words) // n_words) // 1000000))
                   AS grade_band
        FROM base
        ORDER BY doc_id
    """,
}


# Boilerplate spans: shared leading/trailing K-token spans mark
# template headers/footers (license banners, nav chrome) — the
# standard pre-dedup cleanup pass on crawled corpora. A span counts as
# boilerplate when at least BOILER_MIN_DOCS documents share it.
BOILER_K = 3
BOILER_MIN_DOCS = 2


def text_boilerplate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated K-token document prefixes/suffixes (module constant
    ``BOILER_K``): spans shared by >= ``BOILER_MIN_DOCS`` docs, with
    doc count, lang spread, and corpus share in ppm.

    Scale shape (100 TB): two per-row span projections (head/tail
    token slices — whole-stage codegen), one UNION, one map-side-
    combined groupBy(kind, span); the total-docs denominator is a
    broadcast 1-row aggregate. Output is bounded by the distinct
    boilerplate-span count. No window, no explode (the slice keeps
    one row per doc per side)."""
    docs = load_table(spark, sf_dir, "documents")
    ws = docs.select(
        "doc_id", "lang", F.split(F.col("text"), " ").alias("ws")
    ).filter(F.size("ws") >= BOILER_K)
    head = ws.select(
        "doc_id",
        "lang",
        F.lit("prefix").alias("kind"),
        F.expr(f"array_join(slice(ws, 1, {BOILER_K}), ' ')").alias("span"),
    )
    tail = ws.select(
        "doc_id",
        "lang",
        F.lit("suffix").alias("kind"),
        F.expr(
            f"array_join(slice(ws, size(ws) - {BOILER_K} + 1,"
            f" {BOILER_K}), ' ')"
        ).alias("span"),
    )
    total = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs_all"))
    return (
        head.unionAll(tail)
        .groupBy("kind", "span")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count_distinct("lang").cast("bigint").alias("n_langs"),
        )
        .filter(F.col("n_docs") >= BOILER_MIN_DOCS)
        .crossJoin(F.broadcast(total))
        .select(
            "kind",
            "span",
            "n_docs",
            "n_langs",
            F.expr("n_docs * 1000000 div n_docs_all").alias("share_ppm"),
        )
        .orderBy(F.desc("n_docs"), "kind", "span")
    )


QUERIES["text_boilerplate_spans"] = text_boilerplate_spans

ORACLES["text_boilerplate_spans"] = f"""
    WITH ws AS (
        SELECT doc_id, lang, string_split(text, ' ') AS w
        FROM documents),
    spans AS (
        SELECT doc_id, lang, 'prefix' AS kind,
               array_to_string(w[1:{BOILER_K}], ' ') AS span
        FROM ws WHERE len(w) >= {BOILER_K}
        UNION ALL
        SELECT doc_id, lang, 'suffix',
               array_to_string(w[len(w) - {BOILER_K} + 1:len(w)], ' ')
        FROM ws WHERE len(w) >= {BOILER_K}),
    total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs_all
              FROM documents),
    g AS (
        SELECT kind, span,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
        FROM spans GROUP BY 1, 2)
    SELECT kind, span, n_docs, n_langs,
           n_docs * 1000000 // n_docs_all AS share_ppm
    FROM g, total
    WHERE n_docs >= {BOILER_MIN_DOCS}
    ORDER BY n_docs DESC, kind, span
"""


# Winnowing (MOSS-style) fingerprint selection: k-token grams hashed
# to 32-bit ints (md5 prefix, the cross-engine idiom), then one
# fingerprint selected per sliding window of WINNOW_W consecutive
# k-grams — the minimum hash, rightmost position on ties (robust
# winnowing). Guarantee: any shared run of >= WINNOW_K + WINNOW_W - 1
# tokens between two docs shares at least one selected fingerprint.
WINNOW_K = 4
WINNOW_W = 4


def text_winnowing_fingerprints(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Winnowed k-gram fingerprints per document (module constants):
    the selected (position, hash32) pairs a plagiarism/overlap index
    stores, ~1/WINNOW_W of the k-gram stream.

    Scale shape (100 TB): k-gram explode is linear in tokens; the
    window minimum runs DOC-KEYED (doc_id is a data-sized key with
    constant-bounded group width — the fully-parallel regime, one row
    group per doc, never a global or constant-domain window). The
    rightmost-min selection is a bounded-width (WINNOW_W) range
    self-join on (doc, pos) — row-local fan-out of at most W per
    window start — then a distinct. Docs shorter than
    WINNOW_K + WINNOW_W - 1 tokens yield no fingerprint (documented;
    the winnowing guarantee is vacuous below one full window)."""
    docs = load_table(spark, sf_dir, "documents")
    ws = docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("ws")
    ).filter(F.size("ws") >= WINNOW_K)
    kg = ws.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, size(ws) - {WINNOW_K} + 1),"
                f" i -> array_join(slice(ws, i, {WINNOW_K}), ' '))"
            )
        ).alias("pos0", "g"),
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),
        F.expr(
            "CAST(conv(substring(md5(g), 1, 8), 16, 10) AS BIGINT)"
        ).alias("h"),
    )
    from pyspark.sql.window import Window as W

    fwd = (
        W.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(0, WINNOW_W - 1)
    )
    starts = (
        kg.select(
            "doc_id",
            "pos",
            F.min("h").over(fwd).alias("mv"),
            F.max("pos").over(W.partitionBy("doc_id")).alias("mpos"),
        )
        .filter(F.col("pos") <= F.col("mpos") - WINNOW_W + 1)
        .select("doc_id", F.col("pos").alias("s"), "mv")
    )
    sel = (
        starts.join(
            kg.select(
                F.col("doc_id").alias("doc_id2"),
                F.col("pos").alias("p2"),
                F.col("h").alias("h2"),
            ),
            (F.col("doc_id2") == F.col("doc_id"))
            & (F.col("p2") >= F.col("s"))
            & (F.col("p2") <= F.col("s") + WINNOW_W - 1)
            & (F.col("h2") == F.col("mv")),
        )
        .groupBy("doc_id", "s", "mv")
        .agg(F.max("p2").alias("sel_pos"))
        .select("doc_id", "sel_pos", F.col("mv").alias("fp_hash32"))
        .distinct()
    )
    return sel.orderBy("doc_id", "sel_pos")


QUERIES["text_winnowing_fingerprints"] = text_winnowing_fingerprints

ORACLES["text_winnowing_fingerprints"] = f"""
    WITH ws AS (
        SELECT doc_id, string_split(text, ' ') AS w
        FROM documents WHERE len(string_split(text, ' ')) >= {WINNOW_K}),
    kg AS (
        SELECT doc_id, i AS pos,
               CAST(from_hex(substr(md5(
                   array_to_string(w[i:i + {WINNOW_K} - 1], ' ')),
                   1, 8))::BIT::UINTEGER AS BIGINT) AS h
        FROM (SELECT doc_id, w,
                     unnest(generate_series(1, len(w) - {WINNOW_K} + 1))
                         AS i
              FROM ws)),
    starts AS (
        SELECT doc_id, pos AS s,
               MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW
                            AND {WINNOW_W} - 1 FOLLOWING) AS mv,
               MAX(pos) OVER (PARTITION BY doc_id) AS mpos
        FROM kg
        QUALIFY pos <= mpos - {WINNOW_W} + 1),
    sel AS (
        SELECT DISTINCT st.doc_id, MAX(k2.pos) AS sel_pos, st.mv
        FROM starts st
        JOIN kg k2 ON k2.doc_id = st.doc_id
                  AND k2.pos BETWEEN st.s AND st.s + {WINNOW_W} - 1
                  AND k2.h = st.mv
        GROUP BY st.doc_id, st.s, st.mv)
    SELECT DISTINCT doc_id, sel_pos, mv AS fp_hash32
    FROM sel
    ORDER BY doc_id, sel_pos
"""


# RAKE keyword extraction: candidate phrases are maximal runs of
# non-stopword tokens; a word scores degree/frequency (degree = total
# length of phrases containing it), a phrase scores the sum of its
# word scores. The stopword list is pinned (English function words —
# non-English docs simply yield longer phrases, deterministically).
RAKE_STOP = (
    "the a an and or but of to in on for with at by from as is are was"
    " were be been it its this that these those not no"
).split()
RAKE_MAX_WORDS = 4
RAKE_TOP_K = 50


def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``RAKE_TOP_K`` RAKE keyword phrases across the corpus
    (module constants): phrase, occurrence count, and the exact
    integer RAKE score (word degree/frequency ratios in milli,
    truncating — documented convention; word stats count phrase
    occurrences corpus-wide with multiplicity).

    Scale shape (100 TB): one token explode (linear); phrase assembly
    is a DOC-KEYED gaps-and-islands window (fully parallel, the
    winnowing regime) with order-safe array_sort assembly; word stats
    and the phrase-score join are word-keyed shuffles; the final
    top-K is TakeOrderedAndProject. Phrases cap at RAKE_MAX_WORDS."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window as W

    stop_list = ", ".join(f"'{w}'" for w in RAKE_STOP)
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col("text")), " ")).alias(
            "pos", "w"
        ),
    ).filter(F.col("w") != "")
    nonstop = toks.filter(~F.expr(f"w IN ({stop_list})"))
    wisl = W.partitionBy("doc_id").orderBy("pos")
    islands = nonstop.select(
        "doc_id",
        "pos",
        "w",
        (F.col("pos") - F.row_number().over(wisl)).alias("isl"),
    )
    phrases = (
        islands.groupBy("doc_id", "isl")
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list("
                "struct(pos, w))), x -> x.w), ' ')"
            ).alias("phrase"),
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
        )
        .filter(F.col("n_words") <= RAKE_MAX_WORDS)
    )
    pw = phrases.select(
        "phrase",
        "n_words",
        F.explode(F.split(F.col("phrase"), " ")).alias("w"),
    )
    wstats = pw.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("freq"),
        F.sum("n_words").cast("bigint").alias("degree"),
    )
    # score is identical for every occurrence of the same phrase
    # string (same words -> same word stats); counting occurrences
    # needs the phrase grain BEFORE the word explode. A word repeated
    # WITHIN one phrase scores once (DISTINCT phrase-word pairs) —
    # pinned convention.
    counts = phrases.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences")
    )
    per_word = (
        pw.select("phrase", "w")
        .distinct()
        .join(wstats, "w")
        .groupBy("phrase")
        .agg(
            F.sum(F.expr("degree * 1000 div freq"))
            .cast("bigint")
            .alias("score_milli")
        )
    )
    return (
        counts.join(per_word, "phrase")
        .select("phrase", "n_occurrences", "score_milli")
        .orderBy(F.desc("score_milli"), F.desc("n_occurrences"), "phrase")
        .limit(RAKE_TOP_K)
    )


QUERIES["text_rake_keywords"] = text_rake_keywords

ORACLES["text_rake_keywords"] = f"""
    WITH toks AS (
        SELECT doc_id, i AS pos, w[i] AS w
        FROM (SELECT doc_id, string_split(lower(text), ' ') AS w,
                     unnest(generate_series(1, len(string_split(
                         lower(text), ' ')))) AS i
              FROM documents)
        WHERE w[i] != ''),
    nonstop AS (
        SELECT doc_id, pos, w,
               pos - ROW_NUMBER() OVER (PARTITION BY doc_id
                                        ORDER BY pos) AS isl
        FROM toks
        WHERE w NOT IN ({", ".join(f"'{w}'" for w in RAKE_STOP)})),
    phrases AS (
        SELECT doc_id, isl,
               string_agg(w, ' ' ORDER BY pos) AS phrase,
               CAST(COUNT(*) AS BIGINT) AS n_words
        FROM nonstop GROUP BY doc_id, isl
        HAVING COUNT(*) <= {RAKE_MAX_WORDS}),
    pw AS (
        SELECT phrase, n_words, unnest(string_split(phrase, ' ')) AS w
        FROM phrases),
    wstats AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS freq,
               CAST(SUM(n_words) AS BIGINT) AS degree
        FROM pw GROUP BY w),
    counts AS (
        SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences
        FROM phrases GROUP BY phrase),
    per_word AS (
        SELECT p.phrase,
               CAST(SUM(s.degree * 1000 // s.freq) AS BIGINT)
                   AS score_milli
        FROM (SELECT DISTINCT phrase, w FROM pw) p
        JOIN wstats s ON s.w = p.w
        GROUP BY p.phrase)
    SELECT c.phrase, c.n_occurrences, p.score_milli
    FROM counts c JOIN per_word p USING (phrase)
    ORDER BY p.score_milli DESC, c.n_occurrences DESC, c.phrase
    LIMIT {RAKE_TOP_K}
"""


# Edit-distance near-dup audit: capped-prefix Levenshtein between
# adjacent same-lang documents. The cap bounds the O(len^2) DP cell
# count per pair — the standard budget trick before an exact distance
# on long documents.
EDIT_PREFIX_CHARS = 200


def text_edit_distance_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Levenshtein distance on ``EDIT_PREFIX_CHARS``-char prefixes of
    adjacent-id same-lang document pairs, with the normalized
    similarity 1 - d/max_len in exact ppm — the character-level
    near-dup metric beside the token-level Jaccard family. Both
    engines ship the same classical DP (Spark ``levenshtein``, DuckDB
    ``levenshtein``), so the surface is bit-exact without porting it.

    Scale shape (100 TB): one doc-pair join keyed doc_id+1 (the BLEU
    pairing shape); the DP cost per row is the capped prefix square —
    a plan constant. No window, no explode."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.substring(F.col("text"), 1, EDIT_PREFIX_CHARS).alias("pre"),
    )
    return (
        docs.alias("a")
        .join(
            docs.alias("b"),
            (F.col("b.doc_id") == F.col("a.doc_id") + 1)
            & (F.col("b.lang") == F.col("a.lang")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.lang").alias("lang"),
            F.levenshtein(F.col("a.pre"), F.col("b.pre")).cast(
                "bigint"
            ).alias("edit_distance"),
            F.greatest(
                F.length("a.pre"), F.length("b.pre")
            ).cast("bigint").alias("max_len"),
        )
        .select(
            "doc_a",
            "doc_b",
            "lang",
            "edit_distance",
            "max_len",
            F.expr(
                "CASE WHEN max_len = 0 THEN 1000000 ELSE"
                " (max_len - edit_distance) * 1000000 div max_len END"
            ).alias("similarity_ppm"),
        )
        .orderBy("doc_a")
    )


QUERIES["text_edit_distance_pairs"] = text_edit_distance_pairs

ORACLES["text_edit_distance_pairs"] = f"""
    WITH docs AS (
        SELECT doc_id, lang, substr(text, 1, {EDIT_PREFIX_CHARS}) AS pre
        FROM documents)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.lang,
           CAST(levenshtein(a.pre, b.pre) AS BIGINT) AS edit_distance,
           CAST(GREATEST(length(a.pre), length(b.pre)) AS BIGINT)
               AS max_len,
           CASE WHEN GREATEST(length(a.pre), length(b.pre)) = 0
                THEN 1000000
                ELSE (GREATEST(length(a.pre), length(b.pre))
                      - levenshtein(a.pre, b.pre)) * 1000000
                     // GREATEST(length(a.pre), length(b.pre)) END
               AS similarity_ppm
    FROM docs a
    JOIN docs b ON b.doc_id = a.doc_id + 1 AND b.lang = a.lang
    ORDER BY doc_a
"""
