"""Text-analysis operators over the ``documents`` table.

All hot-path logic is built-in column expressions (split / filter /
regexp / md5) — JVM-side, whole-stage-codegen'd, no Python in the loop —
so throughput scales with cores exactly like any projection. Each operator
has an exact ANSI-SQL oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import fan_out, load_table

# Per-language marker words for the n-gram/stopword language heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of"],
    "fr": ["le", "la", "et", "les"],
    "es": ["el", "los", "y", "de"],
    "de": ["der", "und", "die", "das"],
}


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring features: char/word counts, lexical diversity,
    average word length."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars_calc"),
        n_words.alias("n_words"),
        F.size(F.array_distinct(words)).alias("n_distinct_words"),
        (F.size(F.array_distinct(words)).cast("double") / n_words).alias("lexical_diversity"),
        ((F.length("text") - n_words + 1).cast("double") / n_words).alias("avg_word_len"),
    ).orderBy("doc_id")


def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID: count marker-word hits per language,
    argmax with a fixed priority order (en > fr > es > de > unknown)."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    scores = {
        lang: F.size(F.filter(words, lambda w: w.isin(*marks))).alias(f"score_{lang}")
        for lang, marks in LANG_MARKERS.items()
    }
    scored = docs.select("doc_id", "lang", *scores.values())
    best = F.greatest(*[F.col(f"score_{lang}") for lang in LANG_MARKERS])
    predicted = (
        F.when(best == 0, "unknown")
        .when(F.col("score_en") == best, "en")
        .when(F.col("score_fr") == best, "fr")
        .when(F.col("score_es") == best, "es")
        .otherwise("de")
    )
    return scored.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[f"score_{lang}" for lang in LANG_MARKERS],
        predicted.alias("predicted_lang"),
    ).orderBy("doc_id")


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 over whitespace-normalized lowercase text
    (the canonical near-exact-dedup key)."""
    docs = load_table(spark, sf_dir, "documents")
    normalized = F.lower(F.regexp_replace(F.col("text"), r"\s+", " "))
    return docs.select(
        "doc_id",
        F.md5(normalized.cast("binary")).alias("fingerprint"),
        F.length(normalized).alias("norm_len"),
    ).orderBy("doc_id")


def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and BPE-ish word/number
    fragments via regex."""
    docs = load_table(spark, sf_dir, "documents")
    ws_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    re_tokens = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[a-z0-9]+"), 0))
    return docs.select(
        "doc_id",
        ws_tokens.alias("n_ws_tokens"),
        re_tokens.alias("n_re_tokens"),
        (F.col("n_chars").cast("double") / re_tokens).alias("chars_per_token"),
    ).orderBy("doc_id")


def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-corpus quality gate: compose the stats into keep/drop with
    a reason column (the shape of every production corpus filter: cheap
    column predicates, single scan, no shuffle until the final ordering)."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    diversity = F.size(F.array_distinct(words)).cast("double") / n_words
    reason = (
        F.when(n_words < 20, "too_short")
        .when(n_words > 2000, "too_long")
        .when(diversity < 0.08, "low_diversity")
        .otherwise("keep")
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        diversity.alias("diversity"),
        reason.alias("verdict"),
        (reason == "keep").alias("kept"),
    ).orderBy("doc_id")


def dedup_filtered_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus prep: exact-dedup (keep min doc_id per normalized
    fingerprint) then quality-filter — the composed pipeline a training-data
    run executes, as one declarative plan (dedup shuffle on the hash, filter
    fused into the scan)."""
    docs = load_table(spark, sf_dir, "documents")
    normalized = F.lower(F.regexp_replace(F.col("text"), r"\s+", " "))
    w = F.split(F.col("text"), " ")
    keep = (
        docs.withColumn("fp", F.md5(normalized.cast("binary")))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return (
        docs.join(keep, "doc_id", "left_semi")
        .filter((F.size(w) >= 20) & (F.size(w) <= 2000))
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


def _hash_bucket(col, buckets: int = 100):
    """Deterministic content-hash bucket in [0, buckets): first 8 hex chars
    of md5 parsed as an integer. Identical in Spark
    (``conv(substr(md5(...)))``) and DuckDB (``('0x'||substr(...))::BIGINT``),
    so hash-based splits/samples are reproducible cross-engine — unlike
    TABLESAMPLE / ``.sample()``, whose RNG streams are engine-private.
    Hashing (vs key mod N) decorrelates the split from key assignment
    order, which for training data usually encodes time or source."""
    return (
        F.conv(F.substring(F.md5(col.cast("string").cast("binary")), 1, 8), 16, 10)
        .cast("bigint")
        % buckets
    )


def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/valid/test split of the corpus by
    doc_id hash; per split x language doc and whitespace-token counts.
    The split is a pure projection (no shuffle until the tiny aggregate)
    and any row's assignment is recomputable from its key alone — the
    property that lets a 100 TB corpus be split without a seed table."""
    docs = load_table(spark, sf_dir, "documents")
    b = _hash_bucket(F.col("doc_id"))
    split = (
        F.when(b < 80, "train").when(b < 90, "valid").otherwise("test")
    )
    return (
        docs.select(
            split.alias("split"),
            "lang",
            F.size(F.split(F.col("text"), " ")).alias("n_tok"),
        )
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
        )
        .orderBy("split", "lang")
    )


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-rebalancing stratified sample: dominant 'en' keeps 10%,
    rare 'zh' keeps 50%, the rest 25% — the standard corpus-rebalance
    move, as a deterministic hash filter. Reproducible (same rows every
    run, any engine), embarrassingly parallel (the per-row predicate
    evaluates inside the scan — no shuffle, no seed table)."""
    docs = load_table(spark, sf_dir, "documents")
    rate = (
        F.when(F.col("lang") == "en", F.lit(10))
        .when(F.col("lang") == "zh", F.lit(50))
        .otherwise(F.lit(25))
    )
    return (
        docs.filter(_hash_bucket(F.col("doc_id")) < rate)
        .select("doc_id", "source", "lang", "n_chars")
        .orderBy("doc_id")
    )


def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style redaction pass: long digit runs and email-shaped tokens
    are replaced with placeholder tags; per-doc match counts + a digest of
    the redacted text (raw redacted text stays executor-side — at 100 TB
    the rewritten corpus is a sink, not a driver result). All regexp
    built-ins — codegen, no Python."""
    # fan_out: four regex passes per row fuse into the 2-split scan at
    # sf1 (measured r15, ~2s/task serial); spread the narrow rows first.
    docs = fan_out(load_table(spark, sf_dir, "documents"), "doc_id")
    num_pat = r"\d{3,}"
    email_pat = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("text"), email_pat, "<EMAIL>"), num_pat, "<NUM>"
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(num_pat))).alias("n_num_runs"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(email_pat))).alias("n_emails"),
        F.md5(redacted.cast("binary")).alias("redacted_digest"),
        F.length(redacted).alias("redacted_len"),
    ).orderBy("doc_id")


def _tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, term) token stream — one narrow explode, no shuffle."""
    return docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).filter(F.col("term") != "")


def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 most distinctive terms per document by TF-IDF.

    IDF uses the rational form (N+1)/(df+1) instead of its logarithm:
    ln() is not IEEE-exactly specified and differs between libm
    implementations (JVM vs DuckDB), while +,*,/ are — so the rational
    variant is the cross-engine bit-exact choice and ranks terms
    identically (log is monotone).

    Plan shape: tokens -> (doc,term) count shuffle; df reuses that frame
    (a (doc,term) row set IS the distinct pairs) with a second groupBy on
    term, so the raw token stream is shuffled once. The tf->df join keys
    on term (vocabulary-sized — a shuffle join on purpose: at corpus scale
    the vocabulary with junk tokens is NOT broadcastable); N is a 1-row
    broadcast. Top-5 per doc is a row_number window partitioned by doc_id.
    ``localCheckpoint`` computes the tf frame once for its two consumers.
    """
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        _tokens(docs)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint()
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            (F.col("tf") * ((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))).alias(
                "tfidf"
            ),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .orderBy("doc_id", "rn")
    )


# BM25 constants (standard Okapi defaults) and a fixed keyword query. All
# literals are dyadic rationals (1.5, 0.75, 2.5, 0.5) so both engines parse
# them to identical doubles and every arithmetic step is IEEE-exact.
BM25_K1 = 1.5
BM25_B = 0.75
BM25_QUERY = ("spark", "join", "fast")


def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents for a fixed keyword query under BM25 ranking.

    The IDF factor is the rational (N - df + 0.5)/(df + 0.5) — same
    log-free cross-engine-exactness rationale as ``text_tfidf_topterms``.
    Per-term scores combine per doc by FIXED-ORDER addition (one
    conditional aggregate per query term, then s0+s1+s2): a SUM() over the
    term rows would add doubles in engine-dependent order.

    Plan shape: doc lengths are one groupBy on doc_id; the query-term tf
    is a second groupBy over the (tiny) filtered token stream; both join
    on doc_id. The global (N, avgdl) pair and the per-term df are 1-row /
    |query|-row broadcasts. Top-10 via TakeOrderedAndProject.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(docs)
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    # exact-decimal avgdl (order-independent sum), surfaced as double
    corpus = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum(F.col("dl").cast("decimal(25,6)")).cast("double") / F.count(F.lit(1))).alias(
            "avgdl"
        ),
    )
    tf = (
        toks.filter(F.col("term").isin(*BM25_QUERY))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    norm = F.col("tf") + F.lit(BM25_K1) * (
        F.lit(1.0 - BM25_B) + F.lit(BM25_B) * (F.col("dl") / F.col("avgdl"))
    )
    per_term = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            "term",
            (idf * (F.col("tf") * F.lit(BM25_K1 + 1.0)) / norm).alias("s"),
        )
    )
    slots = [
        F.max(F.when(F.col("term") == t, F.col("s"))).alias(f"s{i}")
        for i, t in enumerate(BM25_QUERY)
    ]
    combined = sum(
        (F.coalesce(F.col(f"s{i}"), F.lit(0.0)) for i in range(1, len(BM25_QUERY))),
        F.coalesce(F.col("s0"), F.lit(0.0)),
    )
    return (
        per_term.groupBy("doc_id")
        .agg(*slots, F.count(F.lit(1)).alias("n_terms_hit"))
        .select("doc_id", combined.alias("score"), "n_terms_hit")
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(10)
    )


QUERIES = {
    "text_tfidf_topterms": text_tfidf_topterms,
    "text_bm25_search": text_bm25_search,
    "text_stats": text_stats,
    "text_language_id": text_language_id,
    "text_fingerprint": text_fingerprint,
    "text_token_count": text_token_count,
    "text_quality_filter": text_quality_filter,
    "text_redact_pii": text_redact_pii,
    "dedup_filtered_corpus": dedup_filtered_corpus,
    "q_train_test_split": q_train_test_split,
    "q_stratified_sample": q_stratified_sample,
}

# DuckDB twin of _hash_bucket: same md5-prefix integer, hex-parsed.
_BUCKET_SQL = "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100)"

# DuckDB types bare fractional literals as DECIMAL, which drags adjacent
# integer operands into decimal arithmetic (engine-specific division
# rules); explicit DOUBLE casts keep the whole expression in IEEE doubles,
# matching Spark's F.lit(float). The promotions are exact (dyadic values).
_D = "CAST({} AS DOUBLE)".format

ORACLES = {
    "text_tfidf_topterms": f"""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        t AS (
            SELECT doc_id, term, COUNT(*) AS tf
            FROM toks WHERE term <> '' GROUP BY doc_id, term),
        d AS (SELECT term, COUNT(*) AS df FROM t GROUP BY term),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
            SELECT doc_id, t.term AS term, tf, df,
                   tf * ((n_docs + {_D(1.0)}) / (df + {_D(1.0)})) AS tfidf
            FROM t JOIN d ON t.term = d.term, n),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                         ORDER BY tfidf DESC, term) AS rn
            FROM scored)
        SELECT doc_id, term, tf, df, tfidf, rn
        FROM ranked WHERE rn <= 5
        ORDER BY doc_id, rn
    """,
    "text_bm25_search": f"""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents),
        dl AS (
            SELECT doc_id, COUNT(*) AS dl
            FROM toks WHERE term <> '' GROUP BY doc_id),
        corpus AS (
            SELECT COUNT(*) AS n_docs,
                   CAST(SUM(CAST(dl AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS avgdl
            FROM dl),
        t AS (
            SELECT doc_id, term, COUNT(*) AS tf
            FROM toks
            WHERE term IN ('spark', 'join', 'fast')
            GROUP BY doc_id, term),
        d AS (SELECT term, COUNT(*) AS df FROM t GROUP BY term),
        p AS (
            SELECT doc_id, t.term AS term,
                   ((n_docs - df + {_D(0.5)}) / (df + {_D(0.5)}))
                       * (tf * {_D(2.5)})
                       / (tf + {_D(1.5)} * ({_D(0.25)} + {_D(0.75)} * (dl / avgdl))) AS s
            FROM t JOIN d ON t.term = d.term JOIN dl USING (doc_id), corpus),
        g AS (
            SELECT doc_id,
                   MAX(CASE WHEN term = 'spark' THEN s END) AS s0,
                   MAX(CASE WHEN term = 'join' THEN s END) AS s1,
                   MAX(CASE WHEN term = 'fast' THEN s END) AS s2,
                   COUNT(*) AS n_terms_hit
            FROM p GROUP BY doc_id)
        SELECT doc_id,
               COALESCE(s0, {_D(0.0)}) + COALESCE(s1, {_D(0.0)})
                   + COALESCE(s2, {_D(0.0)}) AS score,
               n_terms_hit
        FROM g
        ORDER BY score DESC, doc_id
        LIMIT 10
    """,
    "q_train_test_split": f"""
        SELECT CASE WHEN {_BUCKET_SQL} < 80 THEN 'train'
                    WHEN {_BUCKET_SQL} < 90 THEN 'valid'
                    ELSE 'test' END AS split,
               lang,
               COUNT(*) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
        FROM documents
        GROUP BY 1, 2
        ORDER BY split, lang
    """,
    "q_stratified_sample": f"""
        SELECT doc_id, source, lang, n_chars
        FROM documents
        WHERE {_BUCKET_SQL} < (CASE lang WHEN 'en' THEN 10
                                         WHEN 'zh' THEN 50
                                         ELSE 25 END)
        ORDER BY doc_id
    """,
    "text_redact_pii": r"""
        WITH red AS (
            SELECT doc_id,
                   regexp_replace(regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
                       '\d{3,}', '<NUM>', 'g') AS redacted,
                   len(regexp_extract_all(text, '\d{3,}')) AS n_num_runs,
                   len(regexp_extract_all(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+')) AS n_emails
            FROM documents)
        SELECT doc_id, n_num_runs, n_emails,
               md5(redacted) AS redacted_digest,
               length(redacted) AS redacted_len
        FROM red
        ORDER BY doc_id
    """,
    "text_quality_filter": """
        WITH s AS (
            SELECT doc_id,
                   len(string_split(text, ' ')) AS n_words,
                   CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                       / len(string_split(text, ' ')) AS diversity
            FROM documents)
        SELECT doc_id, n_words, diversity,
               CASE WHEN n_words < 20 THEN 'too_short'
                    WHEN n_words > 2000 THEN 'too_long'
                    WHEN diversity < 0.08 THEN 'low_diversity'
                    ELSE 'keep' END AS verdict,
               (CASE WHEN n_words < 20 THEN 'too_short'
                     WHEN n_words > 2000 THEN 'too_long'
                     WHEN diversity < 0.08 THEN 'low_diversity'
                     ELSE 'keep' END) = 'keep' AS kept
        FROM s
        ORDER BY doc_id
    """,
    "dedup_filtered_corpus": """
        WITH keep AS (
            SELECT MIN(doc_id) AS doc_id
            FROM documents
            GROUP BY md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))))
        SELECT d.doc_id, d.lang, d.source, d.n_chars
        FROM documents d
        WHERE d.doc_id IN (SELECT doc_id FROM keep)
          AND len(string_split(d.text, ' ')) BETWEEN 20 AND 2000
        ORDER BY d.doc_id
    """,
    "text_stats": """
        SELECT doc_id,
               length(text) AS n_chars_calc,
               len(string_split(text, ' ')) AS n_words,
               len(list_distinct(string_split(text, ' '))) AS n_distinct_words,
               CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                   / len(string_split(text, ' ')) AS lexical_diversity,
               CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
                   / len(string_split(text, ' ')) AS avg_word_len
        FROM documents
        ORDER BY doc_id
    """,
    "text_language_id": """
        WITH scored AS (
            SELECT doc_id, lang AS labeled_lang,
                   len(list_filter(string_split(text, ' '),
                       w -> w IN ('the', 'a', 'and', 'of'))) AS score_en,
                   len(list_filter(string_split(text, ' '),
                       w -> w IN ('le', 'la', 'et', 'les'))) AS score_fr,
                   len(list_filter(string_split(text, ' '),
                       w -> w IN ('el', 'los', 'y', 'de'))) AS score_es,
                   len(list_filter(string_split(text, ' '),
                       w -> w IN ('der', 'und', 'die', 'das'))) AS score_de
            FROM documents)
        SELECT doc_id, labeled_lang, score_en, score_fr, score_es, score_de,
               CASE WHEN greatest(score_en, score_fr, score_es, score_de) = 0 THEN 'unknown'
                    WHEN score_en = greatest(score_en, score_fr, score_es, score_de) THEN 'en'
                    WHEN score_fr = greatest(score_en, score_fr, score_es, score_de) THEN 'fr'
                    WHEN score_es = greatest(score_en, score_fr, score_es, score_de) THEN 'es'
                    ELSE 'de' END AS predicted_lang
        FROM scored
        ORDER BY doc_id
    """,
    "text_fingerprint": """
        SELECT doc_id,
               md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fingerprint,
               length(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm_len
        FROM documents
        ORDER BY doc_id
    """,
    "text_token_count": """
        SELECT doc_id,
               len(string_split_regex(trim(text), '\\s+')) AS n_ws_tokens,
               len(regexp_extract_all(text, '[a-z0-9]+')) AS n_re_tokens,
               CAST(n_chars AS DOUBLE) / len(regexp_extract_all(text, '[a-z0-9]+'))
                   AS chars_per_token
        FROM documents
        ORDER BY doc_id
    """,
}
