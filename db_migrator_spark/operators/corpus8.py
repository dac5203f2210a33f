"""Span-corruption planning and novelty curves (round 8c).

The reference has no corpus surface (scope:
/root/reference/src/migrate/table_migrator.rs:43-114); these extend
the training-data tier (chunking, packing, splits, sampling, BPE)
with two preprocessing plans a denoising-LM pipeline needs, both
exact and collect-free:

- ``corpus_span_corruption_plan``: the T5-style span-corruption MASK
  PLAN, deterministic: each document's token stream is cut into
  CORRUPT_BLOCK-token blocks, and each FULL block masks one
  SPAN_LEN-token span whose offset is the md5 lottery
  md5(doc_id:block) mod (CORRUPT_BLOCK - SPAN_LEN + 1) — md5 is
  bit-identical cross-engine (the splits contract), so the mask is
  reproducible anywhere, span density is SPAN_LEN/CORRUPT_BLOCK
  (3/20 = 15%, the T5 recipe) on full blocks, and spans can never
  overlap BY CONSTRUCTION (one per block) — no sequential rejection
  pass, which is what makes the plan embarrassingly parallel at
  100 TB. Output: one row per span (doc, block, span start, sentinel
  id), plus each doc's token/block accounting carried on the row.
- ``text_bigram_novelty``: the dataset novelty curve — per document
  (in doc_id order), how many of its distinct bigrams appear here
  FIRST (min doc_id over the corpus is this doc). Novelty share in
  ppm flags the point where a growing corpus stops contributing new
  phrase structure — the diminishing-returns audit for data
  collection. One distinct-(bigram, doc) projection, one min-doc
  aggregate per bigram, one join back: two shuffles keyed by bigram,
  map-side combinable.

Scale notes (100 TB): the corruption plan is a pure projection +
bounded explode (one row per CORRUPT_BLOCK tokens — output is ~5% of
token count); the novelty curve's bigram relation is the same shape
as the n-gram vocab builders (corpus5) — the min-doc aggregate is
map-side combinable and the join back is bigram-keyed, no skew (the
per-doc distinct cap bounds any hot bigram's fan-in contribution to
one row per doc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table, ngram_explode

CORRUPT_BLOCK = 20  # tokens per block, one span masked per full block
SPAN_LEN = 3  # masked span length (T5 mean-3 recipe, fixed)


def corpus_span_corruption_plan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Deterministic T5-style span mask plan (module doc): one row per
    masked span with doc accounting and the md5-lottery offset."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias(
            "n_tokens"
        ),
    ).filter(F.col("n_tokens") >= CORRUPT_BLOCK)
    blocks = base.select(
        "doc_id",
        "n_tokens",
        F.expr(f"n_tokens div {CORRUPT_BLOCK}").alias("n_blocks"),
    ).select(
        "doc_id",
        "n_tokens",
        "n_blocks",
        F.explode(F.sequence(F.lit(0), F.col("n_blocks") - 1)).alias(
            "block"
        ),
    )
    # offset lottery: first 8 md5 hex chars as an unsigned int, mod
    # the legal offset count (conv is exact for 32-bit inputs)
    lot = F.expr(
        "CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), ':',"
        " CAST(block AS STRING))), 1, 8), 16, 10) AS BIGINT)"
    )
    return blocks.select(
        "doc_id",
        "n_tokens",
        "n_blocks",
        "block",
        (
            F.col("block") * CORRUPT_BLOCK
            + lot % (CORRUPT_BLOCK - SPAN_LEN + 1)
        ).alias("span_start"),
        F.lit(SPAN_LEN).alias("span_len"),
        F.col("block").alias("sentinel_id"),
    ).orderBy("doc_id", "block")


def text_bigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram novelty in doc_id order (module doc):
    distinct bigrams, first-seen-here bigrams, novelty share ppm."""
    docs = load_table(spark, sf_dir, "documents")
    ws = docs.select("doc_id", F.split(F.col("text"), " ").alias("ws"))
    bigrams = ngram_explode(ws, "ws", 2, "bg", "doc_id").distinct()
    first_doc = bigrams.groupBy("bg").agg(
        F.min("doc_id").alias("first_doc")
    )
    return (
        bigrams.join(first_doc, "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum(
                (F.col("first_doc") == F.col("doc_id")).cast("bigint")
            )
            .cast("bigint")
            .alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "n_novel",
            F.expr("n_novel * 1000000 div n_bigrams").alias(
                "novelty_ppm"
            ),
        )
        .orderBy("doc_id")
    )


QUERIES = {
    "corpus_span_corruption_plan": corpus_span_corruption_plan,
    "text_bigram_novelty": text_bigram_novelty,
}

ORACLES = {
    "corpus_span_corruption_plan": f"""
        WITH base AS (
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents),
        docs AS (
            SELECT doc_id, n_tokens,
                   n_tokens // {CORRUPT_BLOCK} AS n_blocks
            FROM base WHERE n_tokens >= {CORRUPT_BLOCK}),
        blocks AS (
            SELECT doc_id, n_tokens, n_blocks,
                   unnest(generate_series(0, CAST(n_blocks - 1 AS BIGINT)))
                       AS block
            FROM docs)
        SELECT doc_id, n_tokens, n_blocks, block,
               block * {CORRUPT_BLOCK}
                   + CAST(from_hex(substr(md5(CAST(doc_id AS VARCHAR)
                              || ':' || CAST(block AS VARCHAR)), 1, 8))
                          ::BIT::UINTEGER AS BIGINT)
                       % ({CORRUPT_BLOCK} - {SPAN_LEN} + 1) AS span_start,
               {SPAN_LEN} AS span_len,
               block AS sentinel_id
        FROM blocks
        ORDER BY doc_id, block
    """,
    "text_bigram_novelty": """
        WITH ws AS (
            SELECT doc_id, string_split(text, ' ') AS w
            FROM documents),
        idx AS (
            SELECT doc_id, w,
                   unnest(generate_series(1, len(w) - 1)) AS i
            FROM ws WHERE len(w) >= 2),
        bigrams AS (
            SELECT DISTINCT doc_id, w[i] || ' ' || w[i + 1] AS bg
            FROM idx),
        fd AS (
            SELECT bg, MIN(doc_id) AS first_doc FROM bigrams GROUP BY bg)
        SELECT b.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(COUNT(*) FILTER (fd.first_doc = b.doc_id) AS BIGINT)
                   AS n_novel,
               COUNT(*) FILTER (fd.first_doc = b.doc_id) * 1000000
                   // COUNT(*) AS novelty_ppm
        FROM bigrams b JOIN fd ON fd.bg = b.bg
        GROUP BY b.doc_id
        ORDER BY b.doc_id
    """,
}


def corpus_seq_len_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram on power-of-two bins — the
    max_seq_len-selection view a packing planner reads: choosing the
    context length means knowing how many documents (and tokens) land
    in each 2^k bucket and what share of the corpus a given cutoff
    covers. Bin k holds docs with 2^k <= n_tokens < 2^(k+1) (bin 0
    holds 0..1); cumulative token share in exact ppm via the
    decimal-div contract.

    One projection + one map-side-combined groupBy on the bin id
    (O(log max_len) groups), a broadcast one-row total, one
    matrix-sized cumulative window. floor(log2) computed by BIT
    LENGTH, not floating log — exact at any magnitude.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " ")).cast("bigint")
    # floor(log2(n)) == bit_length(n) - 1; Spark: bit_length of the
    # BINARY of... simplest exact route: compare against powers via
    # width_bucket? Use shiftright loop-free: floor(log2) via
    # 63 - bit_count needs intrinsics — portable exact form:
    # length of the binary string representation.
    bin_id = (
        F.when(n_tok <= 1, F.lit(0))
        .otherwise(F.length(F.conv(n_tok.cast("string"), 10, 2)) - 1)
        .cast("int")
    )
    binned = docs.select(
        bin_id.alias("bin"), n_tok.alias("n_tokens")
    )
    hist = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("tokens"),
    )
    tot = hist.agg(F.sum("tokens").cast("bigint").alias("total"))
    from pyspark.sql.window import Window as W

    wcum = W.orderBy("bin").rowsBetween(W.unboundedPreceding, 0)
    return (
        hist.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            F.expr("CAST(pow(2, bin) AS BIGINT)").alias("min_len"),
            "n_docs",
            "tokens",
            F.expr(
                "CAST(CAST(SUM(tokens) OVER (ORDER BY bin"
                " ROWS UNBOUNDED PRECEDING) AS DECIMAL(38,0))"
                " * 1000000 div total AS BIGINT)"
            ).alias("cum_token_share_ppm"),
        )
        .orderBy("bin")
    )


QUERIES["corpus_seq_len_histogram"] = corpus_seq_len_histogram

ORACLES["corpus_seq_len_histogram"] = """
    WITH base AS (
        SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents),
    binned AS (
        SELECT CASE WHEN n_tokens <= 1 THEN 0
                    ELSE CAST(length(bin(n_tokens)) - 1 AS INTEGER) END
                   AS bin,
               n_tokens
        FROM base),
    hist AS (
        SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS tokens
        FROM binned GROUP BY bin),
    tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS total FROM hist)
    SELECT bin,
           CAST(POW(2, bin) AS BIGINT) AS min_len,
           n_docs, tokens,
           CAST(CAST(SUM(tokens) OVER (ORDER BY bin
                    ROWS UNBOUNDED PRECEDING) AS HUGEINT)
                * 1000000 // total AS BIGINT) AS cum_token_share_ppm
    FROM hist, tot
    ORDER BY bin
"""


# Feature hashing (the "hashing trick"): words map to a fixed number
# of buckets via md5 mod D — the constant-memory featurizer used when
# a vocabulary is too large to materialize. Collisions are the price;
# the audit column counts them so the D choice is evidence-based.
FEATHASH_DIM = 64


def text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed bag-of-words features in long form: per (doc, bucket)
    the term-count mass, plus the distinct-word collision audit
    (module comment). md5-derived bucket = first 8 md5 hex chars mod
    FEATHASH_DIM (the span-plan lottery contract), so the featurizer
    is bit-identical anywhere. One map-side-combinable groupBy over
    the (doc, word) projection."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("w")
    ).filter(F.col("w") != "")
    bucket = F.expr(
        "CAST(conv(substring(md5(w), 1, 8), 16, 10) AS BIGINT)"
    ) % FEATHASH_DIM
    return (
        words.select("doc_id", bucket.alias("bucket"), "w")
        .groupBy("doc_id", "bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("mass"),
            F.count_distinct("w").cast("bigint").alias("n_words"),
        )
        .orderBy("doc_id", "bucket")
    )


QUERIES["text_feature_hashing"] = text_feature_hashing

ORACLES["text_feature_hashing"] = f"""
    WITH words AS (
        SELECT doc_id, w
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents)
        WHERE w != ''),
    hashed AS (
        SELECT doc_id,
               CAST(from_hex(substr(md5(w), 1, 8))::BIT::UINTEGER
                    AS BIGINT) % {FEATHASH_DIM} AS bucket,
               w
        FROM words)
    SELECT doc_id, bucket,
           CAST(COUNT(*) AS BIGINT) AS mass,
           CAST(COUNT(DISTINCT w) AS BIGINT) AS n_words
    FROM hashed
    GROUP BY doc_id, bucket
    ORDER BY doc_id, bucket
"""


# Burstiness floor: only words with at least this many total
# occurrences rank (rarer words' repeat shares are noise).
BURST_MIN_TF = 50


def text_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word burstiness (Church & Gale's observation: real words
    REPEAT within documents; function-like tokens spread evenly):
    per word the total occurrences (tf), the documents containing it
    (df), and the repeat share (tf - df) / tf in exact ppm — high
    means the word clumps (topical), low means it sprinkles
    (functional). The mean-occurrences-per-containing-doc surfaces in
    milli alongside. One (doc, word) count projection, one word
    rollup — both map-side combinable.
    """
    docs = load_table(spark, sf_dir, "documents")
    per_doc = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.col("text"), " ")).alias("w"),
        )
        .filter(F.col("w") != "")
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    return (
        per_doc.groupBy("w")
        .agg(
            F.sum("c").cast("bigint").alias("tf"),
            F.count(F.lit(1)).cast("bigint").alias("df"),
        )
        .filter(F.col("tf") >= BURST_MIN_TF)
        .select(
            "w",
            "tf",
            "df",
            F.expr("(tf - df) * 1000000 div tf").alias(
                "repeat_share_ppm"
            ),
            F.expr("tf * 1000 div df").alias("mean_per_doc_milli"),
        )
        .orderBy(F.desc("repeat_share_ppm"), "w")
    )


QUERIES["text_burstiness"] = text_burstiness

ORACLES["text_burstiness"] = f"""
    WITH per_doc AS (
        SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents)
        WHERE w != ''
        GROUP BY doc_id, w),
    agg AS (
        SELECT w, CAST(SUM(c) AS BIGINT) AS tf,
               CAST(COUNT(*) AS BIGINT) AS df
        FROM per_doc GROUP BY w)
    SELECT w, tf, df,
           (tf - df) * 1000000 // tf AS repeat_share_ppm,
           tf * 1000 // df AS mean_per_doc_milli
    FROM agg
    WHERE tf >= {BURST_MIN_TF}
    ORDER BY repeat_share_ppm DESC, w
"""
