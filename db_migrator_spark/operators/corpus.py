"""Training-corpus assembly operators: chunking, repetition-based quality
metrics, benchmark decontamination, and sequence packing.

These are the corpus-preparation stages a large-scale LLM training-data
pipeline runs after cleaning/dedup (see ``operators/text.py`` and
``operators/dedup.py``): split documents into model-window chunks, drop
degenerate repetitive documents (Gopher-style repetition signals), strip
documents that leak evaluation benchmarks, and pack the token stream into
fixed-budget training sequences.

Everything is built-in column expressions (split / transform / explode /
window) — JVM-side, whole-stage-codegen'd — and every operator has an
exact ANSI-SQL oracle twin. Scale notes are on each operator; the common
theme is that per-document work is embarrassingly parallel (fused into the
scan) and the only shuffles are keyed aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from ..io import load_table, ngram_explode

# Chunking geometry: model-window chunks of CHUNK_CHARS with
# CHUNK_STRIDE < CHUNK_CHARS giving (CHUNK_CHARS - CHUNK_STRIDE) overlap,
# the standard retrieval/embedding windowing scheme.
CHUNK_CHARS = 200
CHUNK_STRIDE = 150

# Sequence packing budget (whitespace tokens per training sequence).
PACK_BUDGET = 512

# Decontamination shingle width (word n-grams shared with a benchmark doc).
CONTAM_NGRAM = 3


def text_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split every document into overlapping fixed-width character chunks
    (CHUNK_CHARS wide, stride CHUNK_STRIDE) — the windowing step before
    embedding or retrieval indexing.

    Chunk starts are ``i * stride`` for ``i in [0, floor((len-1)/stride)]``
    so every character lands in >= 1 chunk and consecutive chunks overlap
    by ``CHUNK_CHARS - CHUNK_STRIDE`` chars. The raw chunk text stays
    executor-side (at 100 TB chunked text is a sink, not a driver result);
    the contract result carries per-chunk length + digest.

    Plan: one generator (explode of an int sequence) fused into the scan —
    no shuffle, no Python; output size ~ input * len/stride.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_chunks_minus1 = F.floor((F.length("text") - 1) / CHUNK_STRIDE)
    chunk = F.substring(
        F.col("text"), F.col("i") * CHUNK_STRIDE + 1, CHUNK_CHARS
    )
    return (
        docs.select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(0), n_chunks_minus1)).alias("i"),
        )
        .select(
            "doc_id",
            F.col("i").cast("bigint").alias("chunk_id"),
            F.length(chunk).alias("chunk_len"),
            F.md5(chunk.cast("binary")).alias("chunk_digest"),
        )
        .orderBy("doc_id", "chunk_id")
    )


def text_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: the fraction of tokens
    taken by the single most frequent word, and the fraction of word
    bigrams that are repeats. Degenerate machine-generated text scores
    high on both; the composed ``flagged`` column is the filter verdict.

    Plan shape: the word array is materialized once per row (the
    higher-order-function recompute trap — see ``dedup._shingle_index``),
    bigrams are formed array-side by index (no window over an exploded
    token stream, which would shuffle |tokens| rows), and the only
    shuffles are the two (doc_id, term)-keyed counts, which map-side
    combine. Integer arithmetic until the final divisions, so the doubles
    are cross-engine exact.
    """
    docs = load_table(spark, sf_dir, "documents")
    arr = docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("w")
    ).filter(F.size("w") >= 2)
    toks = arr.select("doc_id", F.size("w").alias("n_words"), F.explode("w").alias("term"))
    word_stats = (
        toks.groupBy("doc_id", "n_words", "term")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id", "n_words")
        .agg(F.max("c").alias("top_word_cnt"))
    )
    bg = ngram_explode(arr, "w", 2, "bg", "doc_id")
    bg_stats = (
        bg.groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_bigrams"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct_bigrams"),
        )
    )
    top_frac = F.col("top_word_cnt").cast("double") / F.col("n_words")
    dup_frac = (F.col("n_bigrams") - F.col("n_distinct_bigrams")).cast("double") / F.col(
        "n_bigrams"
    )
    return (
        word_stats.join(bg_stats, "doc_id")
        .select(
            "doc_id",
            "n_words",
            "top_word_cnt",
            top_frac.alias("top_word_frac"),
            "n_bigrams",
            "n_distinct_bigrams",
            dup_frac.alias("dup_bigram_frac"),
            ((top_frac > 0.1) | (dup_frac > 0.3)).alias("flagged"),
        )
        .orderBy("doc_id")
    )


def text_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing word
    {CONTAM_NGRAM}-grams with a held-out benchmark set (here: doc_id < 25
    stands in for the eval suite). Reports, per contaminated corpus doc,
    how many distinct benchmark shingles it contains and how many distinct
    benchmark documents those shingles came from.

    Scale shape: this is the LINEAR decontamination join, not a pair
    explosion — the benchmark side is tiny by construction (eval suites
    are KBs against a 100 TB corpus), so its distinct-shingle index is
    broadcast and the corpus streams through a broadcast-hash semi-ish
    join fused with the scan. No bucket caps needed (contrast the
    corpus-vs-corpus self-join in ``dedup_ngram_jaccard``). Shingles are
    strings here for oracle parity; the production path would reuse the
    xxhash64 trick from ``dedup._shingle_index``.
    """
    docs = load_table(spark, sf_dir, "documents")
    arr = docs.select("doc_id", F.split(F.col("text"), " ").alias("w")).filter(
        F.size("w") >= CONTAM_NGRAM
    )
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size("w") - CONTAM_NGRAM),
            lambda i: F.concat_ws(
                " ", F.get("w", i), F.get("w", i + 1), F.get("w", i + 2)
            ),
        )
    )
    sh = arr.select("doc_id", F.explode(grams).alias("shingle"))
    bench = (
        sh.filter(F.col("doc_id") < 25)
        .select(F.col("doc_id").alias("bench_id"), "shingle")
    )
    corpus = sh.filter(F.col("doc_id") >= 25)
    return (
        corpus.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("shingle").alias("n_shared_shingles"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
        .orderBy("doc_id")
    )


def _exclusive_cumsum(src: DataFrame, order_col: str, val_col: str) -> DataFrame:
    """Distributed exclusive cumulative sum of ``val_col`` in ``order_col``
    order, added as ``cum_before``.

    A bare running-total window over the whole frame would funnel
    everything through ONE task. Decomposition: range-repartition on the
    order column, per-partition cumsum (window partitioned by
    ``spark_partition_id``), then add each partition's prior-total offset.
    The per-partition totals frame is #partitions rows — its cumulative
    offsets come from a broadcast cross-join aggregation (no
    single-partition window stage). ``localCheckpoint`` pins the sampled
    range boundaries so both branches see identical partitioning.
    """
    parts = (
        src.repartitionByRange(32, order_col)
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint()
    )
    sums = parts.groupBy("pid").agg(F.sum(val_col).cast("bigint").alias("tok"))
    s2 = sums.select(F.col("pid").alias("pid2"), F.col("tok").alias("tok2"))
    offsets = (
        sums.crossJoin(F.broadcast(s2))
        .groupBy("pid")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("pid2") < F.col("pid"), F.col("tok2"))), F.lit(0)
            ).alias("offset")
        )
    )
    wp = W.partitionBy("pid").orderBy(order_col)
    return (
        parts.withColumn("cum_in", F.sum(val_col).over(wp))
        .join(F.broadcast(offsets), "pid")
        .withColumn(
            "cum_before",
            (F.col("cum_in") + F.col("offset") - F.col(val_col)).cast("bigint"),
        )
        .drop("pid", "cum_in", "offset")
    )


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack the corpus token stream into fixed-budget training sequences:
    documents are concatenated in doc_id order and each document is
    assigned to the sequence where it STARTS —
    ``seq_id = floor(exclusive_cumsum(tokens) / PACK_BUDGET)`` — the
    deterministic, order-preserving packing used when training sequences
    are built by concatenation + window slicing. Returns per-sequence
    occupancy (doc count, token sum, doc_id span).

    Scale-safe global cumsum via ``_exclusive_cumsum`` (range partition +
    per-partition window + broadcast offsets — no single-task stage).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tok"))
    packed = _exclusive_cumsum(toks, "doc_id", "n_tok").withColumn(
        "seq_id", F.floor(F.col("cum_before") / PACK_BUDGET)
    )
    return (
        packed.groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("seq_id")
    )


def text_unigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency document scoring — the cheap stand-in for LM
    perplexity filtering: a document whose tokens are all corpus-rare (or
    all corpus-dominant) is an outlier. Scores each doc by its average
    token's corpus frequency, ``avg_p = (Σ_tokens cnt(token)) / (n_tok·N)``.

    The score is kept as ONE rational — integer sums divided once at the
    end — instead of averaging per-token ``cnt/N`` doubles, whose
    summation order is engine-dependent; integer arithmetic makes the
    double cross-engine exact (same trick as the TF-IDF rational IDF).

    Plan shape: token stream → corpus term counts (map-side-combined
    shuffle on term), joined back to the token stream on term (shuffle
    join ON PURPOSE — a 100 TB corpus vocabulary with junk tokens is not
    broadcastable), then a per-doc integer aggregation. The corpus total
    is a 1-row broadcast.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    total = toks.agg(F.count(F.lit(1)).cast("bigint").alias("n_corpus"))
    per_doc = (
        toks.join(vocab, "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tok"),
            F.sum("cnt").cast("bigint").alias("sum_cnt"),
        )
    )
    avg_p = F.col("sum_cnt").cast("double") / (F.col("n_tok") * F.col("n_corpus"))
    return (
        per_doc.crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "n_tok",
            "sum_cnt",
            avg_p.alias("avg_token_freq"),
        )
        .orderBy("doc_id")
    )


def q_domain_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-driven domain rebalancing: downsample every source to the
    token volume of the smallest source (uniform domain mixture), then
    report per-source before/after volumes. The per-row keep decision is
    ``hash_bucket(doc_id) · source_tokens < BUCKETS · min_tokens`` —
    integer cross-multiplication, so the sampling rate min_tokens/source_
    tokens needs no float rounding and the decision is engine-exact and
    recomputable from the row alone.

    Plan shape: one aggregation derives the per-source token totals (and
    their min — a sources-count-sized frame), broadcast back onto the
    scan; the filter then evaluates per row with no second shuffle. This
    is the general template for "compute the sampling policy FROM the
    data, then apply it in the same pass" — at 100 TB the policy frame is
    KBs while the corpus never moves.
    """
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", "source", F.size(F.split(F.col("text"), " ")).alias("n_tok")
    )
    per_src = base.groupBy("source").agg(F.sum("n_tok").cast("bigint").alias("src_tok"))
    policy = per_src.crossJoin(
        F.broadcast(per_src.agg(F.min("src_tok").alias("min_tok")))
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
        .cast("bigint")
        % 1000
    )
    kept = (
        base.join(F.broadcast(policy), "source")
        .withColumn("keep", bucket * F.col("src_tok") < 1000 * F.col("min_tok"))
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("tokens_before"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("bigint").alias("docs_kept"),
            F.sum(F.when(F.col("keep"), F.col("n_tok")).otherwise(0))
            .cast("bigint")
            .alias("tokens_after"),
        )
        .orderBy("source")
    )


def q21_blocking_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 analog (suppliers who kept orders waiting), adapted to the
    fixture's columns (no commitdate/receiptdate): among orders touching
    >= 2 distinct suppliers, find the orders where exactly ONE supplier
    owns the latest ship date — that supplier "blocked" the order — and
    rank suppliers by how many orders they blocked.

    Same algebraic skeleton as Q21's double EXISTS/NOT-EXISTS: instead of
    correlated subqueries, two grouped passes (per (order, supplier) max
    shipdate; per order the supplier count + global max) and an equality
    filter — all hash aggregations + one broadcast join of the supplier
    dim. No correlated per-row probes; every stage is a map-side-combined
    shuffle on keys the data is already clustered by.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    per_os = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("sd")
    )
    per_o = per_os.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"), F.max("sd").alias("order_max")
    )
    latest = (
        per_os.join(per_o, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("sd") == F.col("order_max")))
    )
    sole = (
        latest.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_latest"), F.max("l_suppkey").alias("l_suppkey"))
        .filter(F.col("n_latest") == 1)
    )
    return (
        sole.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_blocked"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "n_blocked")
        .orderBy(F.col("n_blocked").desc(), "s_suppkey")
        .limit(10)
    )


QUERIES = {
    "text_chunk_documents": text_chunk_documents,
    "text_repetition_metrics": text_repetition_metrics,
    "text_contamination_check": text_contamination_check,
    "q_pack_sequences": q_pack_sequences,
    "text_unigram_score": text_unigram_score,
    "q_domain_rebalance": q_domain_rebalance,
    "q21_blocking_supplier": q21_blocking_supplier,
}

ORACLES = {
    "text_chunk_documents": f"""
        WITH ex AS (
            SELECT doc_id, text,
                   unnest(generate_series(
                       0, CAST(floor((length(text) - 1) / {CHUNK_STRIDE}) AS BIGINT))) AS i
            FROM documents)
        SELECT doc_id,
               i AS chunk_id,
               length(substr(text, CAST(i * {CHUNK_STRIDE} + 1 AS BIGINT), {CHUNK_CHARS}))
                   AS chunk_len,
               md5(substr(text, CAST(i * {CHUNK_STRIDE} + 1 AS BIGINT), {CHUNK_CHARS}))
                   AS chunk_digest
        FROM ex
        ORDER BY doc_id, chunk_id
    """,
    "text_repetition_metrics": """
        WITH arr AS (
            SELECT doc_id, string_split(text, ' ') AS w
            FROM documents WHERE len(string_split(text, ' ')) >= 2),
        toks AS (
            SELECT doc_id, len(w) AS n_words, unnest(w) AS term FROM arr),
        ws AS (
            SELECT doc_id, n_words, MAX(c) AS top_word_cnt
            FROM (SELECT doc_id, n_words, term, COUNT(*) AS c
                  FROM toks GROUP BY doc_id, n_words, term)
            GROUP BY doc_id, n_words),
        bgx AS (
            SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i FROM arr),
        bg AS (
            SELECT doc_id, w[i] || ' ' || w[i+1] AS bg FROM bgx),
        bs AS (
            SELECT doc_id,
                   CAST(SUM(c) AS BIGINT) AS n_bigrams,
                   CAST(COUNT(*) AS BIGINT) AS n_distinct_bigrams
            FROM (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY doc_id, bg)
            GROUP BY doc_id)
        SELECT ws.doc_id AS doc_id, n_words, top_word_cnt,
               CAST(top_word_cnt AS DOUBLE) / n_words AS top_word_frac,
               n_bigrams, n_distinct_bigrams,
               CAST(n_bigrams - n_distinct_bigrams AS DOUBLE) / n_bigrams
                   AS dup_bigram_frac,
               (CAST(top_word_cnt AS DOUBLE) / n_words > CAST(0.1 AS DOUBLE)
                OR CAST(n_bigrams - n_distinct_bigrams AS DOUBLE) / n_bigrams
                    > CAST(0.3 AS DOUBLE)) AS flagged
        FROM ws JOIN bs ON ws.doc_id = bs.doc_id
        ORDER BY doc_id
    """,
    "text_contamination_check": f"""
        WITH arr AS (
            SELECT doc_id, string_split(text, ' ') AS w
            FROM documents WHERE len(string_split(text, ' ')) >= {CONTAM_NGRAM}),
        ex AS (
            SELECT doc_id, w,
                   unnest(generate_series(1, len(w) - {CONTAM_NGRAM - 1})) AS i
            FROM arr),
        sh AS (
            SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
            FROM ex),
        bench AS (
            SELECT doc_id AS bench_id, shingle FROM sh WHERE doc_id < 25),
        corpus AS (
            SELECT doc_id, shingle FROM sh WHERE doc_id >= 25)
        SELECT c.doc_id AS doc_id,
               COUNT(DISTINCT c.shingle) AS n_shared_shingles,
               COUNT(DISTINCT b.bench_id) AS n_bench_docs
        FROM corpus c JOIN bench b ON c.shingle = b.shingle
        GROUP BY c.doc_id
        ORDER BY doc_id
    """,
    "q_pack_sequences": f"""
        WITH t AS (
            SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents),
        c AS (
            SELECT doc_id, n_tok,
                   COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS cum_before
            FROM t)
        SELECT CAST(floor(cum_before / {PACK_BUDGET}) AS BIGINT) AS seq_id,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
               MIN(doc_id) AS first_doc,
               MAX(doc_id) AS last_doc
        FROM c
        GROUP BY 1
        ORDER BY seq_id
    """,
    "text_unigram_score": """
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents),
        t AS (SELECT doc_id, term FROM toks WHERE term <> ''),
        vocab AS (SELECT term, COUNT(*) AS cnt FROM t GROUP BY term),
        total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_corpus FROM t),
        per_doc AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_tok,
                   CAST(SUM(cnt) AS BIGINT) AS sum_cnt
            FROM t JOIN vocab ON t.term = vocab.term
            GROUP BY doc_id)
        SELECT doc_id, n_tok, sum_cnt,
               CAST(sum_cnt AS DOUBLE) / (n_tok * n_corpus) AS avg_token_freq
        FROM per_doc, total
        ORDER BY doc_id
    """,
    "q_domain_rebalance": """
        WITH base AS (
            SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok
            FROM documents),
        per_src AS (
            SELECT source, CAST(SUM(n_tok) AS BIGINT) AS src_tok
            FROM base GROUP BY source),
        policy AS (
            SELECT source, src_tok,
                   (SELECT MIN(src_tok) FROM per_src) AS min_tok
            FROM per_src),
        kept AS (
            SELECT b.source, b.n_tok,
                   (('0x' || substr(md5(CAST(b.doc_id AS VARCHAR)), 1, 8))::BIGINT
                        % 1000) * p.src_tok < 1000 * p.min_tok AS keep
            FROM base b JOIN policy p ON b.source = p.source)
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS tokens_before,
               CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS docs_kept,
               CAST(SUM(CASE WHEN keep THEN n_tok ELSE 0 END) AS BIGINT) AS tokens_after
        FROM kept
        GROUP BY source
        ORDER BY source
    """,
    "q21_blocking_supplier": """
        WITH per_os AS (
            SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS sd
            FROM lineitem GROUP BY l_orderkey, l_suppkey),
        per_o AS (
            SELECT l_orderkey, COUNT(*) AS n_supp, MAX(sd) AS order_max
            FROM per_os GROUP BY l_orderkey),
        latest AS (
            SELECT p.l_orderkey, p.l_suppkey
            FROM per_os p JOIN per_o o ON p.l_orderkey = o.l_orderkey
            WHERE o.n_supp >= 2 AND p.sd = o.order_max),
        sole AS (
            SELECT l_orderkey, MAX(l_suppkey) AS l_suppkey
            FROM latest GROUP BY l_orderkey HAVING COUNT(*) = 1)
        SELECT s_suppkey, s_name, COUNT(*) AS n_blocked
        FROM sole JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_suppkey, s_name
        ORDER BY n_blocked DESC, s_suppkey
        LIMIT 10
    """,
}
