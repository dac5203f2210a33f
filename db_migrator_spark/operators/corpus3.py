"""Corpus-assembly operators, round 5: vocabulary building, incremental
dedup, training-order sharding, norm-outlier audit, keep-best dedup.

North-star LLM-data-pipeline additions (the reference is a 1:1 table
copier with none of these — cited for scope:
/root/reference/src/migrate/table_migrator.rs:43-114 is its whole data
path):

- ``text_ngram_vocab``: corpus-wide top-K word-bigram vocabulary with
  occurrence + document frequencies (the counting pass every BPE/vocab
  build starts from);
- ``dedup_incremental_batch``: dedup a NEW crawl batch against the
  already-indexed corpus — the daily-ingest shape: nobody re-dedups
  100 TB from scratch per day;
- ``q_shuffle_shards``: deterministic global training-order shuffle into
  shards (multiplicative-hash key), the step that turns a sorted corpus
  into i.i.d.-looking training files;
- ``embedding_norm_outliers``: L2-norm outlier audit with fully
  integer/decimal comparisons (no cross-engine float drift);
- ``dedup_keep_best``: exact-dup groups keep the BEST copy by an
  explicit policy (prefer ``lang='en'``, then lowest doc_id) instead of
  ``dedup_exact``'s min-id — the "which copy survives" decision real
  pipelines make on quality signals.

Scale notes (100 TB): the vocabulary pass is one shuffle keyed by ngram
with map-side partial aggregation and a global top-K (TakeOrdered — no
full sort); incremental dedup shuffles 16-byte hashes, never text, and
the new-batch side is small by construction so AQE picks a broadcast;
sharding is embarrassingly parallel (per-shard windows, shard count
chosen so one shard ~ one output file); the outlier audit is one scan +
a 1-row broadcast aggregate; keep-best is a single hash aggregation with
a lexicographic max-struct (map-side combinable, unlike a window rank).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import fan_out, load_table, ngram_explode
from .similarity import _as_double, _dot

NGRAM_VOCAB_K = 50
# New-batch membership for incremental dedup: every 10th doc_id is "today's
# crawl", the rest are the indexed corpus (a deterministic stand-in for an
# ingest-date column the fixture lacks).
INCR_BATCH_MOD = 10
N_SHARDS = 16
# Knuth multiplicative hash constant (2^32 / golden ratio), applied mod
# 2^32: a bijective scramble of doc_id in exact BIGINT arithmetic both
# engines reproduce bit-for-bit (unlike xxhash64, whose Spark and DuckDB
# implementations differ).
SHUFFLE_MULT = 2654435761
SHUFFLE_MOD = 4294967296
NORM_SCALE = 1_000_000


def text_ngram_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K corpus bigram vocabulary: occurrence count + doc frequency.

    Plan shape: bigrams are built per-row with an array lambda (narrow,
    zero Python), exploded, then ONE shuffle keyed by ngram computes both
    frequencies — ``countDistinct`` expands to the standard two-phase
    distinct aggregate, still map-side partial on the first phase. The
    top-K is ``orderBy().limit()`` = TakeOrderedAndProject: each partition
    ships only its local K candidates, no global sort. Ordering is fully
    tie-broken (count desc, ngram asc) so the K-th boundary is
    deterministic in both engines.
    """
    docs = load_table(spark, sf_dir, "documents")
    # fan_out (round 14, guide §2.5): the bigram explode + the partial
    # (ngram, doc_id) hash aggregate fuse into the documents SCAN
    # stage, which carries row-group parallelism (1 task at sf0.1, ~6
    # at sf1) — the stage builds per-task hash tables over tens of
    # millions of bigram strings, the heaviest work in the query. One
    # narrow (doc_id, text) shuffle unlocks full width; identity on
    # production-sized inputs. Round 15: bigram generation through the
    # codegen'd zip-explode (io.ngram_explode) instead of the
    # interpreted sequence/element_at lambda (which additionally
    # re-evaluated split(text) per element).
    arr = fan_out(docs.select("doc_id", "text"), "doc_id").select(
        "doc_id", F.split(F.col("text"), " ").alias("w")
    )
    return (
        ngram_explode(arr, "w", 2, "ngram", "doc_id")
        .groupBy("ngram")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), "ngram")
        .limit(NGRAM_VOCAB_K)
    )


def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivors of a new ingest batch after dedup against the corpus.

    The batch (``doc_id % INCR_BATCH_MOD == INCR_BATCH_MOD-1``) is
    anti-joined on content hash against the indexed remainder, then
    deduped within itself (min doc_id per hash — first occurrence wins,
    matching ``dedup_exact``).

    Plan shape: both sides project to (hash, doc_id) BEFORE the shuffle —
    16-byte keys on the wire, never document text. The index side is
    distinct-ed first (its dup groups collapse map-side). At 100 TB the
    index side is the big one, but an anti join only needs its keys; in
    production the index would be the persisted hash column of the corpus
    catalog, not a rescan — this operator IS that query shape.
    """
    docs = load_table(spark, sf_dir, "documents")
    hashed = docs.select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("content_hash")
    )
    is_new = (F.col("doc_id") % INCR_BATCH_MOD) == (INCR_BATCH_MOD - 1)
    new_batch = hashed.filter(is_new)
    index = hashed.filter(~is_new).select("content_hash").distinct()
    return (
        new_batch.join(index, "content_hash", "left_anti")
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "content_hash")
        .orderBy("doc_id")
    )


def q_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle into N_SHARDS shards.

    Each doc gets a pseudo-random but reproducible key
    ``(doc_id * SHUFFLE_MULT) % 2^32`` (Knuth multiplicative scramble —
    exact BIGINT arithmetic, identical in any engine), a shard
    ``key % N_SHARDS``, and a position within its shard. Reading shards
    in (shard, pos) order replays one fixed global permutation.

    Plan shape: one shuffle on shard, per-shard window for the position —
    N_SHARDS-way parallel, no global ordering stage anywhere. At 100 TB
    the shard count is chosen so one shard ~ one output file (tens of
    thousands), and the same expression feeds ``partitionBy`` on the
    write, so the shuffle doubles as the output layout.
    """
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    key = (F.col("doc_id") * F.lit(SHUFFLE_MULT)) % F.lit(SHUFFLE_MOD)
    shard = key % F.lit(N_SHARDS)
    wp = W.partitionBy("shard").orderBy("shuffle_key", "doc_id")
    return (
        docs.select("doc_id", key.alias("shuffle_key"), shard.alias("shard"))
        .withColumn("pos", F.row_number().over(wp).cast("long"))
        .select("doc_id", "shard", "pos")
        .orderBy("shard", "pos")
    )


def embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag embeddings whose L2 norm is an outlier vs the corpus mean.

    Every comparison is exact: norms quantize to integers
    (``floor(norm * 1e6)``, IEEE-exact in both engines), the corpus sum
    runs in DECIMAL, and high/low tests cross-multiply instead of
    dividing (``q * n > 2 * sum``  ⇔  ``q > 2 * mean``) so no float mean
    ever materializes — bit-identical verdicts at any parallelism.

    Plan shape: one scan computes per-vector norms; a 1-row global
    aggregate (map-side partial, ~bytes per partition) broadcasts back
    via crossJoin. Flagging is then a pure column expression.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    vec = _as_double(F.col("embedding"))
    qn = F.floor(F.sqrt(_dot(vec, vec)) * F.lit(float(NORM_SCALE))).cast("long")
    normed = emb.select("vec_id", qn.alias("norm_q"))
    stats = normed.agg(
        F.sum(F.col("norm_q").cast("decimal(28,0)")).alias("sum_q"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        normed.crossJoin(F.broadcast(stats))
        .select(
            "vec_id",
            "norm_q",
            (F.col("norm_q").cast("decimal(28,0)") * F.col("n") > F.col("sum_q") * 2)
            .alias("is_high"),
            (F.col("norm_q").cast("decimal(28,0)") * F.col("n") * 2 < F.col("sum_q"))
            .alias("is_low"),
        )
        .orderBy("vec_id")
    )


def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dup groups keeping the best copy by policy, not position.

    Policy: prefer an English copy, then the lowest doc_id. Implemented
    as a lexicographic max over ``struct(is_en, -doc_id)`` inside ONE
    hash aggregation — map-side combinable, so the shuffle carries one
    candidate per (hash, partition) instead of every copy, which is the
    reason to avoid the equivalent window-rank formulation at scale.
    """
    docs = load_table(spark, sf_dir, "documents")
    is_en = (F.col("lang") == "en").cast("int")
    sel = F.struct(is_en.alias("e"), (-F.col("doc_id")).alias("nd"))
    return (
        docs.groupBy(F.md5(F.col("text").cast("binary")).alias("content_hash"))
        .agg(
            F.max(sel).alias("sel"),
            F.count(F.lit(1)).alias("n_copies"),
            F.sum(is_en).cast("long").alias("n_en"),
        )
        .select(
            "content_hash",
            (-F.col("sel.nd")).alias("keep_doc_id"),
            "n_copies",
            "n_en",
        )
        .orderBy("keep_doc_id")
    )


def corpus_build_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nightly corpus-build job as ONE declarative plan:
    quality filter → exact dedup → sequence packing → shard assignment.

    Stages (each individually oracle-checked elsewhere; this entry proves
    the COMPOSITION stays correct and plannable as a single query):
    1. quality gate — the text_quality_filter predicates (20 ≤ words ≤
       2000, lexical diversity ≥ 0.08), fused into the scan;
    2. exact dedup on the whitespace-normalized lowercase fingerprint,
       keeping the lowest surviving doc_id (filter FIRST: no hash or
       shuffle spent on docs the gate drops);
    3. token-budget sequence packing in doc_id order via the distributed
       exclusive cumsum (``_exclusive_cumsum`` — no single-task stage);
    4. each sequence lands in a training shard (``seq_id % N_SHARDS`` —
       at 100 TB this column is the write partitionBy).

    Catalyst keeps the whole thing one job: the dedup is ONE map-side-
    combinable aggregation (min struct(doc_id, n_tok) per fingerprint —
    "keep the lowest surviving doc_id" needs no semi-join back against
    the gated scan, because the kept doc's token count rides along in
    the struct), the packing reuses the range partitioning, and nothing
    ever collects. Round 14: the former keep-list + left_semi shape
    scanned/split the documents twice and shuffled doc_ids a second
    time; this shape scans once and shuffles only (fp, doc_id, n_tok).
    """
    from .corpus import PACK_BUDGET, _exclusive_cumsum

    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    n_words = F.size(w)
    diversity = F.size(F.array_distinct(w)).cast("double") / n_words
    quality = docs.filter(
        (n_words >= 20) & (n_words <= 2000) & (diversity >= 0.08)
    )
    normalized = F.lower(F.regexp_replace(F.col("text"), r"\s+", " "))
    # doc_id is unique, so the lexicographic struct min picks the lowest
    # doc_id per fingerprint together with ITS n_tok — value-identical to
    # the min-doc_id keep list semi-joined back (the oracle's shape).
    survivors = (
        quality.select(
            F.md5(normalized.cast("binary")).alias("fp"),
            F.struct(F.col("doc_id"), n_words.alias("n_tok")).alias("dt"),
        )
        .groupBy("fp")
        .agg(F.min("dt").alias("dt"))
        .select(F.col("dt.doc_id").alias("doc_id"), F.col("dt.n_tok").alias("n_tok"))
    )
    packed = _exclusive_cumsum(survivors, "doc_id", "n_tok").withColumn(
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
        .withColumn("shard", F.col("seq_id") % F.lit(N_SHARDS))
        .select("seq_id", "shard", "n_docs", "total_tokens", "first_doc", "last_doc")
        .orderBy("seq_id")
    )


# Linear quality model: dyadic weights (exactly representable doubles) so
# every product/sum is IEEE-identical across engines. A real deployment
# loads learned weights; the OPERATOR SHAPE — broadcast coefficients,
# pure column math fused into the scan, zero Python — is what scales.
MODEL_BIAS = -1.0
MODEL_W_NWORDS = 0.0009765625  # 1/1024
MODEL_W_DIVERSITY = 2.0
MODEL_W_AVGLEN = 0.25
MODEL_W_NCHARS = -0.0001220703125  # -1/8192


def text_quality_score_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-scored quality filtering: a (stub) linear classifier over
    cheap text features — the fasttext-style "quality model" stage of a
    training-data pipeline, minus the learned weights.

    score = bias + w·[n_words, diversity, avg_word_len, n_chars],
    evaluated in a fixed left-to-right order with dyadic weights so the
    DuckDB twin is bit-identical. Features reuse the text_stats
    definitions (already hash-pinned cross-engine).

    Plan: pure whole-stage-codegen column expressions in the scan; the
    model is literals (a learned model broadcasts a weight struct). No
    shuffle until the final ordering.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    n_words = F.size(w)
    diversity = F.size(F.array_distinct(w)).cast("double") / n_words
    avg_len = (F.length("text") - n_words + 1).cast("double") / n_words
    score = (
        F.lit(MODEL_BIAS)
        + F.lit(MODEL_W_NWORDS) * n_words
        + F.lit(MODEL_W_DIVERSITY) * diversity
        + F.lit(MODEL_W_AVGLEN) * avg_len
        + F.lit(MODEL_W_NCHARS) * F.length("text")
    )
    return (
        docs.select(
            "doc_id",
            score.alias("score"),
            (score > 0.0).alias("kept"),
        )
        .orderBy("doc_id")
    )


QUERIES = {
    "corpus_build_pipeline": corpus_build_pipeline,
    "text_quality_score_model": text_quality_score_model,
    "text_ngram_vocab": text_ngram_vocab,
    "dedup_incremental_batch": dedup_incremental_batch,
    "q_shuffle_shards": q_shuffle_shards,
    "embedding_norm_outliers": embedding_norm_outliers,
    "dedup_keep_best": dedup_keep_best,
}

from .corpus import PACK_BUDGET  # noqa: E402 — shared packing budget

ORACLES = {
    "corpus_build_pipeline": f"""
        WITH s AS (SELECT doc_id, text,
                          len(string_split(text, ' ')) AS n_tok,
                          CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                              / len(string_split(text, ' ')) AS diversity
                   FROM documents),
             q AS (SELECT * FROM s
                   WHERE n_tok BETWEEN 20 AND 2000 AND diversity >= 0.08),
             keep AS (SELECT MIN(doc_id) AS doc_id FROM q
                      GROUP BY md5(lower(regexp_replace(text, '\\s+', ' ', 'g')))),
             sv AS (SELECT doc_id, n_tok FROM q
                    WHERE doc_id IN (SELECT doc_id FROM keep)),
             c AS (SELECT doc_id, n_tok,
                          COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                              AS cum_before
                   FROM sv)
        SELECT CAST(floor(cum_before / {PACK_BUDGET}) AS BIGINT) AS seq_id,
               CAST(floor(cum_before / {PACK_BUDGET}) AS BIGINT) % {N_SHARDS} AS shard,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
               MIN(doc_id) AS first_doc,
               MAX(doc_id) AS last_doc
        FROM c
        GROUP BY 1, 2
        ORDER BY seq_id
    """,
    "text_quality_score_model": f"""
        WITH s AS (
            SELECT doc_id,
                   len(string_split(text, ' ')) AS n_words,
                   CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                       / len(string_split(text, ' ')) AS diversity,
                   CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
                       / len(string_split(text, ' ')) AS avg_len,
                   length(text) AS n_chars
            FROM documents)
        SELECT doc_id,
               CAST({MODEL_BIAS} AS DOUBLE)
                 + CAST({MODEL_W_NWORDS} AS DOUBLE) * n_words
                 + CAST({MODEL_W_DIVERSITY} AS DOUBLE) * diversity
                 + CAST({MODEL_W_AVGLEN} AS DOUBLE) * avg_len
                 + CAST({MODEL_W_NCHARS!r} AS DOUBLE) * n_chars AS score,
               (CAST({MODEL_BIAS} AS DOUBLE)
                 + CAST({MODEL_W_NWORDS} AS DOUBLE) * n_words
                 + CAST({MODEL_W_DIVERSITY} AS DOUBLE) * diversity
                 + CAST({MODEL_W_AVGLEN} AS DOUBLE) * avg_len
                 + CAST({MODEL_W_NCHARS!r} AS DOUBLE) * n_chars) > 0.0 AS kept
        FROM s
        ORDER BY doc_id
    """,
    "text_ngram_vocab": f"""
        WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
                       WHERE len(string_split(text, ' ')) >= 2),
             ng AS (SELECT doc_id, array_to_string(w[i:i+1], ' ') AS ngram
                    FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
                          FROM words))
        SELECT ngram, COUNT(*) AS n_occurrences,
               COUNT(DISTINCT doc_id) AS n_docs
        FROM ng GROUP BY ngram
        ORDER BY n_occurrences DESC, ngram
        LIMIT {NGRAM_VOCAB_K}
    """,
    "dedup_incremental_batch": f"""
        WITH h AS (SELECT doc_id, md5(text) AS content_hash FROM documents),
             new_batch AS (SELECT * FROM h
                           WHERE doc_id % {INCR_BATCH_MOD} = {INCR_BATCH_MOD - 1}),
             idx AS (SELECT DISTINCT content_hash FROM h
                     WHERE doc_id % {INCR_BATCH_MOD} <> {INCR_BATCH_MOD - 1})
        SELECT MIN(doc_id) AS doc_id, content_hash
        FROM new_batch nb
        -- NOT EXISTS, not NOT IN: a NULL text (NULL md5) must survive the
        -- anti-join here exactly as Spark's left_anti keeps null-key rows.
        WHERE NOT EXISTS (SELECT 1 FROM idx
                          WHERE idx.content_hash = nb.content_hash)
        GROUP BY content_hash
        ORDER BY doc_id
    """,
    "q_shuffle_shards": f"""
        WITH k AS (SELECT doc_id,
                          (doc_id * {SHUFFLE_MULT}) % {SHUFFLE_MOD} AS shuffle_key
                   FROM documents)
        SELECT doc_id,
               shuffle_key % {N_SHARDS} AS shard,
               ROW_NUMBER() OVER (PARTITION BY shuffle_key % {N_SHARDS}
                                  ORDER BY shuffle_key, doc_id) AS pos
        FROM k
        ORDER BY shard, pos
    """,
    "embedding_norm_outliers": f"""
        WITH n AS (SELECT vec_id,
                          CAST(FLOOR(sqrt(list_dot_product(
                                  CAST(embedding AS DOUBLE[]),
                                  CAST(embedding AS DOUBLE[]))) * {NORM_SCALE}.0)
                               AS BIGINT) AS norm_q
                   FROM embeddings),
             s AS (SELECT CAST(SUM(norm_q) AS DECIMAL(28,0)) AS sum_q,
                          COUNT(*) AS cnt FROM n)
        SELECT vec_id, norm_q,
               CAST(norm_q AS DECIMAL(28,0)) * cnt > sum_q * 2 AS is_high,
               CAST(norm_q AS DECIMAL(28,0)) * cnt * 2 < sum_q AS is_low
        FROM n CROSS JOIN s
        ORDER BY vec_id
    """,
    "dedup_keep_best": """
        WITH h AS (SELECT doc_id, md5(text) AS content_hash,
                          CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS e
                   FROM documents),
             g AS (SELECT content_hash, COUNT(*) AS n_copies,
                          CAST(SUM(e) AS BIGINT) AS n_en
                   FROM h GROUP BY content_hash),
             k AS (SELECT content_hash, doc_id AS keep_doc_id,
                          ROW_NUMBER() OVER (PARTITION BY content_hash
                                             ORDER BY e DESC, doc_id) AS rn
                   FROM h)
        SELECT g.content_hash, keep_doc_id, n_copies, n_en
        FROM g JOIN k ON g.content_hash = k.content_hash
        WHERE rn = 1
        ORDER BY keep_doc_id
    """,
}
