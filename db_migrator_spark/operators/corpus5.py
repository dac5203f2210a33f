"""Tokenizer-training and sampling operators (round 7).

The reference is a 1:1 table copier with no corpus operators (scope:
/root/reference/src/migrate/table_migrator.rs:43-114 is its entire data
path); these supply three more stages a training-data pipeline runs
between curation and training:

- ``text_bpe_pair_counts``: the first merge step of BPE tokenizer
  training (Sennrich et al. 2016, arXiv:1508.07909) — adjacent
  character-pair frequencies, words weighted by corpus frequency. The
  scale trick IS the classic BPE one: the corpus compresses to a
  word-frequency table first (one map-side-combined shuffle over the
  corpus), and pair explosion runs over the DISTINCT VOCABULARY — at
  100 TB the vocab is millions of rows where the corpus is trillions,
  so the quadratic-ish per-word work lands on the small relation.
- ``q_weighted_sample``: deterministic weighted sampling WITHOUT
  replacement via the integer-lottery method: a document of weight w
  holds w tickets, each ticket's key is md5(doc_id:ticket), the doc's
  draw is its minimum ticket key, and the k smallest draws win. For
  integer weights this is exactly "every ticket equally likely" — no
  RNG, no row order, reproducible from data alone — and md5 plus
  lexicographic compare are bit-identical across engines (the
  ``splits.py`` contract). Per-row work is O(w) with W_CAP bounding it.
- ``corpus_curriculum_order``: curriculum scheduling — bin documents by
  a difficulty proxy, then emit a round-robin interleave of the bins so
  a sequential trainer sees a stable easy/hard mix in every stripe
  rather than all-easy-then-all-hard.

Scale notes (100 TB): BPE = one corpus shuffle (vocab agg) + vocab-sized
explode + one TakeOrdered top-k; weighted sample = pure projection +
bounded explode + TakeOrdered (no shuffle other than top-k); curriculum
= one window partitioned by bin (BIN_COUNT-way parallelism — for a
trillion-row corpus partition the window by (bin, shard) and offset by
shard size; noted, not needed at fixture scale). Nothing collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from ..io import load_table

# BPE: words shorter than 2 chars have no pairs; longer than WORD_CAP are
# non-linguistic blobs (base64, URLs) that production tokenizers
# pre-split — the cap bounds per-word explode fan-out. Part of the op's
# contract, applied identically in the oracle.
BPE_WORD_CAP = 32
BPE_TOP_K = 100

# Weighted sample: weight 1..W_CAP tickets per doc (one per 400 chars,
# capped) — explode fan-out is bounded by the cap, not the data.
W_PER_CHARS = 400
W_CAP = 8
SAMPLE_K = 200

# Curriculum: difficulty proxy bins (doc length); BIN_WIDTH chars per
# bin, top bin open-ended.
BIN_WIDTH = 500
BIN_MAX = 3


def text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top adjacent character-pair counts across the corpus, words
    weighted by frequency — BPE merge-candidate scoring. One corpus
    shuffle (word -> freq), then pair explosion over the vocab only."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("w")
    ).filter((F.length("w") >= 2) & (F.length("w") <= BPE_WORD_CAP))
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    pairs = vocab.select(
        F.explode(F.expr("sequence(1, length(w) - 1)")).alias("i"),
        F.col("w"),
        F.col("freq"),
    ).select(F.expr("substr(w, i, 2)").alias("pair"), "freq")
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").cast("bigint").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "pair")
        .limit(BPE_TOP_K)
    )


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sample of SAMPLE_K documents without
    replacement: weight = 1 + min(n_chars // W_PER_CHARS, W_CAP - 1)
    tickets each, draw = min ticket hash, k smallest draws win."""
    docs = load_table(spark, sf_dir, "documents")
    weight = (
        F.lit(1)
        + F.least(
            (F.col("n_chars") / W_PER_CHARS).cast("bigint"),
            F.lit(W_CAP - 1),
        )
    ).alias("weight")
    tickets = docs.select("doc_id", "n_chars", weight).select(
        "doc_id",
        "n_chars",
        "weight",
        F.explode(F.expr("sequence(1, weight)")).alias("ticket"),
    )
    draws = tickets.select(
        "doc_id",
        "n_chars",
        "weight",
        F.md5(
            F.concat(
                F.col("doc_id").cast("string"),
                F.lit(":"),
                F.col("ticket").cast("string"),
            ).cast("binary")
        ).alias("tkey"),
    )
    return (
        draws.groupBy("doc_id", "n_chars", "weight")
        .agg(F.min("tkey").alias("draw"))
        .orderBy("draw", "doc_id")
        .limit(SAMPLE_K)
    )


def corpus_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-robin interleave of difficulty bins: position p of the
    output cycles bin 0, 1, 2, ... so every training stripe carries the
    same difficulty mix. Deterministic: within-bin order is doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    bin_ = F.least(
        (F.col("n_chars") / BIN_WIDTH).cast("bigint"), F.lit(BIN_MAX)
    ).alias("bin")
    binned = docs.select("doc_id", "lang", "n_chars", bin_)
    pos = F.row_number().over(W.partitionBy("bin").orderBy("doc_id"))
    return (
        binned.select("doc_id", "lang", "n_chars", "bin", pos.alias("bin_pos"))
        .orderBy("bin_pos", "bin", "doc_id")
    )


QUERIES = {
    "text_bpe_pair_counts": text_bpe_pair_counts,
    "q_weighted_sample": q_weighted_sample,
    "corpus_curriculum_order": corpus_curriculum_order,
}

ORACLES = {
    "text_bpe_pair_counts": f"""
        WITH toks AS (
            SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        vocab AS (
            SELECT w, COUNT(*) AS freq
            FROM toks
            WHERE len(w) >= 2 AND len(w) <= {BPE_WORD_CAP}
            GROUP BY w),
        pairs AS (
            SELECT substr(w, CAST(i AS INTEGER), 2) AS pair, freq
            FROM vocab, unnest(range(1, len(w))) AS t(i))
        SELECT pair, CAST(SUM(freq) AS BIGINT) AS pair_count
        FROM pairs
        GROUP BY pair
        ORDER BY pair_count DESC, pair
        LIMIT {BPE_TOP_K}
    """,
    "q_weighted_sample": f"""
        WITH weighted AS (
            SELECT doc_id, n_chars,
                   1 + LEAST(n_chars // {W_PER_CHARS}, {W_CAP - 1}) AS weight
            FROM documents),
        draws AS (
            SELECT doc_id, n_chars, weight,
                   MIN(md5(doc_id || ':' || CAST(i AS VARCHAR))) AS draw
            FROM weighted, unnest(range(1, weight + 1)) AS t(i)
            GROUP BY doc_id, n_chars, weight)
        SELECT doc_id, n_chars, weight, draw
        FROM draws
        ORDER BY draw, doc_id
        LIMIT {SAMPLE_K}
    """,
    "corpus_curriculum_order": f"""
        WITH binned AS (
            SELECT doc_id, lang, n_chars,
                   LEAST(n_chars // {BIN_WIDTH}, {BIN_MAX}) AS bin
            FROM documents)
        SELECT doc_id, lang, n_chars, bin,
               CAST(ROW_NUMBER() OVER (PARTITION BY bin ORDER BY doc_id)
                    AS INTEGER) AS bin_pos
        FROM binned
        ORDER BY bin_pos, bin, doc_id
    """,
}
