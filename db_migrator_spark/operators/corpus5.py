"""Tokenizer-training and sampling operators (round 7).

The reference is a 1:1 table copier with no corpus operators (scope:
/root/reference/src/migrate/table_migrator.rs:43-114 is its entire data
path); these supply the stages a training-data pipeline runs between
curation and training. Later round-7 additions documented at their
definitions: temperature-(T=2) language mixing (``corpus_temperature_mix``),
PMI word co-occurrence (``text_pmi_pairs``), per-doc bigram coverage
(``text_bigram_coverage``), the composed split->quota plan
(``corpus_train_mix_plan``), and the one-row dataset card
(``corpus_dataset_card``). The founding three:

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

# Temperature mixing: T = 2 => per-language weight proportional to
# sqrt(n_docs) (the multilingual temperature-sampling rule of mT5 /
# XLM-R, arXiv:1901.07291 sec 3.1). All arithmetic is exact integers:
# sqrt runs as an adjusted integer sqrt (see _isqrt), shares surface in
# ppm via truncating integral division.
TEMP_SQRT_SCALE = 1_000_000  # isqrt(n * 1e6) = floor(1e3 * sqrt(n))

# PMI co-occurrence: per-doc candidate words are the PMI_DOC_CAP rarest
# (by corpus doc-frequency) — bounds pair fan-out at C(cap, 2) per doc
# regardless of doc width. Stopword kill: words present in more than
# PMI_DF_MAX_PCT% of documents carry no signal (their lift ~ 1 by
# construction); the synthetic fixture's vocabulary sits under the
# threshold, so the guard is exercised structurally, not numerically.
# Pairs seen in fewer than PMI_MIN_COOC docs are noise.
PMI_WORD_MIN_LEN = 3
PMI_DF_MAX_PCT = 90
PMI_DOC_CAP = 20
PMI_MIN_COOC = 3
PMI_TOP_K = 100


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


def _isqrt(x) -> F.Column:
    """Exact floor(sqrt(x)) for non-negative bigint x, cross-engine.

    floor(sqrt(double)) alone can be off by one near perfect squares
    (the double rounding of x, then of sqrt, each contribute < 1 ulp);
    the two guarded corrections pin it exactly. DuckDB runs the same
    three-branch CASE, so the surfaces agree bit-for-bit at any
    magnitude a bigint can hold.
    """
    s = F.floor(F.sqrt(F.col(x).cast("double") if isinstance(x, str) else x.cast("double"))).cast("bigint")
    xv = F.col(x) if isinstance(x, str) else x
    return (
        F.when((s + 1) * (s + 1) <= xv, s + 1)
        .when(s * s > xv, s - 1)
        .otherwise(s)
    )


def corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language sampling plan at temperature T = 2: target share
    proportional to sqrt(raw share) — low-resource languages upsampled,
    the head compressed. Output: raw share and target share in exact
    ppm, plus the integer sqrt weight they derive from.

    Plan: one map-side-combined groupBy(lang) (languages ~ O(100) at
    any corpus size), then a broadcast one-row total — no second
    shuffle, nothing collected.
    """
    docs = load_table(spark, sf_dir, "documents")
    by_lang = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    totals = by_lang.agg(
        F.sum("n_docs").alias("total_docs")
    )
    weighted = by_lang.crossJoin(F.broadcast(totals)).select(
        "lang",
        "n_docs",
        "total_docs",
        _isqrt(F.col("n_docs") * TEMP_SQRT_SCALE).alias("temp_weight_milli"),
    )
    wtotals = weighted.agg(F.sum("temp_weight_milli").alias("total_weight"))
    return (
        weighted.crossJoin(F.broadcast(wtotals))
        .select(
            "lang",
            "n_docs",
            F.expr("n_docs * 1000000 div total_docs").alias("share_ppm"),
            "temp_weight_milli",
            F.expr("temp_weight_milli * 1000000 div total_weight").alias(
                "target_ppm"
            ),
        )
        .orderBy("lang")
    )


def text_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top within-document word co-occurrences ranked by PMI lift:
    lift_ppm = (c_xy * n_docs * 1e6) div (df_x * df_y) — the exact
    integer cross-ratio whose log is PMI, so the ranking is PMI's
    without either engine taking a log.

    Scale shape: tokenize -> distinct (doc, word) (one shuffle) ->
    doc-frequency join (word-keyed; the df table is vocabulary-sized)
    -> per-doc cap to the PMI_DOC_CAP rarest words (bounds the pair
    explode at C(cap,2) per doc) -> pair count (one shuffle) -> top-K.
    No stage is quadratic in doc width or corpus size.
    """
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    n_docs_df = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    doc_words = (
        docs.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("w")
        )
        .filter(F.length("w") >= PMI_WORD_MIN_LEN)
        .distinct()
    )
    df_tab = doc_words.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    mid = (
        doc_words.join(df_tab, "w")
        .crossJoin(F.broadcast(n_docs_df))
        .filter(F.col("df") * 100 <= F.col("n_docs") * PMI_DF_MAX_PCT)
    )
    # Row-local capped pair generation (round 9, the graph2
    # _copair_explode idiom): ONE doc-keyed aggregate collects each
    # document's (df, w) structs, sort_array + slice keeps the
    # PMI_DOC_CAP rarest — identical to the former row_number window
    # ((df, w) is unique per doc, so the lexicographic struct order IS
    # the window's ORDER BY df, w — same rows survive the cap) — and
    # the C(cap,2) pair explode runs inside codegen with w1 < w2
    # enforced per pair, replacing the doc_id self-join. Same pair
    # multiset, one shuffle instead of window + join re-exchange.
    capped_lists = mid.groupBy("doc_id").agg(
        F.slice(
            F.sort_array(F.collect_list(F.struct("df", "w"))),
            1,
            PMI_DOC_CAP,
        ).alias("ws"),
        F.first("n_docs").alias("n_docs"),
    )
    pair_rows = capped_lists.select(
        "n_docs",
        F.explode(
            F.expr(
                "flatten(transform(ws, (x, i) -> "
                "transform(slice(ws, i + 2, size(ws)), y -> struct("
                "CASE WHEN x.w < y.w THEN x.w ELSE y.w END AS w1, "
                "CASE WHEN x.w < y.w THEN y.w ELSE x.w END AS w2, "
                "CASE WHEN x.w < y.w THEN x.df ELSE y.df END AS df1, "
                "CASE WHEN x.w < y.w THEN y.df ELSE x.df END AS df2))))"
            )
        ).alias("p"),
    ).select("p.w1", "p.w2", "p.df1", "p.df2", "n_docs")
    pairs = (
        pair_rows.groupBy("w1", "w2", "df1", "df2", "n_docs")
        .agg(F.count(F.lit(1)).alias("cooc"))
        .filter(F.col("cooc") >= PMI_MIN_COOC)
    )
    return (
        pairs.select(
            "w1",
            "w2",
            F.col("cooc").cast("bigint").alias("cooc"),
            F.col("df1").cast("bigint").alias("df1"),
            F.col("df2").cast("bigint").alias("df2"),
            # Decimal operands: at 100 TB cooc * n_docs * 1e6 can pass
            # 2^63; DECIMAL(38,0) holds ~1e30 and `div` == DuckDB
            # HUGEINT `//` (the relational.py round-7 contract).
            F.expr(
                "CAST(CAST(cooc AS DECIMAL(38,0)) * n_docs * 1000000"
                " div (CAST(df1 AS DECIMAL(38,0)) * df2) AS BIGINT)"
            ).alias("lift_ppm"),
        )
        .orderBy(F.desc("lift_ppm"), "w1", "w2")
        .limit(PMI_TOP_K)
    )


# Bigram coverage: per-document hit rate against the corpus-wide top-M
# bigram table — a cheap LM-free "how typical is this text" score (high
# coverage = boilerplate-ish, near-zero = noise/contamination). M bounds
# the reference table at a broadcastable constant.
BIGRAM_TOP_M = 500


def text_bigram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc adjacent-word-pair coverage against the corpus top-M
    bigram list, in exact ppm.

    Plan: one corpus shuffle to count bigrams, TakeOrdered top-M (a
    constant), broadcast the M-row set back, one semi-join-shaped
    conditional count per doc. The per-doc bigram explode is linear in
    tokens; nothing quadratic, nothing collected.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("ws")
    ).filter(F.size("ws") >= 2)  # sequence(1, 0) would DESCEND, not empty
    bigrams = toks.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, size(ws) - 1), i -> concat(ws[i-1], ' ', ws[i]))")
        ).alias("bg"),
    )
    top = (
        bigrams.groupBy("bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "bg")
        .limit(BIGRAM_TOP_M)
        .select("bg", F.lit(1).alias("hit"))
    )
    scored = (
        bigrams.join(F.broadcast(top), "bg", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("bigint").alias("n_hits"),
        )
    )
    return scored.select(
        "doc_id",
        "n_bigrams",
        "n_hits",
        F.expr("n_hits * 1000000 div n_bigrams").alias("coverage_ppm"),
    ).orderBy("doc_id")


def corpus_train_mix_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed stage: leakage-safe split -> TRAIN side only -> per-
    language counts -> temperature-(T=2) targets -> integer per-language
    sample quotas. The plan a mixing job hands the sampler: exactly how
    many train documents of each language to draw per epoch.

    One scan + one tiny groupBy: the split predicate is a codegen'd
    projection (no shuffle), the mixing math runs on the language-count
    relation. Demonstrates stage composition without materialization —
    the split column never hits storage.
    """
    from .splits import _split_col

    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(_split_col() == "train")
    by_lang = train.groupBy("lang").agg(F.count(F.lit(1)).alias("n_train"))
    tot = by_lang.agg(F.sum("n_train").alias("total_train"))
    weighted = by_lang.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_train",
        "total_train",
        _isqrt(F.col("n_train") * TEMP_SQRT_SCALE).alias("w_milli"),
    )
    wtot = weighted.agg(F.sum("w_milli").alias("total_w"))
    return (
        weighted.crossJoin(F.broadcast(wtot))
        .select(
            "lang",
            "n_train",
            F.expr("w_milli * 1000000 div total_w").alias("target_ppm"),
            F.expr(
                "CAST(CAST(w_milli AS DECIMAL(38,0)) * total_train"
                " div total_w AS BIGINT)"
            ).alias("quota_docs"),
        )
        .orderBy("lang")
    )


def text_bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One REAL BPE training iteration: pick the argmax character pair,
    merge it into a single symbol across the vocabulary, and recount
    adjacent SYMBOL pairs — the post-merge candidate table the next
    iteration would consume.

    The merge applies via plain string replace over the space-separated
    symbol form, whose left-to-right non-overlapping scan is identical
    in Spark and DuckDB (pinned: 'a a a' -> 'aa a'), so overlapping
    occurrences resolve the same way BPE's greedy left-to-right merge
    does. All work stays on the VOCABULARY relation (the corpus
    compressed to word -> freq — the classic BPE trick, see
    ``text_bpe_pair_counts``); the merge choice broadcasts as a one-row
    frame, never a collected scalar.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("w")
    ).filter((F.length("w") >= 2) & (F.length("w") <= BPE_WORD_CAP))
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    spaced = vocab.select(
        F.expr("trim(regexp_replace(w, '(.)', '$1 '))").alias("sw"), "freq"
    )
    char_pairs = spaced.select(
        F.explode(F.expr("transform(sequence(1, size(split(sw, ' ')) - 1), "
                         "i -> concat(split(sw, ' ')[i-1], ' ', split(sw, ' ')[i]))")).alias("p"),
        "freq",
    )
    top_merge = (
        char_pairs.groupBy("p")
        .agg(F.sum("freq").alias("c"))
        .orderBy(F.desc("c"), "p")
        .limit(1)
        .select(
            F.col("p").alias("merge_spaced"),
            F.replace(F.col("p"), F.lit(" "), F.lit("")).alias("merge_tok"),
        )
    )
    merged = spaced.crossJoin(F.broadcast(top_merge)).select(
        F.expr("replace(sw, merge_spaced, merge_tok)").alias("mw"),
        "freq",
        "merge_tok",
    )
    toks = merged.select(F.split(F.col("mw"), " ").alias("ts"), "freq", "merge_tok")
    sym_pairs = toks.filter(F.size("ts") >= 2).select(
        F.explode(
            F.expr("transform(sequence(1, size(ts) - 1), "
                   "i -> concat(ts[i-1], '|', ts[i]))")
        ).alias("pair"),
        "freq",
        "merge_tok",
    )
    return (
        sym_pairs.groupBy("pair", "merge_tok")
        .agg(F.sum("freq").cast("bigint").alias("pair_count"))
        .select("merge_tok", "pair", "pair_count")
        .orderBy(F.desc("pair_count"), "pair")
        .limit(BPE_TOP_K)
    )


def corpus_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row dataset card: the headline numbers a corpus release
    ships — document/token/char totals, language count, exact-duplicate
    rate (content md5), and singleton-document share, all exact.

    Two scans in total: one straight aggregate for the totals, one
    md5-keyed groupBy for the duplicate profile (the dedup_exact
    shuffle). Everything integer or decimal; rates in ppm by truncating
    division.
    """
    docs = load_table(spark, sf_dir, "documents")
    base = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " ")))
        .cast("bigint")
        .alias("n_tokens"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
        F.countDistinct("lang").alias("n_langs"),
    )
    dup = (
        docs.groupBy(F.md5(F.col("text").cast("binary")).alias("h"))
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.sum(F.col("c") - 1).cast("bigint").alias("n_dup_docs"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_singletons"),
        )
    )
    return (
        base.crossJoin(F.broadcast(dup))
        .select(
            "n_docs",
            "n_tokens",
            "n_chars",
            "n_langs",
            "n_dup_docs",
            F.expr("n_dup_docs * 1000000 div n_docs").alias("dup_rate_ppm"),
            F.expr("n_singletons * 1000000 div n_docs").alias(
                "singleton_ppm"
            ),
            F.expr("n_tokens * 1000000 div n_docs").alias(
                "tokens_per_doc_micro"
            ),
        )
    )


QUERIES = {
    "text_bpe_pair_counts": text_bpe_pair_counts,
    "q_weighted_sample": q_weighted_sample,
    "corpus_curriculum_order": corpus_curriculum_order,
    "corpus_temperature_mix": corpus_temperature_mix,
    "text_pmi_pairs": text_pmi_pairs,
    "text_bigram_coverage": text_bigram_coverage,
    "corpus_train_mix_plan": corpus_train_mix_plan,
    "corpus_dataset_card": corpus_dataset_card,
    "text_bpe_merge_step": text_bpe_merge_step,
}

from .splits import _SPLIT_SQL as _SPLIT_CASE_SQL  # noqa: E402

ORACLES = {
    "corpus_train_mix_plan": f"""
        WITH train AS (
            SELECT lang FROM documents
            WHERE ({_SPLIT_CASE_SQL}) = 'train'),
        by_lang AS (
            SELECT lang, COUNT(*) AS n_train FROM train GROUP BY lang),
        tot AS (SELECT SUM(n_train) AS total_train FROM by_lang),
        sq AS (
            SELECT lang, n_train, total_train,
                   CAST(FLOOR(SQRT(CAST(n_train * {TEMP_SQRT_SCALE}
                        AS DOUBLE))) AS BIGINT) AS s,
                   n_train * {TEMP_SQRT_SCALE} AS x
            FROM by_lang, tot),
        adj AS (
            SELECT lang, n_train, total_train,
                   CASE WHEN (s + 1) * (s + 1) <= x THEN s + 1
                        WHEN s * s > x THEN s - 1
                        ELSE s END AS w_milli
            FROM sq),
        wtot AS (SELECT SUM(w_milli) AS total_w FROM adj)
        SELECT lang, n_train,
               -- SUM() promotes to HUGEINT; an uncast HUGEINT output
               -- column is the r7/r8 driver-red signature (a pandas/arrow
               -- fetch degrades it to float64/decimal while Spark stays
               -- int64) — CAST pins the surface to BIGINT. All operands
               -- non-negative, so // is floor==truncate on any engine.
               CAST(w_milli * 1000000 // total_w AS BIGINT) AS target_ppm,
               CAST(CAST(w_milli AS HUGEINT) * total_train // total_w
                    AS BIGINT) AS quota_docs
        FROM adj, wtot
        ORDER BY lang
    """,
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
    # _isqrt's three-branch CASE transliterated; all shares via // on
    # BIGINT/HUGEINT (truncation toward zero, the div contract).
    "corpus_temperature_mix": f"""
        WITH by_lang AS (
            SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
        tot AS (SELECT SUM(n_docs) AS total_docs FROM by_lang),
        sq AS (
            SELECT lang, n_docs, total_docs,
                   CAST(FLOOR(SQRT(CAST(n_docs * {TEMP_SQRT_SCALE} AS DOUBLE)))
                        AS BIGINT) AS s,
                   n_docs * {TEMP_SQRT_SCALE} AS x
            FROM by_lang, tot),
        adj AS (
            SELECT lang, n_docs, total_docs,
                   CASE WHEN (s + 1) * (s + 1) <= x THEN s + 1
                        WHEN s * s > x THEN s - 1
                        ELSE s END AS temp_weight_milli
            FROM sq),
        wtot AS (SELECT SUM(temp_weight_milli) AS total_weight FROM adj)
        SELECT lang, n_docs,
               -- CAST: totals are HUGEINT (SUM promotion) and an uncast
               -- HUGEINT output column is the driver-red signature.
               CAST(n_docs * 1000000 // total_docs AS BIGINT) AS share_ppm,
               temp_weight_milli,
               CAST(temp_weight_milli * 1000000 // total_weight AS BIGINT)
                   AS target_ppm
        FROM adj, wtot
        ORDER BY lang
    """,
    "text_pmi_pairs": f"""
        WITH doc_words AS (
            SELECT DISTINCT doc_id, w
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                  FROM documents)
            WHERE len(w) >= {PMI_WORD_MIN_LEN}),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        df_tab AS (
            SELECT w, COUNT(*) AS df FROM doc_words GROUP BY w),
        mid AS (
            SELECT dw.doc_id, dw.w, df.df, n.n_docs
            FROM doc_words dw JOIN df_tab df ON df.w = dw.w, n
            WHERE df.df * 100 <= n.n_docs * 90),
        capped AS (
            SELECT * FROM (
                SELECT doc_id, w, df, n_docs,
                       ROW_NUMBER() OVER (
                           PARTITION BY doc_id ORDER BY df, w) AS rk
                FROM mid)
            WHERE rk <= {PMI_DOC_CAP}),
        pairs AS (
            SELECT a.w AS w1, b.w AS w2, a.df AS df1, b.df AS df2,
                   a.n_docs, COUNT(*) AS cooc
            FROM capped a JOIN capped b
              ON a.doc_id = b.doc_id AND a.w < b.w
            GROUP BY 1, 2, 3, 4, 5
            HAVING COUNT(*) >= {PMI_MIN_COOC})
        SELECT w1, w2,
               CAST(cooc AS BIGINT) AS cooc,
               CAST(df1 AS BIGINT) AS df1,
               CAST(df2 AS BIGINT) AS df2,
               CAST(CAST(cooc AS HUGEINT) * n_docs * 1000000
                   // (CAST(df1 AS HUGEINT) * df2) AS BIGINT) AS lift_ppm
        FROM pairs
        ORDER BY lift_ppm DESC, w1, w2
        LIMIT {PMI_TOP_K}
    """,
    "text_bpe_merge_step": f"""
        WITH words AS (
            SELECT w FROM (
                SELECT unnest(string_split(text, ' ')) AS w FROM documents)
            WHERE len(w) >= 2 AND len(w) <= {BPE_WORD_CAP}),
        vocab AS (SELECT w, COUNT(*) AS freq FROM words GROUP BY w),
        spaced AS (
            SELECT trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS sw, freq
            FROM vocab),
        cw AS (SELECT string_split(sw, ' ') AS ws, freq FROM spaced),
        cp AS (
            SELECT unnest(list_transform(
                       ws[1:len(ws) - 1], (x, i) -> x || ' ' || ws[i + 1]))
                       AS p, freq
            FROM cw WHERE len(ws) >= 2),
        top_merge AS (
            SELECT p AS merge_spaced, replace(p, ' ', '') AS merge_tok
            FROM (SELECT p, SUM(freq) AS c FROM cp GROUP BY p
                  ORDER BY c DESC, p LIMIT 1)),
        merged AS (
            SELECT replace(sw, merge_spaced, merge_tok) AS mw, freq,
                   merge_tok
            FROM spaced, top_merge),
        ts AS (SELECT string_split(mw, ' ') AS ts, freq, merge_tok FROM merged),
        sp AS (
            SELECT unnest(list_transform(
                       ts[1:len(ts) - 1], (x, i) -> x || '|' || ts[i + 1]))
                       AS pair, freq, merge_tok
            FROM ts WHERE len(ts) >= 2)
        SELECT merge_tok, pair, CAST(SUM(freq) AS BIGINT) AS pair_count
        FROM sp
        GROUP BY 1, 2
        ORDER BY pair_count DESC, pair
        LIMIT {BPE_TOP_K}
    """,
    "corpus_dataset_card": """
        WITH base AS (
            SELECT COUNT(*) AS n_docs,
                   CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                       AS n_tokens,
                   CAST(SUM(n_chars) AS BIGINT) AS n_chars,
                   COUNT(DISTINCT lang) AS n_langs
            FROM documents),
        groups AS (
            SELECT md5(text) AS h, COUNT(*) AS c
            FROM documents GROUP BY 1),
        dup AS (
            SELECT CAST(SUM(c - 1) AS BIGINT) AS n_dup_docs,
                   CAST(COUNT(*) FILTER (c = 1) AS BIGINT) AS n_singletons
            FROM groups)
        SELECT n_docs, n_tokens, n_chars, n_langs, n_dup_docs,
               n_dup_docs * 1000000 // n_docs AS dup_rate_ppm,
               n_singletons * 1000000 // n_docs AS singleton_ppm,
               n_tokens * 1000000 // n_docs AS tokens_per_doc_micro
        FROM base, dup
    """,
    "text_bigram_coverage": f"""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        bigrams AS (
            SELECT doc_id,
                   unnest(list_transform(
                       ws[1:len(ws) - 1],
                       (x, i) -> x || ' ' || ws[i + 1])) AS bg
            FROM toks
            WHERE len(ws) >= 2),
        top AS (
            SELECT bg FROM bigrams
            GROUP BY bg
            ORDER BY COUNT(*) DESC, bg
            LIMIT {BIGRAM_TOP_M}),
        scored AS (
            SELECT b.doc_id,
                   COUNT(*) AS n_bigrams,
                   CAST(COUNT(t.bg) AS BIGINT) AS n_hits
            FROM bigrams b LEFT JOIN top t ON t.bg = b.bg
            GROUP BY b.doc_id)
        SELECT doc_id, n_bigrams, n_hits,
               n_hits * 1000000 // n_bigrams AS coverage_ppm
        FROM scored
        ORDER BY doc_id
    """,
}
