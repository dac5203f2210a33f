"""Language-model corpus statistics (round 11).

The reference has no analytics surface (it is a 1:1 table copier,
/root/reference/src/migrate/table_migrator.rs:43-114); these add the
vocabulary-statistics tier an LLM-data pipeline runs when sizing a
tokenizer and a sampling scheme, each in EXACT integer arithmetic so
the cross-engine hash match is bit-for-bit:

- ``text_heaps_curve``: vocabulary growth (Heaps' law raw material) —
  cumulative distinct word-trigram types and trigram tokens over the
  corpus in deterministic doc_id order, 20 fixed buckets. A type is
  "new" in the bucket of its FIRST occurrence (min doc_id per type).
- ``text_chao1_richness``: Chao1 species-richness estimate of the
  trigram vocabulary per language + pooled: V + f1^2/(2*f2) (f2 > 0,
  else the bias-corrected f1*(f1-1)/2 form), in exact micros — "how
  many types exist that we have NOT seen yet".
- ``text_good_turing``: Good-Turing frequency-of-frequencies table
  over per-document unigram term frequencies: N_r for r = 1..10 and
  the smoothed count r* = (r+1) * N_{r+1} / N_r in exact micros
  (-1 sentinel where N_{r+1} = 0) — the classical LM discounting
  table.
- ``text_negative_sampling_table``: the word2vec negative-sampling
  distribution, exactly: per-word weight floor(count^(3/4) * 1000)
  via an integer fourth root (double sqrt(sqrt) seed + a one-step
  exact DECIMAL correction — the ``corpus5._isqrt`` idiom widened to
  the quartic), then a largest-remainder allocation of the 1e6-draw
  budget so ``sum(alloc) == budget`` exactly. The remainder ranking
  runs on ``operators.distributed_rank`` (the vocabulary relation is
  data-derived, so no partitionless window).

Scale notes (100 TB): everything reduces to one token/trigram explode
(linear in corpus tokens) followed by vocabulary-sized aggregates;
the only windows are over the FIXED 20-bucket Heaps aggregate
(whitelisted grain) and the distributed-rank bin windows. No collects
beyond distributed_rank's bounded offset fold; no pair generation at
all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from ..io import load_table

HEAPS_BUCKETS = 20

GOOD_TURING_MAX_R = 10

NEG_BUDGET = 1_000_000
# weight scale: floor(count^(3/4) * NEG_W_SCALE); 1000 keeps three
# fractional digits of the 3/4-power exactly while z = c^3 * scale^4
# stays far inside DECIMAL(38,0) (exact while count < ~4.6e8).
NEG_W_SCALE = 1_000


def _trigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, tg) word-trigram instances; docs under 3 words drop
    (slice guard: Spark's sequence(1, 0) DESCENDS, not empty)."""
    return (
        docs.select("doc_id", "lang", F.split(F.col("text"), " ").alias("ws"))
        .filter(F.size("ws") >= 3)
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws) - 2),"
                    " i -> concat(ws[i-1], ' ', ws[i], ' ', ws[i+1]))"
                )
            ).alias("tg"),
        )
    )


def text_heaps_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth curve (module doc): per doc_id-order bucket the
    new trigram types, cumulative types, trigram tokens and cumulative
    tokens — the exact points a Heaps'-law fit would consume."""
    docs = load_table(spark, sf_dir, "documents")
    tgs = _trigrams(docs)
    maxid = docs.agg(F.max("doc_id").alias("max_id"))
    bucketed = tgs.crossJoin(F.broadcast(maxid)).select(
        "doc_id",
        "tg",
        F.least(
            F.lit(HEAPS_BUCKETS - 1),
            F.expr(f"(doc_id * {HEAPS_BUCKETS}) div (max_id + 1)"),
        ).alias("bucket"),
    )
    toks = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("bucket_trigrams")
    )
    first = (
        bucketed.groupBy("tg")
        .agg(F.min("bucket").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("new_types"))
    )
    wcum = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, 0)
    return (
        toks.join(first, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("new_types", F.lit(0)).cast("bigint").alias("new_types"),
            "bucket_trigrams",
        )
        .select(
            "bucket",
            "new_types",
            F.sum("new_types").over(wcum).cast("bigint").alias("cum_types"),
            "bucket_trigrams",
            F.sum("bucket_trigrams")
            .over(wcum)
            .cast("bigint")
            .alias("cum_trigrams"),
        )
        .orderBy("bucket")
    )


def text_chao1_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 richness of the trigram vocabulary per language plus the
    pooled '*' row (module doc). Output: lang, n_types, f1, f2,
    chao1_micro."""
    docs = load_table(spark, sf_dir, "documents")
    tgs = _trigrams(docs)

    def summarize(counts: DataFrame, key_col) -> DataFrame:
        chao = (
            "CAST(CAST(n_types AS DECIMAL(38,0)) * 1000000 + "
            "CASE WHEN f2 > 0"
            " THEN CAST(f1 AS DECIMAL(38,0)) * f1 * 1000000 div (2 * f2)"
            " ELSE CAST(f1 AS DECIMAL(38,0)) * (f1 - 1) * 1000000 div 2"
            " END AS BIGINT)"
        )
        return counts.select(
            key_col.alias("lang"),
            "n_types",
            "f1",
            "f2",
            F.expr(chao).alias("chao1_micro"),
        )

    per_lang = summarize(
        tgs.groupBy("lang", "tg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
            F.sum((F.col("c") == 1).cast("bigint")).cast("bigint").alias("f1"),
            F.sum((F.col("c") == 2).cast("bigint")).cast("bigint").alias("f2"),
        ),
        F.col("lang"),
    )
    pooled = summarize(
        tgs.groupBy("tg")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
            F.sum((F.col("c") == 1).cast("bigint")).cast("bigint").alias("f1"),
            F.sum((F.col("c") == 2).cast("bigint")).cast("bigint").alias("f2"),
        ),
        F.lit("*"),
    )
    return per_lang.unionByName(pooled).orderBy("lang")


def text_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing N_r table over per-document unigram term frequencies
    (module doc). Output rows r = 1..GOOD_TURING_MAX_R where N_r > 0:
    r, n_r, r_star_micro (-1 where N_{r+1} = 0)."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("w")
        )
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("r"))
    )
    nr = (
        tf.filter(F.col("r") <= GOOD_TURING_MAX_R + 1)
        .groupBy("r")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_r"))
    )
    nxt = nr.select(
        (F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r_next")
    )
    return (
        nr.filter(F.col("r") <= GOOD_TURING_MAX_R)
        .join(nxt, "r", "left")
        .select(
            F.col("r").cast("bigint").alias("r"),
            "n_r",
            F.expr(
                "CASE WHEN n_r_next IS NULL THEN -1"
                " ELSE CAST((r + 1) * CAST(n_r_next AS DECIMAL(38,0))"
                " * 1000000 div n_r AS BIGINT) END"
            ).alias("r_star_micro"),
        )
        .orderBy("r")
    )


def _quartic_root_floor(z_expr: str) -> str:
    """SQL for exact floor(z^(1/4)) of a non-negative DECIMAL(38,0) z.

    Seed: floor(sqrt(sqrt(double))) — two correctly-rounded IEEE sqrts
    on a <=1-ulp-rounded input keep the absolute error far below 1 for
    any z a DECIMAL(38,0) holds (relative error ~3e-16 -> absolute
    ~5e-7 at r ~ 1.8e9), so a one-step +/-1 correction against the
    EXACT decimal fourth power pins the floor. DuckDB runs the same
    seed + correction on HUGEINT (oracle side)."""
    seed = f"CAST(FLOOR(SQRT(SQRT(CAST(({z_expr}) AS DOUBLE)))) AS BIGINT)"
    return (
        f"CASE WHEN CAST(({seed}) + 1 AS DECIMAL(38,0)) * (({seed}) + 1)"
        f" * (({seed}) + 1) * (({seed}) + 1) <= ({z_expr}) THEN ({seed}) + 1"
        f" WHEN CAST(({seed}) AS DECIMAL(38,0)) * ({seed}) * ({seed})"
        f" * ({seed}) > ({z_expr}) THEN ({seed}) - 1"
        f" ELSE ({seed}) END"
    )


def text_negative_sampling_table(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """word2vec negative-sampling table (module doc): per word the
    corpus count, the exact 3/4-power weight (milli), and the
    largest-remainder allocation of NEG_BUDGET draws. sum(alloc) ==
    NEG_BUDGET exactly."""
    from .distributed_rank import quantile_cuts, with_global_rank

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    scale4 = NEG_W_SCALE**4
    weighted = counts.select(
        "w",
        "c",
        F.expr(
            _quartic_root_floor(
                f"CAST(c AS DECIMAL(38,0)) * c * c * {scale4}"
            )
        )
        .cast("bigint")
        .alias("weight_milli"),
    )
    tot = weighted.agg(
        F.sum(F.col("weight_milli").cast("decimal(38,0)")).alias("w_tot")
    )
    quotas = weighted.crossJoin(F.broadcast(tot)).select(
        "w",
        "c",
        "weight_milli",
        F.expr(
            f"CAST(CAST({NEG_BUDGET} AS DECIMAL(38,0)) * weight_milli"
            " div w_tot AS BIGINT)"
        ).alias("base_alloc"),
        F.expr(
            f"CAST(CAST({NEG_BUDGET} AS DECIMAL(38,0)) * weight_milli"
            " % w_tot AS DECIMAL(38,0))"
        ).alias("rem"),
    )
    leftovers = quotas.agg(
        (F.lit(NEG_BUDGET) - F.sum("base_alloc")).cast("bigint").alias("k")
    )
    cuts = quantile_cuts(quotas, ["rem"])["rem"]
    ranked = with_global_rank(
        quotas, "rem", ["w"], cuts=cuts, descending=True,
        rank_col="__rr", total_col="__nw",
    )
    return (
        ranked.crossJoin(F.broadcast(leftovers))
        .select(
            "w",
            "c",
            "weight_milli",
            (
                F.col("base_alloc")
                + (F.col("__rr") <= F.col("k")).cast("bigint")
            )
            .cast("bigint")
            .alias("alloc"),
        )
        .orderBy("w")
    )


QUERIES = {
    "text_heaps_curve": text_heaps_curve,
    "text_chao1_richness": text_chao1_richness,
    "text_good_turing": text_good_turing,
    "text_negative_sampling_table": text_negative_sampling_table,
}

_TG_SQL = """
        tg0 AS (
            SELECT doc_id, lang, string_split(text, ' ') AS ws
            FROM documents),
        tgs AS (
            SELECT doc_id, lang,
                   unnest(list_transform(
                       ws[1:len(ws) - 2],
                       (x, i) -> x || ' ' || ws[i + 1] || ' ' || ws[i + 2]))
                       AS tg
            FROM tg0 WHERE len(ws) >= 3)
"""

ORACLES = {
    "text_heaps_curve": f"""
        WITH {_TG_SQL},
        mx AS (SELECT MAX(doc_id) AS max_id FROM documents),
        bucketed AS (
            SELECT t.doc_id, t.tg,
                   LEAST({HEAPS_BUCKETS - 1},
                         (t.doc_id * {HEAPS_BUCKETS}) // (m.max_id + 1))
                       AS bucket
            FROM tgs t, mx m),
        toks AS (
            SELECT bucket, CAST(COUNT(*) AS BIGINT) AS bucket_trigrams
            FROM bucketed GROUP BY bucket),
        first AS (
            SELECT bucket, CAST(COUNT(*) AS BIGINT) AS new_types
            FROM (SELECT tg, MIN(bucket) AS bucket FROM bucketed GROUP BY tg)
            GROUP BY bucket)
        SELECT t.bucket,
               CAST(COALESCE(f.new_types, 0) AS BIGINT) AS new_types,
               CAST(SUM(COALESCE(f.new_types, 0))
                    OVER (ORDER BY t.bucket ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS cum_types,
               t.bucket_trigrams,
               CAST(SUM(t.bucket_trigrams)
                    OVER (ORDER BY t.bucket ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS cum_trigrams
        FROM toks t LEFT JOIN first f ON f.bucket = t.bucket
        ORDER BY t.bucket
    """,
    "text_chao1_richness": f"""
        WITH {_TG_SQL},
        lc AS (SELECT lang, tg, COUNT(*) AS c FROM tgs GROUP BY 1, 2),
        per AS (
            SELECT lang,
                   CAST(COUNT(*) AS BIGINT) AS n_types,
                   CAST(COUNT(*) FILTER (c = 1) AS BIGINT) AS f1,
                   CAST(COUNT(*) FILTER (c = 2) AS BIGINT) AS f2
            FROM lc GROUP BY lang),
        pc AS (SELECT tg, COUNT(*) AS c FROM tgs GROUP BY 1),
        pooled AS (
            SELECT '*' AS lang,
                   CAST(COUNT(*) AS BIGINT) AS n_types,
                   CAST(COUNT(*) FILTER (c = 1) AS BIGINT) AS f1,
                   CAST(COUNT(*) FILTER (c = 2) AS BIGINT) AS f2
            FROM pc),
        u AS (SELECT * FROM per UNION ALL SELECT * FROM pooled)
        SELECT lang, n_types, f1, f2,
               CAST(CAST(n_types AS HUGEINT) * 1000000 +
                    CASE WHEN f2 > 0
                         THEN CAST(f1 AS HUGEINT) * f1 * 1000000 // (2 * f2)
                         ELSE CAST(f1 AS HUGEINT) * (f1 - 1) * 1000000 // 2
                    END AS BIGINT) AS chao1_micro
        FROM u
        ORDER BY lang
    """,
    "text_good_turing": f"""
        WITH tf AS (
            SELECT doc_id, w, COUNT(*) AS r
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                  FROM documents)
            GROUP BY doc_id, w),
        nr AS (
            SELECT r, CAST(COUNT(*) AS BIGINT) AS n_r
            FROM tf WHERE r <= {GOOD_TURING_MAX_R + 1}
            GROUP BY r)
        SELECT CAST(a.r AS BIGINT) AS r, a.n_r,
               CASE WHEN b.n_r IS NULL THEN -1
                    ELSE CAST((a.r + 1) * CAST(b.n_r AS HUGEINT)
                              * 1000000 // a.n_r AS BIGINT) END
                   AS r_star_micro
        FROM nr a LEFT JOIN nr b ON b.r = a.r + 1
        WHERE a.r <= {GOOD_TURING_MAX_R}
        ORDER BY a.r
    """,
    "text_negative_sampling_table": f"""
        WITH counts AS (
            SELECT w, CAST(COUNT(*) AS BIGINT) AS c
            FROM (SELECT unnest(string_split(text, ' ')) AS w
                  FROM documents)
            GROUP BY w),
        z AS (
            SELECT w, c,
                   CAST(c AS HUGEINT) * c * c * {NEG_W_SCALE**4} AS z,
                   CAST(FLOOR(SQRT(SQRT(CAST(
                       CAST(c AS HUGEINT) * c * c * {NEG_W_SCALE**4}
                       AS DOUBLE)))) AS BIGINT) AS r0
            FROM counts),
        weighted AS (
            SELECT w, c,
                   CAST(CASE WHEN CAST(r0 + 1 AS HUGEINT) * (r0 + 1)
                                  * (r0 + 1) * (r0 + 1) <= z THEN r0 + 1
                             WHEN CAST(r0 AS HUGEINT) * r0 * r0 * r0 > z
                                  THEN r0 - 1
                             ELSE r0 END AS BIGINT) AS weight_milli
            FROM z),
        tot AS (SELECT CAST(SUM(weight_milli) AS HUGEINT) AS w_tot
                FROM weighted),
        quotas AS (
            SELECT w, c, weight_milli,
                   CAST(CAST({NEG_BUDGET} AS HUGEINT) * weight_milli
                        // w_tot AS BIGINT) AS base_alloc,
                   CAST({NEG_BUDGET} AS HUGEINT) * weight_milli % w_tot
                       AS rem
            FROM weighted, tot),
        lk AS (SELECT CAST({NEG_BUDGET} - SUM(base_alloc) AS BIGINT) AS k
               FROM quotas),
        ranked AS (
            SELECT q.*, lk.k,
                   ROW_NUMBER() OVER (ORDER BY q.rem DESC, q.w) AS rr
            FROM quotas q, lk)
        SELECT w, c, weight_milli,
               CAST(base_alloc + CASE WHEN rr <= k THEN 1 ELSE 0 END
                    AS BIGINT) AS alloc
        FROM ranked
        ORDER BY w
    """,
}


KN_TOP_K = 100


def text_kneser_ney_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser-Ney continuation-count table over corpus bigrams — the
    quantities interpolated KN smoothing needs, all exact integers:

    - per word w: c(w) (unigram count), N1+(. w) (distinct left
      contexts — the CONTINUATION count that replaces raw frequency in
      the KN lower-order model), N1+(w .) (distinct right contexts,
      the back-off normalizer), and the continuation probability
      P_cont(w) = N1+(. w) / N1+(..) in exact ppm;
    - one '*' summary row carrying the corpus-level discount
      D = n1 / (n1 + 2*n2) in ppm, where n1/n2 are the counts of
      bigram TYPES seen exactly once/twice (absolute discounting's
      closed form), surfaced in the n1plus_left/right columns as
      n1 and n2.

    Output: the KN_TOP_K words by continuation count (ties by word)
    plus the summary row — the table an n-gram LM training job
    persists.

    Scale shape (100 TB): one bigram explode (linear in tokens),
    map-side-combined into bigram-type counts; the per-word rollups
    shuffle on the word key; top-K is TakeOrderedAndProject. The
    N1+(..) total and discount ride broadcast 1-row aggregates.
    """
    docs = load_table(spark, sf_dir, "documents")
    ws = docs.select(F.split(F.col("text"), " ").alias("ws")).filter(
        F.size("ws") >= 2
    )
    bigrams = (
        ws.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws) - 1),"
                    " i -> struct(ws[i - 1] AS l, ws[i] AS r))"
                )
            ).alias("bg")
        )
        .select("bg.l", "bg.r")
        .filter((F.col("l") != "") & (F.col("r") != ""))
        .groupBy("l", "r")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    uni = bigrams.groupBy(F.col("l").alias("w")).agg(
        F.sum("n").cast("bigint").alias("c_w")
    )
    left_ctx = bigrams.groupBy(F.col("r").alias("w")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n1p_left")
    )
    right_ctx = bigrams.groupBy(F.col("l").alias("w")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n1p_right")
    )
    tot = bigrams.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigram_types"),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("n") == 2, 1).otherwise(0))
        .cast("bigint")
        .alias("n2"),
    )
    top = (
        left_ctx.join(uni, "w", "left")
        .join(right_ctx, "w", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "w",
            F.coalesce("c_w", F.lit(0)).alias("c_w"),
            F.col("n1p_left"),
            F.coalesce("n1p_right", F.lit(0)).alias("n1p_right"),
            F.expr(
                "n1p_left * 1000000 div n_bigram_types"
            ).alias("p_cont_ppm"),
        )
        .orderBy(F.desc("n1p_left"), "w")
        .limit(KN_TOP_K)
    )
    summary = tot.select(
        F.lit("*").alias("w"),
        F.col("n_bigram_types").alias("c_w"),
        F.col("n1").alias("n1p_left"),
        F.col("n2").alias("n1p_right"),
        F.expr(
            "CASE WHEN n1 + 2 * n2 = 0 THEN 0"
            " ELSE n1 * 1000000 div (n1 + 2 * n2) END"
        ).alias("p_cont_ppm"),
    )
    return top.unionByName(summary).orderBy(
        F.desc("n1p_left"), "w"
    )


QUERIES["text_kneser_ney_counts"] = text_kneser_ney_counts

ORACLES["text_kneser_ney_counts"] = f"""
    WITH ws AS (
        SELECT string_split(text, ' ') AS w FROM documents
        WHERE len(string_split(text, ' ')) >= 2),
    bigrams AS (
        SELECT w[i] AS l, w[i + 1] AS r, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT w, unnest(generate_series(1, len(w) - 1)) AS i
              FROM ws)
        WHERE w[i] != '' AND w[i + 1] != ''
        GROUP BY 1, 2),
    uni AS (
        SELECT l AS w, CAST(SUM(n) AS BIGINT) AS c_w
        FROM bigrams GROUP BY 1),
    lctx AS (
        SELECT r AS w, CAST(COUNT(*) AS BIGINT) AS n1p_left
        FROM bigrams GROUP BY 1),
    rctx AS (
        SELECT l AS w, CAST(COUNT(*) AS BIGINT) AS n1p_right
        FROM bigrams GROUP BY 1),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_bigram_types,
               CAST(COUNT(*) FILTER (n = 1) AS BIGINT) AS n1,
               CAST(COUNT(*) FILTER (n = 2) AS BIGINT) AS n2
        FROM bigrams),
    top AS (
        SELECT lc.w,
               COALESCE(u.c_w, 0) AS c_w,
               lc.n1p_left,
               COALESCE(rc.n1p_right, 0) AS n1p_right,
               lc.n1p_left * 1000000 // t.n_bigram_types AS p_cont_ppm
        FROM lctx lc
        LEFT JOIN uni u ON u.w = lc.w
        LEFT JOIN rctx rc ON rc.w = lc.w, tot t
        ORDER BY lc.n1p_left DESC, lc.w
        LIMIT {KN_TOP_K}),
    summary AS (
        SELECT '*' AS w, n_bigram_types AS c_w,
               n1 AS n1p_left, n2 AS n1p_right,
               CASE WHEN n1 + 2 * n2 = 0 THEN 0
                    ELSE n1 * 1000000 // (n1 + 2 * n2) END AS p_cont_ppm
        FROM tot)
    SELECT * FROM (SELECT * FROM top UNION ALL SELECT * FROM summary)
    ORDER BY n1p_left DESC, w
"""
