"""Mergeable-sketch operators: HLL distinct counting and count-min
heavy hitters.

Sketches are the 100 TB answer to "how many distinct / how frequent"
questions: fixed-size state, map-side partial aggregation, and —
critically — MERGEABILITY, so per-shard sketches built independently
(per day, per source, per executor) union into the global answer
without rescanning. The reference has no aggregation surface at all
(its reads are 1:1 row streams, /root/reference/src/extract/extractor.rs:96-128);
this module supplies the sketch tier Spark-natively:

- ``q_hll_distinct_by_type``: Datasketches HLL per event type, PLUS the
  union of the per-type sketches as the global row — proving the
  merge path (union estimate computed FROM the sketches, not the data).
- ``q_cms_heavy_hitters``: count-min sketch over the corpus word
  stream; the sketch is built distributed, then probed for the exact
  top-K words. CMS never under-counts (estimate >= truth, bounded
  overcount) — pinned in tests.

Both are rows-only driver checks (DuckDB has no sketch twin); accuracy
against exact answers is asserted in tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession, functions as F

from ..io import load_table

HLL_LG_K = 12  # 2^12 registers — ~1.6% relative standard error
CMS_EPS = 0.0001
CMS_CONF = 0.99
CMS_SEED = 42
CMS_TOP_K = 20


def q_hll_distinct_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct users via HLL sketches + merged global row.

    Plan shape: ONE aggregation pass builds a fixed-size sketch per type
    (map-side partial merge — each task contributes a sketch, bytes not
    rows cross the wire); the global row is ``hll_union_agg`` over the
    six per-type sketches, never a rescan. At 100 TB this is the shape
    of every daily-rollup job: persist per-partition sketches, union on
    demand for any grouping.
    """
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg(F.col("user_id").cast("string"), F.lit(HLL_LG_K)).alias(
            "sketch"
        )
    )
    typed = per_type.select(
        "event_type",
        F.hll_sketch_estimate("sketch").alias("n_users_est"),
    )
    merged = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("n_users_est")
    ).select(F.lit("__ALL__").alias("event_type"), "n_users_est")
    return typed.unionByName(merged).orderBy("event_type")


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min estimates vs exact counts for the corpus's top-K words.

    The sketch builds in one distributed pass (``DataFrame.stat``'s CMS
    aggregate — sub-linear state, mergeable across partitions); the
    driver then probes it for the exact top-K words (a metadata-scale
    list, same class as collecting quantile cut-points). Output carries
    the exact count next to the estimate so consumers (and tests) can
    see the guaranteed-overcount property: est >= exact, bounded by
    eps * stream length with the configured confidence.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(F.split(F.col("text"), " ")).alias("word")).filter(
        F.col("word") != ""
    )
    top = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.desc("n_exact"), "word")
        .limit(CMS_TOP_K)
        .collect()
    )
    # The sketch aggregates distributed (SQL count_min_sketch, partial
    # merges per partition); the returned bytes deserialize through the
    # public org.apache.spark.util.sketch.CountMinSketch API for the
    # driver-side probes (PySpark exposes the aggregate but not the
    # probe; estimateCount(String) hashes the same UTF-8 bytes the
    # aggregate fed in).
    blob = words.agg(
        F.count_min_sketch(
            "word", F.lit(CMS_EPS), F.lit(CMS_CONF), F.lit(CMS_SEED)
        ).alias("s")
    ).head()["s"]
    jvm = spark.sparkContext._jvm
    sketch = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytes(blob))
    )
    rows = [
        Row(word=r["word"], n_exact=r["n_exact"], n_cms=sketch.estimateCount(r["word"]))
        for r in top
    ]
    return spark.createDataFrame(rows).orderBy(F.desc("n_exact"), "word")


# Portable Bloom filter (round 8): unlike HLL/CMS above, the bloom
# membership decision is PURE integer arithmetic both engines can run,
# so this sketch gets a full value-hash oracle. Kirsch-Mitzenmacher
# double hashing: pos_i = (h1 + i*h2) mod M with two independent
# multiplicative hashes reduced by a prime — every step stays on
# positive bigints (products <= key * 2.7e9 ~ 5e14 at sf1), so `%`
# agrees across engines with no negative-modulo edge.
BLOOM_M_BITS = 65536
BLOOM_K_HASH = 3
BLOOM_H_PRIME = 1048573  # largest prime < 2^20
BLOOM_A1 = 2654435761  # Knuth multiplicative
BLOOM_A2 = 2246822519  # xxhash prime 2
BLOOM_BUILD_MIN_SIZE = 45  # build side: parts with p_size >= this


def q_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pruning audit — the 100 TB scan-pruning
    pattern (runtime row-group filters, join pushdown) made portable:
    build a BLOOM_M_BITS-bit / BLOOM_K_HASH-hash filter over the part
    keys of large parts (p_size >= BLOOM_BUILD_MIN_SIZE), probe every
    distinct lineitem part key, and account exactly for what the
    filter passes vs the true semi-join: one summary row with build /
    bit / probe / pass / member / false-positive counts, the FP rate
    over non-members in ppm, and the row-level effect on lineitem.

    Plan: the bit set is DISTINCT positions of build-keys x K hashes
    (<= K*|build| rows, broadcast); the probe explodes K positions per
    DISTINCT key, semi-joins the bit set, and passes keys matching all
    K. Membership truth is one broadcast semi-join; everything
    aggregates to one row. At real scale the bit relation IS the
    serialized filter — k*|build| positions dedup to <= M distinct
    bigints regardless of build size.
    """
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    build = (
        part.filter(F.col("p_size") >= BLOOM_BUILD_MIN_SIZE)
        .select(F.col("p_partkey").alias("key"))
        .distinct()
    )
    ks = F.array(*[F.lit(i) for i in range(BLOOM_K_HASH)])
    pos = F.expr(
        f"((key * {BLOOM_A1}) % {BLOOM_H_PRIME}"
        f" + i * (1 + (key * {BLOOM_A2}) % {BLOOM_H_PRIME}))"
        f" % {BLOOM_M_BITS}"
    )
    bits = (
        build.select("key", F.explode(ks).alias("i"))
        .select(pos.alias("pos"))
        .distinct()
    )
    probe = li.select(F.col("l_partkey").alias("key")).distinct()
    probe_pos = probe.select("key", F.explode(ks).alias("i")).select(
        "key", pos.alias("pos")
    )
    passing = (
        probe_pos.join(F.broadcast(bits), "pos", "left_semi")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("hits"))
        .filter(F.col("hits") == BLOOM_K_HASH)
        .select("key")
    )
    member = probe.join(F.broadcast(build), "key", "left_semi")
    classified = (
        probe.join(
            F.broadcast(passing.withColumn("p", F.lit(1))), "key", "left"
        )
        .join(
            F.broadcast(member.withColumn("m", F.lit(1))), "key", "left"
        )
        .select(
            "key",
            F.coalesce(F.col("p"), F.lit(0)).alias("p"),
            F.coalesce(F.col("m"), F.lit(0)).alias("m"),
        )
    )
    key_stats = classified.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_probe_keys"),
        F.sum("p").cast("bigint").alias("n_bloom_pass"),
        F.sum("m").cast("bigint").alias("n_true_members"),
        F.sum(F.col("p") * (1 - F.col("m"))).cast("bigint").alias(
            "n_false_pos"
        ),
    )
    row_stats = (
        li.select(F.col("l_partkey").alias("key"))
        .join(F.broadcast(passing.withColumn("p", F.lit(1))), "key", "left")
        .join(F.broadcast(member.withColumn("m", F.lit(1))), "key", "left")
        .agg(
            F.sum(F.coalesce(F.col("p"), F.lit(0)))
            .cast("bigint")
            .alias("rows_bloom_pass"),
            F.sum(F.coalesce(F.col("m"), F.lit(0)))
            .cast("bigint")
            .alias("rows_exact"),
        )
    )
    sizes = build.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_build_keys")
    ).crossJoin(
        bits.agg(F.count(F.lit(1)).cast("bigint").alias("n_bits_set"))
    )
    return (
        sizes.crossJoin(key_stats)
        .crossJoin(row_stats)
        .select(
            F.lit(BLOOM_M_BITS).cast("bigint").alias("m_bits"),
            F.lit(BLOOM_K_HASH).cast("bigint").alias("k_hash"),
            "n_build_keys",
            "n_bits_set",
            "n_probe_keys",
            "n_bloom_pass",
            "n_true_members",
            "n_false_pos",
            F.expr(
                "CASE WHEN n_probe_keys = n_true_members THEN 0"
                " ELSE n_false_pos * 1000000"
                " div (n_probe_keys - n_true_members) END"
            ).alias("fp_ppm"),
            "rows_bloom_pass",
            "rows_exact",
        )
    )


QUERIES = {
    "q_hll_distinct_by_type": q_hll_distinct_by_type,
    "q_cms_heavy_hitters": q_cms_heavy_hitters,
    "q_bloom_semi_join": q_bloom_semi_join,
}

# HLL / CMS have no DuckDB twin (Datasketches state) — rows-only driver
# checks; accuracy bounds are pinned against exact answers in
# tests/test_sketches.py. The bloom filter is pure integer arithmetic,
# so IT gets a full value-hash oracle.
ORACLES: dict[str, str] = {
    "q_bloom_semi_join": f"""
        WITH build AS (
            SELECT DISTINCT p_partkey AS key FROM part
            WHERE p_size >= {BLOOM_BUILD_MIN_SIZE}),
        bits AS (
            SELECT DISTINCT
                   ((key * {BLOOM_A1}) % {BLOOM_H_PRIME}
                    + i * (1 + (key * {BLOOM_A2}) % {BLOOM_H_PRIME}))
                   % {BLOOM_M_BITS} AS pos
            FROM build
            CROSS JOIN (SELECT UNNEST([0, 1, 2]) AS i)),
        probe AS (SELECT DISTINCT l_partkey AS key FROM lineitem),
        passing AS (
            SELECT key FROM (
                SELECT p.key,
                       ((p.key * {BLOOM_A1}) % {BLOOM_H_PRIME}
                        + u.i * (1 + (p.key * {BLOOM_A2})
                                 % {BLOOM_H_PRIME}))
                       % {BLOOM_M_BITS} AS pos
                FROM probe p
                CROSS JOIN (SELECT UNNEST([0, 1, 2]) AS i) u) pp
            WHERE pos IN (SELECT pos FROM bits)
            GROUP BY key
            HAVING COUNT(*) = {BLOOM_K_HASH}),
        classified AS (
            SELECT p.key,
                   CASE WHEN ps.key IS NULL THEN 0 ELSE 1 END AS p,
                   CASE WHEN b.key IS NULL THEN 0 ELSE 1 END AS m
            FROM probe p
            LEFT JOIN passing ps ON ps.key = p.key
            LEFT JOIN build b ON b.key = p.key),
        key_stats AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_probe_keys,
                   CAST(SUM(p) AS BIGINT) AS n_bloom_pass,
                   CAST(SUM(m) AS BIGINT) AS n_true_members,
                   CAST(SUM(p * (1 - m)) AS BIGINT) AS n_false_pos
            FROM classified),
        row_stats AS (
            SELECT CAST(SUM(CASE WHEN ps.key IS NULL THEN 0 ELSE 1 END)
                        AS BIGINT) AS rows_bloom_pass,
                   CAST(SUM(CASE WHEN b.key IS NULL THEN 0 ELSE 1 END)
                        AS BIGINT) AS rows_exact
            FROM lineitem l
            LEFT JOIN passing ps ON ps.key = l.l_partkey
            LEFT JOIN build b ON b.key = l.l_partkey),
        sizes AS (
            SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM build)
                       AS n_build_keys,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM bits)
                       AS n_bits_set)
        SELECT CAST({BLOOM_M_BITS} AS BIGINT) AS m_bits,
               CAST({BLOOM_K_HASH} AS BIGINT) AS k_hash,
               n_build_keys, n_bits_set, n_probe_keys, n_bloom_pass,
               n_true_members, n_false_pos,
               CASE WHEN n_probe_keys = n_true_members THEN 0
                    ELSE n_false_pos * 1000000
                         // (n_probe_keys - n_true_members) END AS fp_ppm,
               rows_bloom_pass, rows_exact
        FROM sizes, key_stats, row_stats
    """
}


def q_hll_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap estimates between every event-type pair by
    HLL inclusion-exclusion: |A ∩ B| ≈ est(A) + est(B) - est(A ∪ B),
    with the union estimated from the MERGED sketches (never a rescan
    — the sketches built once per type are unioned pairwise). The
    exact intersection rides along for the contract test; at 100 TB
    the exact twin is the expensive path (a user-keyed distinct per
    pair) and the sketch answer is the product.

    Plan shape: one aggregation pass builds a per-type sketch
    (map-side partial merge, bytes not rows); the pair grid is a
    bounded |types|^2 broadcast self-join of sketch rows; exact
    pair overlaps come from one (user, type-pair) distinct count.
    Inclusion-exclusion can go slightly negative on small overlaps —
    clamped at 0, documented (tests pin the relative error on the
    fixture).
    """
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg(
            F.col("user_id").cast("string"), F.lit(HLL_LG_K)
        ).alias("sketch")
    )
    a = per_type.select(
        F.col("event_type").alias("type_a"),
        F.col("sketch").alias("sk_a"),
    )
    b = per_type.select(
        F.col("event_type").alias("type_b"),
        F.col("sketch").alias("sk_b"),
    )
    pairs = (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("type_a") < F.col("type_b"))
        .select(
            "type_a",
            "type_b",
            F.hll_sketch_estimate("sk_a").alias("est_a"),
            F.hll_sketch_estimate("sk_b").alias("est_b"),
            F.hll_sketch_estimate(
                F.hll_union("sk_a", "sk_b")
            ).alias("est_union"),
        )
        .select(
            "type_a",
            "type_b",
            "est_a",
            "est_b",
            "est_union",
            F.greatest(
                F.lit(0).cast("bigint"),
                (
                    F.col("est_a") + F.col("est_b") - F.col("est_union")
                ).cast("bigint"),
            ).alias("est_intersection"),
        )
    )
    ut = ev.select("user_id", "event_type").distinct()
    exact = (
        ut.alias("x")
        .join(
            ut.alias("y"),
            (F.col("y.user_id") == F.col("x.user_id"))
            & (F.col("y.event_type") > F.col("x.event_type")),
        )
        .groupBy(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_intersection"))
    )
    return (
        pairs.join(exact, ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            "est_a",
            "est_b",
            "est_union",
            "est_intersection",
            F.coalesce("exact_intersection", F.lit(0)).alias(
                "exact_intersection"
            ),
        )
        .orderBy("type_a", "type_b")
    )


QUERIES["q_hll_intersection"] = q_hll_intersection
# no ORACLES entry: Datasketches HLL state has no DuckDB twin —
# rows-only driver check; the inclusion-exclusion accuracy contract is
# pinned in tests/test_sketches.py against the exact column.
