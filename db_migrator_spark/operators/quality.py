"""Data-quality operators: per-key anomaly detection and distributed
exact selection.

- ``events_anomaly_zscore``: per-user z-scores over event values with
  3-sigma outlier flags. The moments accumulate EXACTLY: values quantize
  to integers (floor(v * 1e6), IEEE-exact both engines), sum and
  sum-of-squares run in DECIMAL, and only the final mean/std divisions
  drop to double — written in the same operation order as the oracle, so
  verdicts are bit-identical at any parallelism. Plan: one groupBy for
  the per-user moments (map-side partial), joined back to the events
  (the stats side is |users| rows).
- ``q_exact_median``: the EXACT lower median of a column without a
  global sort — the distributed-selection shape. approxQuantile bins
  partition the value space (error only skews bin sizes); exact per-bin
  counts locate the bin holding the k-th element (driver-side over ≤33
  rows, metadata-scale); only THAT bin's rows are sorted to extract the
  element. At 100 TB the sorted bin is ~n/32 rows — recurse the same
  step if a single bin is still too large (one level suffices here and
  the recursion is the documented scale path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table

Z_SCALE = 1_000_000
Z_SIGMA = 3.0


def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    vq = F.floor(F.col("value") * F.lit(float(Z_SCALE))).cast("long")
    quant = ev.select("event_id", "user_id", vq.alias("vq"))
    stats = quant.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("vq").cast("decimal(38,0)")).alias("s"),
        F.sum(F.col("vq").cast("decimal(38,0)") * F.col("vq").cast("decimal(38,0)")).alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    var = F.col("ss").cast("double") / F.col("n") - mean * mean
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    enriched = quant.join(
        stats.select("user_id", mean.alias("mean_q"), std.alias("std_q")),
        "user_id",
    )
    z = (F.col("vq") - F.col("mean_q")) / F.nullif(F.col("std_q"), F.lit(0.0))
    return (
        enriched.select(
            "event_id",
            "user_id",
            z.alias("z"),
            (F.abs(F.col("vq") - F.col("mean_q")) > F.lit(Z_SIGMA) * F.col("std_q"))
            .alias("is_outlier"),
        )
        .orderBy("event_id")
    )


MEDIAN_BINS = 32


def q_exact_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_totalprice")
    n = orders.count()
    k = (n + 1) // 2  # lower median, interpolation-free in both engines
    cuts = sorted(
        set(
            orders.approxQuantile(
                "o_totalprice", [i / MEDIAN_BINS for i in range(1, MEDIAN_BINS)], 0.001
            )
        )
    )
    bin_id = sum((F.col("o_totalprice") > F.lit(c)).cast("int") for c in cuts)
    binned = orders.withColumn("b", bin_id)
    counts = {
        int(r["b"]): int(r["cnt"])
        for r in binned.groupBy("b").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    before, target = 0, 0
    for b in sorted(counts):
        if before + counts[b] >= k:
            target = b
            break
        before += counts[b]
    median = (
        binned.filter(F.col("b") == target)
        .orderBy("o_totalprice")
        .limit(k - before)
        .orderBy(F.col("o_totalprice").desc())
        .limit(1)
    )
    return median.select(
        F.col("o_totalprice").alias("median_price"),
        F.lit(n).cast("long").alias("n_rows"),
    )


FUZZY_MAX_DIST = 2


def q_fuzzy_part_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution by edit distance with blocking, over DISTINCT
    names: near-duplicate part-name pairs (levenshtein ≤ FUZZY_MAX_DIST)
    sharing a blocking key (the name's last word — the noun of the
    fixture's adjective+noun names), each side carrying its part count.

    Matching distinct VALUES instead of rows is what makes fuzzy
    matching scale: key-level self-joins are quadratic in DUPLICATES
    (measured 1.2s -> 97s at 10x data on this fixture, whose name
    vocabulary is fixed while rows grow 10x), while the distinct-name
    frame is vocabulary-sized — the data-sized work is one distinct
    aggregation, and consumers needing key pairs join back by name.
    Levenshtein runs JVM-side, identical to DuckDB's.
    """
    parts = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    names = parts.groupBy("p_name").agg(F.count(F.lit(1)).alias("n_parts"))
    block = F.regexp_extract(F.col("p_name"), r"([^ ]+)$", 1)
    keyed = names.withColumn("blk", block)
    a, b = keyed.alias("a"), keyed.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .select(
            F.col("a.p_name").alias("name1"),
            F.col("b.p_name").alias("name2"),
            dist.alias("edit_dist"),
            F.col("a.n_parts").alias("n_parts_1"),
            F.col("b.n_parts").alias("n_parts_2"),
        )
        .filter(F.col("edit_dist") <= FUZZY_MAX_DIST)
        .orderBy("name1", "name2")
    )


def _key_profile(df: DataFrame, table: str, key: str) -> DataFrame:
    per = df.groupBy(F.col(key).alias("k")).agg(F.count(F.lit(1)).alias("c"))
    return per.agg(
        F.lit(table).alias("table_name"),
        F.lit(key).alias("key_name"),
        F.sum("c").cast("long").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("c").alias("max_per_key"),
        (F.sum("c").cast("double") / F.count(F.lit(1))).alias("avg_per_key"),
        (F.max("c").cast("double") * F.count(F.lit(1)) / F.sum("c")).alias(
            "skew_ratio"
        ),
    )


def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis: per-key cardinality profile of the three
    hottest join keys (orders.o_custkey, lineitem.l_orderkey,
    events.user_id) — max/avg rows per key and the skew ratio that
    decides between a plain shuffle join, AQE skew splitting, and salting
    (operators/skew.py). The report every scale engineer runs BEFORE
    picking a join strategy; at 100 TB it reads a sample or the
    per-partition statistics, same plan shape.

    All-integer aggregation; the two ratios divide exact integers in
    double (identical IEEE result both engines).
    """
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")
    return (
        _key_profile(orders, "orders", "o_custkey")
        .unionByName(_key_profile(lineitem, "lineitem", "l_orderkey"))
        .unionByName(_key_profile(events, "events", "user_id"))
        .orderBy("table_name")
    )


QUERIES = {
    "q_skew_report": q_skew_report,
    "events_anomaly_zscore": events_anomaly_zscore,
    "q_exact_median": q_exact_median,
    "q_fuzzy_part_match": q_fuzzy_part_match,
}

_SKEW_ONE = """
        SELECT '{table}' AS table_name, '{key}' AS key_name,
               CAST(SUM(c) AS BIGINT) AS n_rows,
               COUNT(*) AS n_keys,
               MAX(c) AS max_per_key,
               CAST(SUM(c) AS DOUBLE) / COUNT(*) AS avg_per_key,
               CAST(MAX(c) AS DOUBLE) * COUNT(*) / SUM(c) AS skew_ratio
        FROM (SELECT {key}, COUNT(*) AS c FROM {table} GROUP BY {key})
    """

ORACLES = {
    "q_skew_report": " UNION ALL ".join(
        _SKEW_ONE.format(table=t, key=k)
        for t, k in (
            ("events", "user_id"),
            ("lineitem", "l_orderkey"),
            ("orders", "o_custkey"),
        )
    )
    + " ORDER BY table_name",
    "events_anomaly_zscore": f"""
        WITH q AS (SELECT event_id, user_id,
                          CAST(FLOOR(value * {Z_SCALE}.0) AS BIGINT) AS vq
                   FROM events),
             st AS (SELECT user_id, COUNT(*) AS n,
                           CAST(SUM(CAST(vq AS DECIMAL(38,0))) AS DOUBLE) AS s,
                           CAST(SUM(CAST(vq AS DECIMAL(38,0)) * CAST(vq AS DECIMAL(38,0))) AS DOUBLE) AS ss
                    FROM q GROUP BY user_id),
             m AS (SELECT user_id,
                          s / n AS mean_q,
                          sqrt(greatest(ss / n - (s / n) * (s / n), 0.0)) AS std_q
                   FROM st)
        SELECT event_id, q.user_id,
               (vq - mean_q) / nullif(std_q, 0.0) AS z,
               abs(vq - mean_q) > {Z_SIGMA} * std_q AS is_outlier
        FROM q JOIN m ON q.user_id = m.user_id
        ORDER BY event_id
    """,
    "q_fuzzy_part_match": f"""
        WITH n AS (SELECT p_name, COUNT(*) AS n_parts FROM part GROUP BY p_name),
             k AS (SELECT p_name, n_parts,
                          regexp_extract(p_name, '([^ ]+)$', 1) AS blk
                   FROM n)
        SELECT a.p_name AS name1, b.p_name AS name2,
               CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist,
               a.n_parts AS n_parts_1, b.n_parts AS n_parts_2
        FROM k a JOIN k b ON a.blk = b.blk AND a.p_name < b.p_name
        WHERE levenshtein(a.p_name, b.p_name) <= {FUZZY_MAX_DIST}
        ORDER BY name1, name2
    """,
    "q_exact_median": """
        WITH s AS (SELECT o_totalprice AS v,
                          ROW_NUMBER() OVER (ORDER BY o_totalprice) AS rn
                   FROM orders),
             c AS (SELECT COUNT(*) AS n FROM orders)
        SELECT (SELECT v FROM s, c WHERE rn = (n + 1) // 2) AS median_price,
               (SELECT n FROM c) AS n_rows
    """,
}
