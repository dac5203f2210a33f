"""Batch analytics over the ``events`` stream table.

Batch twins of the Structured Streaming operators (tumbling / sliding
windows, sessionization) plus JSON property extraction — each with an
exact SQL oracle. The streaming forms live in ``db_migrator_spark.streaming``;
keeping the same column logic in both places is what makes the streaming
results testable against these batch results.

Timestamps: events.ts is nanosecond parquet; ``io.load_table`` truncates to
microseconds exactly like DuckDB's ``CAST(ts AS TIMESTAMP)``, so boundary
arithmetic (window assignment, 30-minute session gaps) is integer-equal in
both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from ..io import load_table

SESSION_GAP_US = 1_800_000_000  # 30 minutes


def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type: count + exact value sum.
    ``F.window`` compiles to pure timestamp arithmetic in the groupBy key —
    a single shuffle on (hour, type)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "total_value")
        .orderBy("w_start", "event_type")
    )


def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h length, 15 min step): each event lands in 4
    windows. Spark's Expand produces the 4 copies map-side; the shuffle is
    keyed on (window, type)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"),
             (F.sum(F.col("value").cast("decimal(25,6)")).cast("double")
              / F.count(F.lit(1))).alias("avg_value"))
        .select(F.col("w.start").alias("w_start"), "n", "avg_value")
        .orderBy("w_start")
    )


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction + aggregation: parse ``props`` (regex-based
    so the oracle needs no JSON extension), bucket k, aggregate."""
    ev = load_table(spark, sf_dir, "events")
    k = F.regexp_extract(F.col("props"), r'"k":\s*(\d+)', 1).cast("int")
    return (
        ev.select("event_type", (k % 10).alias("k_bucket"), "value")
        .groupBy("event_type", "k_bucket")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("total_value"))
        .orderBy("event_type", "k_bucket")
    )


def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag + cumulative-sum
    session ids, then per-session aggregates. One shuffle on user_id; the
    windows reuse that partitioning."""
    ev = load_table(spark, sf_dir, "events")
    order = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(order)
    is_new = F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0)
    sess = (
        ev.withColumn("is_new", is_new)
        .withColumn(
            "session_id",
            # pinned to long on BOTH sides (oracle casts its HUGEINT window
            # sum to BIGINT) so the driver canonicalizer renders identically
            F.sum("is_new").over(order.rowsBetween(W.unboundedPreceding, 0)).cast("long"),
        )
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            ((F.unix_micros(F.max("ts").cast("timestamp"))
              - F.unix_micros(F.min("ts").cast("timestamp"))).cast("double") / 1e6).alias("duration_sec"),
            F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("total_value"),
        )
        .orderBy("user_id", "session_id")
    )


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel signup -> click -> purchase per user:
    each stage's timestamp must follow the previous stage's. Three
    dependent conditional-min aggregations; the two rejoins are on the
    already-partitioned user key."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("s_ts")
    )
    c = (
        ev.join(s, "user_id")
        .filter((F.col("event_type") == "click") & (F.col("ts") > F.col("s_ts")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.join(c, "user_id")
        .filter((F.col("event_type") == "purchase") & (F.col("ts") > F.col("c_ts")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    funnel = (
        s.join(c, "user_id", "left").join(p, "user_id", "left")
    )
    return funnel.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("s_ts").alias("n_signup"),
        F.count("c_ts").alias("n_click_after_signup"),
        F.count("p_ts").alias("n_purchase_after_click"),
    )


def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by first-activity week,
    counted distinct per (cohort, weeks-since) offset — the standard
    retention triangle, two shuffles (first-seen agg + distinct count)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    week = F.date_trunc("week", F.col("ts"))
    first = ev.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    active = ev.select("user_id", week.alias("active_week")).distinct()
    return (
        active.join(first, "user_id")
        .groupBy(
            F.col("cohort_week").cast("date").alias("cohort_week"),  # match DATE output
            ((F.unix_micros(F.col("active_week").cast("timestamp"))
              - F.unix_micros(F.col("cohort_week").cast("timestamp")))
             / (7 * 86400 * 1_000_000)).cast("int").alias("weeks_since"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
        .orderBy("cohort_week", "weeks_since")
    )


def events_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly resample with forward-fill: the time-series
    alignment step (sensor/metric gap-filling) of a training pipeline.

    Each user's event hours densify onto an hourly spine from their first
    to last active hour; hours with no events take the last observed
    hourly value (``last(..., ignorenulls)`` over an unbounded-preceding
    row frame — DuckDB's ``last_value(x IGNORE NULLS)`` is the exact
    twin). The first spine hour always has data (it IS the user's min
    event hour), so no leading nulls.

    Plan shape: one shuffle for the per-(user, hour) aggregate; the spine
    is a per-user ``sequence`` explode (rows bounded by time span, not
    corpus size); fill is a window partitioned by user_id — parallel in
    users, no global window. The user_id < 50 filter bounds the declared
    query's output; the operator itself has no such limit.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    hourly = ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("hr")).agg(
        F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("v")
    )
    spine = (
        hourly.groupBy("user_id")
        .agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
        .select(
            "user_id",
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hr"),
        )
    )
    w = W.partitionBy("user_id").orderBy("hr").rowsBetween(W.unboundedPreceding, 0)
    return (
        spine.join(hourly, ["user_id", "hr"], "left")
        .select(
            "user_id",
            "hr",
            F.col("v").isNull().alias("was_gap"),
            F.last("v", ignorenulls=True).over(w).alias("value_ffill"),
        )
        .orderBy("user_id", "hr")
    )


def events_pattern_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern detection (the MATCH_RECOGNIZE shape): per user,
    the time-ordered event-type initial string, and how many times the
    click→view→purchase pattern occurs in it.

    Plan shape: one groupBy(user) building the ordered letter string via
    sort_array over (ts, event_id, letter) structs — deterministic under
    any parallelism because the sort key is total — then a regex count
    over the per-user string. The per-user sequence must fit one row
    (true for any per-entity event history worth pattern-matching); for
    unbounded histories the same regex runs per session window instead.
    """
    ev = load_table(spark, sf_dir, "events")
    letter = F.substring("event_type", 1, 1)
    tagged = ev.select(
        "user_id",
        F.struct(F.col("ts"), F.col("event_id"), letter.alias("c")).alias("s"),
    )
    seq = F.array_join(
        F.transform(F.sort_array(F.collect_list("s")), lambda s: s["c"]), ""
    )
    return (
        tagged.groupBy("user_id")
        .agg(seq.alias("seq"))
        .select(
            "user_id",
            F.length("seq").alias("n_events"),
            F.regexp_count("seq", F.lit("cvp")).alias("n_cvp"),
            F.col("seq").rlike("p").alias("ever_purchased"),
        )
        .orderBy("user_id")
    )


def events_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type co-occurrence with lift (market-basket association):
    for every pair of event types, how many users did both, and the lift
    vs independence ``P(a,b) / (P(a)·P(b)) = n_both·U / (n_a·n_b)``.

    Plan shape: everything runs on the DISTINCT (user, type) frame — the
    same distinct-value discipline as the fuzzy matcher — so the pair
    self-join is |types|²-bounded per user and the aggregates are one
    shuffle each. The user-count denominator joins in as a broadcast
    one-row aggregate (the ``corpus.py`` idiom) instead of an eager
    ``count()``: the whole query stays ONE lazy plan, no driver-blocking
    scalar pass. Lift divides exact integers in double (identical IEEE
    both engines); log-free, like the TF-IDF rational-idf trick.
    """
    ev = load_table(spark, sf_dir, "events")
    d = ev.select("user_id", "event_type").distinct()
    n_users = d.agg(
        F.count_distinct(F.col("user_id")).cast("long").alias("n_users")
    )
    a = d.select(F.col("user_id").alias("u"), F.col("event_type").alias("type_a"))
    b = d.select(F.col("user_id").alias("u"), F.col("event_type").alias("type_b"))
    both = (
        a.join(b, "u")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    singles = d.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    sa = singles.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = singles.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    lift = (F.col("n_both").cast("double") * F.col("n_users")) / (
        F.col("n_a").cast("double") * F.col("n_b")
    )
    return (
        both.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .crossJoin(F.broadcast(n_users))
        .select("type_a", "type_b", "n_both", "n_a", "n_b", lift.alias("lift"))
        .orderBy("type_a", "type_b")
    )


QUERIES = {
    "events_cooccurrence_lift": events_cooccurrence_lift,
    "events_pattern_sequence": events_pattern_sequence,
    "events_resample_ffill": events_resample_ffill,
    "events_funnel": events_funnel,
    "events_retention_cohorts": events_retention_cohorts,
    "events_tumbling_hourly": events_tumbling_hourly,
    "events_sliding_windows": events_sliding_windows,
    "events_json_extract": events_json_extract,
    "events_sessionization": events_sessionization,
}

ORACLES = {
    "events_cooccurrence_lift": """
        WITH d AS (SELECT DISTINCT user_id, event_type FROM events),
             u AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM d),
             both_t AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                               COUNT(*) AS n_both
                        FROM d a JOIN d b ON a.user_id = b.user_id
                                         AND a.event_type < b.event_type
                        GROUP BY 1, 2),
             s AS (SELECT event_type, COUNT(*) AS n FROM d GROUP BY event_type)
        SELECT type_a, type_b, n_both,
               sa.n AS n_a, sb.n AS n_b,
               CAST(n_both AS DOUBLE) * (SELECT n_users FROM u)
                   / (CAST(sa.n AS DOUBLE) * sb.n) AS lift
        FROM both_t
        JOIN s sa ON sa.event_type = type_a
        JOIN s sb ON sb.event_type = type_b
        ORDER BY type_a, type_b
    """,
    "events_pattern_sequence": """
        WITH s AS (SELECT user_id,
                          string_agg(left(event_type, 1), ''
                                     ORDER BY ts, event_id) AS seq
                   FROM events GROUP BY user_id)
        SELECT user_id,
               CAST(length(seq) AS INT) AS n_events,
               CAST(len(regexp_extract_all(seq, 'cvp')) AS INT) AS n_cvp,
               regexp_matches(seq, 'p') AS ever_purchased
        FROM s
        ORDER BY user_id
    """,
    "events_resample_ffill": """
        WITH hourly AS (
            SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
                   CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS v
            FROM events WHERE user_id < 50 GROUP BY 1, 2),
        bounds AS (SELECT user_id, MIN(hr) AS lo, MAX(hr) AS hi
                   FROM hourly GROUP BY user_id),
        spine AS (SELECT user_id,
                         unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
                  FROM bounds)
        SELECT s.user_id, s.hr, (h.v IS NULL) AS was_gap,
               last_value(h.v IGNORE NULLS)
                   OVER (PARTITION BY s.user_id ORDER BY s.hr
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS value_ffill
        FROM spine s
        LEFT JOIN hourly h ON s.user_id = h.user_id AND s.hr = h.hr
        ORDER BY s.user_id, s.hr
    """,
    "events_funnel": """
        WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        s AS (SELECT user_id,
                     MIN(CASE WHEN event_type = 'signup' THEN ts END) AS s_ts
              FROM e GROUP BY user_id),
        c AS (SELECT e.user_id, MIN(e.ts) AS c_ts
              FROM e JOIN s ON e.user_id = s.user_id
              WHERE e.event_type = 'click' AND e.ts > s.s_ts
              GROUP BY e.user_id),
        p AS (SELECT e.user_id, MIN(e.ts) AS p_ts
              FROM e JOIN c ON e.user_id = c.user_id
              WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
              GROUP BY e.user_id)
        SELECT COUNT(*) AS n_users,
               COUNT(s.s_ts) AS n_signup,
               COUNT(c.c_ts) AS n_click_after_signup,
               COUNT(p.p_ts) AS n_purchase_after_click
        FROM s
        LEFT JOIN c ON s.user_id = c.user_id
        LEFT JOIN p ON s.user_id = p.user_id
    """,
    "events_retention_cohorts": """
        WITH e AS (SELECT user_id, date_trunc('week', CAST(ts AS TIMESTAMP)) AS w FROM events),
        first AS (SELECT user_id, MIN(w) AS cohort_week FROM e GROUP BY user_id),
        active AS (SELECT DISTINCT user_id, w AS active_week FROM e)
        SELECT cohort_week,
               CAST((epoch_us(active_week) - epoch_us(cohort_week))
                    / (7 * 86400 * CAST(1000000 AS BIGINT)) AS INT) AS weeks_since,
               COUNT(DISTINCT a.user_id) AS n_active
        FROM active a JOIN first f ON a.user_id = f.user_id
        GROUP BY 1, 2
        ORDER BY cohort_week, weeks_since
    """,
    "events_tumbling_hourly": """
        SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS w_start,
               event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY 1, 2
        ORDER BY w_start, event_type
    """,
    "events_sliding_windows": """
        WITH expanded AS (
            SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
                       - unnest(range(4)) * INTERVAL '15 minutes' AS w_start,
                   value
            FROM events)
        SELECT w_start, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS avg_value
        FROM expanded
        GROUP BY w_start
        ORDER BY w_start
    """,
    "events_json_extract": """
        SELECT event_type,
               CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INT) % 10 AS k_bucket,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY 1, 2
        ORDER BY event_type, k_bucket
    """,
    "events_sessionization": """
        WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
        g AS (SELECT *, epoch_us(ts) - LAG(epoch_us(ts)) OVER
                           (PARTITION BY user_id ORDER BY ts, event_id) AS gap
              FROM e),
        s AS (SELECT *, CAST(SUM(CASE WHEN gap IS NULL OR gap > 1800000000 THEN 1 ELSE 0 END)
                           OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
              FROM g)
        SELECT user_id, session_id,
               MIN(ts) AS session_start,
               COUNT(*) AS n_events,
               CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS DOUBLE) / 1e6 AS duration_sec,
               CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
        FROM s
        GROUP BY user_id, session_id
        ORDER BY user_id, session_id
    """,
}
