"""Advanced relational operators: as-of / range joins, grouping sets,
correlated-subquery patterns, percentiles, scalar function library, SQL API.

Operators Spark has no single built-in for (as-of join, range join) are
composed from primitives per the build rules (SURVEY.md §7, pyspark guide):
union + ignore-nulls window for as-of, broadcast non-equi join for ranges —
both shuffle-once and skew-safe, never a cartesian product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from ..io import load_table, register_views


def q_asof_join_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF JOIN: each event matched to the same user's most recent order
    at event time (match-if-earlier).

    Spark has no native as-of join; the scalable composition is the
    union-and-carry trick: union both streams on a common timeline, then a
    single window per key carries the last order forward
    (``last(..., ignorenulls)``) onto event rows. ONE shuffle on the key —
    contrast with a naive approach (key-join then filter+argmax) that
    explodes to |events| x |orders per key| intermediates.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderdate").cast("timestamp_ntz").alias("t"),
        F.col("o_orderkey").alias("orderkey"),
        F.lit(0).alias("kind"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(None).cast("string").alias("event_type"),
    )
    events = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("key"),
        F.col("ts").cast("timestamp_ntz").alias("t"),
        F.lit(None).cast("bigint").alias("orderkey"),
        F.lit(1).alias("kind"),
        "event_id",
        "event_type",
    )
    # kind orders order-rows before event-rows at identical timestamps;
    # orderkey desc makes the carried order deterministic on date ties.
    w = (
        W.partitionBy("key")
        .orderBy("t", "kind", F.col("orderkey").desc_nulls_last())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    merged = orders.unionByName(events).withColumn(
        "asof_orderkey", F.last("orderkey", ignorenulls=True).over(w)
    )
    return (
        merged.filter(F.col("kind") == 1)
        .select("event_id", F.col("key").alias("user_id"), "event_type", "asof_orderkey")
        .orderBy("event_id")
    )


def q_asof_forward_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF JOIN, forward and nearest variants — completing the family
    with q_asof_join_latest_order's backward carry.

    Same union-and-carry shape, ONE window pass: with orders sorted
    before events at identical timestamps, the [unbounded, current]
    frame carries the latest at-or-before order (backward) while the
    [current, unbounded] frame reaches the first strictly-after order
    (forward) — both via ignorenulls carries, no per-pair join. Nearest
    picks whichever side is closer in time (ties prefer backward); time
    distances compare as exact microsecond longs. Tie among same-time
    orders: highest orderkey (the window's orderkey-desc sort), mirrored
    in the oracle's LATERAL ORDER BY.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderdate").cast("timestamp_ntz").alias("t"),
        F.col("o_orderkey").alias("orderkey"),
        F.lit(0).alias("kind"),
        F.lit(None).cast("bigint").alias("event_id"),
    )
    events = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("key"),
        F.col("ts").cast("timestamp_ntz").alias("t"),
        F.lit(None).cast("bigint").alias("orderkey"),
        F.lit(1).alias("kind"),
        "event_id",
    )
    order_t = F.when(F.col("kind") == 0, F.col("t"))
    base = W.partitionBy("key").orderBy("t", "kind", F.col("orderkey").desc_nulls_last())
    bwd = base.rowsBetween(W.unboundedPreceding, 0)
    fwd = base.rowsBetween(0, W.unboundedFollowing)
    merged = (
        orders.unionByName(events)
        .withColumn("bwd_key", F.last("orderkey", ignorenulls=True).over(bwd))
        .withColumn("bwd_t", F.last(order_t, ignorenulls=True).over(bwd))
        .withColumn("fwd_key", F.first("orderkey", ignorenulls=True).over(fwd))
        .withColumn("fwd_t", F.first(order_t, ignorenulls=True).over(fwd))
    )
    d_bwd = F.unix_micros(F.col("t").cast("timestamp")) - F.unix_micros(
        F.col("bwd_t").cast("timestamp")
    )
    d_fwd = F.unix_micros(F.col("fwd_t").cast("timestamp")) - F.unix_micros(
        F.col("t").cast("timestamp")
    )
    nearest = (
        F.when(F.col("bwd_key").isNull(), F.col("fwd_key"))
        .when(F.col("fwd_key").isNull(), F.col("bwd_key"))
        .when(d_bwd <= d_fwd, F.col("bwd_key"))
        .otherwise(F.col("fwd_key"))
    )
    return (
        merged.filter(F.col("kind") == 1)
        .select(
            "event_id",
            F.col("key").alias("user_id"),
            F.col("bwd_key").alias("backward_orderkey"),
            F.col("fwd_key").alias("forward_orderkey"),
            nearest.alias("nearest_orderkey"),
        )
        .orderBy("event_id")
    )


_PRICE_BANDS = [("low", 0.0, 20000.0), ("mid", 20000.0, 45000.0), ("high", 45000.0, 1e12)]


def q_range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE JOIN against a static band dimension, via the scalable
    bucketize-then-equi-join strategy: the fact side computes its band key
    in the scan projection (a codegen'd comparison chain — free), then an
    ordinary broadcast equi-join attaches band attributes.

    The naive form — broadcast non-equi join on ``lo <= x < hi`` — plans as
    BroadcastNestedLoopJoin: every row probes every band (|fact| x |bands|
    comparisons; measured 2.2s vs 0.6s at sf0.1 with 3 bands, and linearly
    worse with more bands). When the range dimension is static and
    non-overlapping, bucketizing first is strictly better and is the
    documented Spark range-join recipe.
    """
    li = load_table(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(_PRICE_BANDS, "band string, lo double, hi double")
    band_key = F.lit(None).cast("string")
    for name, lo, hi in reversed(_PRICE_BANDS):
        band_key = F.when(
            (F.col("l_extendedprice") >= lo) & (F.col("l_extendedprice") < hi), name
        ).otherwise(band_key)
    return (
        li.withColumn("band", band_key)
        .join(F.broadcast(bands), "band")  # attach band attributes (lo/hi)
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(25,6)")).cast("double").alias("total"),
        )
        .orderBy("band")
    )


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping_id — via the SQL API (Catalyst
    compiles it to the same single Expand+Aggregate as rollup/cube)."""
    register_views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT) AS g_flag,
               CAST(grouping(l_linestatus) AS INT) AS g_status,
               CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
        """
    )


def q_min_per_group_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery pattern (TPC-H Q2 shape): parts at the minimum
    retail price within their brand. Decorrelated Spark-side into a
    map-side-combinable group-min aggregate + broadcast join back — the
    distributed Q2 shape. (Round 11: this replaced a brand-keyed window
    min, which was a 25-task ceiling with linearly growing partitions;
    the aggregate path is one partial-agg shuffle of 25 rows plus a
    broadcast probe, fully parallel at any scale.)"""
    part = load_table(spark, sf_dir, "part")
    mins = part.groupBy("p_brand").agg(
        F.min("p_retailprice").alias("min_price")
    )
    return (
        part.join(F.broadcast(mins), "p_brand")
        .filter(F.col("p_retailprice") == F.col("min_price"))
        .select("p_brand", "p_partkey", "p_name", "p_retailprice")
        .orderBy("p_brand", "p_partkey")
    )


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (median + p90)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.percentile("o_totalprice", F.lit(0.5)).alias("median_price"),
            F.percentile("o_totalprice", F.lit(0.9)).alias("p90_price"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderpriority")
    )


def q_arg_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/arg_max: each customer's single most expensive order — the
    aggregation-based top-1 (cheaper than a row_number window: map-side
    partial max_by, shuffle carries one row per group per partition)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.max_by("o_orderkey", F.struct("o_totalprice", "o_orderkey")).alias("top_orderkey"),
            F.max("o_totalprice").alias("top_price"),
        )
        .orderBy("o_custkey")
    )


def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar function library showcase over one projection: string ops,
    date parts, rounding, conditionals — all whole-stage-codegen built-ins."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.upper(F.col("o_orderstatus")).alias("status_u"),
        F.substring(F.col("o_orderpriority"), 1, 1).alias("prio_code"),
        F.concat_ws("-", F.col("o_orderstatus"), F.col("o_orderpriority")).alias("tag"),
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.round(F.col("o_totalprice"), 0).alias("price_rounded"),
        F.when(F.col("o_totalprice") > 300000, "big").otherwise("small").alias("size_class"),
        F.greatest(F.col("o_orderkey"), F.col("o_custkey")).alias("max_key"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias("status_or_open"),
    ).orderBy("o_orderkey")


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct — sketch-based, mergeable,
    constant memory per group (THE 100 TB cardinality pattern). Approximate
    and engine-specific -> rows-only check; accuracy vs exact is pinned in
    tests/test_relational2.py."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        )
        .orderBy("l_returnflag")
    )


def q_sql_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL API surface: correlated EXISTS + scalar subquery, straight
    through spark.sql on registered views (Catalyst decorrelates into a
    semi join + broadcast scalar)."""
    register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name,
               (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        ORDER BY c_custkey
        """
    )


QUERIES = {
    "q_asof_join_latest_order": q_asof_join_latest_order,
    "q_asof_forward_nearest": q_asof_forward_nearest,
    "q_range_band_join": q_range_band_join,
    "q_grouping_sets": q_grouping_sets,
    "q_min_per_group_filter": q_min_per_group_filter,
    "q_percentiles": q_percentiles,
    "q_arg_max": q_arg_max,
    "q_scalar_functions": q_scalar_functions,
    "q_approx_distinct": q_approx_distinct,
    "q_sql_exists_subquery": q_sql_exists_subquery,
}

ORACLES = {
    # Tie rules mirror the window frame exactly: backward = max t' then
    # MIN orderkey (last of an orderkey-desc frame), forward = min t'
    # then MAX orderkey (first of an orderkey-desc frame).
    "q_asof_forward_nearest": """
        WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                   FROM events),
             o AS (SELECT o_custkey, o_orderkey,
                          CAST(o_orderdate AS TIMESTAMP) AS ot
                   FROM orders)
        SELECT e.event_id, e.user_id,
               b.o_orderkey AS backward_orderkey,
               f.o_orderkey AS forward_orderkey,
               CASE WHEN b.o_orderkey IS NULL THEN f.o_orderkey
                    WHEN f.o_orderkey IS NULL THEN b.o_orderkey
                    WHEN epoch_us(e.ts) - epoch_us(b.ot)
                         <= epoch_us(f.ot) - epoch_us(e.ts) THEN b.o_orderkey
                    ELSE f.o_orderkey END AS nearest_orderkey
        FROM e
        LEFT JOIN LATERAL (
            SELECT o_orderkey, ot FROM o
            WHERE o.o_custkey = e.user_id AND o.ot <= e.ts
            ORDER BY ot DESC, o_orderkey ASC LIMIT 1) b ON TRUE
        LEFT JOIN LATERAL (
            SELECT o_orderkey, ot FROM o
            WHERE o.o_custkey = e.user_id AND o.ot > e.ts
            ORDER BY ot ASC, o_orderkey DESC LIMIT 1) f ON TRUE
        ORDER BY event_id
    """,
    "q_asof_join_latest_order": """
        WITH timeline AS (
            SELECT o_custkey AS key, CAST(o_orderdate AS TIMESTAMP) AS t,
                   o_orderkey AS orderkey, 0 AS kind,
                   CAST(NULL AS BIGINT) AS event_id, CAST(NULL AS VARCHAR) AS event_type
            FROM orders
            UNION ALL
            SELECT user_id, CAST(ts AS TIMESTAMP), NULL, 1, event_id, event_type
            FROM events),
        carried AS (
            SELECT *, LAST_VALUE(orderkey IGNORE NULLS) OVER (
                       PARTITION BY key
                       ORDER BY t, kind, orderkey DESC NULLS LAST
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_orderkey
            FROM timeline)
        SELECT event_id, key AS user_id, event_type, asof_orderkey
        FROM carried WHERE kind = 1
        ORDER BY event_id
    """,
    "q_range_band_join": """
        WITH bands(band, lo, hi) AS (
            VALUES ('low', 0.0, 20000.0), ('mid', 20000.0, 45000.0), ('high', 45000.0, 1e12))
        SELECT band, COUNT(*) AS n,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS total
        FROM lineitem JOIN bands ON l_extendedprice >= lo AND l_extendedprice < hi
        GROUP BY band
        ORDER BY band
    """,
    "q_grouping_sets": """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT) AS g_flag,
               CAST(grouping(l_linestatus) AS INT) AS g_status,
               CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    "q_min_per_group_filter": """
        SELECT p_brand, p_partkey, p_name, p_retailprice
        FROM part p
        WHERE p_retailprice = (SELECT MIN(p2.p_retailprice) FROM part p2
                               WHERE p2.p_brand = p.p_brand)
        ORDER BY p_brand, p_partkey
    """,
    "q_percentiles": """
        SELECT o_orderpriority,
               quantile_cont(o_totalprice, 0.5) AS median_price,
               quantile_cont(o_totalprice, 0.9) AS p90_price,
               COUNT(*) AS n
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "q_arg_max": """
        WITH m AS (SELECT o_custkey, MAX(o_totalprice) AS top_price
                   FROM orders GROUP BY o_custkey)
        SELECT m.o_custkey, MAX(o.o_orderkey) AS top_orderkey, m.top_price
        FROM orders o
        JOIN m ON o.o_custkey = m.o_custkey AND o.o_totalprice = m.top_price
        GROUP BY m.o_custkey, m.top_price
        ORDER BY m.o_custkey
    """,
    "q_scalar_functions": """
        SELECT o_orderkey,
               upper(o_orderstatus) AS status_u,
               substring(o_orderpriority, 1, 1) AS prio_code,
               concat_ws('-', o_orderstatus, o_orderpriority) AS tag,
               CAST(year(o_orderdate) AS INT) AS y,
               CAST(month(o_orderdate) AS INT) AS m,
               CAST(day(o_orderdate) AS INT) AS d,
               round(o_totalprice, 0) AS price_rounded,
               CASE WHEN o_totalprice > 300000 THEN 'big' ELSE 'small' END AS size_class,
               greatest(o_orderkey, o_custkey) AS max_key,
               coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open
        FROM orders
        ORDER BY o_orderkey
    """,
    "q_sql_exists_subquery": """
        SELECT c_custkey, c_name,
               (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        ORDER BY c_custkey
    """,
}


# Staleness bound for the tolerance-banded as-of join: previous-order
# matches older than this many days are rejected (NULL) — the
# repeat-purchase window. 180 days accepts roughly the faster half of
# the fixture's inter-order gaps, so both branches stay exercised.
ASOF_TOLERANCE_DAYS = 180


def q_asof_tolerance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self as-of with a staleness tolerance: each order matched to the
    same customer's most recent PRIOR order, accepted only within
    ASOF_TOLERANCE_DAYS — the repeat-purchase linkage every retention
    model starts from, with stale carries rejected to NULL.

    Plan: ONE keyed window (lag over (custkey, date, orderkey)) — the
    self-as-of degenerates to lag, so there is no join at all; the
    tolerance test is one datediff per row. Output keeps the exact gap
    in days for accepted matches — the freshness audit column.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("d"),
    )
    w = W.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    prev = orders.select(
        "o_custkey",
        "o_orderkey",
        "d",
        F.lag("o_orderkey").over(w).alias("prev_key"),
        F.lag("d").over(w).alias("prev_d"),
    )
    gap = F.datediff(F.col("d"), F.col("prev_d")).cast("bigint")
    fresh = gap <= ASOF_TOLERANCE_DAYS
    return prev.select(
        "o_custkey",
        "o_orderkey",
        F.when(fresh, F.col("prev_key")).alias("asof_prev_orderkey"),
        F.when(fresh, gap).alias("staleness_days"),
    ).orderBy("o_orderkey")


QUERIES["q_asof_tolerance_join"] = q_asof_tolerance_join

ORACLES["q_asof_tolerance_join"] = f"""
    WITH prev AS (
        SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS d,
               LAG(o_orderkey) OVER w AS prev_key,
               LAG(CAST(o_orderdate AS DATE)) OVER w AS prev_d
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY CAST(o_orderdate AS DATE), o_orderkey))
    SELECT o_custkey, o_orderkey,
           CASE WHEN d - prev_d <= {ASOF_TOLERANCE_DAYS}
                THEN prev_key END AS asof_prev_orderkey,
           CASE WHEN d - prev_d <= {ASOF_TOLERANCE_DAYS}
                THEN CAST(d - prev_d AS BIGINT) END AS staleness_days
    FROM prev
    ORDER BY o_orderkey
"""
