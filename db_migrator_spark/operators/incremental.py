"""Incremental-load patterns: merge/upsert (CDC apply) and change capture.

Without a table format that supports MERGE INTO (Delta/Iceberg jars absent
in this image), upsert over immutable parquet is the classic anti-join +
union: new snapshot = updates ∪ (current ▷ update-keys). That IS how CDC
application works at scale on raw parquet lakes; the anti-join shuffles on
the key once and the union is free.

The "delta" here is derived deterministically from the fixture data itself
(every 100th order re-priced +10%, plus synthetic new orders) so the
operator is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table


def _delta(orders: DataFrame) -> DataFrame:
    """Deterministic change set: updates for orderkey % 100 == 0 (price
    +10%), inserts with keys strictly above the current max (offset by the
    actual MAX(o_orderkey), not a constant, so synthetic inserts can never
    collide with real keys at any scale factor).

    The max folds in as a broadcast one-row aggregate (the scalar-subquery
    idiom shared with ``events_cooccurrence_lift``) so the whole delta
    stays one lazy plan — no eager driver-blocking job per invocation."""
    max_key = orders.agg(F.coalesce(F.max("o_orderkey"), F.lit(0)).alias("max_key"))
    updates = orders.filter(F.col("o_orderkey") % 100 == 0).withColumn(
        "o_totalprice", F.round(F.col("o_totalprice") * 1.1, 2)
    )
    inserts = (
        orders.filter(F.col("o_orderkey") % 100 == 7)
        .crossJoin(F.broadcast(max_key))
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("max_key") + 1)
        .drop("max_key")
        .withColumn("o_orderstatus", F.lit("N"))
    )
    return updates.unionByName(inserts)


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE (upsert) emulation: delta rows win, untouched current rows
    survive — one shuffle on the key (left_anti), union is shuffle-free."""
    orders = load_table(spark, sf_dir, "orders")
    delta = _delta(orders)
    untouched = orders.join(delta.select("o_orderkey"), "o_orderkey", "left_anti")
    merged = untouched.unionByName(delta)
    return (
        merged.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(25,6)")).cast("double").alias("total"),
        )
        .orderBy("o_orderstatus")
    )


def q_change_capture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (CDC extraction): full-outer join of two snapshots
    keyed on the PK, classifying rows insert/update/delete/unchanged and
    counting per class. At scale both sides shuffle once on the key."""
    old = load_table(spark, sf_dir, "orders")
    new = _delta(old).unionByName(
        old.join(_delta(old).select("o_orderkey"), "o_orderkey", "left_anti")
    )
    o = old.select("o_orderkey", F.col("o_totalprice").alias("old_price"))
    n = new.select("o_orderkey", F.col("o_totalprice").alias("new_price"))
    classified = o.join(n, "o_orderkey", "full_outer").select(
        "o_orderkey",
        F.when(F.col("old_price").isNull(), "insert")
        .when(F.col("new_price").isNull(), "delete")
        .when(F.col("old_price") != F.col("new_price"), "update")
        .otherwise("unchanged")
        .alias("change"),
    )
    return classified.groupBy("change").agg(F.count(F.lit(1)).alias("n")).orderBy("change")


AGG_REFRESH_CUTOFF = "1997-01-01"


def q_incremental_agg_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view refresh: per-customer order stats
    maintained by MERGING partial aggregate states instead of
    re-aggregating the full table.

    The base partition (orders before ``AGG_REFRESH_CUTOFF``) and the
    delta (orders since) are aggregated separately into mergeable states
    — count, exact decimal sum, min/max — then combined per key:
    counts/sums add, mins/maxes fold. The DuckDB oracle aggregates the
    WHOLE table directly, so the hash-match proves merge(partial(base),
    partial(delta)) == full recompute, the algebraic contract every
    incremental-view pipeline rests on. At scale the base partial is the
    stored view (never re-read beyond its own aggregate) and only the
    delta is scanned per refresh; decimal-domain sums make the merge
    order-independent, so refresh cadence cannot change the result.
    """
    orders = load_table(spark, sf_dir, "orders")
    cutoff = F.lit(AGG_REFRESH_CUTOFF).cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(25,6)")).alias("sp"),
            F.min("o_orderdate").alias("mn"),
            F.max("o_orderdate").alias("mx"),
        )

    # Null-safe partitioning: a NULL o_orderdate satisfies NEITHER date
    # predicate, which would silently drop the row from both partials
    # while the full-recompute oracle still counts it. Nulls go to the
    # delta (coalesce to True) so base ∪ delta is exactly the table.
    base = partial(
        orders.filter(F.coalesce(F.col("o_orderdate") < cutoff, F.lit(False)))
    )
    delta = partial(
        orders.filter(F.coalesce(F.col("o_orderdate") >= cutoff, F.lit(True)))
    )
    return (
        base.unionByName(delta)
        .groupBy("o_custkey")
        .agg(
            F.sum("n").cast("bigint").alias("n_orders"),
            F.sum("sp").cast("double").alias("total_price"),
            F.min("mn").alias("first_order"),
            F.max("mx").alias("last_order"),
        )
        .orderBy("o_custkey")
    )


def q_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 build from an order history: one
    version row per (customer, priority-run), opened at the first order
    of the run and closed by the next run's open date (NULL = current).

    The warehouse op a migrator's audience runs right after landing a
    raw history table. Plan shape: ONE shuffle on the dimension key —
    both windows (the run-change ``lag`` and the closing ``lead``) sort
    by the same (o_orderdate, o_orderkey) key inside the same partition,
    so Catalyst plans a single Exchange + Sort and the second window
    rides it. Deterministic under same-date ties via the o_orderkey
    tiebreak. At 100 TB: dimension keys are customers (no hot key), and
    the change filter between the windows shrinks the second window's
    input to the version count, not the history count.
    """
    from pyspark.sql.window import Window as W

    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderpriority").over(w)
    changes = (
        orders.select(
            "o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority", prev.alias("prev_p")
        )
        .filter(F.col("prev_p").isNull() | (F.col("prev_p") != F.col("o_orderpriority")))
    )
    w2 = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return changes.select(
        "o_custkey",
        F.row_number().over(w2).alias("version_n"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").alias("effective_from"),
        F.lead("o_orderdate").over(w2).alias("effective_to"),
        F.lead("o_orderdate").over(w2).isNull().alias("is_current"),
    ).orderBy("o_custkey", "version_n")


# Point-in-time for the as-of reconstruction below; deliberately the
# same date as the drift pivot so the snapshot slices mid-history.
SCD2_SNAPSHOT_TS = "1998-07-01"


def q_scd2_asof_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel over the SCD2 history: reconstruct every customer's
    dimension row AS OF ``SCD2_SNAPSHOT_TS`` — the consumer side of
    ``q_scd2_dimension`` (what was this customer's priority when the
    order shipped?). A row is in the snapshot when its validity
    interval covers the timestamp: effective_from <= t and
    (effective_to is NULL or effective_to > t). Exactly one version
    per customer with history at t, by the half-open interval
    construction.

    Plan: the SCD2 build's single keyed Exchange + its two windows,
    then a filter — the snapshot adds no shuffle. At 100 TB the filter
    lands on the versions relation (run count, not history count).
    """
    ts = F.lit(SCD2_SNAPSHOT_TS).cast("timestamp")
    dim = q_scd2_dimension(spark, sf_dir)
    return (
        dim.filter(
            (F.col("effective_from") <= ts)
            & (F.col("effective_to").isNull() | (F.col("effective_to") > ts))
        )
        .select(
            "o_custkey", "version_n", "priority", "effective_from",
            "effective_to",
        )
        .orderBy("o_custkey")
    )


QUERIES = {
    "q_merge_upsert": q_merge_upsert,
    "q_change_capture": q_change_capture,
    "q_incremental_agg_refresh": q_incremental_agg_refresh,
    "q_scd2_dimension": q_scd2_dimension,
    "q_scd2_asof_snapshot": q_scd2_asof_snapshot,
}

_DELTA_SQL = """
    delta AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               round(o_totalprice * 1.1, 2) AS o_totalprice,
               o_orderdate, o_orderpriority
        FROM orders WHERE o_orderkey % 100 = 0
        UNION ALL
        SELECT o_orderkey + (SELECT MAX(o_orderkey) FROM orders) + 1,
               o_custkey, 'N', o_totalprice,
               o_orderdate, o_orderpriority
        FROM orders WHERE o_orderkey % 100 = 7)
"""

ORACLES = {
    "q_incremental_agg_refresh": """
        SELECT o_custkey,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
                   AS total_price,
               MIN(o_orderdate) AS first_order,
               MAX(o_orderdate) AS last_order
        FROM orders
        GROUP BY o_custkey
        ORDER BY o_custkey
    """,
    "q_merge_upsert": f"""
        WITH {_DELTA_SQL},
        merged AS (
            SELECT * FROM orders
            WHERE o_orderkey NOT IN (SELECT o_orderkey FROM delta)
            UNION ALL
            SELECT * FROM delta)
        SELECT o_orderstatus, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total
        FROM merged
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    "q_scd2_asof_snapshot": """
        WITH runs AS (
            SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
                   LAG(o_orderpriority) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey) AS prev_p
            FROM orders),
        changes AS (
            SELECT * FROM runs
            WHERE prev_p IS NULL OR prev_p <> o_orderpriority),
        dim AS (
            SELECT o_custkey,
                   CAST(ROW_NUMBER() OVER w AS INTEGER) AS version_n,
                   o_orderpriority AS priority,
                   o_orderdate AS effective_from,
                   LEAD(o_orderdate) OVER w AS effective_to
            FROM changes
            WINDOW w AS (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey))
        SELECT o_custkey, version_n, priority, effective_from, effective_to
        FROM dim
        WHERE effective_from <= TIMESTAMP '1998-07-01'
          AND (effective_to IS NULL OR effective_to > TIMESTAMP '1998-07-01')
        ORDER BY o_custkey
    """,
    "q_scd2_dimension": """
        WITH runs AS (
            SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
                   LAG(o_orderpriority) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey) AS prev_p
            FROM orders),
        changes AS (
            SELECT * FROM runs
            WHERE prev_p IS NULL OR prev_p <> o_orderpriority)
        SELECT o_custkey,
               CAST(ROW_NUMBER() OVER w AS INTEGER) AS version_n,
               o_orderpriority AS priority,
               o_orderdate AS effective_from,
               LEAD(o_orderdate) OVER w AS effective_to,
               LEAD(o_orderdate) OVER w IS NULL AS is_current
        FROM changes
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, version_n
    """,
    "q_change_capture": f"""
        WITH {_DELTA_SQL},
        new_snap AS (
            SELECT * FROM delta
            UNION ALL
            SELECT * FROM orders
            WHERE o_orderkey NOT IN (SELECT o_orderkey FROM delta)),
        o AS (SELECT o_orderkey, o_totalprice AS old_price FROM orders),
        n AS (SELECT o_orderkey, o_totalprice AS new_price FROM new_snap),
        classified AS (
            SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS k,
                   CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                        WHEN n.o_orderkey IS NULL THEN 'delete'
                        WHEN old_price != new_price THEN 'update'
                        ELSE 'unchanged' END AS change
            FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey)
        SELECT change, COUNT(*) AS n FROM classified
        GROUP BY change ORDER BY change
    """,
}


# Retraction-aware maintenance: the CDC stream is deterministic —
# md5(orderkey)'s last hex digit selects DELETEs ('0','1') and
# UPDATEs ('2','3', +10% exact cents); everything else is untouched.
RETRACT_DELETE_DIGITS = ("0", "1")
RETRACT_UPDATE_DIGITS = ("2", "3")


def q_incremental_agg_retract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Materialized-view maintenance UNDER RETRACTIONS: the per-priority
    (count, revenue-cents) view updated by a CDC batch containing
    deletes and in-place updates — the negative-delta algebra
    ``q_incremental_agg_refresh`` (insert-only) doesn't exercise.

    The maintained result is computed as base-view PLUS delta-aggregate
    (deletes contribute (-1, -cents), updates (0, new - old)) — never
    by rescanning surviving rows — and the oracle recomputes the final
    state directly from the post-CDC table, so the hash match IS the
    proof the retraction algebra is exact. All integer cents; the
    update is +cents div 10 (truncating-div contract).

    Scale notes (100 TB): the delta aggregate touches ONLY the CDC
    rows (map-side combinable on priority); the merge is a groups-
    sized outer join. The view never rescans history — the whole point
    of maintaining it.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderkey",
        F.expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)").alias(
            "cents"
        ),
        F.substring(
            F.md5(F.col("o_orderkey").cast("string")), 32, 1
        ).alias("tag"),
    )
    base_view = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("sum_cents"),
    )
    deltas = (
        orders.filter(
            F.col("tag").isin(
                *(RETRACT_DELETE_DIGITS + RETRACT_UPDATE_DIGITS)
            )
        )
        .select(
            "o_orderpriority",
            F.when(
                F.col("tag").isin(*RETRACT_DELETE_DIGITS), F.lit(-1)
            )
            .otherwise(F.lit(0))
            .alias("dn"),
            F.when(
                F.col("tag").isin(*RETRACT_DELETE_DIGITS),
                -F.col("cents"),
            )
            .otherwise(F.expr("cents div 10"))
            .alias("dcents"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.sum("dn").cast("bigint").alias("dn"),
            F.sum(F.col("dcents").cast("decimal(38,0)")).alias("dcents"),
        )
    )
    return (
        base_view.join(deltas, "o_orderpriority", "left")
        .select(
            "o_orderpriority",
            (F.col("n") + F.coalesce("dn", F.lit(0)))
            .cast("bigint")
            .alias("n"),
            # Digits-as-text surface (q_anova_fstat rationale in
            # stats3.py): DECIMAL output columns stringify differently
            # across comparator fetch models; VARCHAR digits are stable.
            F.expr(
                "CAST(CAST(sum_cents + COALESCE(dcents, 0)"
                " AS DECIMAL(38,0)) AS STRING)"
            ).alias("sum_cents"),
        )
        .orderBy("o_orderpriority")
    )


QUERIES["q_incremental_agg_retract"] = q_incremental_agg_retract

# The oracle NEVER sees the delta algebra: it recomputes the view from
# the post-CDC table state — equality proves the retraction math.
ORACLES["q_incremental_agg_retract"] = f"""
    WITH tagged AS (
        SELECT o_orderpriority,
               CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents,
               substr(md5(CAST(o_orderkey AS VARCHAR)), 32, 1) AS tag
        FROM orders),
    post AS (
        SELECT o_orderpriority,
               CASE WHEN tag IN {RETRACT_UPDATE_DIGITS}
                    THEN cents + cents // 10 ELSE cents END AS cents
        FROM tagged
        WHERE tag NOT IN {RETRACT_DELETE_DIGITS})
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(cents AS HUGEINT)) AS VARCHAR) AS sum_cents
    FROM post
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""
