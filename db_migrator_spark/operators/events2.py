"""Temporal-join and interpolation operators over ``events`` (round 6).

The reference has no event operators (1:1 table copier, cited:
/root/reference/src/migrate/table_migrator.rs:43-114); these extend the
time-series family (sessionization, as-of, resample+ffill) with the two
classical shapes it still lacked:

- ``events_overlap_sessions``: interval-overlap self-join — which pairs
  of users were active at the same time (padded sessions intersecting).
  The textbook O(n²) temporal join, made scale-safe by time-bucket
  blocking: intervals explode onto the hour grid they span and only
  same-hour pairs are compared, so the join is an equi-join on the hour
  key and the pair count is bounded by per-hour concurrency, never by
  corpus size; hour buckets over ``OVERLAP_MAX_HOUR_SESSIONS`` are
  excluded (the ``_cap_buckets`` pair budget, mirrored exactly in the
  oracle so the contract holds at every scale factor).
- ``events_interpolate_linear``: per-user hourly gap-fill by LINEAR
  interpolation between the surrounding observed hours (the companion
  to ``events_resample_ffill``'s step-fill). Interpolation weights are
  ratios of integer epoch-hour differences with one double expression
  evaluated in the same shape in both engines.

Scale notes (100 TB): the overlap join's hour-chunk explode is bounded
by interval duration (padded sessions are ~an hour), per-hour pair
generation is quadratic ONLY in per-hour concurrency and hot hours are
dropped by the ``_cap_buckets`` guard (round 7 — previously only the
fixture's user filter kept this bounded), and the exact-overlap verify
carries only 4 longs per candidate. Interpolation is two window passes over the user-partitioned
spine — parallel in users, no global window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from ..io import load_table
from .events import SESSION_GAP_US

OVERLAP_PAD_US = 1_800_000_000  # 30-min presence padding per session side
OVERLAP_MAX_USER = 20  # declared-query bound (operator itself is general)
# An hour bucket with more than this many concurrent sessions is excluded
# from pair generation — the same per-group pair budget every
# group-then-pair operator carries (``dedup._cap_buckets``): one hot hour
# would otherwise emit up to n^2/2 pairs from a single join key. Budget
# ~8k pairs/bucket -> cap sqrt(2 * 8192) = 128. A co-presence analysis at
# higher concurrency needs finer time buckets, not a bigger shuffle; the
# DuckDB twin applies the identical exclusion so the contract is
# engine-exact at every scale factor.
OVERLAP_MAX_HOUR_SESSIONS = 128
INTERP_MAX_USER = 50


def _padded_sessions(ev: DataFrame) -> DataFrame:
    """(user_id, session_id, s_us, e_us) — gap-based sessions (same
    recurrence as ``events_sessionization``) padded by OVERLAP_PAD_US on
    each side, bounds in epoch micros."""
    order = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(order)
    is_new = F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0)
    return (
        ev.withColumn("us", us)
        .withColumn("is_new", is_new)
        .withColumn(
            "session_id",
            F.sum("is_new").over(order.rowsBetween(W.unboundedPreceding, 0)).cast("long"),
        )
        .groupBy("user_id", "session_id")
        .agg(
            (F.min("us") - F.lit(OVERLAP_PAD_US)).alias("s_us"),
            (F.max("us") + F.lit(OVERLAP_PAD_US)).alias("e_us"),
        )
    )


def events_overlap_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-user co-presence: pairs of padded sessions whose intervals
    intersect, with the exact overlap duration.

    Plan shape: sessions explode onto the epoch-hour grid they span
    (explode bounded by interval length), hour buckets above
    ``OVERLAP_MAX_HOUR_SESSIONS`` are dropped (capped per-key fan-out —
    the ``_cap_buckets`` guard this operator's siblings carry), candidate
    pairs come from an equi-join on the hour key with ``u1 < u2``,
    duplicates from multi-hour overlaps collapse in a distinct that
    carries only the pair key + 4 interval longs, and the exact
    intersection is then a row-local expression. Never an interval
    nested-loop.
    """
    from .dedup import _cap_buckets

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < OVERLAP_MAX_USER)
    sess = _padded_sessions(ev)
    hours = sess.select(
        "user_id",
        "session_id",
        "s_us",
        "e_us",
        F.explode(
            F.sequence(
                (F.col("s_us") / 3_600_000_000).cast("long"),
                (F.col("e_us") / 3_600_000_000).cast("long"),
            )
        ).alias("hr"),
    )
    hours = _cap_buckets(hours, ["hr"], OVERLAP_MAX_HOUR_SESSIONS)
    a = hours.select(
        F.col("user_id").alias("u1"),
        F.col("session_id").alias("sid1"),
        F.col("s_us").alias("s1"),
        F.col("e_us").alias("e1"),
        "hr",
    )
    b = hours.select(
        F.col("user_id").alias("u2"),
        F.col("session_id").alias("sid2"),
        F.col("s_us").alias("s2"),
        F.col("e_us").alias("e2"),
        "hr",
    )
    overlap_us = F.least(F.col("e1"), F.col("e2")) - F.greatest(F.col("s1"), F.col("s2"))
    return (
        a.join(b, ["hr"])
        .filter(F.col("u1") < F.col("u2"))
        .select("u1", "sid1", "u2", "sid2", "s1", "e1", "s2", "e2")
        .distinct()
        .filter(overlap_us > 0)
        .select(
            "u1",
            "sid1",
            "u2",
            "sid2",
            (overlap_us.cast("double") / 1e6).alias("overlap_sec"),
        )
        .orderBy("u1", "sid1", "u2", "sid2")
    )


def events_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly spine with linear interpolation across gaps.

    Observed hours keep their value; a gap hour takes
    ``prev + ((next - prev) * (h - h0)) / (h1 - h0)`` where (h0, prev)
    and (h1, next) are the surrounding observed epoch-hours — evaluated
    with that exact operation order in both engines. Trailing gaps (no
    next observation) fall back to the previous value; the spine starts
    at each user's first observed hour, so there are no leading gaps.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < INTERP_MAX_USER)
    hourly = ev.groupBy(
        "user_id",
        (F.unix_micros(F.date_trunc("hour", F.col("ts").cast("timestamp")))
         / 3_600_000_000).cast("long").alias("h"),
    ).agg(F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("v"))
    spine = (
        hourly.groupBy("user_id")
        .agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
        .select("user_id", F.explode(F.sequence("lo", "hi")).alias("h"))
    )
    wp = W.partitionBy("user_id").orderBy("h").rowsBetween(W.unboundedPreceding, 0)
    wn = W.partitionBy("user_id").orderBy("h").rowsBetween(0, W.unboundedFollowing)
    joined = (
        spine.join(hourly, ["user_id", "h"], "left")
        .select(
            "user_id",
            "h",
            "v",
            F.last("v", ignorenulls=True).over(wp).alias("pv"),
            F.last(F.when(F.col("v").isNotNull(), F.col("h")), ignorenulls=True)
            .over(wp)
            .alias("ph"),
            F.first("v", ignorenulls=True).over(wn).alias("nv"),
            F.first(F.when(F.col("v").isNotNull(), F.col("h")), ignorenulls=True)
            .over(wn)
            .alias("nh"),
        )
    )
    interp = F.col("pv") + (
        (F.col("nv") - F.col("pv")) * (F.col("h") - F.col("ph"))
    ) / (F.col("nh") - F.col("ph"))
    return joined.select(
        "user_id",
        F.col("h").alias("epoch_hour"),
        F.col("v").isNull().alias("was_gap"),
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(interp)
        .alias("value_interp"),
    ).orderBy("user_id", "epoch_hour")


# EWMA: alpha = 1/2 over the last EWMA_LOOKBACK purchase values per
# user, zero-initialized (the standard biased-init EWMA: missing history
# contributes 0). Everything runs in integer micro-units — value floors
# to micros, weights are powers of two, the final normalization is one
# truncating shift by 2^EWMA_LOOKBACK — so the surface is bit-exact
# cross-engine with no float summation-order hazard at any scale.
EWMA_LOOKBACK = 16
_EWMA_WEIGHTS = [2 ** (EWMA_LOOKBACK - 1 - j) for j in range(EWMA_LOOKBACK)]
_EWMA_DEN = 2**EWMA_LOOKBACK


def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average of purchase
    values (alpha = 1/2, bounded lookback), in exact integer micros.

    Plan: ONE shuffle keyed by user, one ordered window; the frame
    collect is bounded at EWMA_LOOKBACK rows, the weight fold runs as a
    codegen'd array zip — no UDF, no per-row Python. Per-user state is
    a constant, so a trillion-event table streams through at the cost
    of its sort.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(EWMA_LOOKBACK - 1), 0)
    )
    # FLOOR, matching the oracle's FLOOR(value*1e6) exactly — a plain
    # bigint cast truncates toward zero and diverges on negatives (refunds).
    v_micro = F.floor(F.col("value") * 1_000_000).cast("bigint")
    framed = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.collect_list(v_micro).over(w).alias("vals"),  # oldest..newest
    )
    weights = F.array(*[F.lit(x) for x in _EWMA_WEIGHTS])
    weighted = F.zip_with(
        F.reverse(F.col("vals")),
        F.slice(weights, 1, F.size("vals")),
        lambda x, wt: x * wt,
    )
    total = F.aggregate(weighted, F.lit(0).cast("bigint"), lambda acc, x: acc + x)
    return (
        framed.select(
            "user_id",
            "event_id",
            "ts",
            "value",
            total.alias("t"),
        )
        .select(
            "user_id",
            "event_id",
            "ts",
            "value",
            F.expr(f"t div {_EWMA_DEN}").alias("ewma_micro"),
        )
        .orderBy("user_id", "ts", "event_id")
    )


# Last-touch attribution: a purchase is attributed to the user's most
# recent click no older than ATTR_WINDOW_US. Pure running-max window —
# no self-join, no interval join: the classic marketing-attribution op
# expressed as one ordered pass per user.
ATTR_WINDOW_US = 7 * 24 * 3600 * 1_000_000  # 7 days


def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per purchase: the most recent preceding click by the same user,
    whether it falls inside the attribution window, and the exact
    click-to-purchase latency in microseconds.

    Plan: ONE shuffle keyed by user + one ordered window (running max
    of click timestamps over the unbounded-preceding frame), then a
    purchase filter — per-user state is a single timestamp, so the op
    streams at sort cost at any scale. Timestamps compare in integer
    microseconds; no float surface anywhere.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    last_click = F.max(
        F.when(F.col("event_type") == "click", F.col("ts"))
    ).over(w)
    flagged = ev.select(
        "event_id", "user_id", "ts", "event_type", "value",
        last_click.alias("last_click_ts"),
    ).filter(F.col("event_type") == "purchase")
    latency = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.col("last_click_ts").cast("timestamp")
    )
    return flagged.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        "last_click_ts",
        latency.alias("latency_us"),
        F.when(
            F.col("last_click_ts").isNull(), F.lit(False)
        ).otherwise(latency <= ATTR_WINDOW_US).alias("attributed"),
    ).orderBy("user_id", "ts", "event_id")


def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event-type
    sequences: count and exact ppm probability of each (prev -> next)
    transition, plus per-state totals.

    The behavioral-model fit a sequence pipeline runs before building
    synthetic sessions. Plan: one shuffle keyed by user for the lag
    window, one map-side-combined groupBy over the (state x state)
    matrix (constant-sized output), one broadcast of per-state totals.
    Probabilities are exact integer ppm — no float division.
    """
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_trans"))
    )
    totals = pairs.groupBy("prev_type").agg(
        F.sum("n_trans").cast("bigint").alias("n_from")
    )
    return (
        pairs.join(F.broadcast(totals), "prev_type")
        .select(
            "prev_type",
            "next_type",
            F.col("n_trans").cast("bigint").alias("n_trans"),
            "n_from",
            F.expr("n_trans * 1000000 div n_from").alias("prob_ppm"),
        )
        .orderBy("prev_type", "next_type")
    )


# Rolling active users: window length in days. The explode factor IS the
# window length — constant — so the sliding distinct count becomes one
# keyed exact-distinct aggregation instead of a per-day self-join.
ROLLING_DAYS = 7


def events_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users: for every day D in the data span, the
    exact distinct user count over [D-6, D] — the canonical WAU metric.

    Shape: distinct (user, day) presence (one shuffle — presence is
    |users| x |days|, tiny next to events), each presence row explodes
    onto the ROLLING_DAYS window-ends it feeds (constant fan-out), one
    count_distinct keyed by window end. Days are exact epoch-day
    integers; no calendar arithmetic crosses the engine boundary.
    """
    ev = load_table(spark, sf_dir, "events")
    day = (
        F.unix_micros(F.date_trunc("day", F.col("ts").cast("timestamp")))
        / 86_400_000_000
    ).cast("bigint")
    presence = ev.select("user_id", day.alias("day")).distinct()
    span = presence.agg(F.max("day").alias("hi"))
    expl = presence.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.col("day") + (ROLLING_DAYS - 1))
        ).alias("w_end"),
    )
    return (
        expl.crossJoin(F.broadcast(span))
        .filter(F.col("w_end") <= F.col("hi"))
        .groupBy("w_end")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .select(F.col("w_end").alias("window_end_day"), "n_active")
        .orderBy("window_end_day")
    )


# Path analysis: the first PATH_LEN event types of each session, joined
# into a path string, counted corpus-wide, top PATH_TOP_K emitted.
PATH_LEN = 3
PATH_TOP_K = 20


def events_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top session-opening paths: the first PATH_LEN event types per
    gap-based session (same 30-min recurrence as sessionization),
    joined 'a>b>c', counted, top-K with session share in exact ppm.

    Plan: the session id is the standard lag/cumsum pass (one shuffle
    keyed by user), the path is a bounded collect of the first
    PATH_LEN rows per session, the count is one map-side-combined
    groupBy over path strings, and top-K is TakeOrdered. The per-
    session state is PATH_LEN strings — constant.
    """
    ev = load_table(spark, sf_dir, "events")
    order = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(order)
    is_new = F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0)
    sess = ev.withColumn("is_new", is_new).withColumn(
        "session_id",
        F.sum("is_new").over(order.rowsBetween(W.unboundedPreceding, 0)).cast("long"),
    )
    wrk = W.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    first_n = (
        sess.withColumn("rk", F.row_number().over(wrk))
        .filter(F.col("rk") <= PATH_LEN)
        .groupBy("user_id", "session_id")
        .agg(
            F.concat_ws(
                ">", F.array_sort(F.collect_list(F.struct("rk", "event_type"))).getField("event_type")
            ).alias("path")
        )
    )
    counts = first_n.groupBy("path").agg(F.count(F.lit(1)).alias("n_sessions"))
    total = counts.agg(F.sum("n_sessions").alias("n_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "path",
            F.col("n_sessions").cast("bigint").alias("n_sessions"),
            F.expr("n_sessions * 1000000 div n_total").alias("share_ppm"),
        )
        .orderBy(F.desc("n_sessions"), "path")
        .limit(PATH_TOP_K)
    )


def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: for each signup-week cohort and
    week-of-life, cumulative purchase revenue per cohort user in exact
    integer micros — the growth table every subscription business plots.

    Shape: one groupBy for per-user first-seen week (cohort), one join
    to tag purchases with cohort age, one groupBy over (cohort, age) —
    matrix-sized — and a cumulative window keyed by cohort. The only
    division is the final per-user truncating `div`.
    """
    ev = load_table(spark, sf_dir, "events")
    # Monday-aligned week index in pure integer arithmetic: epoch day 4
    # (1970-01-05) is the first Monday. Written as (day + 3) div 7 - 1
    # (== floor((day - 4) / 7) for day >= 0) so the dividend is
    # non-negative for any post-1970 timestamp — where truncating div
    # (Spark) and flooring // (DuckDB) agree. The r9 form (day - 4) div 7
    # had a negative dividend on 1970-01-01..04 (day 0-3): Spark
    # truncated to week 0 while the oracle floored to -1 (ADVICE r9);
    # with the offset both engines put those days in week -1, the
    # correct Monday week. Valid from 1970-01-01; pre-1970 data would
    # need a sign branch on the day division itself.
    week = F.expr(
        "(unix_micros(cast(ts as timestamp)) div 86400000000 + 3) div 7 - 1"
    )
    tagged = ev.select(
        "user_id",
        "event_type",
        week.alias("wk"),
        F.floor(F.col("value") * 1_000_000).cast("bigint").alias("v_micro"),
    )
    cohorts = tagged.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    sizes = cohorts.groupBy("cohort_wk").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    rev = (
        tagged.filter(F.col("event_type") == "purchase")
        .join(cohorts, "user_id")
        .groupBy("cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("age_wk"))
        .agg(F.sum("v_micro").alias("rev_micro"))
    )
    wcum = (
        W.partitionBy("cohort_wk")
        .orderBy("age_wk")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        rev.withColumn("cum_rev_micro", F.sum("rev_micro").over(wcum))
        .join(F.broadcast(sizes), "cohort_wk")
        .select(
            "cohort_wk",
            "age_wk",
            F.col("rev_micro").cast("bigint").alias("rev_micro"),
            F.col("cum_rev_micro").cast("bigint").alias("cum_rev_micro"),
            "n_users",
            F.expr("cum_rev_micro div n_users").alias("ltv_micro_per_user"),
        )
        .orderBy("cohort_wk", "age_wk")
    )


def events_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per day: daily active users over the rolling
    7-day active users ending that day, in exact ppm — the engagement
    ratio every growth dashboard carries.

    Shares the rolling-active plan: one distinct presence pass feeds
    BOTH aggregates (DAU = presence grouped by day; WAU = the
    constant-fan-out window-end explode), joined on the day key.
    """
    ev = load_table(spark, sf_dir, "events")
    day = (
        F.unix_micros(F.date_trunc("day", F.col("ts").cast("timestamp")))
        / 86_400_000_000
    ).cast("bigint")
    presence = ev.select("user_id", day.alias("day")).distinct()
    dau = presence.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    expl = presence.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.col("day") + (ROLLING_DAYS - 1))
        ).alias("w_end"),
    )
    wau = expl.groupBy("w_end").agg(F.countDistinct("user_id").alias("wau"))
    return (
        dau.join(wau, dau.day == wau.w_end)
        .select(
            "day",
            "dau",
            "wau",
            F.expr("dau * 1000000 div wau").alias("stickiness_ppm"),
        )
        .orderBy("day")
    )


def events_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality profile of purchase revenue: per weekday
    the exact micro mean and its signed ppm deviation from the overall
    mean — the additive seasonal component a forecaster removes first.

    Weekday = epoch_day % 7 (0 = Thursday): a pure integer that both
    engines compute identically, dodging their different DAYOFWEEK
    origin conventions. One scan, 7-row output, broadcast overall mean.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    # Direct integer epoch-day (identical to date_trunc('day')-then-divide
    # for post-1970 timestamps, without either engine's date_trunc).
    day = F.expr("unix_micros(cast(ts as timestamp)) div 86400000000")
    base = ev.select(
        F.pmod(day, F.lit(7)).alias("dow"),
        F.floor(F.col("value") * 1_000_000).cast("bigint").alias("v_micro"),
    )
    per_dow = base.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v_micro").alias("sum_micros"),
    )
    overall = per_dow.agg(
        F.sum("n").alias("n_all"), F.sum("sum_micros").alias("sum_all")
    )
    return (
        per_dow.crossJoin(F.broadcast(overall))
        .select(
            "dow",
            F.col("n").cast("bigint").alias("n"),
            F.col("sum_micros").cast("bigint").alias("sum_micros"),
            F.expr("sum_micros div n").alias("mean_micro"),
            F.expr(
                "(sum_micros div n - sum_all div n_all) * 1000000"
                " div (sum_all div n_all)"
            ).alias("dev_ppm"),
        )
        .orderBy("dow")
    )


def events_user_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS trend of purchase value over time, exact to the
    integer: slope = (n*Sxy - Sx*Sy) div (n*Sxx - Sx^2) in micro-units
    per hour, from the closed-form sums — no float moment in sight.

    x is HOURS SINCE THE USER'S FIRST PURCHASE (small bounded ints, so
    the cross-products stay far inside the decimal contract even at
    corpus scale; absolute epoch would not). One groupBy for the first
    timestamp, one for the five sums — both map-side combined.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    q = ev.select("user_id", us.alias("us"),
                  F.floor(F.col("value") * 1_000_000).cast("bigint").alias("y"))
    first = q.groupBy("user_id").agg(F.min("us").alias("us0"))
    xy = q.join(first, "user_id").select(
        "user_id",
        F.expr("(us - us0) div 3600000000").alias("x"),
        "y",
    )
    sums = xy.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = "CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy"
    den = "CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx"
    return sums.select(
        "user_id",
        F.col("n").cast("bigint").alias("n"),
        F.expr(
            f"CASE WHEN ({den}) = 0 THEN NULL"
            f" ELSE CAST(({num}) div ({den}) AS BIGINT) END"
        ).alias("slope_micro_per_hr"),
    ).orderBy("user_id")


def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint candidate per user: the position where the
    cumulative sum of (value - user mean) attains its maximum absolute
    value — the classic mean-shift detector, in exact integer micros.

    One shuffle keyed by user for the ordered cumsum window, one
    user-sized aggregation; the argmax is a rank window over the same
    partitioning (rides the same exchange). Deterministic tie-break:
    earliest position wins.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    q = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") * 1_000_000).cast("bigint").alias("v_micro"),
    )
    stats = q.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v_micro").alias("s"),
    )
    dev = q.join(F.broadcast(stats), "user_id").select(
        "user_id",
        "ts",
        "event_id",
        "n",
        F.expr("v_micro - s div n").alias("dev_micro"),
    )
    worder = W.partitionBy("user_id").orderBy("ts", "event_id")
    cusum = dev.select(
        "user_id",
        "n",
        F.row_number().over(worder).alias("pos"),
        F.sum("dev_micro")
        .over(worder.rowsBetween(W.unboundedPreceding, 0))
        .alias("cusum_micro"),
    )
    pick = W.partitionBy("user_id").orderBy(
        F.desc(F.abs(F.col("cusum_micro"))), "pos"
    )
    return (
        cusum.withColumn("rk", F.row_number().over(pick))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("n").cast("bigint").alias("n"),
            F.col("pos").alias("change_pos"),
            F.col("cusum_micro").cast("bigint").alias("cusum_micro"),
        )
        .orderBy("user_id")
    )


QUERIES = {
    "events_overlap_sessions": events_overlap_sessions,
    "events_interpolate_linear": events_interpolate_linear,
    "events_ewma": events_ewma,
    "events_attribution": events_attribution,
    "events_markov_transitions": events_markov_transitions,
    "events_rolling_active_users": events_rolling_active_users,
    "events_session_paths": events_session_paths,
    "events_cohort_ltv": events_cohort_ltv,
    "events_stickiness": events_stickiness,
    "events_dow_seasonality": events_dow_seasonality,
    "events_cusum_changepoint": events_cusum_changepoint,
    "events_user_trend": events_user_trend,
}

ORACLES = {
    "events_overlap_sessions": f"""
        WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                   FROM events WHERE user_id < {OVERLAP_MAX_USER}),
        g AS (SELECT *, epoch_us(ts) - LAG(epoch_us(ts)) OVER
                           (PARTITION BY user_id ORDER BY ts, event_id) AS gap
              FROM e),
        s AS (SELECT *, CAST(SUM(CASE WHEN gap IS NULL OR gap > {SESSION_GAP_US}
                                      THEN 1 ELSE 0 END)
                           OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
              FROM g),
        sess AS (SELECT user_id, session_id,
                        MIN(epoch_us(ts)) - {OVERLAP_PAD_US} AS s_us,
                        MAX(epoch_us(ts)) + {OVERLAP_PAD_US} AS e_us
                 FROM s GROUP BY user_id, session_id),
        hours AS (SELECT user_id, session_id, s_us, e_us,
                         unnest(generate_series(s_us // 3600000000,
                                                e_us // 3600000000)) AS hr
                  FROM sess),
        ok AS (SELECT hr FROM hours GROUP BY hr
               HAVING COUNT(*) <= {OVERLAP_MAX_HOUR_SESSIONS}),
        h2 AS (SELECT hours.* FROM hours JOIN ok USING (hr)),
        pairs AS (
            SELECT DISTINCT a.user_id AS u1, a.session_id AS sid1,
                            b.user_id AS u2, b.session_id AS sid2,
                            a.s_us AS s1, a.e_us AS e1,
                            b.s_us AS s2, b.e_us AS e2
            FROM h2 a JOIN h2 b ON a.hr = b.hr AND a.user_id < b.user_id)
        SELECT u1, sid1, u2, sid2,
               CAST(LEAST(e1, e2) - GREATEST(s1, s2) AS DOUBLE) / 1e6
                   AS overlap_sec
        FROM pairs
        WHERE LEAST(e1, e2) - GREATEST(s1, s2) > 0
        ORDER BY u1, sid1, u2, sid2
    """,
    "events_interpolate_linear": f"""
        WITH hourly AS (
            SELECT user_id,
                   CAST(epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP)))
                        / 3600000000 AS BIGINT) AS h,
                   CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS v
            FROM events WHERE user_id < {INTERP_MAX_USER}
            GROUP BY 1, 2),
        spine AS (
            SELECT user_id, unnest(generate_series(MIN(h), MAX(h))) AS h
            FROM hourly GROUP BY user_id),
        j AS (
            SELECT sp.user_id, sp.h, hv.v,
                   LAST_VALUE(hv.v IGNORE NULLS) OVER
                       (PARTITION BY sp.user_id ORDER BY sp.h
                        ROWS UNBOUNDED PRECEDING) AS pv,
                   LAST_VALUE(CASE WHEN hv.v IS NOT NULL THEN sp.h END
                              IGNORE NULLS) OVER
                       (PARTITION BY sp.user_id ORDER BY sp.h
                        ROWS UNBOUNDED PRECEDING) AS ph,
                   FIRST_VALUE(hv.v IGNORE NULLS) OVER
                       (PARTITION BY sp.user_id ORDER BY sp.h
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
                   FIRST_VALUE(CASE WHEN hv.v IS NOT NULL THEN sp.h END
                               IGNORE NULLS) OVER
                       (PARTITION BY sp.user_id ORDER BY sp.h
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
            FROM spine sp LEFT JOIN hourly hv
              ON sp.user_id = hv.user_id AND sp.h = hv.h)
        SELECT user_id, h AS epoch_hour, v IS NULL AS was_gap,
               CASE WHEN v IS NOT NULL THEN v
                    WHEN nv IS NULL THEN pv
                    ELSE pv + ((nv - pv) * (h - ph)) / (nh - ph)
               END AS value_interp
        FROM j
        ORDER BY user_id, epoch_hour
    """,
    # Same integer-micro fold: list() over the identical ordered frame,
    # reversed, weighted by powers of two via the 1-based indexed
    # lambda, one truncating // at the end.
    "events_ewma": f"""
        WITH p AS (
            SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
                   CAST(FLOOR(value * 1000000) AS BIGINT) AS v_micro
            FROM events WHERE event_type = 'purchase'),
        framed AS (
            SELECT user_id, event_id, ts, value,
                   list(v_micro) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN {EWMA_LOOKBACK - 1} PRECEDING
                                AND CURRENT ROW) AS vals
            FROM p)
        SELECT user_id, event_id, ts, value,
               CAST(list_sum(list_transform(
                   list_reverse(vals),
                   (x, i) -> x * (CAST(1 AS BIGINT) << ({EWMA_LOOKBACK} - i))
               )) // {_EWMA_DEN} AS BIGINT) AS ewma_micro
        FROM framed
        ORDER BY user_id, ts, event_id
    """,
    "events_attribution": f"""
        WITH e AS (
            SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
                   event_type, value
            FROM events),
        flagged AS (
            SELECT event_id, user_id, ts, event_type, value,
                   MAX(CASE WHEN event_type = 'click' THEN ts END) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS last_click_ts
            FROM e)
        SELECT event_id, user_id, ts, value, last_click_ts,
               epoch_us(ts) - epoch_us(last_click_ts) AS latency_us,
               CASE WHEN last_click_ts IS NULL THEN FALSE
                    ELSE epoch_us(ts) - epoch_us(last_click_ts)
                         <= {ATTR_WINDOW_US} END AS attributed
        FROM flagged
        WHERE event_type = 'purchase'
        ORDER BY user_id, ts, event_id
    """,
    "events_markov_transitions": """
        WITH e AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
                   event_type
            FROM events),
        seq AS (
            SELECT LAG(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)
                       AS prev_type,
                   event_type AS next_type
            FROM e),
        pairs AS (
            SELECT prev_type, next_type, COUNT(*) AS n_trans
            FROM seq WHERE prev_type IS NOT NULL
            GROUP BY 1, 2),
        totals AS (
            SELECT prev_type, CAST(SUM(n_trans) AS BIGINT) AS n_from
            FROM pairs GROUP BY prev_type)
        SELECT p.prev_type, p.next_type,
               CAST(p.n_trans AS BIGINT) AS n_trans,
               t.n_from,
               p.n_trans * 1000000 // t.n_from AS prob_ppm
        FROM pairs p JOIN totals t ON t.prev_type = p.prev_type
        ORDER BY p.prev_type, p.next_type
    """,
    "events_rolling_active_users": f"""
        WITH presence AS (
            SELECT DISTINCT user_id,
                   CAST(epoch_us(date_trunc('day', CAST(ts AS TIMESTAMP)))
                        // 86400000000 AS BIGINT) AS day
            FROM events),
        span AS (SELECT MAX(day) AS hi FROM presence),
        expl AS (
            SELECT user_id, day + i AS w_end
            FROM presence, range(0, 7) AS t(i))
        SELECT w_end AS window_end_day,
               COUNT(DISTINCT user_id) AS n_active
        FROM expl, span
        WHERE w_end <= hi
        GROUP BY w_end
        ORDER BY window_end_day
    """,
    "events_session_paths": f"""
        WITH e AS (
            SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
                   event_type
            FROM events),
        g AS (
            SELECT *,
                   epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS gap
            FROM e),
        s AS (
            SELECT *,
                   SUM(CASE WHEN gap IS NULL OR gap > {SESSION_GAP_US}
                            THEN 1 ELSE 0 END) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS session_id
            FROM g),
        rk AS (
            SELECT user_id, session_id, event_type,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id, session_id
                       ORDER BY ts, event_id) AS rk
            FROM s),
        paths AS (
            SELECT user_id, session_id,
                   string_agg(event_type, '>' ORDER BY rk) AS path
            FROM rk WHERE rk <= {PATH_LEN}
            GROUP BY user_id, session_id),
        counts AS (
            SELECT path, COUNT(*) AS n_sessions FROM paths GROUP BY path),
        tot AS (SELECT SUM(n_sessions) AS n_total FROM counts)
        SELECT path,
               CAST(n_sessions AS BIGINT) AS n_sessions,
               -- n_total is HUGEINT (SUM promotion); uncast HUGEINT output
               -- is the driver-red signature — pin to BIGINT.
               CAST(n_sessions * 1000000 // n_total AS BIGINT) AS share_ppm
        FROM counts, tot
        ORDER BY n_sessions DESC, path
        LIMIT {PATH_TOP_K}
    """,
    "events_cohort_ltv": """
        WITH tagged AS (
            SELECT user_id, event_type,
                   -- Monday-aligned integer week index (day 4 = first
                   -- Monday), offset so the dividend stays non-negative
                   -- for post-1970 data: floor (//) == truncate (Spark
                   -- div) there, engine-proof on 1970-01-01..04 too.
                   CAST((epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 + 3)
                        // 7 - 1 AS BIGINT) AS wk,
                   CAST(FLOOR(value * 1000000) AS BIGINT) AS v_micro
            FROM events),
        cohorts AS (
            SELECT user_id, MIN(wk) AS cohort_wk FROM tagged GROUP BY user_id),
        sizes AS (
            SELECT cohort_wk, COUNT(*) AS n_users FROM cohorts GROUP BY cohort_wk),
        rev AS (
            SELECT c.cohort_wk, t.wk - c.cohort_wk AS age_wk,
                   SUM(t.v_micro) AS rev_micro
            FROM tagged t JOIN cohorts c ON c.user_id = t.user_id
            WHERE t.event_type = 'purchase'
            GROUP BY 1, 2),
        cum AS (
            SELECT cohort_wk, age_wk, rev_micro,
                   SUM(rev_micro) OVER (
                       PARTITION BY cohort_wk ORDER BY age_wk
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum_rev_micro
            FROM rev)
        SELECT m.cohort_wk, m.age_wk,
               CAST(m.rev_micro AS BIGINT) AS rev_micro,
               CAST(m.cum_rev_micro AS BIGINT) AS cum_rev_micro,
               s.n_users,
               -- sign-branched truncating division (== Spark div on every
               -- engine version, refund-negative cumulative included) and
               -- BIGINT-pinned output (HUGEINT is the driver-red signature)
               CAST(CASE WHEN m.cum_rev_micro < 0
                         THEN -((-m.cum_rev_micro) // s.n_users)
                         ELSE m.cum_rev_micro // s.n_users END
                    AS BIGINT) AS ltv_micro_per_user
        FROM cum m JOIN sizes s ON s.cohort_wk = m.cohort_wk
        ORDER BY m.cohort_wk, m.age_wk
    """,
    "events_stickiness": """
        WITH presence AS (
            SELECT DISTINCT user_id,
                   CAST(epoch_us(date_trunc('day', CAST(ts AS TIMESTAMP)))
                        // 86400000000 AS BIGINT) AS day
            FROM events),
        dau AS (
            SELECT day, COUNT(DISTINCT user_id) AS dau
            FROM presence GROUP BY day),
        expl AS (
            SELECT user_id, day + i AS w_end
            FROM presence, range(0, 7) AS t(i)),
        wau AS (
            SELECT w_end, COUNT(DISTINCT user_id) AS wau
            FROM expl GROUP BY w_end)
        SELECT d.day, d.dau, w.wau,
               d.dau * 1000000 // w.wau AS stickiness_ppm
        FROM dau d JOIN wau w ON w.w_end = d.day
        ORDER BY d.day
    """,
    "events_dow_seasonality": """
        WITH base AS (
            SELECT CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
                        AS BIGINT) % 7 AS dow,
                   CAST(FLOOR(value * 1000000) AS BIGINT) AS v_micro
            FROM events WHERE event_type = 'purchase'),
        per_dow AS (
            SELECT dow, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(v_micro) AS BIGINT) AS sum_micros
            FROM base GROUP BY dow),
        overall AS (
            SELECT CAST(SUM(n) AS BIGINT) AS n_all,
                   CAST(SUM(sum_micros) AS BIGINT) AS sum_all
            FROM per_dow),
        means AS (
            SELECT dow, n, sum_micros,
                   sum_micros // n AS mean_micro,
                   sum_all // n_all AS mean_all
            FROM per_dow, overall),
        devs AS (
            SELECT dow, n, sum_micros, mean_micro,
                   (mean_micro - mean_all) * 1000000 AS dev_num, mean_all
            FROM means)
        SELECT dow, n, sum_micros, mean_micro,
               -- sign-branched truncating division: dev_num is negative
               -- for below-average weekdays, and // on a negative
               -- dividend is floor-vs-truncate engine-version-dependent;
               -- CAST pins the output to BIGINT (HUGEINT output is the
               -- driver-red signature).
               CAST(CASE WHEN dev_num < 0
                         THEN -((-dev_num) // mean_all)
                         ELSE dev_num // mean_all END
                    AS BIGINT) AS dev_ppm
        FROM devs
        ORDER BY dow
    """,
    "events_cusum_changepoint": """
        WITH q AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
                   CAST(FLOOR(value * 1000000) AS BIGINT) AS v_micro
            FROM events WHERE event_type = 'purchase'),
        stats AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(v_micro) AS s
            FROM q GROUP BY user_id),
        dev AS (
            SELECT q.user_id, q.ts, q.event_id, st.n,
                   q.v_micro - st.s // st.n AS dev_micro
            FROM q JOIN stats st ON st.user_id = q.user_id),
        cusum AS (
            SELECT user_id, n,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS pos,
                   SUM(dev_micro) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cusum_micro
            FROM dev),
        picked AS (
            SELECT *, ROW_NUMBER() OVER (
                       PARTITION BY user_id
                       ORDER BY ABS(cusum_micro) DESC, pos) AS rk
            FROM cusum)
        SELECT user_id, n, CAST(pos AS INTEGER) AS change_pos,
               CAST(cusum_micro AS BIGINT) AS cusum_micro
        FROM picked WHERE rk = 1
        ORDER BY user_id
    """,
    "events_user_trend": """
        WITH q AS (
            SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                   CAST(FLOOR(value * 1000000) AS BIGINT) AS y
            FROM events WHERE event_type = 'purchase'),
        first AS (
            SELECT user_id, MIN(us) AS us0 FROM q GROUP BY user_id),
        xy AS (
            SELECT q.user_id, (q.us - f.us0) // 3600000000 AS x, q.y
            FROM q JOIN first f ON f.user_id = q.user_id),
        sums AS (
            SELECT user_id,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(x) AS sx, SUM(y) AS sy,
                   SUM(x * y) AS sxy, SUM(x * x) AS sxx
            FROM xy GROUP BY user_id)
        SELECT user_id, n,
               -- The slope numerator CAN be negative, and DuckDB versions
               -- disagree on negative ``//`` (1.0 truncates, later floor)
               -- while Spark's div truncates — so divide magnitudes and
               -- reapply the sign: positive-operand ``//`` is identical
               -- in every version (r14 floordiv_probe).
               CASE WHEN CAST(n AS HUGEINT) * sxx
                         - CAST(sx AS HUGEINT) * sx = 0 THEN NULL
                    WHEN CAST(n AS HUGEINT) * sxy
                         - CAST(sx AS HUGEINT) * sy < 0
                    THEN CAST(-((CAST(sx AS HUGEINT) * sy
                                 - CAST(n AS HUGEINT) * sxy)
                                // (CAST(n AS HUGEINT) * sxx
                                    - CAST(sx AS HUGEINT) * sx)) AS BIGINT)
                    ELSE CAST((CAST(n AS HUGEINT) * sxy
                               - CAST(sx AS HUGEINT) * sy)
                              // (CAST(n AS HUGEINT) * sxx
                                  - CAST(sx AS HUGEINT) * sx) AS BIGINT)
                    END AS slope_micro_per_hr
        FROM sums
        ORDER BY user_id
    """,
}
