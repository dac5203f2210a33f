"""Conversion-latency analytics (round 8).

The reference has no event analytics (its data path is a 1:1 table
copy, /root/reference/src/migrate/table_migrator.rs:43-114); this
extends the events family (funnel, retention, attribution, sessions)
with the funnel-LATENCY histogram: how long signup -> first purchase
takes, the growth metric behind activation dashboards.

Scale notes (100 TB): two conditional MINs in ONE user-keyed aggregate
(never two scans), a day-bucket histogram (output is bucket-count-
sized), and a broadcast one-row total for the share ppm. Exact integer
end-to-end: microsecond deltas, truncating-div day buckets, ppm shares
via the repo `div` contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from ..io import load_table
from .events2 import ATTR_WINDOW_US


def events_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup-to-first-purchase latency, bucketed by whole days.

    Per user: first ``signup`` ts and first ``purchase`` ts (one
    aggregate with two conditional MINs). Converters are users whose
    first purchase is at or after their first signup; their lag in
    whole days (truncating) buckets the histogram. Output: one row per
    lag-day bucket with the converter count and its exact-ppm share of
    all converters, plus a summary row (lag_days = -1) carrying the
    signup population and the overall conversion rate ppm.
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    per_user = (
        ev.filter(F.col("event_type").isin("signup", "purchase"))
        .select("user_id", "event_type", us.alias("us"))
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "signup", F.col("us"))).alias(
                "signup_us"
            ),
            F.min(
                F.when(F.col("event_type") == "purchase", F.col("us"))
            ).alias("purchase_us"),
        )
        .filter(F.col("signup_us").isNotNull())
    )
    converters = per_user.filter(
        F.col("purchase_us") >= F.col("signup_us")
    ).select(
        F.expr("(purchase_us - signup_us) div 86400000000").alias("lag_days")
    )
    hist = converters.groupBy("lag_days").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    tot = per_user.agg(
        F.count(F.lit(1)).alias("n_signup"),
        F.sum(
            F.when(F.col("purchase_us") >= F.col("signup_us"), 1).otherwise(0)
        ).alias("n_conv"),
    )
    buckets = hist.crossJoin(F.broadcast(tot)).select(
        "lag_days",
        "n_users",
        F.expr("n_users * 1000000 div n_conv").alias("share_ppm"),
    )
    summary = tot.select(
        F.lit(-1).cast("bigint").alias("lag_days"),
        F.col("n_signup").cast("bigint").alias("n_users"),
        F.expr("n_conv * 1000000 div n_signup").alias("share_ppm"),
    )
    return buckets.unionByName(summary).orderBy("lag_days")


FUNNEL_WINDOW_DAYS = 7


def events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-boxed conversion funnel per signup cohort week: of each
    week's first-time signups, how many viewed and how many purchased
    WITHIN ``FUNNEL_WINDOW_DAYS`` of their first signup — the plain
    funnel (``events.events_funnel``) ignores elapsed time, which
    overstates activation; this is the dashboard variant.

    One user-keyed aggregate derives first-signup plus the two windowed
    firsts (conditional MINs against the signup bound — still a single
    scan because the bound is the same aggregate's MIN, folded via a
    self-join-free two-phase aggregate: first pass min signup, second
    conditional pass joined back per user). Cohort output is
    weeks-sized; rates in exact ppm.
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    base = ev.filter(
        F.col("event_type").isin("signup", "view", "purchase")
    ).select("user_id", "event_type", us.alias("us"))
    first_signup = (
        base.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("us").alias("s_us"))
    )
    window_us = FUNNEL_WINDOW_DAYS * 86_400_000_000
    stages = (
        base.join(first_signup, "user_id")
        .filter(
            (F.col("us") >= F.col("s_us"))
            & (F.col("us") < F.col("s_us") + F.lit(window_us))
        )
        .groupBy("user_id")
        .agg(
            F.min("s_us").alias("s_us"),
            F.max(
                F.when(F.col("event_type") == "view", 1).otherwise(0)
            ).alias("viewed"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("purchased"),
        )
    )
    wk = F.expr("s_us div 604800000000").cast("bigint")
    return (
        stages.groupBy(wk.alias("cohort_wk"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_signups"),
            F.sum("viewed").cast("bigint").alias("n_viewed_7d"),
            F.sum("purchased").cast("bigint").alias("n_purchased_7d"),
        )
        .select(
            "cohort_wk",
            "n_signups",
            "n_viewed_7d",
            "n_purchased_7d",
            F.expr("n_viewed_7d * 1000000 div n_signups").alias(
                "view_rate_ppm"
            ),
            F.expr("n_purchased_7d * 1000000 div n_signups").alias(
                "purchase_rate_ppm"
            ),
        )
        .orderBy("cohort_wk")
    )


def q_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions through Spark's NATIVE ``session_window``
    aggregation (the batch form of the streaming session operator) —
    the engine-owned twin of the gaps-and-islands
    ``events.events_sessionization``. Semantics difference pinned by
    the oracle: ``session_window`` starts a NEW session when the gap is
    >= the timeout (the islands form uses strict >), and the session
    end extends 30 minutes past the last event.

    Plan: one shuffle keyed by (user, merged session window) — the
    session merge happens inside the aggregation operator, no window
    function pass at all.
    """
    ev = load_table(spark, sf_dir, "events")
    sw = F.session_window(F.col("ts").cast("timestamp"), "30 minutes")
    return (
        ev.groupBy(sw.alias("w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.floor(F.col("value") * 1_000_000).cast("bigint")).alias(
                "sum_micros"
            ),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_micros",
        )
        .orderBy("user_id", "session_start")
    )


def events_inter_arrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap profile: event count, min/max gap, and
    the exact mean gap in whole microseconds (sum of gaps is simply
    last - first, so the aggregate needs no per-gap sum) — the
    burstiness signal bot-detection and capacity models start from.

    One user-keyed aggregate for (n, first, last); the min/max gaps
    need the lag pass — a second expression over the SAME user-keyed
    sort, one shuffle total.
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    gapped = ev.select(
        "user_id", us.alias("us"), "event_id"
    ).select(
        "user_id",
        "us",
        (F.col("us") - F.lag("us").over(w)).alias("gap"),
    )
    return (
        gapped.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.min("gap").alias("min_gap_us"),
            F.max("gap").alias("max_gap_us"),
            (F.max("us") - F.min("us")).alias("span_us"),
        )
        .filter(F.col("n_events") >= 2)
        .select(
            "user_id",
            "n_events",
            "min_gap_us",
            "max_gap_us",
            F.expr("span_us div (n_events - 1)").alias("mean_gap_us"),
        )
        .orderBy("user_id")
    )


def events_survival_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-time churn hazard table: per cohort age (weeks since a
    user's first event), the number of users still at risk, the number
    whose LAST event falls in that week (churned), and the exact-ppm
    hazard churned/at_risk — the lifetime-model complement of the
    retention matrix (retention counts presence; hazard conditions on
    survival).

    One user-keyed aggregate for (first_wk, last_wk); ages derive per
    user; at-risk at age a = users with lifetime >= a, a suffix count
    over the AGE domain (bounded weeks, tiny window). Ages-sized
    output.
    """
    ev = load_table(spark, sf_dir, "events")
    wk = F.expr(
        "unix_micros(CAST(ts AS TIMESTAMP)) div 604800000000"
    ).cast("bigint")
    spans = ev.select("user_id", wk.alias("wk")).groupBy("user_id").agg(
        F.min("wk").alias("first_wk"), F.max("wk").alias("last_wk")
    )
    per_age = (
        spans.select((F.col("last_wk") - F.col("first_wk")).alias("age"))
        .groupBy("age")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_churned"))
    )
    wsuf = (
        W.orderBy(F.desc("age")).rowsBetween(W.unboundedPreceding, 0)
    )
    # The suffix count runs over the AGE domain — weeks of history, a
    # constants-bounded support (the KS/AUC distinct-support argument),
    # so the partitionless window is result-sized, not corpus-sized.
    return (
        per_age.select(
            "age",
            "n_churned",
            F.sum("n_churned").over(wsuf).cast("bigint").alias("n_at_risk"),
        )
        .select(
            "age",
            "n_at_risk",
            "n_churned",
            F.expr("n_churned * 1000000 div n_at_risk").alias("hazard_ppm"),
        )
        .orderBy("age")
    )


def events_peak_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-maximum detection over the hourly volume series per event
    type: an hour is a PEAK when its count strictly exceeds the
    previous observed hour's and is at least the next observed hour's
    (ties break toward the earlier hour, so plateaus yield exactly one
    peak). Neighbors are adjacent OBSERVED hours — zero-volume gap
    hours do not reset the comparison — and series endpoints compare
    against 0. The alerting primitive on any metric stream.

    One (type, hour) aggregate + one type-keyed lag/lead window over
    the HOUR domain (bounded support), peaks-sized output.
    """
    ev = load_table(spark, sf_dir, "events")
    hour = F.expr(
        "unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000"
    ).cast("bigint")
    per_hour = ev.select("event_type", hour.alias("hr")).groupBy(
        "event_type", "hr"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = W.partitionBy("event_type").orderBy("hr")
    flagged = per_hour.select(
        "event_type",
        "hr",
        "n",
        F.coalesce(F.lag("n").over(w), F.lit(0)).alias("prev_n"),
        F.coalesce(F.lead("n").over(w), F.lit(0)).alias("next_n"),
    )
    return (
        flagged.filter(
            (F.col("n") > F.col("prev_n")) & (F.col("n") >= F.col("next_n"))
        )
        .select("event_type", "hr", "n", "prev_n", "next_n")
        .orderBy("event_type", "hr")
    )


def events_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact autocorrelation of the daily event-count series at lags
    1..7 — the seasonality detector behind `events_dow_seasonality`
    generalized to arbitrary lag, with the classic ACF estimator kept
    fully rational so the cross-engine hash is bit-for-bit:

        r_k = sum_t (x_t - mean)(x_{t+k} - mean) / sum_t (x_t - mean)^2

    Multiplying numerator and denominator by n^2 clears the mean's
    division: with c_t = n*x_t - S both sides are integer sums, and the
    only division is the final micro-scaled truncating `div` (signed;
    Spark `div` == DuckDB `//` truncate toward zero). t is the
    OBSERVED-day sequence index (row_number over the day domain), the
    same convention both engines compute.

    Scale notes (100 TB): one map-side-combined day aggregate collapses
    the table to ~n_days rows; everything after (centering, the 7-lag
    band self-join, the final ratio) runs on that bounded relation —
    the band join is days x 7 rows. Overflow: c_t^2 sums reach ~1.5e18
    at 670k events/day x 150 days; the 1e6 scaling runs in
    DECIMAL(38,0)/HUGEINT with ~1e13 days-to-spare headroom.
    """
    ev = load_table(spark, sf_dir, "events")
    day = F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000")
    daily = ev.select(day.alias("day")).groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    wt = W.orderBy("day")
    seq = daily.select(
        "day", "x", F.row_number().over(wt).alias("t")
    )
    tot = seq.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
    )
    cent = seq.crossJoin(F.broadcast(tot)).select(
        "t",
        (F.col("n") * F.col("x") - F.col("s")).alias("c"),
        "n",
    )
    den = cent.agg(
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("den"),
        F.max("n").alias("n_days"),
    )
    a, b = cent.alias("a"), cent.alias("b")
    nums = (
        a.join(
            b,
            (F.col("b.t") - F.col("a.t") >= 1)
            & (F.col("b.t") - F.col("a.t") <= 7),
        )
        .groupBy((F.col("b.t") - F.col("a.t")).alias("lag"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
            F.sum(
                F.col("a.c").cast("decimal(38,0)") * F.col("b.c")
            ).cast("bigint").alias("num"),
        )
    )
    return (
        nums.crossJoin(F.broadcast(den))
        .select(
            "lag",
            "n_days",
            "n_terms",
            "num",
            F.expr(
                "CAST(CAST(num AS DECIMAL(38,0)) * 1000000 div den"
                " AS BIGINT)"
            ).alias("acf_micro"),
        )
        .orderBy("lag")
    )


# Deterministic experiment assignment: same salted-md5 mechanics as the
# corpus splits (engine-exact, re-drawable via the salt), arms split
# 128/128 of the 256 two-hex-prefix values.
AB_SALT = "ab-v1"
AB_ARM_UPPER = "80"


def events_ab_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic A/B arm assignment + sample-ratio-mismatch audit:
    every user hashes into arm A or B (salted md5 prefix, 50/50 by
    construction), and the audit reports per arm the user count and
    its exact-ppm share (the SRM check — a share far from 500000 means
    the assignment or logging is broken), event volume, purchase
    conversion (converting users ppm), and total purchase value in
    micros. The experiment-analysis entry point over the events table.

    Scale notes (100 TB): assignment is a pure projection on user_id;
    the audit is one user-level aggregate (map-side combinable on the
    user key) followed by a 2-group rollup and a broadcast one-row
    total. No windows, no collects.
    """
    ev = load_table(spark, sf_dir, "events")
    arm = F.when(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(AB_SALT), F.col("user_id").cast("string")
                ).cast("binary")
            ),
            1,
            2,
        )
        < AB_ARM_UPPER,
        "A",
    ).otherwise("B")
    per_user = (
        ev.select(
            "user_id",
            arm.alias("arm"),
            (F.col("event_type") == "purchase").cast("bigint").alias(
                "is_purchase"
            ),
            F.when(
                F.col("event_type") == "purchase",
                F.floor(F.col("value") * 1_000_000).cast("bigint"),
            )
            .otherwise(0)
            .alias("v_micro"),
        )
        .groupBy("arm", "user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("is_purchase").cast("bigint").alias("n_purchases"),
            F.sum("v_micro").cast("bigint").alias("value_micro"),
        )
    )
    per_arm = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("n_events").cast("bigint").alias("n_events"),
        F.sum("n_purchases").cast("bigint").alias("n_purchase_events"),
        F.sum((F.col("n_purchases") > 0).cast("bigint"))
        .cast("bigint")
        .alias("converting_users"),
        F.sum("value_micro").cast("bigint").alias("purchase_value_micro"),
    )
    total = per_arm.agg(
        F.sum("n_users").cast("bigint").alias("total_users")
    )
    return (
        per_arm.crossJoin(F.broadcast(total))
        .select(
            "arm",
            "n_users",
            F.expr("n_users * 1000000 div total_users").alias(
                "user_share_ppm"
            ),
            "n_events",
            "n_purchase_events",
            "converting_users",
            F.expr("converting_users * 1000000 div n_users").alias(
                "conv_ppm"
            ),
            "purchase_value_micro",
        )
        .orderBy("arm")
    )


def events_time_weighted_value(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Time-weighted average value (TWAP) per user, exact integer micros.

    Each event's ``value`` is held until the user's next event; the
    segment weight is the microsecond gap to that next event (the final
    open segment carries no weight). TWAP = sum(v_micro * dt_us) div
    sum(dt_us), with the weighted sum promoted through DECIMAL(38,0)
    because v_micro * dt_us passes 2^63 at fixture scale already.

    Scale notes (100 TB): one shuffle keyed by user for the LEAD
    window, then a user-sized aggregate that rides the SAME exchange
    (partitioning reuse — no second shuffle); output is one row per
    user. Deterministic total order inside a user: (ts micros,
    event_id). The reference has no event analytics (its data path is
    a 1:1 table copy, /root/reference/src/migrate/table_migrator.rs).
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    seq = ev.select(
        "user_id",
        "event_id",
        us.alias("us"),
        F.floor(F.col("value") * 1_000_000).cast("bigint").alias("v_micro"),
    ).withColumn("nxt", F.lead("us").over(w))
    seg = seq.filter(F.col("nxt").isNotNull()).select(
        "user_id",
        "v_micro",
        (F.col("nxt") - F.col("us")).alias("dt_us"),
    )
    return (
        seg.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_segments"),
            F.sum("dt_us").cast("bigint").alias("span_us"),
            F.sum(
                F.col("v_micro").cast("decimal(38,0)") * F.col("dt_us")
            ).alias("w_sum"),
        )
        .select(
            "user_id",
            "n_segments",
            "span_us",
            F.expr(
                "CASE WHEN span_us = 0 THEN NULL"
                " ELSE CAST(w_sum div CAST(span_us AS DECIMAL(38,0))"
                " AS BIGINT) END"
            ).alias("twap_micro"),
        )
        .orderBy("user_id")
    )


# Position-based (U-shaped) multi-touch attribution: first and last
# touch each take MT_EDGE_PPM, interior touches split MT_MID_PPM evenly
# (truncating). 1 touch takes everything; 2 touches split evenly.
MT_EDGE_PPM = 400_000
MT_MID_PPM = 200_000
MT_TOUCH_TYPES = ("click", "view")


def events_multitouch_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """U-shaped multi-touch attribution: credited revenue per touch
    type, exact ppm credit splits (the last-touch op's multi-touch
    sibling — position-based credit is the ad-tech default when
    first-touch discovery matters as much as closing).

    Per purchase, its touchpoints are the same user's click/view
    events inside the 7-day lookback. Credit: single touch 1e6 ppm,
    two touches 500k each, otherwise 400k/400k to first/last and 200k
    split evenly (truncating div — credit may under-sum by < n ppm,
    never over) across the middle. Credited value = v_micro *
    credit_ppm div 1e6 per touch, summed per touch type.

    Plan: one user-keyed join purchases x touches (fan-out bounded by
    per-user activity inside the ATTRIBUTION WINDOW — the same
    horizon-bound argument as the interval-overlap join), two
    rank windows keyed by purchase riding one exchange, one
    touch-type aggregate. Integer micros/ppm end-to-end.
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        us.alias("p_us"),
        F.floor(F.col("value") * 1_000_000).cast("bigint").alias("v_micro"),
    )
    t = ev.filter(F.col("event_type").isin(*MT_TOUCH_TYPES)).select(
        F.col("user_id").alias("t_user"),
        F.col("event_id").alias("t_id"),
        us.alias("t_us"),
        F.col("event_type").alias("touch_type"),
    )
    j = p.join(
        t,
        (F.col("p_user") == F.col("t_user"))
        & (F.col("t_us") < F.col("p_us"))
        & (F.col("t_us") >= F.col("p_us") - F.lit(ATTR_WINDOW_US)),
        "inner",
    )
    w_asc = W.partitionBy("p_id").orderBy("t_us", "t_id")
    w_desc = W.partitionBy("p_id").orderBy(
        F.col("t_us").desc(), F.col("t_id").desc()
    )
    ranked = j.select(
        "p_id",
        "v_micro",
        "touch_type",
        F.row_number().over(w_asc).alias("rn"),
        F.row_number().over(w_desc).alias("rn_rev"),
        F.count(F.lit(1)).over(W.partitionBy("p_id")).alias("n_touches"),
    )
    credit = (
        F.when(F.col("n_touches") == 1, F.lit(1_000_000))
        .when(F.col("n_touches") == 2, F.lit(500_000))
        .when(F.col("rn") == 1, F.lit(MT_EDGE_PPM))
        .when(F.col("rn_rev") == 1, F.lit(MT_EDGE_PPM))
        .otherwise(
            F.expr(f"{MT_MID_PPM} div (n_touches - 2)")
        )
    )
    return (
        ranked.select(
            "touch_type",
            credit.cast("bigint").alias("credit_ppm"),
            "v_micro",
        )
        .select(
            "touch_type",
            "credit_ppm",
            F.expr("v_micro * credit_ppm div 1000000").alias(
                "credited_micro"
            ),
        )
        .groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            F.sum("credit_ppm").cast("bigint").alias("credit_ppm_sum"),
            F.sum("credited_micro").cast("bigint").alias(
                "credited_value_micro"
            ),
        )
        .orderBy("touch_type")
    )


def events_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix: for every unordered event-type pair,
    the exact user-set sizes, intersection, and Jaccard in ppm — the
    segmentation question ("do viewers also click?") answered exactly.

    Plan: one distinct (user, type) collapse (map-side combinable),
    then a user-keyed self-join whose fan-out is bounded by
    |types|^2 per user (constant — event types are a vocabulary, not
    data-scaled), one types^2-sized aggregate joined against the
    types-sized audience counts. No collects, no windows.
    """
    ev = load_table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    sizes = ut.groupBy(F.col("event_type").alias("t")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    both = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )
    return (
        both.join(
            F.broadcast(sizes.select(F.col("t").alias("type_a"),
                                     F.col("n_users").alias("n_a"))),
            "type_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("t").alias("type_b"),
                                     F.col("n_users").alias("n_b"))),
            "type_b",
        )
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_both",
            F.expr(
                "n_both * 1000000 div (n_a + n_b - n_both)"
            ).alias("jaccard_ppm"),
        )
        .orderBy("type_a", "type_b")
    )


QUERIES = {
    "events_conversion_lag": events_conversion_lag,
    "events_audience_overlap": events_audience_overlap,
    "events_time_weighted_value": events_time_weighted_value,
    "events_multitouch_attribution": events_multitouch_attribution,
    "events_autocorrelation": events_autocorrelation,
    "events_ab_assignment": events_ab_assignment,
    "events_funnel_windowed": events_funnel_windowed,
    "q_session_window_native": q_session_window_native,
    "events_inter_arrival": events_inter_arrival,
    "events_survival_hazard": events_survival_hazard,
    "events_peak_hours": events_peak_hours,
}

ORACLES = {
    "events_audience_overlap": """
        WITH ut AS (
            SELECT DISTINCT user_id, event_type FROM events),
        sizes AS (
            SELECT event_type AS t, CAST(COUNT(*) AS BIGINT) AS n_users
            FROM ut GROUP BY 1),
        both_t AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(COUNT(*) AS BIGINT) AS n_both
            FROM ut a JOIN ut b ON b.user_id = a.user_id
            WHERE a.event_type < b.event_type
            GROUP BY 1, 2)
        SELECT o.type_a, o.type_b,
               sa.n_users AS n_a, sb.n_users AS n_b, o.n_both,
               o.n_both * 1000000 // (sa.n_users + sb.n_users - o.n_both)
                   AS jaccard_ppm
        FROM both_t o
        JOIN sizes sa ON sa.t = o.type_a
        JOIN sizes sb ON sb.t = o.type_b
        ORDER BY type_a, type_b
    """,
    "events_multitouch_attribution": f"""
        WITH p AS (
            SELECT event_id AS p_id, user_id AS p_user,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS p_us,
                   CAST(FLOOR(value * 1000000) AS BIGINT) AS v_micro
            FROM events WHERE event_type = 'purchase'),
        t AS (
            SELECT user_id AS t_user, event_id AS t_id,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS t_us,
                   event_type AS touch_type
            FROM events
            WHERE event_type IN ('click', 'view')),
        j AS (
            SELECT p.p_id, p.v_micro, t.touch_type, t.t_us, t.t_id
            FROM p JOIN t
              ON t.t_user = p.p_user
             AND t.t_us < p.p_us
             AND t.t_us >= p.p_us - {ATTR_WINDOW_US}),
        ranked AS (
            SELECT p_id, v_micro, touch_type,
                   ROW_NUMBER() OVER (PARTITION BY p_id
                                      ORDER BY t_us, t_id) AS rn,
                   ROW_NUMBER() OVER (PARTITION BY p_id
                                      ORDER BY t_us DESC, t_id DESC)
                       AS rn_rev,
                   COUNT(*) OVER (PARTITION BY p_id) AS n_touches
            FROM j),
        credited AS (
            SELECT touch_type,
                   CAST(CASE WHEN n_touches = 1 THEN 1000000
                             WHEN n_touches = 2 THEN 500000
                             WHEN rn = 1 THEN {MT_EDGE_PPM}
                             WHEN rn_rev = 1 THEN {MT_EDGE_PPM}
                             ELSE {MT_MID_PPM} // (n_touches - 2)
                        END AS BIGINT) AS credit_ppm,
                   v_micro
            FROM ranked)
        SELECT touch_type,
               CAST(COUNT(*) AS BIGINT) AS n_touches,
               CAST(SUM(credit_ppm) AS BIGINT) AS credit_ppm_sum,
               CAST(SUM(v_micro * credit_ppm // 1000000) AS BIGINT)
                   AS credited_value_micro
        FROM credited
        GROUP BY touch_type
        ORDER BY touch_type
    """,
    "events_time_weighted_value": """
        WITH seq AS (
            SELECT user_id, event_id,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                   CAST(FLOOR(value * 1000000) AS BIGINT) AS v_micro,
                   LEAD(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                       PARTITION BY user_id
                       ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id
                   ) AS nxt
            FROM events),
        seg AS (
            SELECT user_id, v_micro, nxt - us AS dt_us
            FROM seq WHERE nxt IS NOT NULL)
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_segments,
               CAST(SUM(dt_us) AS BIGINT) AS span_us,
               CASE WHEN SUM(dt_us) = 0 THEN NULL
                    ELSE CAST(SUM(CAST(v_micro AS HUGEINT) * dt_us)
                              // CAST(SUM(dt_us) AS HUGEINT) AS BIGINT)
                    END AS twap_micro
        FROM seg GROUP BY user_id
        ORDER BY user_id
    """,
    "events_ab_assignment": f"""
        WITH per_user AS (
            SELECT CASE WHEN substr(md5('{AB_SALT}'
                                        || CAST(user_id AS VARCHAR)), 1, 2)
                             < '{AB_ARM_UPPER}'
                        THEN 'A' ELSE 'B' END AS arm,
                   user_id,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_purchases,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                                 THEN CAST(FLOOR(value * 1000000) AS BIGINT)
                                 ELSE 0 END) AS BIGINT) AS value_micro
            FROM events GROUP BY 1, 2),
        per_arm AS (
            SELECT arm,
                   CAST(COUNT(*) AS BIGINT) AS n_users,
                   CAST(SUM(n_events) AS BIGINT) AS n_events,
                   CAST(SUM(n_purchases) AS BIGINT) AS n_purchase_events,
                   CAST(SUM(CASE WHEN n_purchases > 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS converting_users,
                   CAST(SUM(value_micro) AS BIGINT) AS purchase_value_micro
            FROM per_user GROUP BY arm),
        total AS (SELECT CAST(SUM(n_users) AS BIGINT) AS total_users
                  FROM per_arm)
        SELECT arm, n_users,
               n_users * 1000000 // total_users AS user_share_ppm,
               n_events, n_purchase_events, converting_users,
               converting_users * 1000000 // n_users AS conv_ppm,
               purchase_value_micro
        FROM per_arm, total
        ORDER BY arm
    """,
    "events_autocorrelation": """
        WITH daily AS (
            SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1),
        seq AS (
            SELECT day, x, ROW_NUMBER() OVER (ORDER BY day) AS t
            FROM daily),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS s
            FROM seq),
        cent AS (
            SELECT t, n * x - s AS c, n FROM seq, tot),
        den AS (
            SELECT SUM(CAST(c AS HUGEINT) * c) AS den,
                   CAST(MAX(n) AS BIGINT) AS n_days
            FROM cent),
        nums AS (
            SELECT b.t - a.t AS lag,
                   CAST(COUNT(*) AS BIGINT) AS n_terms,
                   CAST(SUM(CAST(a.c AS HUGEINT) * b.c) AS BIGINT) AS num
            FROM cent a JOIN cent b
              ON b.t - a.t BETWEEN 1 AND 7
            GROUP BY 1)
        SELECT lag, n_days, n_terms, num,
               -- num (the lag autocovariance) CAN be negative; negative
               -- ``//`` drifts across DuckDB versions (1.0 truncates,
               -- later floor) while Spark's div truncates — divide
               -- magnitudes, reapply the sign (r14 floordiv_probe).
               CASE WHEN num < 0
                    THEN CAST(-((CAST(-num AS HUGEINT) * 1000000) // den)
                              AS BIGINT)
                    ELSE CAST((CAST(num AS HUGEINT) * 1000000) // den
                              AS BIGINT)
               END AS acf_micro
        FROM nums, den
        ORDER BY lag
    """,
    "events_peak_hours": """
        WITH per_hour AS (
            SELECT event_type,
                   CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000
                        AS BIGINT) AS hr,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2),
        flagged AS (
            SELECT event_type, hr, n,
                   CAST(COALESCE(LAG(n) OVER w, 0) AS BIGINT) AS prev_n,
                   CAST(COALESCE(LEAD(n) OVER w, 0) AS BIGINT) AS next_n
            FROM per_hour
            WINDOW w AS (PARTITION BY event_type ORDER BY hr))
        SELECT event_type, hr, n, prev_n, next_n
        FROM flagged
        WHERE n > prev_n AND n >= next_n
        ORDER BY event_type, hr
    """,
    "events_survival_hazard": """
        WITH spans AS (
            SELECT user_id,
                   MIN(epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000)
                       AS first_wk,
                   MAX(epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000)
                       AS last_wk
            FROM events GROUP BY user_id),
        per_age AS (
            SELECT CAST(last_wk - first_wk AS BIGINT) AS age,
                   CAST(COUNT(*) AS BIGINT) AS n_churned
            FROM spans GROUP BY 1),
        risk AS (
            SELECT age, n_churned,
                   CAST(SUM(n_churned) OVER (
                       ORDER BY age DESC ROWS UNBOUNDED PRECEDING)
                       AS BIGINT) AS n_at_risk
            FROM per_age)
        SELECT age, n_at_risk, n_churned,
               n_churned * 1000000 // n_at_risk AS hazard_ppm
        FROM risk
        ORDER BY age
    """,
    "events_inter_arrival": """
        WITH g AS (
            SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                   epoch_us(CAST(ts AS TIMESTAMP))
                       - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                           PARTITION BY user_id
                           ORDER BY CAST(ts AS TIMESTAMP), event_id) AS gap
            FROM events),
        per AS (
            SELECT user_id,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   MIN(gap) AS min_gap_us,
                   MAX(gap) AS max_gap_us,
                   MAX(us) - MIN(us) AS span_us
            FROM g GROUP BY user_id
            HAVING COUNT(*) >= 2)
        SELECT user_id, n_events, min_gap_us, max_gap_us,
               span_us // (n_events - 1) AS mean_gap_us
        FROM per
        ORDER BY user_id
    """,
    # Gaps-and-islands twin of the native session_window aggregation:
    # new session at gap >= 30 min (session_window's boundary rule),
    # session end = last event + 30 min.
    "q_session_window_native": """
        WITH e AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                   CAST(FLOOR(value * 1000000) AS BIGINT) AS v_micro,
                   event_id
            FROM events),
        g AS (
            SELECT *,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                                >= 1800000000
                        THEN 1 ELSE 0 END AS is_new
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s AS (
            SELECT *,
                   SUM(is_new) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS sid
            FROM g)
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 30 MINUTE AS session_end,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(v_micro) AS BIGINT) AS sum_micros
        FROM s
        GROUP BY user_id, sid
        ORDER BY user_id, session_start
    """,
    "events_funnel_windowed": f"""
        WITH base AS (
            SELECT user_id, event_type,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS us
            FROM events
            WHERE event_type IN ('signup', 'view', 'purchase')),
        fs AS (
            SELECT user_id, MIN(us) AS s_us
            FROM base WHERE event_type = 'signup' GROUP BY user_id),
        stages AS (
            SELECT b.user_id, MIN(f.s_us) AS s_us,
                   MAX(CASE WHEN b.event_type = 'view' THEN 1 ELSE 0 END)
                       AS viewed,
                   MAX(CASE WHEN b.event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS purchased
            FROM base b JOIN fs f ON f.user_id = b.user_id
            WHERE b.us >= f.s_us
              AND b.us < f.s_us + {FUNNEL_WINDOW_DAYS} * 86400000000
            GROUP BY b.user_id),
        cohorts AS (
            SELECT CAST(s_us // 604800000000 AS BIGINT) AS cohort_wk,
                   CAST(COUNT(*) AS BIGINT) AS n_signups,
                   CAST(SUM(viewed) AS BIGINT) AS n_viewed_7d,
                   CAST(SUM(purchased) AS BIGINT) AS n_purchased_7d
            FROM stages GROUP BY 1)
        SELECT cohort_wk, n_signups, n_viewed_7d, n_purchased_7d,
               n_viewed_7d * 1000000 // n_signups AS view_rate_ppm,
               n_purchased_7d * 1000000 // n_signups AS purchase_rate_ppm
        FROM cohorts
        ORDER BY cohort_wk
    """,
    "events_conversion_lag": """
        WITH per_user AS (
            SELECT user_id,
                   MIN(epoch_us(CAST(ts AS TIMESTAMP)))
                       FILTER (event_type = 'signup') AS signup_us,
                   MIN(epoch_us(CAST(ts AS TIMESTAMP)))
                       FILTER (event_type = 'purchase') AS purchase_us
            FROM events
            WHERE event_type IN ('signup', 'purchase')
            GROUP BY user_id
            HAVING signup_us IS NOT NULL),
        conv AS (
            SELECT (purchase_us - signup_us) // 86400000000 AS lag_days
            FROM per_user WHERE purchase_us >= signup_us),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_signup,
                   CAST(COUNT(*) FILTER (purchase_us >= signup_us) AS BIGINT)
                       AS n_conv
            FROM per_user),
        hist AS (
            SELECT lag_days, CAST(COUNT(*) AS BIGINT) AS n_users
            FROM conv GROUP BY lag_days)
        SELECT CAST(h.lag_days AS BIGINT) AS lag_days, h.n_users,
               h.n_users * 1000000 // t.n_conv AS share_ppm
        FROM hist h, tot t
        UNION ALL
        SELECT CAST(-1 AS BIGINT), n_signup,
               n_conv * 1000000 // n_signup
        FROM tot
        ORDER BY lag_days
    """,
}
