"""Binary-segmentation changepoint (round 11d, events5).

The reference has no event analytics (1:1 table copier,
/root/reference/src/migrate/table_migrator.rs:43-114); this extends
the changepoint tier (per-user CUSUM in events2.py) with the SERIES-
level detector a metrics platform runs nightly: the single best
mean-shift split of each event type's daily-revenue series — the
first step of binary segmentation.

For a series x_1..x_m (daily value cents), split after day t:
the between-segment cost reduction is
Delta(t) = n1*n2/m * (mean1 - mean2)^2, maximized exactly by
maximizing A(t)^2 / (t*(m-t)*m) with
A(t) = S1(t)*(m-t) - (S-S1(t))*t  — all integers, no division until
the final surfaced score (truncating, documented; ties break to the
EARLIEST day). delta fits BIGINT through ~sf10 and the ORDERING is on
the exact DECIMAL square and integer denominator via the truncated
quotient, identical in both engines.

Scale notes (100 TB): rows collapse to (event_type, day) cells first
(map-side combined); everything after — the prefix-sum window, the
argmax rank — runs on calendar-bounded cells (days x types, a plan
constant), the t-closeness/Mann-Kendall regime. One data-sized
shuffle total (the cells groupBy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from ..io import load_table


def events_best_split_changepoint(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Best single mean-shift split per event type over the daily
    value-cents series (module doc): split day, segment sizes and
    means, exact truncated Delta score."""
    ev = load_table(spark, sf_dir, "events")
    cells = (
        ev.select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.floor(F.col("value") * 100).cast("bigint").alias("v"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("v").cast("decimal(38,0)").alias("x"))
    )
    wo = W.partitionBy("event_type").orderBy("day")
    wall = W.partitionBy("event_type")
    pre = cells.select(
        "event_type",
        "day",
        F.row_number().over(wo).alias("t"),
        F.sum("x").over(wo.rowsBetween(W.unboundedPreceding, 0)).alias("s1"),
        F.count(F.lit(1)).over(wall).alias("m"),
        F.sum("x").over(wall).alias("s"),
    ).filter(F.col("t") < F.col("m"))
    scored = pre.select(
        "event_type",
        "day",
        "t",
        "m",
        F.expr(
            "CAST(s1 * (m - t) - (s - s1) * t AS DECIMAL(38,0))"
        ).alias("a"),
        F.expr("CAST(s1 div t AS BIGINT)").alias("mean1_cents"),
        F.expr("CAST((s - s1) div (m - t) AS BIGINT)").alias(
            "mean2_cents"
        ),
    ).select(
        "event_type",
        "day",
        "t",
        "m",
        "mean1_cents",
        "mean2_cents",
        F.expr(
            "CAST(a * a div (CAST(t AS DECIMAL(38,0)) * (m - t) * m)"
            " AS DECIMAL(38,0))"
        ).alias("_delta"),
    )
    pick = W.partitionBy("event_type").orderBy(F.desc("_delta"), "t")
    return (
        scored.withColumn("rk", F.row_number().over(pick))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("m").cast("bigint").alias("m_days"),
            F.col("day").alias("split_day"),
            F.col("t").cast("bigint").alias("n1_days"),
            "mean1_cents",
            "mean2_cents",
            F.col("_delta").cast("string").alias("delta_cents2"),
        )
        .orderBy("event_type")
    )


QUERIES = {
    "events_best_split_changepoint": events_best_split_changepoint,
}

ORACLES = {
    "events_best_split_changepoint": """
        WITH cells AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(SUM(CAST(FLOOR(value * 100) AS HUGEINT))
                        AS HUGEINT) AS x
            FROM events GROUP BY 1, 2),
        pre AS (
            SELECT event_type, day,
                   CAST(ROW_NUMBER() OVER w AS BIGINT) AS t,
                   SUM(x) OVER (w ROWS UNBOUNDED PRECEDING) AS s1,
                   CAST(COUNT(*) OVER (PARTITION BY event_type)
                        AS BIGINT) AS m,
                   SUM(x) OVER (PARTITION BY event_type) AS s
            FROM cells
            WINDOW w AS (PARTITION BY event_type ORDER BY day)
            QUALIFY t < m),
        scored AS (
            SELECT event_type, day, t, m,
                   s1 * (m - t) - (s - s1) * t AS a,
                   CAST(s1 // t AS BIGINT) AS mean1_cents,
                   CAST((s - s1) // (m - t) AS BIGINT) AS mean2_cents,
                   (s1 * (m - t) - (s - s1) * t)
                       * (s1 * (m - t) - (s - s1) * t)
                       // (CAST(t AS HUGEINT) * (m - t) * m) AS delta
            FROM pre),
        pick AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                         ORDER BY delta DESC, t) AS rk
            FROM scored)
        SELECT event_type,
               m AS m_days,
               day AS split_day,
               t AS n1_days,
               mean1_cents, mean2_cents,
               CAST(delta AS VARCHAR) AS delta_cents2
        FROM pick WHERE rk = 1
        ORDER BY event_type
    """,
}


def events_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve over purchase-cohort age
    (days between each user's first and last purchase): at-risk counts, churn events, discrete hazard,
    and the product-limit survival estimate in exact staged ppm —
    s_ppm(a) = s_ppm(a-1) * (r_a - d_a) div r_a (one truncation per
    step, documented; the float product would be order-safe here but
    not bit-pinned). The sequential product folds on the DRIVER over
    the bounded AGE cells (max user lifetime — the
    events_survival_hazard regime; the bounded-driver-read class,
    measured 4.5s -> sub-second vs a WITH RECURSIVE ladder whose
    UnionLoopExec pays one micro-job per step). Rows collapse to one
    user-keyed aggregate, then an ages-sized suffix count; the oracle
    keeps the recursive-CTE form.

    Reference scope note: the reference has no analytics surface
    (src/migrate/table_migrator.rs:43-114).
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    wk = F.expr(
        "unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000"
    ).cast("bigint")
    spans = (
        ev.select("user_id", wk.alias("wk"))
        .groupBy("user_id")
        .agg(F.min("wk").alias("first_wk"), F.max("wk").alias("last_wk"))
    )
    per_age = (
        spans.select((F.col("last_wk") - F.col("first_wk")).alias("age"))
        .groupBy("age")
        .agg(F.count(F.lit(1)).cast("bigint").alias("churned"))
    )
    wsuf = W.orderBy(F.desc("age")).rowsBetween(W.unboundedPreceding, 0)
    widx = W.orderBy("age")
    cells = per_age.select(
        "age",
        "churned",
        F.sum("churned").over(wsuf).cast("bigint").alias("at_risk"),
    ).withColumn("idx", F.row_number().over(widx))
    # The staged product is inherently sequential over the age ladder.
    # A WITH RECURSIVE ladder works but pays one micro-job per step
    # (21 steps = 4.5s at sf0.1 even with the anchor materialized);
    # the age domain is BOUNDED (max purchase lifetime), so this is
    # the bounded-driver-read class (centroids / histogram bins /
    # distributed_rank fold): collect the cells once, fold the exact
    # integer product on the driver, return a literal relation.
    rows = sorted(
        cells.collect(), key=lambda r: r.age
    )  # bounded: one row per lifetime day
    out = []
    s_ppm = None
    for r in rows:
        step = (r.at_risk - r.churned, r.at_risk)
        s_ppm = (
            (step[0] * 1_000_000) // step[1]
            if s_ppm is None
            else (s_ppm * step[0]) // step[1]
        )
        out.append(
            (
                int(r.age),
                int(r.at_risk),
                int(r.churned),
                (r.churned * 1_000_000) // r.at_risk,
                s_ppm,
            )
        )
    return spark.createDataFrame(
        out,
        "age_days bigint, at_risk bigint, churned bigint,"
        " hazard_ppm bigint, survival_ppm bigint",
    ).orderBy("age_days")


QUERIES["events_kaplan_meier"] = events_kaplan_meier

ORACLES["events_kaplan_meier"] = """
    WITH spans AS (
        SELECT user_id,
               CAST(MIN(epoch_us(CAST(ts AS TIMESTAMP))
                        // 86400000000) AS BIGINT) AS first_wk,
               CAST(MAX(epoch_us(CAST(ts AS TIMESTAMP))
                        // 86400000000) AS BIGINT) AS last_wk
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
    per_age AS (
        SELECT last_wk - first_wk AS age,
               CAST(COUNT(*) AS BIGINT) AS churned
        FROM spans GROUP BY 1),
    cells AS (
        SELECT age, churned,
               CAST(SUM(churned) OVER (ORDER BY age DESC
                                       ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS at_risk,
               CAST(ROW_NUMBER() OVER (ORDER BY age) AS BIGINT) AS idx
        FROM per_age),
    km AS (
        WITH RECURSIVE r AS (
            SELECT idx, age, at_risk, churned,
                   CAST((at_risk - churned) * 1000000 // at_risk
                        AS BIGINT) AS survival_ppm
            FROM cells WHERE idx = 1
            UNION ALL
            SELECT c.idx, c.age, c.at_risk, c.churned,
                   CAST(r.survival_ppm * (c.at_risk - c.churned)
                        // c.at_risk AS BIGINT)
            FROM r JOIN cells c ON c.idx = r.idx + 1)
        SELECT * FROM r)
    SELECT CAST(age AS BIGINT) AS age_days, at_risk, churned,
           CAST(churned * 1000000 // at_risk AS BIGINT) AS hazard_ppm,
           survival_ppm
    FROM km
    ORDER BY age_days
"""


def q_sax_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX-style symbolization of each priority's monthly revenue
    series with EMPIRICAL quartile breakpoints (the classic normal-
    curve breakpoints are irrational; the type-1 quartiles of the
    series's own values keep the alphabet assignment exact): month t
    maps to symbol a/b/c/d by how many of the three quartile values it
    exceeds. Output per priority: the month-ordered SAX word plus the
    symbol histogram — the shape-index a motif/anomaly scanner stores.

    Scale shape (100 TB): rows collapse to (priority, month) cells
    (map-side combined, calendar-bounded); the rank pass, breakpoint
    pick, word assembly and histogram all run on those cells. The word
    assembles order-safely via array_sort(struct(month, symbol)) —
    no order-dependent aggregation.

    Reference scope note: the reference has no analytics surface
    (src/migrate/table_migrator.rs:43-114).
    """
    orders = load_table(spark, sf_dir, "orders")
    cells = (
        orders.select(
            "o_orderpriority",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            .cast("bigint")
            .alias("mk"),
            F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("r"),
        )
        .groupBy("o_orderpriority", "mk")
        .agg(F.sum(F.col("r").cast("decimal(38,0)")).alias("rev"))
    )
    wo = W.partitionBy("o_orderpriority").orderBy("rev", "mk")
    ranked = cells.select(
        "o_orderpriority",
        "mk",
        "rev",
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1))
        .over(W.partitionBy("o_orderpriority"))
        .alias("m"),
    )
    qs = ranked.groupBy("o_orderpriority").agg(
        *[
            F.min(
                F.when(
                    F.expr(f"rn = ({i} * m + 3) div 4"), F.col("rev")
                )
            ).alias(f"q{i}")
            for i in (1, 2, 3)
        ]
    )
    sym = (
        cells.join(F.broadcast(qs), "o_orderpriority")
        .select(
            "o_orderpriority",
            "mk",
            F.expr(
                "element_at(array('a','b','c','d'),"
                " CAST((rev > q1) AS INT) + CAST((rev > q2) AS INT)"
                " + CAST((rev > q3) AS INT) + 1)"
            ).alias("sym"),
        )
    )
    return (
        sym.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("m_months"),
            F.expr(
                "array_join(transform(array_sort(collect_list("
                "struct(mk, sym))), x -> x.sym), '')"
            ).alias("sax_word"),
            *[
                F.sum((F.col("sym") == c).cast("bigint"))
                .cast("bigint")
                .alias(f"n_{c}")
                for c in "abcd"
            ],
        )
        .orderBy("o_orderpriority")
    )


QUERIES["q_sax_symbols"] = q_sax_symbols

ORACLES["q_sax_symbols"] = """
    WITH cells AS (
        SELECT o_orderpriority,
               CAST(YEAR(o_orderdate) * 12 + MONTH(o_orderdate)
                    AS BIGINT) AS mk,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS HUGEINT))
                    AS HUGEINT) AS rev
        FROM orders GROUP BY 1, 2),
    ranked AS (
        SELECT o_orderpriority, mk, rev,
               CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                       ORDER BY rev, mk) AS BIGINT)
                   AS rn,
               CAST(COUNT(*) OVER (PARTITION BY o_orderpriority)
                    AS BIGINT) AS m
        FROM cells),
    qs AS (
        SELECT o_orderpriority,
               MIN(CASE WHEN rn = (1 * m + 3) // 4 THEN rev END) AS q1,
               MIN(CASE WHEN rn = (2 * m + 3) // 4 THEN rev END) AS q2,
               MIN(CASE WHEN rn = (3 * m + 3) // 4 THEN rev END) AS q3
        FROM ranked GROUP BY 1),
    sym AS (
        SELECT c.o_orderpriority, c.mk,
               ['a','b','c','d'][CAST(c.rev > q.q1 AS INTEGER)
                                 + CAST(c.rev > q.q2 AS INTEGER)
                                 + CAST(c.rev > q.q3 AS INTEGER) + 1]
                   AS sym
        FROM cells c JOIN qs q USING (o_orderpriority))
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS m_months,
           string_agg(sym, '' ORDER BY mk) AS sax_word,
           CAST(COUNT(*) FILTER (sym = 'a') AS BIGINT) AS n_a,
           CAST(COUNT(*) FILTER (sym = 'b') AS BIGINT) AS n_b,
           CAST(COUNT(*) FILTER (sym = 'c') AS BIGINT) AS n_c,
           CAST(COUNT(*) FILTER (sym = 'd') AS BIGINT) AS n_d
    FROM sym
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


def q_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per priority over the monthly revenue
    series: the type-1 lower median of all pairwise slopes — the
    outlier-resistant companion to ``stats4.q_mann_kendall_trend``
    (same cells), plus the median intercept so the fitted line is
    fully specified.

    Slopes quantize to milli-cents-per-month with the SIGN SPLIT
    convention (slope = sign * (|dr| * 1000 div dm)) because signed
    integer division is not cross-engine verified (Spark div truncates
    toward zero, DuckDB // floors); medians are rank-based so no
    further division touches a signed value.

    Scale shape (100 TB): the (priority, month) cells are calendar-
    bounded, so the pairwise slope relation (~m^2/2 per priority) and
    both median rank windows are plan constants — the Mann-Kendall
    cells regime."""
    orders = load_table(spark, sf_dir, "orders")
    cells = (
        orders.select(
            "o_orderpriority",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            .cast("bigint")
            .alias("mk"),
            F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("r"),
        )
        .groupBy("o_orderpriority", "mk")
        .agg(
            F.sum(F.col("r").cast("decimal(38,0)"))
            .cast("bigint")
            .alias("rev")
        )
    )
    a = cells.select(
        "o_orderpriority", F.col("mk").alias("mi"), F.col("rev").alias("ri")
    )
    b = cells.select(
        "o_orderpriority", F.col("mk").alias("mj"), F.col("rev").alias("rj")
    )
    slopes = (
        a.join(b, "o_orderpriority")
        .filter(F.col("mi") < F.col("mj"))
        .select(
            "o_orderpriority",
            F.expr(
                "CAST(CASE WHEN rj >= ri THEN 1 ELSE -1 END"
                " * (ABS(rj - ri) * 1000 div (mj - mi)) AS BIGINT)"
            ).alias("slope"),
        )
    )
    ws = W.partitionBy("o_orderpriority").orderBy("slope")
    med_slope = (
        slopes.select(
            "o_orderpriority",
            "slope",
            F.row_number().over(ws).alias("rn"),
            F.count(F.lit(1))
            .over(W.partitionBy("o_orderpriority"))
            .alias("np"),
        )
        .filter(F.expr("rn = (np + 1) div 2"))
        .select(
            "o_orderpriority",
            F.col("slope").alias("slope_milli"),
            F.col("np").cast("bigint").alias("n_pairs"),
        )
    )
    resid = cells.join(F.broadcast(med_slope), "o_orderpriority").select(
        "o_orderpriority",
        "slope_milli",
        "n_pairs",
        (F.col("rev") * 1000 - F.col("slope_milli") * F.col("mk")).alias(
            "b_milli"
        ),
    )
    wb = W.partitionBy("o_orderpriority").orderBy("b_milli")
    return (
        resid.select(
            "o_orderpriority",
            "slope_milli",
            "n_pairs",
            "b_milli",
            F.row_number().over(wb).alias("rn"),
            F.count(F.lit(1))
            .over(W.partitionBy("o_orderpriority"))
            .alias("m"),
        )
        .filter(F.expr("rn = (m + 1) div 2"))
        .select(
            "o_orderpriority",
            F.col("m").cast("bigint").alias("m_months"),
            "n_pairs",
            "slope_milli",
            F.col("b_milli").alias("intercept_milli"),
        )
        .orderBy("o_orderpriority")
    )


QUERIES["q_theil_sen_trend"] = q_theil_sen_trend

ORACLES["q_theil_sen_trend"] = """
    WITH cells AS (
        SELECT o_orderpriority,
               CAST(YEAR(o_orderdate) * 12 + MONTH(o_orderdate)
                    AS BIGINT) AS mk,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS HUGEINT))
                    AS BIGINT) AS rev
        FROM orders GROUP BY 1, 2),
    slopes AS (
        SELECT a.o_orderpriority,
               CAST(CASE WHEN b.rev >= a.rev THEN 1 ELSE -1 END
                    * (ABS(b.rev - a.rev) * 1000 // (b.mk - a.mk))
                    AS BIGINT) AS slope
        FROM cells a
        JOIN cells b ON b.o_orderpriority = a.o_orderpriority
                    AND a.mk < b.mk),
    med AS (
        SELECT o_orderpriority, slope AS slope_milli,
               CAST(np AS BIGINT) AS n_pairs
        FROM (SELECT o_orderpriority, slope,
                     ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                        ORDER BY slope) AS rn,
                     COUNT(*) OVER (PARTITION BY o_orderpriority) AS np
              FROM slopes)
        WHERE rn = (np + 1) // 2),
    resid AS (
        SELECT c.o_orderpriority, m.slope_milli, m.n_pairs,
               c.rev * 1000 - m.slope_milli * c.mk AS b_milli
        FROM cells c JOIN med m USING (o_orderpriority))
    SELECT o_orderpriority,
           CAST(m AS BIGINT) AS m_months,
           n_pairs, slope_milli,
           b_milli AS intercept_milli
    FROM (SELECT *,
                 ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                    ORDER BY b_milli) AS rn,
                 COUNT(*) OVER (PARTITION BY o_orderpriority) AS m
          FROM resid)
    WHERE rn = (m + 1) // 2
    ORDER BY o_orderpriority
"""


MARKOV_POWER_ITERS = 4


def events_markov_stationary(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stationary distribution of the event-type Markov chain by
    ``MARKOV_POWER_ITERS`` exact integer power iterations — the
    long-run state mix implied by ``events2.events_markov_transitions``
    (same transition counts).

    pi_0 is uniform floor(1e6 / K); each step is
    pi'[j] = (sum_i pi[i] * p_ij) div 1e6 with p_ij the exact ppm
    transition row (one truncation per state per step; the mass drift
    is < K ppm per iteration, documented — no renormalization keeps
    every stage pure integer). The chain matrix is STATE x STATE
    (a domain constant), so the fold runs on the driver over the
    bounded transition cells (the KM / centroids bounded-driver-read
    class); the heavy work — the user-keyed lag shuffle and the
    matrix aggregate — is the same one-shuffle shape as the
    transitions query. The oracle unrolls the same iterations as a
    CTE chain.
    """
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    cells = (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    rows = cells.collect()  # bounded: |states|^2 cells
    from collections import defaultdict

    tot = defaultdict(int)
    for r in rows:
        tot[r.prev_type] += r.n
    states = sorted(
        set(tot) | {r.next_type for r in rows}
    )
    p_ppm = {
        (r.prev_type, r.next_type): r.n * 1_000_000 // tot[r.prev_type]
        for r in rows
    }
    k = len(states)
    pi = {st: 1_000_000 // k for st in states}
    pi0 = dict(pi)
    for _ in range(MARKOV_POWER_ITERS):
        pi = {
            j: sum(
                pi[i] * p_ppm.get((i, j), 0) for i in states
            )
            // 1_000_000
            for j in states
        }
    out = [
        (st, pi0[st], pi[st], tot.get(st, 0)) for st in states
    ]
    return spark.createDataFrame(
        out,
        "event_type string, pi0_ppm bigint, stationary_ppm bigint,"
        " n_out_transitions bigint",
    ).orderBy("event_type")


QUERIES["events_markov_stationary"] = events_markov_stationary


def _markov_stationary_oracle() -> str:
    steps = []
    for t in range(1, MARKOV_POWER_ITERS + 1):
        steps.append(f"""
        pi{t} AS (
            SELECT p.next_type AS state,
                   CAST(SUM(pi.v * p.ppm) // 1000000 AS BIGINT) AS v
            FROM pi{t - 1} pi
            JOIN pmat p ON p.prev_type = pi.state
            GROUP BY p.next_type)""")
    k = MARKOV_POWER_ITERS
    return (
        """
        WITH lagged AS (
            SELECT user_id,
                   LAG(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)
                       AS prev_type,
                   event_type AS next_type
            FROM events),
        cells AS (
            SELECT prev_type, next_type,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM lagged WHERE prev_type IS NOT NULL
            GROUP BY 1, 2),
        tot AS (
            SELECT prev_type, CAST(SUM(n) AS BIGINT) AS n_from
            FROM cells GROUP BY 1),
        pmat AS (
            SELECT c.prev_type, c.next_type,
                   c.n * 1000000 // t.n_from AS ppm
            FROM cells c JOIN tot t USING (prev_type)),
        states AS (
            SELECT DISTINCT state FROM (
                SELECT prev_type AS state FROM cells
                UNION
                SELECT next_type FROM cells)),
        ks AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM states),
        pi0 AS (
            SELECT state, CAST(1000000 // k AS BIGINT) AS v
            FROM states, ks),"""
        + ",".join(steps)
        + f"""
        SELECT s.state AS event_type,
               p0.v AS pi0_ppm,
               COALESCE(pn.v, 0) AS stationary_ppm,
               COALESCE(t.n_from, 0) AS n_out_transitions
        FROM states s
        JOIN pi0 p0 USING (state)
        LEFT JOIN pi{k} pn USING (state)
        LEFT JOIN tot t ON t.prev_type = s.state
        ORDER BY event_type
    """
    )


ORACLES["events_markov_stationary"] = _markov_stationary_oracle()
