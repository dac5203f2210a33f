"""Scalar-function surface, round 5: higher-order array lambdas and
datetime arithmetic.

Extends the function-library coverage of ``q_scalar_functions`` /
``q_string_functions2`` (strings, basic date parts, null handling) with
the two families a SQL user reaches for next:

- ``q_array_functions``: per-order quantity arrays exercised through
  the lambda suite — filter / exists / forall / aggregate (fold) /
  sort_array / slice / array_position / array_min / array_max. These
  are the JVM-side (no Python) building blocks every array-typed
  column pipeline composes; each has an exact DuckDB list-function
  twin, with the engine quirks pinned in the oracle (list_position
  returns NULL where Spark returns 0; list_sum of INTs widens to
  HUGEINT and is cast back).
- ``q_datetime_functions``: trunc-to-month, last_day, add_months,
  date_add, date subtraction, quarter / day-of-week / day-of-year /
  ISO week, and strftime-style formatting. Day-of-week is pinned to
  Spark's 1=Sunday convention (DuckDB's dayofweek is 0=Sunday — the
  oracle adds 1).

Scale notes: both suites are pure column expressions fused into the
scan (zero shuffles beyond the array-building groupBy, which is one
hash aggregation on the join key). Arrays are surfaced as joined
strings because the driver canonicalizer cannot hash array cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import fan_out, load_table


def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_quantity").cast("int").alias("q")
    )
    arr = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list("q")).alias("qs")
    )
    return (
        arr.filter(F.size("qs") >= 4)
        .select(
            "l_orderkey",
            F.array_join(F.col("qs").cast("array<string>"), ",").alias("qtys"),
            F.size(F.filter("qs", lambda x: x > 25)).alias("n_big"),
            F.exists("qs", lambda x: x == 40).alias("has_40"),
            F.forall("qs", lambda x: x < 50).alias("all_under_50"),
            F.aggregate("qs", F.lit(0).cast("bigint"), lambda a, x: a + x).alias(
                "total_qty"
            ),
            F.array_max("qs").alias("max_q"),
            F.array_min("qs").alias("min_q"),
            F.array_join(F.slice("qs", 1, 3).cast("array<string>"), ",").alias(
                "first3"
            ),
            F.array_position("qs", 30).cast("bigint").alias("pos_30"),
        )
        .orderBy("l_orderkey")
    )


def q_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return (
        orders.select(
            "o_orderkey",
            d.alias("d"),
            F.trunc(d, "mm").alias("month_start"),
            F.last_day(d).alias("month_end"),
            F.add_months(d, 3).alias("plus_3m"),
            F.date_add(d, 30).alias("plus_30d"),
            F.datediff(F.lit("1996-01-01").cast("date"), d).alias("days_to_1996"),
            F.quarter(d).alias("qtr"),
            F.dayofweek(d).alias("dow"),
            F.dayofyear(d).alias("doy"),
            F.weekofyear(d).alias("iso_week"),
            F.date_format(d, "yyyy-MM").alias("ym"),
        )
        .orderBy("o_orderkey")
    )


def q_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column family: per-customer status→count maps built with
    map_from_entries, then interrogated via map_keys / map_values /
    map_entries / element_at / size / aggregate-over-values. Maps are
    surfaced as sorted joined strings (the canonicalizer cannot hash map
    cells; DuckDB's map type would not stringify identically anyway) —
    the oracle rebuilds the same strings from the grouped entries.
    """
    orders = load_table(spark, sf_dir, "orders")
    per = orders.groupBy("o_custkey", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("v")
    )
    m = per.groupBy("o_custkey").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("o_orderstatus", "v")))
        ).alias("m")
    )
    entry_strs = F.transform(
        F.map_entries("m"),
        lambda e: F.concat_ws(":", e["key"], e["value"].cast("string")),
    )
    return (
        m.select(
            "o_custkey",
            F.array_join(F.sort_array(F.map_keys("m")), ",").alias("statuses"),
            F.size("m").alias("n_statuses"),
            F.coalesce(F.element_at("m", "O"), F.lit(0).cast("bigint")).alias(
                "n_open"
            ),
            F.aggregate(
                F.map_values("m"), F.lit(0).cast("bigint"), lambda a, x: a + x
            ).alias("n_orders"),
            F.array_join(F.sort_array(entry_strs), ",").alias("entries"),
        )
        .orderBy("o_custkey")
    )


def q_regex_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex family over part names: extract / global replace / match
    count / boolean match — portable regex subset (character classes,
    anchors) so Java and RE2-style engines agree."""
    parts = load_table(spark, sf_dir, "part")
    name = F.col("p_name")
    return (
        parts.select(
            "p_partkey",
            F.regexp_extract(name, r"^(\w+)", 1).alias("first_word"),
            F.regexp_extract(name, r"([^ ]+)$", 1).alias("last_word"),
            F.regexp_replace(name, r"[aeiou]", "*").alias("devoweled"),
            F.regexp_count(name, F.lit(r"[aeiou]")).alias("n_vowels"),
            name.rlike(r"^[a-z]+ w.dget$").alias("is_widgetish"),
        )
        .orderBy("p_partkey")
    )


def q_null_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling family: nullif-manufactured nulls pushed through
    coalesce / nvl2-style branches / least-greatest null semantics /
    null-safe equality — the conditional kernel of every cleansing job."""
    orders = load_table(spark, sf_dir, "orders")
    # manufacture nulls deterministically: status 'O' -> null priority
    p = F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT"))
    tp = F.nullif(F.col("o_totalprice"), F.col("o_totalprice"))  # always null
    return (
        orders.select(
            "o_orderkey",
            F.coalesce(p, F.lit("(none)")).alias("prio_or_default"),
            F.when(p.isNull(), "missing").otherwise("present").alias("nvl2_style"),
            F.coalesce(tp, F.col("o_totalprice"), F.lit(0.0)).alias("price_chain"),
            F.least(p, F.col("o_orderstatus")).alias("least_nullsafe"),
            F.greatest(p, F.col("o_orderstatus")).alias("greatest_nullsafe"),
            p.eqNullSafe(F.lit("5-LOW")).alias("is_low_nullsafe"),
            p.isNull().alias("prio_null"),
        )
        .orderBy("o_orderkey")
    )


def q_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE traversal (Spark 4 WITH RECURSIVE): walk a
    deterministic part hierarchy (parent = key DIV 7, rooted at 0) to
    the root, returning each node's depth and ancestor-key sum.

    The hierarchy is derived arithmetically from fixture keys — the
    recursion, not the edge list, is what's under test. Iterations are
    logarithmic in max key (~6 here); each step is one self-join the
    engine unions into the working set — the same ladder the iterative
    DataFrame loop in dedup_clusters builds by hand, now expressed
    declaratively. All-integer math, so the DuckDB twin hash-matches.
    """
    import uuid

    view = f"__rec_part_{uuid.uuid4().hex[:8]}"
    load_table(spark, sf_dir, "part").select("p_partkey").createOrReplaceTempView(view)
    return spark.sql(
        f"""
        WITH RECURSIVE anc AS (
            SELECT p_partkey AS node, p_partkey AS cur, 0 AS depth FROM {view}
            UNION ALL
            SELECT node, cur DIV 7, depth + 1 FROM anc WHERE cur > 0
        )
        SELECT node,
               CAST(MAX(depth) AS INT) AS depth_to_root,
               CAST(SUM(cur) AS BIGINT) AS ancestor_key_sum
        FROM anc
        GROUP BY node
        ORDER BY node
        """
    )


def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access via the VARIANT type (Spark 4): parse the
    events JSON props once into a variant column, then typed-path
    extraction with variant_get — the open-schema ingestion shape (no
    schema declared up front, binary-encoded storage, typed reads).
    Extracted values are cast to concrete types so the DuckDB
    json_extract twin compares exactly; the VARIANT encoding itself is
    engine-internal and never surfaced.
    """
    # fan_out: parse_json + four variant extractions per row fuse into
    # the events scan (3 splits at sf1 — measured r15); spread first.
    ev = fan_out(load_table(spark, sf_dir, "events"), "event_id")
    v = F.parse_json(F.col("props"))
    return (
        ev.select(
            "event_id",
            F.variant_get(v, "$.k", "bigint").alias("k_val"),
            F.variant_get(v, "$.missing", "string").alias("missing_val"),
            F.is_variant_null(F.try_parse_json(F.lit("null"))).alias("null_probe"),
            F.try_variant_get(v, "$.k", "date").alias("try_wrong_type"),
        )
        .orderBy("event_id")
    )


QUERIES = {
    "q_variant_json": q_variant_json,
    "q_recursive_hierarchy": q_recursive_hierarchy,
    "q_array_functions": q_array_functions,
    "q_datetime_functions": q_datetime_functions,
    "q_map_functions": q_map_functions,
    "q_regex_functions": q_regex_functions,
    "q_null_functions": q_null_functions,
}

ORACLES = {
    "q_array_functions": """
        WITH a AS (SELECT l_orderkey,
                          list_sort(list(CAST(l_quantity AS INT))) AS qs
                   FROM lineitem GROUP BY l_orderkey)
        SELECT l_orderkey,
               array_to_string(qs, ',') AS qtys,
               CAST(len(list_filter(qs, x -> x > 25)) AS INT) AS n_big,
               len(list_filter(qs, x -> x = 40)) > 0 AS has_40,
               len(list_filter(qs, x -> NOT (x < 50))) = 0 AS all_under_50,
               CAST(list_sum(qs) AS BIGINT) AS total_qty,
               list_max(qs) AS max_q,
               list_min(qs) AS min_q,
               array_to_string(qs[1:3], ',') AS first3,
               CAST(COALESCE(list_position(qs, 30), 0) AS BIGINT) AS pos_30
        FROM a
        WHERE len(qs) >= 4
        ORDER BY l_orderkey
    """,
    "q_map_functions": """
        WITH per AS (SELECT o_custkey, o_orderstatus AS k, COUNT(*) AS v
                     FROM orders GROUP BY o_custkey, o_orderstatus)
        SELECT o_custkey,
               array_to_string(list_sort(list(k)), ',') AS statuses,
               CAST(COUNT(*) AS INT) AS n_statuses,
               CAST(COALESCE(MAX(CASE WHEN k = 'O' THEN v END), 0) AS BIGINT)
                   AS n_open,
               CAST(SUM(v) AS BIGINT) AS n_orders,
               array_to_string(list_sort(list(k || ':' || CAST(v AS VARCHAR))), ',')
                   AS entries
        FROM per
        GROUP BY o_custkey
        ORDER BY o_custkey
    """,
    "q_variant_json": """
        SELECT event_id,
               CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
               json_extract_string(props, '$.missing') AS missing_val,
               TRUE AS null_probe,
               CAST(NULL AS DATE) AS try_wrong_type
        FROM events
        ORDER BY event_id
    """,
    "q_recursive_hierarchy": """
        WITH RECURSIVE anc AS (
            SELECT p_partkey AS node, p_partkey AS cur, 0 AS depth FROM part
            UNION ALL
            SELECT node, cur // 7, depth + 1 FROM anc WHERE cur > 0
        )
        SELECT node,
               CAST(MAX(depth) AS INT) AS depth_to_root,
               CAST(SUM(cur) AS BIGINT) AS ancestor_key_sum
        FROM anc
        GROUP BY node
        ORDER BY node
    """,
    "q_regex_functions": """
        SELECT p_partkey,
               regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
               regexp_extract(p_name, '([^ ]+)$', 1) AS last_word,
               regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled,
               CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS INT) AS n_vowels,
               regexp_matches(p_name, '^[a-z]+ w.dget$') AS is_widgetish
        FROM part
        ORDER BY p_partkey
    """,
    "q_null_functions": """
        WITH s AS (SELECT o_orderkey, o_totalprice, o_orderstatus,
                          nullif(o_orderpriority, '1-URGENT') AS p,
                          nullif(o_totalprice, o_totalprice) AS tp
                   FROM orders)
        SELECT o_orderkey,
               coalesce(p, '(none)') AS prio_or_default,
               CASE WHEN p IS NULL THEN 'missing' ELSE 'present' END AS nvl2_style,
               coalesce(tp, o_totalprice, 0.0) AS price_chain,
               least(p, o_orderstatus) AS least_nullsafe,
               greatest(p, o_orderstatus) AS greatest_nullsafe,
               p IS NOT DISTINCT FROM '5-LOW' AS is_low_nullsafe,
               p IS NULL AS prio_null
        FROM s
        ORDER BY o_orderkey
    """,
    "q_datetime_functions": """
        SELECT o_orderkey,
               CAST(o_orderdate AS DATE) AS d,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
               last_day(CAST(o_orderdate AS DATE)) AS month_end,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus_3m,
               CAST(o_orderdate AS DATE) + 30 AS plus_30d,
               CAST(DATE '1996-01-01' - CAST(o_orderdate AS DATE) AS INT)
                   AS days_to_1996,
               CAST(quarter(o_orderdate) AS INT) AS qtr,
               CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS INT) AS dow,
               CAST(dayofyear(o_orderdate) AS INT) AS doy,
               CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
               strftime(o_orderdate, '%Y-%m') AS ym
        FROM orders
        ORDER BY o_orderkey
    """,
}
