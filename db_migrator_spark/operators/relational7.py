"""Round-6 API-surface completion: cogrouped applyInPandas and SQL
LATERAL correlated subqueries.

Closes the last two §2.8/§2.9 surface gaps: every other Python-UDF
entry point (pandas_udf, applyInPandas, mapInPandas,
applyInPandasWithState, UDTF, Python DataSource) already has a declared,
oracle-checked query; ``DataFrame.groupBy().cogroup().applyInPandas``
and the SQL ``LATERAL`` correlated-subquery join did not. (The reference
has neither — its data path is a 1:1 copy, cited:
/root/reference/src/migrate/table_migrator.rs:43-114.)

Scale notes (100 TB): cogroup shuffles BOTH inputs once on the group
key and streams each key's two Arrow batches into Python — group size
bounds peak memory (orders: ≤7 lines/order), and the per-key work is
embarrassingly parallel. The LATERAL top-n decorrelates to the same
ranked-window plan as ``q_topk_orders_per_customer`` — asserted in
tests: declaring it LATERAL must not buy a nested-loop.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table

LATERAL_TOP_N = 3
COGROUP_BUCKETS = 64


def q_cogroup_order_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order reconciliation via cogrouped applyInPandas: lineitem
    groups meet their orders group in one Python function that emits the
    line count, exact integer quantity total, and the max extended
    price — including orders with NO lines (right-group-only keys), the
    case a plain inner-join aggregate would drop.

    Determinism: quantities are integral-valued doubles; the pandas side
    casts to int64 before summing (exact, order-free), and max is
    order-free. The oracle is the equivalent outer-join aggregate.

    The cogroup key is a BUCKET of orders (``o_orderkey % N``), not the
    order itself: cogroup costs one Python round-trip PER KEY, and
    per-order keys were measured at 86s for 15k orders at sf0.01 —
    per-call overhead, not compute. Bucketed, each call reconciles
    thousands of orders with vectorized pandas groupby (0.9s, ~100x).
    Same co-partitioning guarantee — every order's lines land in its
    bucket — and the right granularity at 100 TB, where the bucket count
    scales with the cluster, not the row count.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    lb = li.withColumn("bucket", F.col("l_orderkey") % COGROUP_BUCKETS)
    ob = orders.withColumn("bucket", F.col("o_orderkey") % COGROUP_BUCKETS)

    def reconcile(lines: pd.DataFrame, order: pd.DataFrame) -> pd.DataFrame:
        agg = (
            lines.assign(q=lines["l_quantity"].astype("int64"))
            .groupby("l_orderkey")
            .agg(
                n_lines=("q", "size"),
                sum_qty=("q", "sum"),
                max_price=("l_extendedprice", "max"),
            )
            .reset_index()
            .rename(columns={"l_orderkey": "o_orderkey"})
        )
        out = order[["o_orderkey", "o_totalprice"]].merge(
            agg, on="o_orderkey", how="outer"
        )
        out["n_lines"] = out["n_lines"].fillna(0).astype("int64")
        out["sum_qty"] = out["sum_qty"].fillna(0).astype("int64")
        return out

    out = (
        lb.groupBy("bucket")
        .cogroup(ob.groupBy("bucket"))
        .applyInPandas(
            reconcile,
            schema="o_orderkey long, o_totalprice double, n_lines long, "
            "sum_qty long, max_price double",
        )
    )
    return out.orderBy("o_orderkey")


def q_lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N orders per customer expressed as a SQL LATERAL correlated
    subquery — the declarative twin of ``q_topk_orders_per_customer``.
    Catalyst decorrelates the per-row subquery into a ranked window over
    a single shuffle; the LATERAL syntax must never cost a per-customer
    nested-loop re-scan of orders."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        f"""
        SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
        FROM v_customer c,
        LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM v_orders
            WHERE o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT {LATERAL_TOP_N}
        ) t
        ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey
        """
    )


QUERIES = {
    "q_cogroup_order_reconcile": q_cogroup_order_reconcile,
    "q_lateral_top_orders": q_lateral_top_orders,
}

ORACLES = {
    "q_cogroup_order_reconcile": """
        SELECT o.o_orderkey, o.o_totalprice,
               COUNT(l.l_orderkey) AS n_lines,
               COALESCE(CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT), 0)
                   AS sum_qty,
               MAX(l.l_extendedprice) AS max_price
        FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderkey, o.o_totalprice
        ORDER BY o.o_orderkey
    """,
    "q_lateral_top_orders": f"""
        SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
        FROM customer c,
        LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM orders
            WHERE o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT {LATERAL_TOP_N}
        ) t
        ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey
    """,
}


def q_sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 4 SQL PIPE syntax surface (|>): a multi-stage
    filter -> aggregate -> derive -> order pipeline written as the
    linear dataflow it is. Same Catalyst plan as the nested-SELECT
    equivalent — the oracle IS that equivalent in ANSI form, so this
    pins that the pipe surface parses AND optimizes identically
    (pushdown/pruning included). Decimal-contract money arithmetic.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "pipe_orders"
    )
    return spark.sql(
        """
        FROM pipe_orders
        |> WHERE o_orderdate >= DATE '1995-01-01'
        |> AGGREGATE COUNT(*) AS n,
                     SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS cents
           GROUP BY o_orderpriority
        |> EXTEND CAST(cents div n AS BIGINT) AS mean_cents
        |> WHERE n >= 10
        |> ORDER BY o_orderpriority
        """
    )


QUERIES["q_sql_pipe_syntax"] = q_sql_pipe_syntax

ORACLES["q_sql_pipe_syntax"] = """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) // COUNT(*)
                AS BIGINT) AS mean_cents
    FROM orders
    WHERE o_orderdate >= DATE '1995-01-01'
    GROUP BY o_orderpriority
    HAVING COUNT(*) >= 10
    ORDER BY o_orderpriority
"""


def q_transpose_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark-4 ``DataFrame.transpose`` surface: a per-priority
    metrics table flipped so METRICS become rows and priorities become
    columns — the report-orientation pivot analysts ask for last.
    Transpose keys on the first column; the metric values share one
    BIGINT type (cents / counts — the decimal money contract keeps
    them integral). The oracle rebuilds the transposed shape with
    literal conditional aggregates, pinning both the values and the
    column-naming behavior.

    Scale note: transpose is driver-bounded by design — it runs on the
    GROUPS-sized aggregate (5 rows), never on data-sized input.
    """
    orders = load_table(spark, sf_dir, "orders")
    metrics = (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("sum_cents"),
            F.count_distinct("o_custkey").cast("bigint").alias(
                "n_customers"
            ),
        )
        .orderBy("o_orderpriority")
    )
    return metrics.transpose().orderBy("key")


QUERIES["q_transpose_metrics"] = q_transpose_metrics

ORACLES["q_transpose_metrics"] = """
    WITH m AS (
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS sum_cents,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
        FROM orders GROUP BY o_orderpriority)
    SELECT k AS key,
           MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN v END)
               AS "1-URGENT",
           MAX(CASE WHEN o_orderpriority = '2-HIGH' THEN v END)
               AS "2-HIGH",
           MAX(CASE WHEN o_orderpriority = '3-MEDIUM' THEN v END)
               AS "3-MEDIUM",
           MAX(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN v END)
               AS "4-NOT SPECIFIED",
           MAX(CASE WHEN o_orderpriority = '5-LOW' THEN v END)
               AS "5-LOW"
    FROM (
        SELECT o_orderpriority, 'n_orders' AS k, n_orders AS v FROM m
        UNION ALL
        SELECT o_orderpriority, 'sum_cents', sum_cents FROM m
        UNION ALL
        SELECT o_orderpriority, 'n_customers', n_customers FROM m)
    GROUP BY k
    ORDER BY key
"""


def q_sql_udf_tiering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar UDFs (Spark 4's CREATE FUNCTION ... RETURN):
    a money-to-cents function and a balance-tier classifier, composed
    in a query — the catalog-function surface that lets analysts share
    logic WITHOUT Python UDF serialization (the body inlines into the
    plan, so whole-stage codegen keeps running; no row-at-a-time
    interpreter anywhere). The oracle re-expresses the bodies inline,
    pinning that the function surface is pure sugar over the same
    expressions.
    """
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION mig_cents(x DOUBLE)"
        " RETURNS BIGINT RETURN CAST(FLOOR(x * 100) AS BIGINT)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION mig_tier(b BIGINT)"
        " RETURNS STRING RETURN CASE WHEN b >= 500000 THEN 'high'"
        " WHEN b >= 0 THEN 'mid' ELSE 'low' END"
    )
    import uuid

    view = f"__sqludf_cust_{uuid.uuid4().hex[:8]}"
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT mig_tier(mig_cents(c_acctbal)) AS tier,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(mig_cents(c_acctbal)) AS BIGINT) AS total_cents
        FROM {view}
        GROUP BY mig_tier(mig_cents(c_acctbal))
        ORDER BY tier
        """
    )


QUERIES["q_sql_udf_tiering"] = q_sql_udf_tiering

ORACLES["q_sql_udf_tiering"] = """
    WITH cents AS (
        SELECT CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS b
        FROM customer),
    tiered AS (
        SELECT CASE WHEN b >= 500000 THEN 'high'
                    WHEN b >= 0 THEN 'mid' ELSE 'low' END AS tier, b
        FROM cents)
    SELECT tier, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(b) AS BIGINT) AS total_cents
    FROM tiered
    GROUP BY tier
    ORDER BY tier
"""


def q_sql_table_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined TABLE function (CREATE FUNCTION ... RETURNS TABLE),
    applied LATERALLY: a calendar-decomposition function expanded per
    order row, feeding a quarterly revenue rollup — the declarative
    (and codegen-preserving) alternative to a Python UDTF for
    row-expanding logic. The oracle inlines the function body, pinning
    the lateral-apply semantics.
    """
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION mig_date_parts(d DATE)"
        " RETURNS TABLE(y INT, q INT)"
        " RETURN SELECT year(d), quarter(d)"
    )
    import uuid

    view = f"__sqltf_orders_{uuid.uuid4().hex[:8]}"
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT p.y, p.q,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(FLOOR(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM {view} o,
             LATERAL mig_date_parts(CAST(o.o_orderdate AS DATE)) p
        GROUP BY p.y, p.q
        ORDER BY p.y, p.q
        """
    )


QUERIES["q_sql_table_function"] = q_sql_table_function

ORACLES["q_sql_table_function"] = """
    SELECT CAST(EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS INTEGER)
               AS y,
           CAST(EXTRACT(quarter FROM CAST(o_orderdate AS DATE))
                AS INTEGER) AS q,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
    FROM orders
    GROUP BY 1, 2
    ORDER BY y, q
"""


def q_schema_evolution_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution append: two "versions" of the orders feed —
    v1 lacks o_clerk-era columns (priority), v2 lacks the legacy
    status — merged with ``unionByName(allowMissingColumns=True)``,
    the engine's answer to a source system adding/dropping columns
    mid-migration. Missing columns null-fill per version; the rollup
    counts per version and per present-column so the evolution is
    auditable. The oracle rebuilds the union with explicit NULL
    projections — pinning that allowMissingColumns is pure sugar.
    """
    orders = load_table(spark, sf_dir, "orders")
    v1 = orders.filter("o_orderkey % 2 = 0").select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)").alias(
            "cents"
        ),
        F.lit("v1").alias("src_version"),
    )
    v2 = orders.filter("o_orderkey % 2 = 1").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
        F.expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)").alias(
            "cents"
        ),
        F.lit("v2").alias("src_version"),
    )
    merged = v1.unionByName(v2, allowMissingColumns=True)
    return (
        merged.groupBy("src_version")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.count("status").cast("bigint").alias("n_status"),
            F.count("priority").cast("bigint").alias("n_priority"),
            F.sum("cents").cast("bigint").alias("cents"),
        )
        .orderBy("src_version")
    )


QUERIES["q_schema_evolution_union"] = q_schema_evolution_union

ORACLES["q_schema_evolution_union"] = """
    WITH v1 AS (
        SELECT o_orderkey, o_orderstatus AS status,
               CAST(NULL AS VARCHAR) AS priority,
               CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents,
               'v1' AS src_version
        FROM orders WHERE o_orderkey % 2 = 0),
    v2 AS (
        SELECT o_orderkey, CAST(NULL AS VARCHAR) AS status,
               o_orderpriority AS priority,
               CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents,
               'v2' AS src_version
        FROM orders WHERE o_orderkey % 2 = 1),
    merged AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
    SELECT src_version,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(status) AS BIGINT) AS n_status,
           CAST(COUNT(priority) AS BIGINT) AS n_priority,
           CAST(SUM(cents) AS BIGINT) AS cents
    FROM merged
    GROUP BY src_version
    ORDER BY src_version
"""
