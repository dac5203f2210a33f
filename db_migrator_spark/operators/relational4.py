"""TPC-H-analog coverage extensions (SURVEY.md §2.9 relational surface):
order-priority EXISTS counts (Q4), returned-item customer revenue (Q10),
promo revenue share (Q14), top-revenue supplier (Q15), OR-of-ANDs band
filters (Q19), idle high-balance customers (Q22), customer order-count
distribution (Q13).

Adapted to the fixture schema (no partsupp / commitdate / shipmode
columns). All money aggregates follow the decimal-domain discipline from
``relational.py`` (exact decimal accumulation, double surface cast) so the
DuckDB oracles hash-match at any row count.

Scale notes: every query is shuffle-keyed on its natural join/group keys;
dimension sides broadcast; the two "global scalar" queries (Q15's max
revenue, Q22's average balance) attach the scalar via a broadcast
cross-join of a 1-row aggregate — never a single-partition window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table
from .relational import _davg, _dsum, _revenue_dec

# the exact-decimal revenue SQL twin (matches _revenue_dec operand types)
_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(6,4)))"
)


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 analog: per-priority count of 1995-Q1 orders having at least one
    line item shipped after the order date (EXISTS -> left-semi join)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1995-04-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 analog: top-20 customers by revenue lost to returned items
    (l_returnflag = 'R'), with nation attached. Revenue shuffles on
    custkey; nation broadcasts; top-20 via TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_revenue_dec()).cast("decimal(38,6)").cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 analog: share of one month's revenue from PROMO parts. Both
    sums accumulate in exact decimal; the final share divides the two
    DOUBLE surfaces (IEEE-identical cross-engine)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-03-01") & (F.col("l_shipdate") < "1995-04-01")
    )
    part = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    promo = F.when(F.col("p_type").startswith("PROMO"), _revenue_dec()).otherwise(
        F.expr("CAST(0 AS DECIMAL(1,0))")
    )
    return joined.agg(
        (
            F.lit(100.0)
            * F.sum(promo).cast("decimal(38,6)").cast("double")
            / F.sum(_revenue_dec()).cast("decimal(38,6)").cast("double")
        ).alias("promo_revenue_pct")
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 analog: the supplier(s) with maximum quarterly revenue. The max
    is a 1-row aggregate broadcast back onto the per-supplier revenues —
    the scale-safe form of ``WHERE total = (SELECT MAX(...))``."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1995-04-01")
    )
    supplier = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(_revenue_dec()).cast("decimal(38,6)").cast("double").alias("total_revenue")
    )
    top = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.join(F.broadcast(top), rev.total_revenue == top.max_revenue)
        .join(F.broadcast(supplier), rev.l_suppkey == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def q19_band_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 analog: revenue from an OR of three (brand, size-band,
    quantity-band) conjunctions. One broadcast join; the disjunction is a
    single codegen'd predicate evaluated at the join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(band).agg(
        F.sum(_revenue_dec()).cast("decimal(38,6)").cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 analog: per-nation count + total balance of customers whose
    balance exceeds the global average positive balance AND who placed no
    orders from 1998 on (lapsed customers). Global average: broadcast
    1-row aggregate; "no recent orders": left-anti join on the
    date-filtered orders (filter pushed to the scan)."""
    cust = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "1998-01-01")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        _davg("c_acctbal").alias("avg_bal")
    )
    rich = cust.crossJoin(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("avg_bal"))
    idle = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return (
        idle.groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_custs"), _dsum("c_acctbal").alias("total_bal"))
        .orderBy("c_nationkey")
    )


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 analog: shipping volume between two nations by year, both
    directions. Supplier and customer nations attach via broadcast dims;
    the fact joins shuffle on their natural keys."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = F.broadcast(
        nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    )
    n2 = F.broadcast(
        nation.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    )
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(n1, supp.s_nationkey == F.col("s_nk"))
        .join(n2, cust.c_nationkey == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        j.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_revenue_dec()).cast("decimal(38,6)").cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 analog: weekly-equivalent revenue from orders of less than half
    a part's average quantity. The per-part average is a groupBy rejoined
    on partkey (the scalable form of the correlated scalar subquery)."""
    li = load_table(spark, sf_dir, "lineitem")
    avg_qty = li.groupBy(F.col("l_partkey").alias("p_key")).agg(
        _davg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(avg_qty, li.l_partkey == avg_qty.p_key)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(25,6)")).cast("double")
                / F.lit(7.0)
            ).alias("avg_weekly_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 analog: customers whose single orders total > 300 units
    (HAVING over a per-order sum, rejoined to orders + customer)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(_dsum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "total_qty")
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 analog: NATION_1's share of ECONOMY-part revenue sold to ASIA
    customers, by order year (conditional-sum ratio of two exact-decimal
    revenue aggregates).

    Plan shape: the selective dims reduce FIRST — part filtered to one
    type and nation->region filtered to one region both broadcast; the
    only big shuffles are lineitem->orders (orderkey) and orders->customer
    (custkey). Supplier nation attaches via broadcast. The year groupBy
    then carries one decimal pair per (year, partition) thanks to map-side
    partial aggregation.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    asia_nations = (
        nation.join(region, nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .select("n_nationkey")
    )
    asia_cust = cust.join(
        F.broadcast(asia_nations), cust.c_nationkey == asia_nations.n_nationkey, "left_semi"
    ).select("c_custkey")
    econ_parts = (
        load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    )
    supp_nation = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).select(F.col("s_suppkey"), F.col("n_name").alias("supp_nation"))

    j = (
        li.join(F.broadcast(econ_parts), li.l_partkey == econ_parts.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(asia_cust, orders.o_custkey == asia_cust.c_custkey, "left_semi")
        .join(F.broadcast(supp_nation), li.l_suppkey == supp_nation.s_suppkey)
    )
    nation_rev = F.when(F.col("supp_nation") == "NATION_1", _revenue_dec()).otherwise(
        F.expr("CAST(0 AS DECIMAL(1,0))")
    )
    return (
        j.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(nation_rev).cast("decimal(38,6)").cast("double")
                / F.sum(_revenue_dec()).cast("decimal(38,6)").cast("double")
            ).alias("mkt_share"),
            F.sum(_revenue_dec()).cast("decimal(38,6)").cast("double").alias("total_revenue"),
        )
        .orderBy("o_year")
    )


# Q9's cost side: the fixture has no partsupp/ps_supplycost, so cost is
# modeled as 60% of the part's retail price per unit. All operands stay in
# tight decimal types (see _revenue_dec rationale) so the per-row profit is
# an exact rational in both engines.
_COST_SQL = (
    "CAST(0.6 AS DECIMAL(2,1)) * CAST(p_retailprice AS DECIMAL(12,2))"
    " * CAST(l_quantity AS DECIMAL(9,2))"
)


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 analog: profit on 'red' parts by supplier nation and order year,
    profit = revenue - modeled supply cost (see _COST_SQL note).

    Plan shape: part pre-filtered on the name predicate and broadcast
    (prunes most lineitem rows at the first join); supplier+nation
    broadcast; the one big shuffle is lineitem->orders for the year.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    red_parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("red"))
        .select("p_partkey", "p_retailprice")
    )
    supp_nation = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).select(F.col("s_suppkey"), F.col("n_name").alias("nation"))
    cost = (
        F.expr("CAST(0.6 AS DECIMAL(2,1))")
        * F.col("p_retailprice").cast("decimal(12,2)")
        * F.col("l_quantity").cast("decimal(9,2)")
    )
    return (
        li.join(F.broadcast(red_parts), li.l_partkey == red_parts.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp_nation), li.l_suppkey == supp_nation.s_suppkey)
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(_revenue_dec() - cost).cast("decimal(38,6)").cast("double").alias("profit"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("nation", "o_year")
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 analog: distribution of per-customer order counts, including
    zero-order customers (fixture lacks o_comment, so the exclusion filter
    drops '5-LOW' priority orders instead of the comment LIKE).

    Plan shape: aggregate orders per custkey FIRST (map-side partial
    combine shrinks the fact ~10:1 before any join), then left-join the
    counts onto customer and re-aggregate by count value. The alternative
    join-then-count shuffles every order row keyed by custkey — strictly
    more data through the exchange for the same answer.
    """
    cust = load_table(spark, sf_dir, "customer")
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "5-LOW")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce(F.col("n"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


QUERIES = {
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q4_order_priority": q4_order_priority,
    "q13_customer_distribution": q13_customer_distribution,
    "q7_nation_volume": q7_nation_volume,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q18_large_volume_customers": q18_large_volume_customers,
    "q10_returned_items": q10_returned_items,
    "q14_promo_revenue": q14_promo_revenue,
    "q15_top_supplier": q15_top_supplier,
    "q19_band_filters": q19_band_filters,
    "q22_idle_customers": q22_idle_customers,
}

ORACLES = {
    "q8_market_share": f"""
        SELECT year(o_orderdate) AS o_year,
               CAST(CAST(SUM(CASE WHEN n1.n_name = 'NATION_1' THEN {_REV_SQL}
                                  ELSE CAST(0 AS DECIMAL(1,0)) END)
                    AS DECIMAL(38,6)) AS DOUBLE)
                 / CAST(CAST(SUM({_REV_SQL}) AS DECIMAL(38,6)) AS DOUBLE) AS mkt_share,
               CAST(CAST(SUM({_REV_SQL}) AS DECIMAL(38,6)) AS DOUBLE) AS total_revenue
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        WHERE p_type = 'ECONOMY'
          AND EXISTS (SELECT 1 FROM customer
                      JOIN nation n2 ON c_nationkey = n2.n_nationkey
                      JOIN region ON n2.n_regionkey = r_regionkey
                      WHERE c_custkey = o_custkey AND r_name = 'ASIA')
        GROUP BY o_year
        ORDER BY o_year
    """,
    "q9_product_profit": f"""
        SELECT n_name AS nation, year(o_orderdate) AS o_year,
               CAST(CAST(SUM({_REV_SQL} - {_COST_SQL}) AS DECIMAL(38,6)) AS DOUBLE)
                   AS profit,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    "q13_customer_distribution": """
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c_custkey, COALESCE(n, 0) AS c_count
            FROM customer
            LEFT JOIN (
                SELECT o_custkey, COUNT(*) AS n
                FROM orders
                WHERE o_orderpriority <> '5-LOW'
                GROUP BY o_custkey) o
            ON c_custkey = o_custkey)
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    "q7_nation_volume": f"""
        SELECT supp_nation, cust_nation, l_year,
               CAST(CAST(SUM(rev) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   year(l_shipdate) AS l_year, {_REV_SQL} AS rev
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
               OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    "q17_small_quantity_revenue": """
        WITH avg_qty AS (
            SELECT l_partkey AS p_key,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS aq
            FROM lineitem GROUP BY l_partkey)
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) / 7.0
                   AS avg_weekly_revenue,
               COUNT(*) AS n_items
        FROM lineitem JOIN avg_qty ON l_partkey = p_key
        WHERE l_quantity < 0.5 * aq
    """,
    "q18_large_volume_customers": """
        WITH big AS (
            SELECT l_orderkey,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS total_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) > 300)
        SELECT c_custkey, c_name, o_orderkey, o_orderdate, total_qty
        FROM big
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY total_qty DESC, o_orderkey
    """,
    "q4_order_priority": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-04-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "q10_returned_items": f"""
        SELECT c_custkey, c_name, n_name,
               CAST(CAST(SUM({_REV_SQL}) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    "q14_promo_revenue": f"""
        SELECT 100.0 * CAST(CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                                          THEN {_REV_SQL}
                                          ELSE CAST(0 AS DECIMAL(1,0)) END)
                             AS DECIMAL(38,6)) AS DOUBLE)
                     / CAST(CAST(SUM({_REV_SQL}) AS DECIMAL(38,6)) AS DOUBLE)
               AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= DATE '1995-03-01' AND l_shipdate < DATE '1995-04-01'
    """,
    "q15_top_supplier": f"""
        WITH rev AS (
            SELECT l_suppkey,
                   CAST(CAST(SUM({_REV_SQL}) AS DECIMAL(38,6)) AS DOUBLE) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1995-04-01'
            GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
        ORDER BY s_suppkey
    """,
    "q19_band_filters": f"""
        SELECT CAST(CAST(SUM({_REV_SQL}) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
    """,
    "q22_idle_customers": """
        WITH avg_bal AS (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS a
            FROM customer WHERE c_acctbal > 0)
        SELECT c_nationkey, COUNT(*) AS n_custs,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) AS total_bal
        FROM customer, avg_bal
        WHERE c_acctbal > a
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= DATE '1998-01-01')
        GROUP BY c_nationkey
        ORDER BY c_nationkey
    """,
}
