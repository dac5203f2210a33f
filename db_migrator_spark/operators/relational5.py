"""TPC-H-analog coverage completion (SURVEY.md §2.9 relational surface):
min-cost supplier selection (Q2), important-stock value (Q11), late-line
priority split (Q12), supplier-count distribution (Q16), excess-stock
promotion candidates (Q20).

The fixture schema has no ``partsupp``, ``l_shipmode``, ``l_commitdate``
or ``l_receiptdate`` (TESTDATA.md), so — as with ``relational4.q9_product_profit``
— the supply relationship is modeled from lineitem itself and lateness is
modeled against the order date. Each analog keeps the *query shape* of its
TPC-H original (correlated-min subquery, global-fraction HAVING, conditional
priority counts, NOT-IN distinct counting, nested semi-join chain) so the
same Catalyst patterns are exercised.

All money aggregates follow the decimal-domain discipline from
``relational.py`` (exact decimal accumulation, double surface cast) so the
DuckDB oracles hash-match at any row count.

Scale notes: per-part minima and global scalars are computed as aggregates
rejoined by key / broadcast 1-row aggregates — never single-partition
windows; dimension sides (nation, region, supplier, filtered part) always
broadcast; the only big shuffles are keyed on the natural join keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table
from .relational import _davg, _dsum

# Modeled per-(part, supplier) unit cost: the average unit price this
# supplier charged for this part across its lineitems, in exact decimal
# (sum of extendedprice) / (sum of quantity) evaluated in DOUBLE at the
# surface — IEEE-identical cross-engine for identical operand sets.
_UNIT_COST_SQL = (
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE)"
    " / CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE)"
)


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 analog: for each size-15 part, the EUROPE supplier offering it at
    the lowest modeled unit cost (avg unit price over that supplier's
    lineitems for the part), ties broken by supplier key.

    Shape parity with Q2's correlated ``ps_supplycost = (SELECT MIN(...))``:
    the per-(part, supplier) cost table is aggregated once, the per-part
    minimum is a second keyed aggregate rejoined on partkey (the scalable
    decorrelation), and the region restriction prunes suppliers *before*
    the cost aggregate so the shuffle only carries EUROPE rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    europe_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    sized_parts = part.select("p_partkey")
    es_keys = europe_supp.select(F.col("s_suppkey").alias("es_suppkey"))
    cost = (
        li.join(F.broadcast(sized_parts), li.l_partkey == sized_parts.p_partkey, "left_semi")
        .join(F.broadcast(es_keys), li.l_suppkey == es_keys.es_suppkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(25,6)")).cast("double")
                / F.sum(F.col("l_quantity").cast("decimal(25,6)")).cast("double")
            ).alias("unit_cost")
        )
    )
    min_cost = cost.groupBy(F.col("l_partkey").alias("mc_partkey")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    best = (
        cost.join(
            min_cost,
            (cost.l_partkey == min_cost.mc_partkey) & (cost.unit_cost == min_cost.min_cost),
        )
        # Q2's ORDER BY would surface ties; pin one winner per part for a
        # deterministic result: lowest suppkey among the cost minima.
        .groupBy("l_partkey")
        .agg(F.min("l_suppkey").alias("best_suppkey"), F.min("min_cost").alias("unit_cost"))
    )
    return (
        best.join(F.broadcast(europe_supp), best.best_suppkey == europe_supp.s_suppkey)
        .join(F.broadcast(part), best.l_partkey == part.p_partkey)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "p_name",
            F.col("best_suppkey").alias("s_suppkey"),
            "s_name",
            "n_name",
            "unit_cost",
        )
        .orderBy("p_partkey")
    )


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 analog: per-part "stock value" (sum of extended price shipped by
    NATION_1 suppliers) for parts whose value exceeds 0.1% of the nation's
    total — the global-fraction HAVING realized as a broadcast 1-row
    aggregate cross-joined onto the per-part values."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .filter(F.col("n_name") == "NATION_1")
        .select("s_suppkey")
    )
    per_part = (
        li.join(F.broadcast(n1_supp), li.l_suppkey == n1_supp.s_suppkey, "left_semi")
        .groupBy("l_partkey")
        .agg(_dsum("l_extendedprice").alias("part_value"))
    )
    total = per_part.agg(
        F.sum(F.col("part_value").cast("decimal(38,6)")).cast("double").alias("total_value")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.lit(0.001) * F.col("total_value"))
        .select("l_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), F.col("l_partkey"))
    )


def q12_late_lines_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 analog: lines shipped more than 60 days after their order date
    in 1995, bucketed by return flag (stand-in for ship mode), split into
    high-priority (1-URGENT / 2-HIGH) vs low-priority order counts.

    One shuffle (lineitem->orders on orderkey); the date-window filter is
    pushed to the orders scan; the priority split is two conditional sums
    in a single codegen'd aggregate.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1996-01-01")
    )
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 analog: distinct-supplier counts per (brand, type, size) for
    non-Brand#1 parts, excluding "complaint" suppliers (modeled as negative
    account balance) via an anti-join — Q16's NOT IN subquery.

    The distinct count shuffles once on the (brand, type, size) group keys
    after a partial distinct; the exclusion set broadcasts.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#1")
    bad_supp = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 analog: EUROPE suppliers whose 1995 shipped quantity of
    'blue' parts exceeds 20% of their all-time shipped quantity of those
    parts — Q20's nested IN-chain (supplier IN (... partsupp ... WHERE
    availqty > fraction * shipped)) realized as aggregate + self-rejoin +
    semi-join.

    The blue-part filter broadcasts and prunes lineitem at its first
    join; the two quantity aggregates reuse one shuffle key (suppkey).
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    green = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("blue"))
        .select("p_partkey")
    )
    green_li = li.join(F.broadcast(green), li.l_partkey == green.p_partkey, "left_semi")
    qty = green_li.groupBy("l_suppkey").agg(
        _dsum("l_quantity").alias("total_qty"),
        F.sum(
            F.when(
                (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1996-01-01"),
                F.col("l_quantity"),
            )
            .otherwise(F.lit(0.0))
            .cast("decimal(25,6)")
        )
        .cast("double")
        .alias("qty_1995"),
    )
    heavy = qty.filter(F.col("qty_1995") > 0.2 * F.col("total_qty"))
    region = load_table(spark, sf_dir, "region")
    eu_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "n_name")
    )
    return (
        eu_supp.join(heavy, eu_supp.s_suppkey == heavy.l_suppkey)
        .select("s_suppkey", "s_name", "n_name", "qty_1995", "total_qty")
        .orderBy("s_suppkey")
    )


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q11_important_stock": q11_important_stock,
    "q12_late_lines_priority": q12_late_lines_priority,
    "q16_supplier_counts": q16_supplier_counts,
    "q20_excess_stock_suppliers": q20_excess_stock_suppliers,
}

ORACLES = {
    "q2_min_cost_supplier": f"""
        WITH europe_supp AS (
            SELECT s_suppkey, s_name, n_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'),
        cost AS (
            SELECT l_partkey, l_suppkey, {_UNIT_COST_SQL} AS unit_cost
            FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 15)
              AND l_suppkey IN (SELECT s_suppkey FROM europe_supp)
            GROUP BY l_partkey, l_suppkey),
        best AS (
            SELECT l_partkey, MIN(l_suppkey) AS best_suppkey, MIN(unit_cost) AS unit_cost
            FROM cost
            WHERE unit_cost = (SELECT MIN(c2.unit_cost) FROM cost c2
                               WHERE c2.l_partkey = cost.l_partkey)
            GROUP BY l_partkey)
        SELECT l_partkey AS p_partkey, p_name, best_suppkey AS s_suppkey,
               s_name, n_name, unit_cost
        FROM best
        JOIN europe_supp ON best_suppkey = s_suppkey
        JOIN part ON l_partkey = p_partkey
        ORDER BY p_partkey
    """,
    "q11_important_stock": """
        WITH per_part AS (
            SELECT l_partkey,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS part_value
            FROM lineitem
            WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
                                JOIN nation ON s_nationkey = n_nationkey
                                WHERE n_name = 'NATION_1')
            GROUP BY l_partkey)
        SELECT l_partkey, part_value
        FROM per_part
        WHERE part_value > 0.001 * (SELECT CAST(CAST(SUM(CAST(part_value AS DECIMAL(38,6)))
                                         AS DECIMAL(38,6)) AS DOUBLE) FROM per_part)
        ORDER BY part_value DESC, l_partkey
    """,
    "q12_late_lines_priority": """
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1996-01-01'
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "q16_supplier_counts": """
        SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1'
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    "q20_excess_stock_suppliers": """
        WITH qty AS (
            SELECT l_suppkey,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS total_qty,
                   CAST(SUM(CAST(CASE WHEN l_shipdate >= DATE '1995-01-01'
                                       AND l_shipdate < DATE '1996-01-01'
                                      THEN l_quantity ELSE 0.0 END
                            AS DECIMAL(25,6))) AS DOUBLE) AS qty_1995
            FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%blue%')
            GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, n_name, qty_1995, total_qty
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        JOIN qty ON s_suppkey = l_suppkey
        WHERE r_name = 'EUROPE'
          AND qty_1995 > 0.2 * total_qty
        ORDER BY s_suppkey
    """,
}
