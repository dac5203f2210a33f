"""Property-based cross-engine fuzz: randomized filter/group/aggregate
queries over lineitem must produce identical results in Spark and DuckDB.

The hand-written contract queries pin specific shapes; this fuzzes the
space between them — arbitrary predicate combinations, group keys, and
aggregate columns — using the same decimal-accumulation discipline, so a
regression in predicate semantics, null handling, or aggregate typing
shows up on shapes nobody hand-picked.
"""

import duckdb
import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SF = "/root/testdata/sf0.001"

# (name, spark predicate builder, SQL text) triples over lineitem columns
_PREDICATES = [
    ("qty_lo", lambda v: F.col("l_quantity") > v, "l_quantity > {}"),
    ("qty_hi", lambda v: F.col("l_quantity") <= v, "l_quantity <= {}"),
    ("disc", lambda v: F.col("l_discount") >= v / 100.0, "l_discount >= {} / 100.0"),
    ("price", lambda v: F.col("l_extendedprice") < v * 1000.0, "l_extendedprice < {} * 1000.0"),
    ("line", lambda v: F.col("l_linenumber") != (v % 7) + 1, "l_linenumber != {} % 7 + 1"),
    ("tax", lambda v: F.col("l_tax") * 100 < v, "l_tax * 100 < {}"),
]

_GROUP_KEYS = ["l_returnflag", "l_linestatus", "l_linenumber"]
_AGG_COLS = ["l_quantity", "l_extendedprice", "l_discount"]


@st.composite
def _query_shapes(draw):
    picks = draw(
        st.lists(st.sampled_from(range(len(_PREDICATES))), min_size=1, max_size=3, unique=True)
    )
    vals = [draw(st.integers(min_value=0, max_value=60)) for _ in picks]
    key = draw(st.sampled_from(_GROUP_KEYS))
    agg = draw(st.sampled_from(_AGG_COLS))
    return picks, vals, key, agg


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(shape=_query_shapes())
def test_random_filter_group_agg_matches_duckdb(spark, shape):
    from db_migrator_spark.io import load_table

    picks, vals, key, agg = shape
    li = load_table(spark, SF, "lineitem")
    cond = None
    sql_parts = []
    for idx, v in zip(picks, vals):
        name, builder, sql = _PREDICATES[idx]
        c = builder(v)
        cond = c if cond is None else (cond & c)
        sql_parts.append(sql.format(v))
    got = {
        (r.k, r.n, r.total)
        for r in (
            li.filter(cond)
            .groupBy(F.col(key).alias("k"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col(agg).cast("decimal(25,6)")).cast("double").alias("total"),
            )
        ).collect()
    }
    where = " AND ".join(sql_parts)
    want = {
        tuple(r)
        for r in duckdb.sql(
            f"""
            SELECT {key} AS k, COUNT(*) AS n,
                   CAST(SUM(CAST({agg} AS DECIMAL(25,6))) AS DOUBLE) AS total
            FROM read_parquet('{SF}/lineitem.parquet')
            WHERE {where}
            GROUP BY {key}
            """
        ).fetchall()
    }
    assert got == want


@st.composite
def _array_shapes(draw):
    thr = draw(st.integers(min_value=1, max_value=50))
    ex = draw(st.integers(min_value=1, max_value=50))
    s0 = draw(st.integers(min_value=1, max_value=3))
    sl = draw(st.integers(min_value=1, max_value=4))
    return thr, ex, s0, sl


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(shape=_array_shapes())
def test_random_array_lambdas_match_duckdb(spark, shape):
    """Randomized filter/exists/fold/slice over per-order quantity arrays
    must match DuckDB's list functions for arbitrary thresholds/bounds."""
    from db_migrator_spark.io import load_table

    thr, ex, s0, sl = shape
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", F.col("l_quantity").cast("int").alias("q")
    )
    arr = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("q")).alias("qs"))
        .filter(F.size("qs") >= 4)
    )
    got = {
        (r.k, r.n_thr, r.has, r.tot, r.sl)
        for r in arr.select(
            F.col("l_orderkey").alias("k"),
            F.size(F.filter("qs", lambda x: x > F.lit(thr))).alias("n_thr"),
            F.exists("qs", lambda x: x == F.lit(ex)).alias("has"),
            F.aggregate("qs", F.lit(0).cast("bigint"), lambda a, x: a + x).alias("tot"),
            F.array_join(F.slice("qs", s0, sl).cast("array<string>"), ",").alias("sl"),
        ).collect()
    }
    want = {
        tuple(r)
        for r in duckdb.sql(
            f"""
            WITH a AS (SELECT l_orderkey,
                              list_sort(list(CAST(l_quantity AS INT))) AS qs
                       FROM read_parquet('{SF}/lineitem.parquet')
                       GROUP BY l_orderkey)
            SELECT l_orderkey AS k,
                   CAST(len(list_filter(qs, x -> x > {thr})) AS INT) AS n_thr,
                   len(list_filter(qs, x -> x = {ex})) > 0 AS has,
                   CAST(list_sum(qs) AS BIGINT) AS tot,
                   array_to_string(qs[{s0}:{s0 + sl - 1}], ',') AS sl
            FROM a WHERE len(qs) >= 4
            """
        ).fetchall()
    }
    assert got == want


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    days=st.integers(min_value=-400, max_value=400),
    months=st.integers(min_value=-13, max_value=13),
)
def test_random_date_arithmetic_matches_duckdb(spark, days, months):
    """date_add / add_months for arbitrary offsets (incl. negative and
    month-end clamping) must match DuckDB's interval arithmetic."""
    from db_migrator_spark.io import load_table

    orders = load_table(spark, SF, "orders")
    d = F.col("o_orderdate").cast("date")
    got = {
        (r.k, str(r.pd), str(r.pm))
        for r in orders.select(
            F.col("o_orderkey").alias("k"),
            F.date_add(d, days).alias("pd"),
            F.add_months(d, months).alias("pm"),
        ).collect()
    }
    want = {
        (r[0], str(r[1]), str(r[2]))
        for r in duckdb.sql(
            f"""
            SELECT o_orderkey AS k,
                   CAST(o_orderdate AS DATE) + {days} AS pd,
                   CAST(CAST(o_orderdate AS DATE) + to_months({months}) AS DATE) AS pm
            FROM read_parquet('{SF}/orders.parquet')
            """
        ).fetchall()
    }
    assert got == want
