"""Property-based cross-engine checks for the round-7 exact-arithmetic
primitives: the adjusted integer sqrt and the truncating-division ppm
contract must agree with Python's exact integer math — and therefore
with DuckDB, whose twins run the same three-branch CASE / `//` forms —
on ARBITRARY bigints, not just the fixture's values."""

import math

import duckdb
import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.integers(min_value=0, max_value=9 * 10**17), min_size=1, max_size=50
    )
)
def test_isqrt_matches_python_everywhere(spark, xs):
    from db_migrator_spark.operators.corpus5 import _isqrt

    df = spark.createDataFrame([(v,) for v in xs], "x long")
    got = {r.x: r.s for r in df.select("x", _isqrt(F.col("x")).alias("s")).collect()}
    for v in xs:
        assert got[v] == math.isqrt(v)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**62),
            st.integers(min_value=1, max_value=2**40),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_decimal_div_is_python_floordiv_cross_engine(spark, pairs):
    """CAST(a AS DECIMAL(38,0)) * 1e6 div b == Python (a*1e6)//b for
    non-negative operands, in Spark AND DuckDB (HUGEINT `//`).

    Scope: quotients that FIT a bigint — the final CAST silently wraps
    past 2^63 (found by this very test's unconstrained first run), so
    the operator contract everywhere in the repo keeps quotients
    bounded (ppm shares, per-group ratios); pairs whose quotient
    overflows are filtered here to pin the in-contract behavior."""
    pairs = [(a, b) for a, b in pairs if (a * 1_000_000) // b < 2**63]
    if not pairs:
        return
    df = spark.createDataFrame(pairs, "a long, b long")
    got = {
        (r.a, r.b): r.q
        for r in df.select(
            "a",
            "b",
            F.expr(
                "CAST(CAST(a AS DECIMAL(38,0)) * 1000000 div b AS BIGINT)"
            ).alias("q"),
        ).collect()
    }
    con = duckdb.connect()
    for a, b in pairs:
        want = (a * 1_000_000) // b
        assert got[(a, b)] == want
        (duck,) = con.execute(
            f"SELECT CAST(CAST({a} AS HUGEINT) * 1000000 // {b} AS BIGINT)"
        ).fetchone()
        assert duck == want


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.floats(
            min_value=-1e6,
            max_value=1e6,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=50,
    )
)
def test_floor_micros_matches_duckdb_on_negatives(spark, vals):
    """F.floor(value * 1e6).cast(bigint) == DuckDB CAST(FLOOR(value*1e6)
    AS BIGINT) on ARBITRARY doubles including negatives (refunds). A
    plain bigint cast truncates toward zero in Spark but ROUNDS in
    DuckDB — the r7 verdict's events_cohort_ltv finding — so every
    v_micro site uses explicit FLOOR on both engines."""
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = [
        r.m
        for r in df.select(
            F.floor(F.col("v") * 1_000_000).cast("bigint").alias("m")
        ).collect()
    ]
    con = duckdb.connect()
    for v, g in zip(vals, got):
        (duck,) = con.execute(
            "SELECT CAST(FLOOR(CAST(? AS DOUBLE) * 1000000) AS BIGINT)", [v]
        ).fetchone()
        assert g == duck == math.floor(v * 1_000_000)
