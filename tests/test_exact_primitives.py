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


@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.sampled_from([1, 2])),
        min_size=2,
        max_size=60,
    ).filter(lambda s: len({h for _, h in s}) == 2)
)
@settings(max_examples=30, deadline=None)
def test_doubled_rank_identity_u1_plus_u2(sample):
    """The Mann-Whitney doubled-rank construction (stats3): with
    tie-averaged ranks carried DOUBLED, 2U1 + 2U2 == 2 * n1 * n2 for
    ANY multiset — the identity q_mann_whitney_u's arithmetic rides."""
    sample.sort()
    n1 = sum(1 for _, h in sample if h == 1)
    n2 = len(sample) - n1

    def r_x2(group):
        out = i = 0
        while i < len(sample):
            j = i
            while j < len(sample) and sample[j][0] == sample[i][0]:
                j += 1
            avg2 = 2 * i + (j - i) + 1
            out += avg2 * sum(
                1 for k in range(i, j) if sample[k][1] == group
            )
            i = j
        return out

    u1_x2 = r_x2(1) - n1 * (n1 + 1)
    u2_x2 = r_x2(2) - n2 * (n2 + 1)
    assert u1_x2 + u2_x2 == 2 * n1 * n2
    assert 0 <= u1_x2 <= 2 * n1 * n2


@given(
    st.lists(st.integers(0, 10**9), min_size=1, max_size=30).filter(
        lambda m: sum(m) > 0
    ),
    st.integers(1, 10_000),
)
@settings(max_examples=50, deadline=None)
def test_largest_remainder_sums_exactly(masses, budget):
    """The Hamilton allocation (events4): floor shares + top-r
    remainders sum to the budget EXACTLY for any masses."""
    total = sum(masses)
    floors = [m * budget // total for m in masses]
    rems = [(m * budget) % total for m in masses]
    r = budget - sum(floors)
    assert 0 <= r < len(masses) or (r == 0 and len(masses) >= 0)
    order = sorted(range(len(masses)), key=lambda i: (-rems[i], i))
    finals = list(floors)
    for i in order[:r]:
        finals[i] += 1
    assert sum(finals) == budget
    assert all(f in (fl, fl + 1) for f, fl in zip(finals, floors))
