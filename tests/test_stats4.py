"""Semantic checks for the stats4 tests (Kruskal-Wallis, Brown-
Forsythe Levene, Jarque-Bera, Mann-Kendall). Cross-engine parity is
the driver/oracle gate's job; these recompute each statistic in plain
Python from the same fixture rows (sf0.001 so collects stay tiny),
replicating the documented staged-truncation contracts exactly."""

from collections import Counter, defaultdict

from db_migrator_spark.io import load_table

SF0 = "/root/testdata/sf0.001"


def _orders(spark):
    return load_table(spark, SF0, "orders").select(
        "o_orderpriority", "o_totalprice", "o_orderdate"
    ).collect()


def test_kruskal_wallis_staged_math(spark):
    from db_migrator_spark.operators.stats4 import q_kruskal_wallis

    row = q_kruskal_wallis(spark, SF0).collect()[0]
    rows = _orders(spark)
    vals = [(r.o_orderpriority, int(r.o_totalprice * 1_000_000)) for r in rows]
    pooled = Counter(v for _, v in vals)
    # doubled average rank per distinct value
    avg2, cum = {}, 0
    for v in sorted(pooled):
        t = pooled[v]
        cum += t
        avg2[v] = 2 * cum - t + 1
    n_total = len(vals)
    groups = defaultdict(list)
    for g, v in vals:
        groups[g].append(v)
    a = 0
    for g, vs in groups.items():
        r_x2 = sum(avg2[v] for v in vs)
        a += (r_x2 * r_x2) // len(vs)
    hu = 3 * a * 1_000_000 // (n_total * (n_total + 1)) - 3 * (
        n_total + 1
    ) * 1_000_000
    n3n = n_total**3 - n_total
    tc = sum(t**3 - t for t in pooled.values())
    assert row.k_groups == len(groups)
    assert row.n_rows == n_total
    assert row.tie_cells == sum(1 for t in pooled.values() if t > 1)
    assert row.h_uncorr_ppm == hu
    assert row.h_ppm == hu * n3n // (n3n - tc)
    # sum of doubled ranks over all rows is N(N+1) (rank-sum identity)
    assert sum(pooled[v] * avg2[v] for v in pooled) == n_total * (
        n_total + 1
    )


def test_levene_brown_forsythe_math(spark):
    from db_migrator_spark.operators.stats4 import q_levene_test

    row = q_levene_test(spark, SF0).collect()[0]
    rows = _orders(spark)
    groups = defaultdict(list)
    for r in rows:
        groups[r.o_orderpriority].append(int(r.o_totalprice))
    a = s = q = n_rows = 0
    for vs in groups.values():
        vs_sorted = sorted(vs)
        med = vs_sorted[(len(vs) + 1) // 2 - 1]  # type-1 lower median
        zs = [abs(v - med) for v in vs]
        s_g, q_g = sum(zs), sum(z * z for z in zs)
        a += (s_g * s_g) // len(zs)
        s += s_g
        q += q_g
        n_rows += len(zs)
    k = len(groups)
    ssb = a - (s * s) // n_rows
    ssw = q - a
    assert row.k_groups == k
    assert row.n_rows == n_rows
    assert row.ssb_dollars2 == str(ssb)
    assert row.ssw_dollars2 == str(ssw)
    assert row.w_ppm == ssb * (n_rows - k) * 1_000_000 // (ssw * (k - 1))


def test_jarque_bera_moment_contract(spark):
    from db_migrator_spark.operators.stats4 import q_jarque_bera

    out = {r.o_orderpriority: r for r in q_jarque_bera(spark, SF0).collect()}
    rows = _orders(spark)
    groups = defaultdict(list)
    for r in rows:
        groups[r.o_orderpriority].append(int(r.o_totalprice // 100))
    for g, vs in groups.items():
        n = len(vs)
        mu0 = sum(vs) // n
        ds = [v - mu0 for v in vs]
        t2, t3, t4 = (sum(d**k for d in ds) for k in (2, 3, 4))
        m2, m3a, m4 = t2 // n, abs(t3) // n, t4 // n
        r = out[g]
        assert (r.n_rows, r.mean100, r.m2) == (n, mu0, m2)
        assert r.skew_sign == (0 if t3 == 0 else (1 if t3 > 0 else -1))
        sk = m3a * m3a * 1_000_000 // (m2**3)
        ek = m4 * 1_000_000 // (m2 * m2) - 3_000_000
        assert r.skew_sq_ppm == sk
        assert r.exkurt_ppm == ek
        assert r.jb_milli == n * (sk // 6 + ek * ek // 24_000_000) // 1000
        # JB is non-negative by construction
        assert r.jb_milli >= 0


def test_mann_kendall_pairwise_math(spark):
    from db_migrator_spark.operators.stats4 import q_mann_kendall_trend

    out = {
        r.o_orderpriority: r
        for r in q_mann_kendall_trend(spark, SF0).collect()
    }
    rows = _orders(spark)
    series = defaultdict(lambda: defaultdict(int))
    for r in rows:
        mk = r.o_orderdate.year * 12 + r.o_orderdate.month
        series[r.o_orderpriority][mk] += int(r.o_totalprice * 100)
    for g, by_month in series.items():
        xs = [by_month[m] for m in sorted(by_month)]
        m = len(xs)
        s = sum(
            (xs[j] > xs[i]) - (xs[j] < xs[i])
            for i in range(m)
            for j in range(i + 1, m)
        )
        ties = Counter(xs)
        var18 = m * (m - 1) * (2 * m + 5) - sum(
            t * (t - 1) * (2 * t + 5) for t in ties.values()
        )
        r = out[g]
        assert (r.m, r.s, r.var18) == (m, s, var18)
        assert r.trend_sign == (0 if s == 0 else (1 if s > 0 else -1))
        if s == 0 or var18 == 0:
            assert r.z_abs_milli == 0
        else:
            import math

            root = math.isqrt(var18 * 18)
            assert r.z_abs_milli == (abs(s) - 1) * 18000 // root
        # |S| can never exceed the pair count
        assert abs(s) <= m * (m - 1) // 2
