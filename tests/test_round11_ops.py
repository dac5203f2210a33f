"""Semantic checks for the round-11 operators: LM corpus statistics
(Heaps curve, Chao1, Good-Turing, negative-sampling table), Palma
ratio, quantile normalization, t-closeness, Krippendorff's alpha and
propensity matching. Cross-engine parity is the driver/oracle gate's
job; these assert the MATH — each metric recomputed in plain Python
from the same fixture rows (sf0.001/sf0.01 so collects stay tiny)."""

from collections import Counter

import pyspark.sql.functions as F

from db_migrator_spark.io import load_table

SF0 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _doc_trigrams(spark, sf):
    docs = load_table(spark, sf, "documents").select(
        "doc_id", "lang", "text"
    ).collect()
    out = []
    for d in docs:
        ws = d.text.split(" ")
        for i in range(len(ws) - 2):
            out.append((d.doc_id, d.lang, " ".join(ws[i : i + 3])))
    return out


def test_heaps_curve_totals_and_monotonicity(spark):
    from db_migrator_spark.operators.text_lm import text_heaps_curve

    rows = text_heaps_curve(spark, SF0).collect()
    tgs = _doc_trigrams(spark, SF0)
    assert rows[-1].cum_types == len({t for _, _, t in tgs})
    assert rows[-1].cum_trigrams == len(tgs)
    assert sum(r.new_types for r in rows) == rows[-1].cum_types
    cums = [r.cum_types for r in rows]
    assert cums == sorted(cums)
    assert all(r.bucket_trigrams > 0 for r in rows)


def test_chao1_exact_formula(spark):
    from db_migrator_spark.operators.text_lm import text_chao1_richness

    rows = {r.lang: r for r in text_chao1_richness(spark, SF0).collect()}
    tgs = _doc_trigrams(spark, SF0)
    pooled = Counter(t for _, _, t in tgs)
    v = len(pooled)
    f1 = sum(1 for c in pooled.values() if c == 1)
    f2 = sum(1 for c in pooled.values() if c == 2)
    star = rows["*"]
    assert (star.n_types, star.f1, star.f2) == (v, f1, f2)
    if f2 > 0:
        expect = v * 1_000_000 + f1 * f1 * 1_000_000 // (2 * f2)
    else:
        expect = v * 1_000_000 + f1 * (f1 - 1) * 1_000_000 // 2
    assert star.chao1_micro == expect
    # richness estimate never drops below the observed vocabulary
    assert all(r.chao1_micro >= r.n_types * 1_000_000 for r in rows.values())


def test_good_turing_mass_identities(spark):
    from db_migrator_spark.operators.text_lm import (
        GOOD_TURING_MAX_R,
        text_good_turing,
    )

    rows = text_good_turing(spark, SF01).collect()
    docs = load_table(spark, SF01, "documents").select("doc_id", "text").collect()
    tf = Counter()
    for d in docs:
        for w, c in Counter(d.text.split(" ")).items():
            tf[(d.doc_id, w)] = c
    nr = Counter(tf.values())
    for r in rows:
        assert 1 <= r.r <= GOOD_TURING_MAX_R
        assert r.n_r == nr[r.r]
        nxt = nr.get(r.r + 1, 0)
        if nxt == 0:
            assert r.r_star_micro == -1
        else:
            assert r.r_star_micro == (r.r + 1) * nxt * 1_000_000 // r.n_r


def test_negative_sampling_exact_power_and_budget(spark):
    from db_migrator_spark.operators.text_lm import (
        NEG_BUDGET,
        NEG_W_SCALE,
        text_negative_sampling_table,
    )

    rows = text_negative_sampling_table(spark, SF01).collect()
    assert sum(r.alloc for r in rows) == NEG_BUDGET
    w_tot = sum(r.weight_milli for r in rows)
    for r in rows:
        # exact integer fourth root: floor((c^3 * scale^4)^(1/4))
        z = r.c**3 * NEG_W_SCALE**4
        lo, hi = 0, 1
        while hi**4 <= z:
            hi *= 2
        while hi - lo > 1:
            mid = (lo + hi) // 2
            if mid**4 <= z:
                lo = mid
            else:
                hi = mid
        assert r.weight_milli == lo
        # largest-remainder: every word gets its floor quota, at most +1
        base = NEG_BUDGET * r.weight_milli // w_tot
        assert base <= r.alloc <= base + 1


def test_palma_matches_python(spark):
    from db_migrator_spark.operators.quality5 import q_palma_ratio

    rows = {r.c_nationkey: r for r in q_palma_ratio(spark, SF0).collect()}
    orders = load_table(spark, SF0, "orders").select(
        "o_custkey", "o_totalprice"
    ).collect()
    cust = {
        r.c_custkey: r.c_nationkey
        for r in load_table(spark, SF0, "customer").collect()
    }
    rev = Counter()
    for o in orders:
        rev[o.o_custkey] += int(o.o_totalprice * 1_000_000 // 1)
    by_nation = {}
    for ck, y in rev.items():
        by_nation.setdefault(cust[ck], []).append((y, ck))
    for nk, ys in by_nation.items():
        ys.sort(key=lambda t: (-t[0], t[1]))
        n = len(ys)
        vals = [y for y, _ in ys]
        top = sum(vals[: n // 10])
        bot = sum(vals[n - (2 * n) // 5 :])
        r = rows[nk]
        assert r.n_customers == n
        assert r.top10_micros == top
        assert r.bottom40_micros == bot
        if bot > 0:
            assert r.palma_ppm == top * 1_000_000 // bot
        else:
            assert r.palma_ppm == -1


def test_quantile_normalize_matches_python(spark):
    from db_migrator_spark.operators.quality5 import q_quantile_normalize

    out = {
        r.o_orderkey: r for r in q_quantile_normalize(spark, SF0).collect()
    }
    orders = load_table(spark, SF0, "orders").select(
        "o_orderpriority", "o_orderkey", "o_totalprice"
    ).collect()
    base = [
        (o.o_orderpriority, o.o_orderkey, int(o.o_totalprice * 1_000_000 // 1))
        for o in orders
    ]
    pooled = sorted((v, k) for _, k, v in base)
    big_n = len(base)
    groups = {}
    for p, k, v in base:
        groups.setdefault(p, []).append((v, k))
    for p, members in groups.items():
        members.sort()
        n = len(members)
        for rk0, (v, k) in enumerate(members):
            rk = rk0 + 1
            target = (rk * big_n + n - 1) // n
            expect = pooled[target - 1][0]
            assert out[k].qnorm_micro == expect
            assert out[k].v_micro == v


def test_t_closeness_bounds_and_self_distance(spark):
    from db_migrator_spark.operators.quality5 import (
        T_CLOSE_PPM,
        q_t_closeness_audit,
    )

    rows = q_t_closeness_audit(spark, SF01).collect()
    assert rows, "no classes"
    cust = load_table(spark, SF01, "customer").select(
        "c_nationkey", "c_mktsegment", "c_acctbal"
    ).collect()
    n_total = len(cust)
    assert sum(r.n_rows for r in rows) == n_total
    for r in rows:
        assert 0 <= r.emd_ppm <= 1_000_000
        assert r.t_close_ok == (r.emd_ppm <= T_CLOSE_PPM)
    # python recompute for the largest class
    big = max(rows, key=lambda r: r.n_rows)
    gl = Counter(int(c.c_acctbal // 1000) for c in cust)
    cl = Counter(
        int(c.c_acctbal // 1000)
        for c in cust
        if c.c_nationkey == big.c_nationkey
        and c.c_mktsegment == big.c_mktsegment
    )
    m = len(gl)
    n_c = sum(cl.values())
    acc = cum_c = cum_g = 0
    for s in sorted(gl):
        cum_c += cl.get(s, 0)
        cum_g += gl[s]
        acc += abs(cum_c * n_total - cum_g * n_c)
    assert big.emd_ppm == acc * 1_000_000 // (n_c * n_total * (m - 1))


def test_krippendorff_matches_python(spark):
    from db_migrator_spark.operators.evals3 import (
        KRIPP_CHARS_MIN,
        KRIPP_TOKENS_MIN,
        eval_krippendorff_alpha,
    )

    row = eval_krippendorff_alpha(spark, SF01).collect()[0]
    docs = load_table(spark, SF01, "documents").select(
        "n_chars", "text"
    ).collect()
    n = len(docs)
    a = [int(d.n_chars >= KRIPP_CHARS_MIN) for d in docs]
    b = [int(len(d.text.split(" ")) >= KRIPP_TOKENS_MIN) for d in docs]
    d_dis = sum(1 for x, y in zip(a, b) if x != y)
    m1 = sum(a) + sum(b)
    m0 = 2 * n - m1
    assert (row.n_units, row.n_disagree, row.m_pos, row.m_neg) == (
        n,
        d_dis,
        m1,
        m0,
    )
    assert row.observed_agree_ppm == (n - d_dis) * 1_000_000 // n
    assert row.alpha_ppm == 1_000_000 - d_dis * (2 * n - 1) * 1_000_000 // (
        m0 * m1
    )
    # calibrated labelers: strong but imperfect agreement
    assert 0 < row.alpha_ppm < 1_000_000


def test_propensity_matching_is_nearest_and_label_correct(spark):
    from db_migrator_spark.operators.events4 import events_propensity_matching

    out = events_propensity_matching(spark, SF01).collect()
    assert out, "no treated users"
    ev = load_table(spark, SF01, "events").select(
        "user_id", "event_type", "ts", "event_id", "value"
    ).collect()
    per = {}
    for e in ev:
        per.setdefault(e.user_id, []).append(e)
    treated, controls = {}, {}
    for uid, es in per.items():
        es.sort(key=lambda e: (e.ts, e.event_id))
        score = len(es)
        outcome = sum(
            int(e.value * 1_000_000 // 1)
            for e in es
            if e.event_type == "purchase"
        )
        (treated if es[0].event_type == "signup" else controls)[uid] = (
            score,
            outcome,
        )
    assert {r.user_id for r in out} == set(treated)
    ctrl_scores = sorted({s for s, _ in controls.values()})
    for r in out:
        score, outcome = treated[r.user_id]
        assert (r.score, r.outcome_micro) == (score, outcome)
        best = min(
            ctrl_scores, key=lambda s: (abs(s - score), s)
        )
        assert r.m_score == best
        # representative control: min user_id at the matched score
        reps = [u for u, (s, _) in controls.items() if s == r.m_score]
        assert r.ctrl_user == min(reps)
        assert r.ctrl_outcome_micro == controls[r.ctrl_user][1]
        assert r.lift_micro == r.outcome_micro - r.ctrl_outcome_micro


def test_bootstrap_ci_poisson_multiplicities_and_selection(spark):
    import hashlib

    from db_migrator_spark.operators.resampling import (
        BOOT_B,
        BOOT_HI_RANK,
        BOOT_LO_RANK,
        POISSON1_CUM_2_32,
        eval_bootstrap_ci,
    )

    rows = eval_bootstrap_ci(spark, SF0).collect()
    base = [
        (o.o_orderpriority, o.o_orderkey, int(o.o_totalprice * 1_000_000 // 1))
        for o in load_table(spark, SF0, "orders").collect()
    ]
    groups = {}
    for p, k, v in base:
        groups.setdefault(p, []).append((k, v))
    got = {r.o_orderpriority: r for r in rows}
    assert set(got) == set(groups)
    for p, members in groups.items():
        means = []
        for rep in range(BOOT_B):
            n_eff = s = 0
            for k, v in members:
                u = int(
                    hashlib.md5(f"{k}:{rep}".encode()).hexdigest()[:8], 16
                )
                m = sum(1 for t in POISSON1_CUM_2_32 if u >= t)
                n_eff += m
                s += m * v
            means.append(s // n_eff)
        means.sort()
        r = got[p]
        assert r.b_replicates == BOOT_B
        assert r.ci_lo_micro == means[BOOT_LO_RANK - 1]
        assert r.ci_hi_micro == means[BOOT_HI_RANK - 1]
        assert r.point_mean_micro == sum(v for _, v in members) // len(members)
        assert r.ci_lo_micro <= r.ci_hi_micro
        # the point estimate sits inside (or at worst on) the 95% CI
        assert r.ci_lo_micro <= r.point_mean_micro <= r.ci_hi_micro


def test_harmonic_centrality_matches_bfs(spark):
    from db_migrator_spark.operators.graph4 import (
        graph_bfs_distances,
        graph_harmonic_centrality,
    )

    hc = {r.seed: r for r in graph_harmonic_centrality(spark, SF01).collect()}
    dist = graph_bfs_distances(spark, SF01).collect()
    agg = {}
    for d in dist:
        if d.dist > 0:
            n, h = agg.get(d.seed, (0, 0))
            agg[d.seed] = (n + 1, h + 1_000_000 // d.dist)
    assert set(hc) == set(agg)
    for seed, (n, h) in agg.items():
        assert (hc[seed].n_reached, hc[seed].harmonic_micro) == (n, h)


def test_cuped_matches_python(spark):
    import hashlib
    from datetime import datetime

    from db_migrator_spark.operators.events4 import (
        DID_PIVOT,
        events_cuped_adjustment,
    )

    rows = {r.arm: r for r in events_cuped_adjustment(spark, SF01).collect()}
    ev = load_table(spark, SF01, "events").select(
        "user_id", "ts", "value"
    ).collect()
    pivot = datetime.fromisoformat(DID_PIVOT)
    per = {}
    for e in ev:
        x, y, xc, yc = per.get(e.user_id, (0, 0, 0, 0))
        vm = int(e.value * 1_000_000 // 1)
        vc = int(e.value * 100 // 1)
        if e.ts < pivot:
            x, xc = x + vm, xc + vc
        else:
            y, yc = y + vm, yc + vc
        per[e.user_id] = (x, y, xc, yc)

    def tdiv(a, b):
        return -((-a) // b) if a < 0 else a // b

    n = len(per)
    sx_m = sum(v[0] for v in per.values())
    sx = sum(v[2] for v in per.values())
    sy = sum(v[3] for v in per.values())
    sxx = sum(v[2] * v[2] for v in per.values())
    sxy = sum(v[2] * v[3] for v in per.values())
    p, q = n * sxy - sx * sy, n * sxx - sx * sx
    theta_ppm = tdiv(p * 1_000_000, q)
    mean_x_all = sx_m // n
    arms = {}
    for uid, (x, y, _, _) in per.items():
        a = (
            "A"
            if hashlib.md5(f"ab-v1{uid}".encode()).hexdigest()[:2] < "80"
            else "B"
        )
        na, ax, ay = arms.get(a, (0, 0, 0))
        arms[a] = (na + 1, ax + x, ay + y)
    for a, (na, ax, ay) in arms.items():
        r = rows[a]
        assert r.n_users == na
        assert r.mean_x_micro == ax // na
        assert r.raw_mean_y_micro == ay // na
        adj = tdiv(theta_ppm * (ax // na - mean_x_all), 1_000_000)
        assert r.cuped_mean_y_micro == ay // na - adj
        assert r.theta_ppm == theta_ppm
        # variance reduction is a valid squared-correlation share
        assert 0 <= r.var_reduction_ppm <= 1_000_000
