"""Semantic checks for the round-11d additions: best-split
changepoint and water-filled epoch allocation, recomputed in plain
Python at sf0.001."""

from collections import defaultdict
from fractions import Fraction

from db_migrator_spark.io import load_table

SF0 = "/root/testdata/sf0.001"


def test_best_split_matches_python(spark):
    from db_migrator_spark.operators.events5 import (
        events_best_split_changepoint,
    )

    ev = load_table(spark, SF0, "events").select(
        "event_type", "ts", "value"
    ).collect()
    series = defaultdict(lambda: defaultdict(int))
    for e in ev:
        series[e.event_type][e.ts.date()] += int(e.value * 100)
    got = {
        r.event_type: r
        for r in events_best_split_changepoint(spark, SF0).collect()
    }
    for et, by_day in series.items():
        days = sorted(by_day)
        xs = [by_day[d] for d in days]
        m = len(xs)
        total = sum(xs)
        best = None
        s1 = 0
        for t in range(1, m):
            s1 += xs[t - 1]
            a = s1 * (m - t) - (total - s1) * t
            delta = a * a // (t * (m - t) * m)
            if best is None or delta > best[0]:
                best = (delta, t, s1)
        delta, t, s1 = best
        r = got[et]
        assert r.m_days == m
        assert r.n1_days == t
        assert r.split_day == days[t - 1]
        assert r.mean1_cents == s1 // t
        assert r.mean2_cents == (total - s1) // (m - t)
        assert r.delta_cents2 == str(delta)


def test_epoch_waterfill_exact_solve(spark):
    from db_migrator_spark.operators.corpus9 import (
        EPOCH_BUDGET_PCT,
        EPOCH_CAP_HI,
        EPOCH_CAP_LO,
        corpus_epoch_waterfill,
    )

    docs = load_table(spark, SF0, "documents").select(
        "lang", "text"
    ).collect()
    s = defaultdict(int)
    nd = defaultdict(int)
    for d in docs:
        s[d.lang] += len(d.text.split(" "))
        nd[d.lang] += 1
    s_all, docs_all = sum(s.values()), sum(nd.values())
    r = {
        lang: (
            EPOCH_CAP_HI
            if s[lang] * docs_all >= nd[lang] * s_all
            else EPOCH_CAP_LO
        )
        for lang in s
    }
    b = s_all * EPOCH_BUDGET_PCT // 100
    # reference water-fill solve with exact fractions
    order = sorted(s, key=lambda g: (r[g], g))
    best_k = None
    for k in range(0, len(order) + 1):
        num = b - sum(r[g] * s[g] for g in order[:k])
        den = sum(s[g] for g in order[k:])
        r_k = r[order[k - 1]] if k > 0 else 0
        r_next = r[order[k]] if k < len(order) else None
        if num < 0:
            continue
        if num >= r_k * den and (r_next is None or num < r_next * den):
            best_k = (k, num, den)
            break
    k, num, den = best_k
    sat = set(order[:k])
    got = {
        row.lang: row for row in corpus_epoch_waterfill(spark, SF0).collect()
    }
    alloc_total = 0
    for lang in s:
        row = got[lang]
        assert row.s == s[lang]
        assert row.r == r[lang]
        assert row.saturated == (lang in sat)
        if lang in sat:
            assert row.epochs_ppm == r[lang] * 1_000_000
            assert row.alloc_tokens == r[lang] * s[lang]
        else:
            assert row.epochs_ppm == num * 1_000_000 // den
            assert row.alloc_tokens == s[lang] * num // den
            # the water level sits inside the unsaturated caps
            assert Fraction(num, den) <= r[lang]
        alloc_total += row.alloc_tokens
    # allocation exhausts the spendable budget up to < K truncations
    spendable = min(b, sum(r[g] * s[g] for g in s))
    assert 0 <= spendable - alloc_total < len(s)


def test_kaplan_meier_staged_product(spark):
    from db_migrator_spark.operators.events5 import events_kaplan_meier

    rows = events_kaplan_meier(spark, SF0).collect()
    ev = load_table(spark, SF0, "events").filter(
        "event_type = 'purchase'"
    ).select("user_id", "ts").collect()
    spans = {}
    for e in ev:
        day = int(e.ts.timestamp() * 1_000_000) // 86_400_000_000
        lo, hi = spans.get(e.user_id, (day, day))
        spans[e.user_id] = (min(lo, day), max(hi, day))
    from collections import Counter

    churn = Counter(hi - lo for lo, hi in spans.values())
    ages = sorted(churn)
    at_risk = {}
    run = 0
    for a in reversed(ages):
        run += churn[a]
        at_risk[a] = run
    s_ppm = None
    expect = []
    for a in ages:
        r, d = at_risk[a], churn[a]
        s_ppm = (
            (r - d) * 1_000_000 // r
            if s_ppm is None
            else s_ppm * (r - d) // r
        )
        expect.append((a, r, d, d * 1_000_000 // r, s_ppm))
    got = [
        (r.age_days, r.at_risk, r.churned, r.hazard_ppm, r.survival_ppm)
        for r in rows
    ]
    assert got == expect
    # survival is non-increasing and ends wherever everyone churned
    surv = [r.survival_ppm for r in rows]
    assert surv == sorted(surv, reverse=True)
    assert rows[0].at_risk == len(spans)


def test_sax_symbols_quartile_alphabet(spark):
    from db_migrator_spark.operators.events5 import q_sax_symbols

    rows = {r.o_orderpriority: r for r in q_sax_symbols(spark, SF0).collect()}
    orders = load_table(spark, SF0, "orders").select(
        "o_orderpriority", "o_orderdate", "o_totalprice"
    ).collect()
    series = defaultdict(lambda: defaultdict(int))
    for o in orders:
        mk = o.o_orderdate.year * 12 + o.o_orderdate.month
        series[o.o_orderpriority][mk] += int(o.o_totalprice * 100)
    for g, by_mk in series.items():
        vals = sorted(
            (v, mk) for mk, v in by_mk.items()
        )  # rank order (rev, mk)
        m = len(vals)
        qs = [vals[(i * m + 3) // 4 - 1][0] for i in (1, 2, 3)]
        word = "".join(
            "abcd"[sum(v > q for q in qs)]
            for mk, v in sorted(by_mk.items())
        )
        r = rows[g]
        assert r.m_months == m
        assert r.sax_word == word
        assert (r.n_a, r.n_b, r.n_c, r.n_d) == tuple(
            word.count(c) for c in "abcd"
        )


def test_theil_sen_matches_python(spark):
    from db_migrator_spark.operators.events5 import q_theil_sen_trend

    got = {
        r.o_orderpriority: r
        for r in q_theil_sen_trend(spark, SF0).collect()
    }
    orders = load_table(spark, SF0, "orders").select(
        "o_orderpriority", "o_orderdate", "o_totalprice"
    ).collect()
    series = defaultdict(lambda: defaultdict(int))
    for o in orders:
        mk = o.o_orderdate.year * 12 + o.o_orderdate.month
        series[o.o_orderpriority][mk] += int(o.o_totalprice * 100)
    for g, by_mk in series.items():
        pts = sorted(by_mk.items())
        slopes = []
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                dm = pts[j][0] - pts[i][0]
                dr = pts[j][1] - pts[i][1]
                sgn = 1 if dr >= 0 else -1
                slopes.append(sgn * (abs(dr) * 1000 // dm))
        slopes.sort()
        med = slopes[(len(slopes) + 1) // 2 - 1]
        bs = sorted(r * 1000 - med * mk for mk, r in pts)
        r = got[g]
        assert r.m_months == len(pts)
        assert r.n_pairs == len(slopes)
        assert r.slope_milli == med
        assert r.intercept_milli == bs[(len(bs) + 1) // 2 - 1]


def test_rake_matches_python(spark):
    from db_migrator_spark.operators.text_metrics import (
        RAKE_MAX_WORDS,
        RAKE_STOP,
        RAKE_TOP_K,
        text_rake_keywords,
    )

    docs = load_table(spark, SF0, "documents").select("text").collect()
    stop = set(RAKE_STOP)
    phrases = []
    for d in docs:
        run = []
        for w in d.text.lower().split(" "):
            if w == "" or w in stop:
                if run and len(run) <= RAKE_MAX_WORDS:
                    phrases.append(" ".join(run))
                run = []
            else:
                run.append(w)
        if run and len(run) <= RAKE_MAX_WORDS:
            phrases.append(" ".join(run))
    from collections import Counter

    freq, degree = Counter(), Counter()
    for ph in phrases:
        ws = ph.split(" ")
        for w in ws:
            freq[w] += 1
            degree[w] += len(ws)
    counts = Counter(phrases)
    scored = {
        ph: sum(degree[w] * 1000 // freq[w] for w in set(ph.split(" ")))
        for ph in counts
    }
    expect = sorted(
        ((ph, counts[ph], sc) for ph, sc in scored.items()),
        key=lambda t: (-t[2], -t[1], t[0]),
    )[:RAKE_TOP_K]
    got = [
        (r.phrase, r.n_occurrences, r.score_milli)
        for r in text_rake_keywords(spark, SF0).collect()
    ]
    assert got == expect


def test_markov_stationary_power_iteration(spark):
    from db_migrator_spark.operators.events5 import (
        MARKOV_POWER_ITERS,
        events_markov_stationary,
    )

    ev = load_table(spark, SF0, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    by_user = defaultdict(list)
    for e in ev:
        by_user[e.user_id].append((e.ts, e.event_id, e.event_type))
    cells = defaultdict(int)
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            cells[(a, b)] += 1
    tot = defaultdict(int)
    for (a, _), n in cells.items():
        tot[a] += n
    states = sorted({a for a, _ in cells} | {b for _, b in cells})
    p = {
        (a, b): n * 1_000_000 // tot[a] for (a, b), n in cells.items()
    }
    k = len(states)
    pi = {s: 1_000_000 // k for s in states}
    for _ in range(MARKOV_POWER_ITERS):
        pi = {
            j: sum(pi[i] * p.get((i, j), 0) for i in states)
            // 1_000_000
            for j in states
        }
    got = {
        r.event_type: r
        for r in events_markov_stationary(spark, SF0).collect()
    }
    for s_ in states:
        r = got[s_]
        assert r.pi0_ppm == 1_000_000 // k
        assert r.stationary_ppm == pi[s_]
        assert r.n_out_transitions == tot.get(s_, 0)
    # mass drift from per-state truncation stays under K ppm per step
    assert 1_000_000 - sum(pi.values()) <= (
        MARKOV_POWER_ITERS + 1
    ) * k
