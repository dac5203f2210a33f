"""Semantic checks for the round-11c additions: winnowing
fingerprints, Cochran-Armitage trend, McNemar — recomputed in plain
Python at sf0.001."""

import hashlib
from collections import defaultdict

from db_migrator_spark.io import load_table

SF0 = "/root/testdata/sf0.001"


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_winnowing_matches_python(spark):
    from db_migrator_spark.operators.text_metrics import (
        WINNOW_K,
        WINNOW_W,
        text_winnowing_fingerprints,
    )

    docs = load_table(spark, SF0, "documents").select(
        "doc_id", "text"
    ).collect()
    expect = set()
    for d in docs:
        ws = d.text.split(" ")
        if len(ws) < WINNOW_K:
            continue
        hs = [
            _h32(" ".join(ws[i : i + WINNOW_K]))
            for i in range(len(ws) - WINNOW_K + 1)
        ]
        for s in range(len(hs) - WINNOW_W + 1):
            win = hs[s : s + WINNOW_W]
            mv = min(win)
            # rightmost position of the window minimum
            sel = s + max(i for i, h in enumerate(win) if h == mv)
            expect.add((d.doc_id, sel + 1, mv))
    got = {
        (r.doc_id, r.sel_pos, r.fp_hash32)
        for r in text_winnowing_fingerprints(spark, SF0).collect()
    }
    assert got == expect
    # density: winnowing selects at most one fingerprint per window
    # start, and at least one per w consecutive k-grams
    per_doc = defaultdict(list)
    for doc_id, pos, _ in expect:
        per_doc[doc_id].append(pos)
    for d in docs:
        ws = d.text.split(" ")
        m = len(ws) - WINNOW_K + 1
        if m >= WINNOW_W and per_doc[d.doc_id]:
            ps = sorted(per_doc[d.doc_id])
            assert all(b - a <= WINNOW_W for a, b in zip(ps, ps[1:]))


def test_cochran_armitage_matches_python(spark):
    from db_migrator_spark.operators.stats4 import (
        q_cochran_armitage_trend,
    )

    row = q_cochran_armitage_trend(spark, SF0).collect()[0]
    orders = load_table(spark, SF0, "orders").select(
        "o_orderpriority", "o_orderstatus"
    ).collect()
    cells = defaultdict(lambda: [0, 0])
    for o in orders:
        w = int(o.o_orderpriority[0])
        cells[w][0] += 1
        cells[w][1] += int(o.o_orderstatus == "F")
    nn = sum(n for n, _ in cells.values())
    rr = sum(r for _, r in cells.values())
    wn = sum(w * n for w, (n, _) in cells.items())
    wr = sum(w * r for w, (_, r) in cells.items())
    wwn = sum(w * w * n for w, (n, _) in cells.items())
    t = nn * wr - rr * wn
    assert row.n_rows == nn and row.n_pos == rr
    assert row.t_scaled == t
    assert row.trend_sign == (0 if t == 0 else (1 if t > 0 else -1))
    denom = nn * wwn - wn * wn
    if rr in (0, nn) or denom == 0:
        assert row.z2_ppm == 0
    else:
        assert row.z2_ppm == (t * t // (rr * (nn - rr))) * nn * 1_000_000 // denom


def test_mcnemar_matches_python(spark):
    from db_migrator_spark.operators.evals import PR_LABEL_MIN_TOKENS
    from db_migrator_spark.operators.evals4 import (
        MCNEMAR_CHARS,
        MCNEMAR_MAXWORD,
        eval_mcnemar,
    )

    docs = load_table(spark, SF0, "documents").select(
        "lang", "text", "n_chars"
    ).collect()
    agg = defaultdict(lambda: [0, 0, 0])  # n, b, c
    for d in docs:
        ws = d.text.split(" ")
        truth = int(len(ws) >= PR_LABEL_MIN_TOKENS)
        a = int(max(len(w) for w in ws) >= MCNEMAR_MAXWORD)
        b = int(d.n_chars >= MCNEMAR_CHARS)
        e = agg[d.lang]
        e[0] += 1
        e[1] += int(a == truth and b != truth)
        e[2] += int(a != truth and b == truth)
    got = {r.lang: r for r in eval_mcnemar(spark, SF0).collect()}
    for lang, (n, b, c) in agg.items():
        r = got[lang]
        assert (r.n_docs, r.b_disc, r.c_disc) == (n, b, c)
        if b + c == 0 or abs(b - c) < 1:
            assert r.mcnemar_milli == 0
        else:
            assert r.mcnemar_milli == (abs(b - c) - 1) ** 2 * 1000 // (
                b + c
            )


def test_gini_stump_matches_python(spark):
    from db_migrator_spark.operators.stats4 import q_gini_stump

    row = q_gini_stump(spark, SF0).collect()[0]
    orders = load_table(spark, SF0, "orders").select(
        "o_totalprice", "o_orderstatus"
    ).collect()
    from collections import Counter

    n_by_v, p_by_v = Counter(), Counter()
    for o in orders:
        v = int(o.o_totalprice)
        n_by_v[v] += 1
        p_by_v[v] += int(o.o_orderstatus == "F")
    n_all = sum(n_by_v.values())
    p_all = sum(p_by_v.values())

    def wi_part(n, p):
        return (n * n - p * p - (n - p) * (n - p)) * 1_000_000 // n

    best = None
    n1 = p1 = 0
    for v in sorted(n_by_v):
        n1 += n_by_v[v]
        p1 += p_by_v[v]
        if n1 == n_all:
            break
        wi = wi_part(n1, p1) + wi_part(n_all - n1, p_all - p1)
        if best is None or wi < best[0]:
            best = (wi, v, n1, p1)
    wi, v, n1, p1 = best
    assert row.split_dollars == v
    assert (row.n1, row.p1) == (n1, p1)
    assert (row.n2, row.p2) == (n_all - n1, p_all - p1)
    assert row.wi_micro == wi
    assert row.gain_micro == wi_part(n_all, p_all) - wi
    # a split never increases impurity by more than the documented
    # 2-micro truncation slack
    assert row.gain_micro >= -2
