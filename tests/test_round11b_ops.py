"""Semantic checks for the round-11b additions beyond the stats/graph
batches: ECE/MCE rollup and boilerplate span detection, recomputed in
plain Python at sf0.001."""

from collections import Counter

from db_migrator_spark.io import load_table

SF0 = "/root/testdata/sf0.001"


def test_ece_matches_python(spark):
    from db_migrator_spark.operators.evals import (
        CAL_BINS,
        CAL_SOFT,
        PR_LABEL_MIN_TOKENS,
    )
    from db_migrator_spark.operators.evals4 import eval_ece

    row = eval_ece(spark, SF0).collect()[0]
    docs = load_table(spark, SF0, "documents").select(
        "n_chars", "text"
    ).collect()
    bins = {}
    for d in docs:
        score = d.n_chars * 1_000_000 // (d.n_chars + CAL_SOFT)
        label = int(len(d.text.split(" ")) >= PR_LABEL_MIN_TOKENS)
        b = score * CAL_BINS // 1_000_000
        n, ss, np = bins.get(b, (0, 0, 0))
        bins[b] = (n + 1, ss + score, np + label)
    gaps = {
        b: abs(ss // n - np * 1_000_000 // n)
        for b, (n, ss, np) in bins.items()
    }
    total = sum(n for n, _, _ in bins.values())
    ece = sum(bins[b][0] * gaps[b] for b in bins) // total
    assert row.n_rows == total
    assert row.n_bins == len(bins)
    assert row.ece_ppm == ece
    assert row.mce_ppm == max(gaps.values())
    # ECE is a weighted mean of gaps, so it can never exceed MCE
    assert row.ece_ppm <= row.mce_ppm


def test_boilerplate_spans_match_python(spark):
    from db_migrator_spark.operators.text_metrics import (
        BOILER_K,
        BOILER_MIN_DOCS,
        text_boilerplate_spans,
    )

    docs = load_table(spark, SF0, "documents").select(
        "lang", "text"
    ).collect()
    spans = Counter()
    langs = {}
    for d in docs:
        ws = d.text.split(" ")
        if len(ws) < BOILER_K:
            continue
        for kind, span in (
            ("prefix", " ".join(ws[:BOILER_K])),
            ("suffix", " ".join(ws[-BOILER_K:])),
        ):
            spans[(kind, span)] += 1
            langs.setdefault((kind, span), set()).add(d.lang)
    expect = {
        k: (c, len(langs[k]), c * 1_000_000 // len(docs))
        for k, c in spans.items()
        if c >= BOILER_MIN_DOCS
    }
    got = {
        (r.kind, r.span): (r.n_docs, r.n_langs, r.share_ppm)
        for r in text_boilerplate_spans(spark, SF0).collect()
    }
    assert got == expect


def test_delong_matches_python(spark):
    import math
    from collections import defaultdict

    from db_migrator_spark.operators.evals import PR_LABEL_MIN_TOKENS
    from db_migrator_spark.operators.evals4 import eval_auc_delong

    docs = load_table(spark, SF0, "documents").select(
        "lang", "n_chars", "text"
    ).collect()
    by_lang = defaultdict(list)
    for d in docs:
        lbl = int(len(d.text.split(" ")) >= PR_LABEL_MIN_TOKENS)
        by_lang[d.lang].append((d.n_chars, lbl))
    got = {r.lang: r for r in eval_auc_delong(spark, SF0).collect()}
    for lang, pts in by_lang.items():
        pos = [s for s, l in pts if l == 1]
        neg = [s for s, l in pts if l == 0]
        n1, n0 = len(pos), len(neg)
        r = got[lang]
        assert (r.n_pos, r.n_neg) == (n1, n0)
        if n1 < 2 or n0 < 2:
            assert r.var_e12 is None
            continue
        # doubled placements straight from the definition
        w10 = {
            s: 2 * sum(1 for y in neg if y < s)
            + sum(1 for y in neg if y == s)
            for s in set(pos)
        }
        w01 = {
            s: 2 * sum(1 for x in pos if x > s)
            + sum(1 for x in pos if x == s)
            for s in set(neg)
        }
        a = sum(w10[s] for s in pos)
        b = sum(w10[s] ** 2 for s in pos)
        c = sum(w01[s] ** 2 for s in neg)
        assert r.auc_ppm == a * 1_000_000 // (2 * n0 * n1)
        t = (b * n1 - a * a) * 10**12 // (n1 - 1) + (
            c * n0 - a * a
        ) * 10**12 // (n0 - 1)
        var = t // (4 * n0 * n0 * n1 * n1)
        assert r.var_e12 == var
        se = math.isqrt(var)
        assert r.se_ppm == se
        assert r.ci_lo_ppm == r.auc_ppm - 196 * se // 100
        assert r.ci_hi_ppm == r.auc_ppm + 196 * se // 100
        # the CI half-width is positive and the interval brackets AUC
        assert r.ci_lo_ppm <= r.auc_ppm <= r.ci_hi_ppm


def test_bradley_terry_zermelo_fold(spark):
    from collections import defaultdict

    from db_migrator_spark.operators.evals4 import (
        BT_ITERS,
        eval_bradley_terry,
    )

    docs = load_table(spark, SF0, "documents").select(
        "doc_id", "lang", "text"
    ).collect()
    by_id = {d.doc_id: d for d in docs}
    wins = defaultdict(int)
    for d in docs:
        o = by_id.get(d.doc_id + 1)
        if o is None or o.lang == d.lang:
            continue
        na, nb = len(d.text.split(" ")), len(o.text.split(" "))
        if na == nb:
            continue
        w, l = (d.lang, o.lang) if na > nb else (o.lang, d.lang)
        wins[(w, l)] += 1
    items = sorted({a for a, _ in wins} | {b for _, b in wins})
    n = {
        (i, j): wins.get((i, j), 0) + wins.get((j, i), 0)
        for i in items
        for j in items
        if i != j
    }
    wt = {i: sum(wins.get((i, j), 0) for j in items if j != i) for i in items}
    p = {i: 1_000_000 for i in items}
    for _ in range(BT_ITERS):
        d_ = {
            i: sum(
                n[(i, j)] * 10**12 // (p[i] + p[j])
                for j in items
                if j != i and n[(i, j)] > 0 and p[i] + p[j] > 0
            )
            for i in items
        }
        p = {i: (wt[i] * 10**12 // d_[i]) if d_[i] > 0 else 0 for i in items}
    got = {r.lang: r for r in eval_bradley_terry(spark, SF0).collect()}
    assert set(got) == set(items)
    for i in items:
        r = got[i]
        assert r.n_wins == wt[i]
        assert r.n_losses == sum(
            wins.get((j, i), 0) for j in items if j != i
        )
        assert r.bt_strength_ppm == p[i]
    # strengths order consistently with win rates on a dominant item
    best = max(items, key=lambda i: (wt[i], i))
    assert got[best].bt_strength_ppm >= min(
        r.bt_strength_ppm for r in got.values()
    )


def test_ssim_matches_python(spark):
    from db_migrator_spark.operators.multimodal import (
        PPM_H,
        PPM_W,
        SSIM_C1,
        SSIM_C2,
        _ppm_payloads,
        multimodal_image_ssim,
    )

    payloads = {
        r.doc_id: bytes(r.payload)
        for r in _ppm_payloads(spark, SF0).collect()
    }

    def gray(buf):
        toks, pos = [], 0
        while len(toks) < 4:
            while buf[pos : pos + 1].isspace():
                pos += 1
            st = pos
            while pos < len(buf) and not buf[pos : pos + 1].isspace():
                pos += 1
            toks.append(buf[st:pos])
        pos += 1
        n = PPM_W * PPM_H
        px = buf[pos : pos + n * 3]
        return [px[3 * i] + px[3 * i + 1] + px[3 * i + 2] for i in range(n)]

    got = {
        (r.doc_a, r.doc_b): r
        for r in multimodal_image_ssim(spark, SF0).collect()
    }
    n = PPM_W * PPM_H
    checked = 0
    for doc_a in sorted(payloads):
        if doc_a + 1 not in payloads:
            continue
        ga, gb = gray(payloads[doc_a]), gray(payloads[doc_a + 1])
        s1a, s1b = sum(ga), sum(gb)
        s2a = sum(g * g for g in ga)
        s2b = sum(g * g for g in gb)
        s12 = sum(a * b for a, b in zip(ga, gb))
        lnum = 2 * s1a * s1b + SSIM_C1 * n * n
        lden = s1a * s1a + s1b * s1b + SSIM_C1 * n * n
        csnum = 2 * (n * s12 - s1a * s1b) + SSIM_C2 * n * n
        csden = (
            (n * s2a - s1a * s1a)
            + (n * s2b - s1b * s1b)
            + SSIM_C2 * n * n
        )
        num, den = lnum * csnum, lden * csden
        sgn = -1 if num < 0 else 1
        expect = sgn * (abs(num) * 1_000_000 // den)
        r = got[(doc_a, doc_a + 1)]
        assert r.s12 == s12
        assert r.ssim_ppm == expect
        assert -1_000_000 <= r.ssim_ppm <= 1_000_000
        checked += 1
    assert checked == len(got) > 0
    # an image is maximally similar to itself: sanity on the algebra
    ga = gray(payloads[min(payloads)])
    s1 = sum(ga)
    s2 = sum(g * g for g in ga)
    lnum = 2 * s1 * s1 + SSIM_C1 * n * n
    lden = 2 * s1 * s1 + SSIM_C1 * n * n
    csnum = 2 * (n * s2 - s1 * s1) + SSIM_C2 * n * n
    csden = 2 * (n * s2 - s1 * s1) + SSIM_C2 * n * n
    assert lnum * csnum == lden * csden  # self-SSIM = exactly 1


def test_kneser_ney_counts_match_python(spark):
    from collections import Counter

    from db_migrator_spark.operators.text_lm import (
        KN_TOP_K,
        text_kneser_ney_counts,
    )

    docs = load_table(spark, SF0, "documents").select("text").collect()
    bigrams = Counter()
    for d in docs:
        ws = d.text.split(" ")
        for a, b in zip(ws, ws[1:]):
            if a and b:
                bigrams[(a, b)] += 1
    uni = Counter()
    lctx, rctx = Counter(), Counter()
    for (a, b), n in bigrams.items():
        uni[a] += n
        lctx[b] += 1
        rctx[a] += 1
    types = len(bigrams)
    n1 = sum(1 for n in bigrams.values() if n == 1)
    n2 = sum(1 for n in bigrams.values() if n == 2)
    rows = text_kneser_ney_counts(spark, SF0).collect()
    star = [r for r in rows if r.w == "*"][0]
    assert (star.c_w, star.n1p_left, star.n1p_right) == (types, n1, n2)
    assert star.p_cont_ppm == n1 * 1_000_000 // (n1 + 2 * n2)
    words = [r for r in rows if r.w != "*"]
    assert len(words) == min(KN_TOP_K, len(lctx))
    expect_order = sorted(lctx.items(), key=lambda kv: (-kv[1], kv[0]))
    for r, (w, nl) in zip(
        sorted(words, key=lambda r: (-r.n1p_left, r.w)),
        expect_order[: len(words)],
    ):
        assert (r.w, r.n1p_left) == (w, nl)
        assert r.c_w == uni.get(w, 0)
        assert r.n1p_right == rctx.get(w, 0)
        assert r.p_cont_ppm == nl * 1_000_000 // types
    # continuation mass sums to the bigram type count over ALL words
    assert sum(lctx.values()) == types


def test_edit_distance_pairs_match_python(spark):
    from db_migrator_spark.operators.text_metrics import (
        EDIT_PREFIX_CHARS,
        text_edit_distance_pairs,
    )

    docs = load_table(spark, SF0, "documents").select(
        "doc_id", "lang", "text"
    ).collect()
    by_id = {d.doc_id: d for d in docs}

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(
                        prev[j] + 1,
                        cur[j - 1] + 1,
                        prev[j - 1] + (ca != cb),
                    )
                )
            prev = cur
        return prev[-1]

    got = {
        (r.doc_a, r.doc_b): r
        for r in text_edit_distance_pairs(spark, SF0).collect()
    }
    n_checked = 0
    for d in docs:
        o = by_id.get(d.doc_id + 1)
        if o is None or o.lang != d.lang:
            continue
        a = d.text[:EDIT_PREFIX_CHARS]
        b = o.text[:EDIT_PREFIX_CHARS]
        r = got[(d.doc_id, o.doc_id)]
        dist = lev(a, b)
        ml = max(len(a), len(b))
        assert r.edit_distance == dist
        assert r.max_len == ml
        assert r.similarity_ppm == (ml - dist) * 1_000_000 // ml
        n_checked += 1
    assert n_checked == len(got) > 0
