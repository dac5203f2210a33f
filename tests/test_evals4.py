"""Semantic checks for the n-gram overlap evals (ROUGE-N, corpus
BLEU): metrics recomputed in plain Python over the same adjacent-id
same-lang pairs at sf0.001."""

import math
from collections import Counter, defaultdict

from db_migrator_spark.io import load_table

SF0 = "/root/testdata/sf0.001"


def _pairs_and_grams(spark, n_max):
    docs = load_table(spark, SF0, "documents").select(
        "doc_id", "lang", "text"
    ).collect()
    by_id = {d.doc_id: d for d in docs}
    pairs = [
        (d.doc_id, d.doc_id + 1, d.lang)
        for d in docs
        if d.doc_id + 1 in by_id and by_id[d.doc_id + 1].lang == d.lang
    ]
    grams = {}
    for d in docs:
        ws = d.text.split(" ")
        grams[d.doc_id] = {
            n: Counter(
                " ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)
            )
            for n in range(1, n_max + 1)
        }
    return pairs, grams


def _clipped(grams, ref, cand, n):
    r, c = grams[ref][n], grams[cand][n]
    return sum(min(cnt, c[g]) for g, cnt in r.items() if g in c)


def test_rouge_micro_macro(spark):
    from db_migrator_spark.operators.evals4 import eval_rouge_n

    pairs, grams = _pairs_and_grams(spark, 2)
    got = {
        (r.lang, r.n): r for r in eval_rouge_n(spark, SF0).collect()
    }
    agg = defaultdict(lambda: [0, 0, 0, 0, 0])  # num, den, ppmsum, k, npairs
    for ref, cand, lang in pairs:
        for n in (1, 2):
            num = _clipped(grams, ref, cand, n)
            den = sum(grams[ref][n].values())
            a = agg[(lang, n)]
            a[4] += 1
            a[0] += num
            a[1] += den
            if den > 0:
                a[2] += num * 1_000_000 // den
                a[3] += 1
    for key, (num, den, ppmsum, k, npairs) in agg.items():
        r = got[key]
        assert r.n_pairs == npairs
        assert r.rouge_micro_ppm == (
            0 if den == 0 else num * 1_000_000 // den
        )
        assert r.rouge_macro_ppm == (0 if k == 0 else ppmsum // k)
        # recall is a proportion
        assert 0 <= r.rouge_micro_ppm <= 1_000_000


def test_bleu_precisions_and_geo_mean(spark):
    from db_migrator_spark.operators.evals4 import (
        NGRAM_MAX,
        eval_bleu_corpus,
    )

    pairs, grams = _pairs_and_grams(spark, NGRAM_MAX)
    got = {r.lang: r for r in eval_bleu_corpus(spark, SF0).collect()}
    agg = defaultdict(lambda: defaultdict(lambda: [0, 0, 0]))
    npairs = Counter()
    for ref, cand, lang in pairs:
        npairs[lang] += 1
        for n in range(1, NGRAM_MAX + 1):
            a = agg[lang][n]
            a[0] += _clipped(grams, ref, cand, n)
            a[1] += sum(grams[cand][n].values())
            a[2] += sum(grams[ref][n].values())
    for lang, row in got.items():
        assert row.n_pairs == npairs[lang]
        ps = []
        for n in range(1, NGRAM_MAX + 1):
            num, ctot, _ = agg[lang][n]
            p = 0 if ctot == 0 else num * 1_000_000 // ctot
            assert getattr(row, f"p{n}_ppm") == p
            ps.append(p)
        assert row.ref_tokens == agg[lang][1][2]
        assert row.cand_tokens == agg[lang][1][1]
        expect = math.isqrt(math.isqrt(ps[0] * ps[1] * ps[2] * ps[3]))
        assert row.bleu_nbp_ppm == expect
        # geometric mean never exceeds the max precision
        assert row.bleu_nbp_ppm <= max(ps)
        assert row.bp_is_one == (row.cand_tokens >= row.ref_tokens)


def test_pair_overlap_roled_aggregate_edges(spark, tmp_path):
    """Focused r14 test: the roled-aggregate clip (one shuffle, no
    gram join) must equal the direct per-pair clipped count on a
    crafted corpus exercising the rewrite's edge cases — repeated
    grams (multiplicity clipping via LEAST of role counts), short docs
    (len < n => closed-form total 0), a lang break in the id chain,
    and boundary ids whose phantom pairs must fold away."""
    from db_migrator_spark.operators.evals4 import _pair_overlap

    rows = [
        (1, "en", "a a b a"),        # repeated grams
        (2, "en", "a b a a a"),      # pair (1,2): clip multiplicities
        (3, "de", "a b"),            # lang break: (2,3) invalid
        (4, "de", "x"),              # len 1: n>=2 totals are 0
        (5, "de", "x y z w v"),      # pair (4,5) valid
        (7, "en", "q q"),            # id gap: no pair (6,7)/(7,8)
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    ).coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")

    n_max = 3
    got = {
        (r.ref_id, r.n): (r.ref_tot, r.cand_tot, r.num)
        for r in _pair_overlap(spark, sf_dir, n_max).collect()
    }

    from collections import Counter

    def grams(text, n):
        ws = text.split(" ")
        return Counter(
            " ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)
        )

    docs = {d: (lang, text) for d, lang, text in rows}
    expect = {}
    for d, (lang, text) in docs.items():
        c = docs.get(d + 1)
        if c is None or c[0] != lang:
            continue
        for n in range(1, n_max + 1):
            gr, gc = grams(text, n), grams(c[1], n)
            expect[(d, n)] = (
                max(len(text.split(" ")) - n + 1, 0),
                max(len(c[1].split(" ")) - n + 1, 0),
                sum(min(k, gc[g]) for g, k in gr.items() if g in gc),
            )
    assert got == expect
