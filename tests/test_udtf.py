"""Python UDTF surface: LATERAL word chunking (udtf_ops.py)."""

import hashlib

from db_migrator_spark.operators.udtf_ops import CHUNK_WORDS, text_word_chunks_udtf

SF = "/root/testdata/sf0.001"


def test_word_chunks_udtf_matches_python_reference(spark):
    from db_migrator_spark.io import load_table

    out = text_word_chunks_udtf(spark, SF).collect()
    docs = {r.doc_id: r.text for r in load_table(spark, SF, "documents").collect()}

    got: dict[int, list] = {}
    for r in out:
        got.setdefault(r.doc_id, []).append(r)

    assert set(got) == set(docs)
    for doc_id, rows in got.items():
        rows.sort(key=lambda r: r.chunk_id)
        words = docs[doc_id].split(" ")
        expect = [
            words[s : s + CHUNK_WORDS] for s in range(0, len(words), CHUNK_WORDS)
        ]
        assert [r.chunk_id for r in rows] == list(range(len(expect)))
        for r, seg in zip(rows, expect):
            assert r.n_words == len(seg)
            assert r.chunk_digest == hashlib.md5(" ".join(seg).encode()).hexdigest()
