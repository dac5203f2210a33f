"""LLM-pipeline operator tests: recall of approximate methods vs exact
ground truth, plus plumbing checks the oracle gate can't express."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def exact_pairs(spark):
    from db_migrator_spark.operators.dedup import dedup_ngram_jaccard

    return {(r.d1, r.d2) for r in dedup_ngram_jaccard(spark, SF).collect()}


def test_minhash_lsh_recall(spark, exact_pairs):
    """MinHash-LSH candidates (est_jaccard >= 0.5) must recover the
    high-similarity exact pairs (jaccard >= 0.2 fixture pairs are ~0.9)."""
    from db_migrator_spark.operators.dedup import dedup_minhash_lsh

    got = {(r.d1, r.d2) for r in dedup_minhash_lsh(spark, SF).collect()}
    assert exact_pairs, "fixture should contain planted near-duplicates"
    recall = len(got & exact_pairs) / len(exact_pairs)
    assert recall >= 0.9, f"minhash recall {recall} too low ({got=} vs {exact_pairs=})"


def test_simhash_covers_near_dups(spark, exact_pairs):
    from db_migrator_spark.operators.dedup import dedup_simhash

    got = {(r.d1, r.d2) for r in dedup_simhash(spark, SF).collect()}
    recall = len(got & exact_pairs) / len(exact_pairs)
    assert recall >= 0.8, f"simhash recall {recall} too low"


def test_similarity_lsh_recall(spark):
    """LSH pair search recall vs the exact cross join at the same
    threshold; the multi-table scheme targets ~50% at cos 0.5."""
    from db_migrator_spark.operators.similarity import _cosine, similarity_lsh_pairs
    from db_migrator_spark.io import load_table

    emb = load_table(spark, SF, "embeddings")
    l, r = emb.alias("l"), emb.alias("r")
    exact = {
        (row.v1, row.v2)
        for row in (
            l.join(r, F.col("l.vec_id") < F.col("r.vec_id"))
            .select(
                F.col("l.vec_id").alias("v1"),
                F.col("r.vec_id").alias("v2"),
                _cosine(F.col("l.embedding"), F.col("r.embedding")).alias("c"),
            )
            .filter(F.col("c") >= 0.4)
            .collect()
        )
    }
    got = {(row.v1, row.v2) for row in similarity_lsh_pairs(spark, SF).collect()}
    assert got <= exact, "LSH must not produce false positives above threshold"
    if exact:
        recall = len(got & exact) / len(exact)
        assert recall >= 0.2, f"LSH recall {recall} implausibly low ({len(exact)} exact pairs)"


def test_frame_sample_shape(spark):
    from db_migrator_spark.operators.multimodal import multimodal_frame_sample

    df = multimodal_frame_sample(spark, SF)
    rows = df.collect()
    per_doc = {}
    for row in rows:
        per_doc.setdefault(row.doc_id, []).append(row.frame_idx)
    # frames are 0..k-1 with 1 <= k <= 3
    for doc, idxs in per_doc.items():
        assert sorted(idxs) == list(range(len(idxs)))
        assert 1 <= len(idxs) <= 3


def test_decode_real_raises_without_pil():
    from db_migrator_spark.operators import multimodal

    if not multimodal.HAVE_PIL:
        with pytest.raises(NotImplementedError):
            multimodal.decode_image_real(b"\x89PNG")
