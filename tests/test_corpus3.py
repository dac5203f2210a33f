"""Semantics of the round-5 corpus-assembly operators (corpus3.py)."""

import pytest

from db_migrator_spark.operators.corpus3 import (
    INCR_BATCH_MOD,
    N_SHARDS,
    NGRAM_VOCAB_K,
    dedup_incremental_batch,
    dedup_keep_best,
    embedding_norm_outliers,
    q_shuffle_shards,
    text_ngram_vocab,
)

SF = "/root/testdata/sf0.001"


def test_ngram_vocab_topk_and_bounds(spark):
    rows = text_ngram_vocab(spark, SF).collect()
    assert 0 < len(rows) <= NGRAM_VOCAB_K
    counts = [r.n_occurrences for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert 1 <= r.n_docs <= r.n_occurrences
        assert len(r.ngram.split(" ")) == 2


def test_incremental_batch_survivors_disjoint_from_index(spark):
    from pyspark.sql import functions as F

    from db_migrator_spark.io import load_table

    out = dedup_incremental_batch(spark, SF)
    survivors = {r.content_hash for r in out.collect()}
    docs = load_table(spark, SF, "documents")
    idx_hashes = {
        r.h
        for r in docs.filter(
            (F.col("doc_id") % INCR_BATCH_MOD) != (INCR_BATCH_MOD - 1)
        )
        .select(F.md5(F.col("text").cast("binary")).alias("h"))
        .distinct()
        .collect()
    }
    assert survivors and not (survivors & idx_hashes)
    # every survivor doc_id really belongs to the new batch
    for r in out.collect():
        assert r.doc_id % INCR_BATCH_MOD == INCR_BATCH_MOD - 1


def test_shuffle_shards_is_permutation(spark):
    from db_migrator_spark.io import load_table

    rows = q_shuffle_shards(spark, SF).collect()
    n_docs = load_table(spark, SF, "documents").count()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        assert 0 <= r.shard < N_SHARDS
        by_shard.setdefault(r.shard, []).append(r.pos)
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))


def test_shuffle_shards_deterministic(spark):
    a = [(r.doc_id, r.shard, r.pos) for r in q_shuffle_shards(spark, SF).collect()]
    b = [(r.doc_id, r.shard, r.pos) for r in q_shuffle_shards(spark, SF).collect()]
    assert a == b


def test_norm_outliers_flags_consistent(spark):
    rows = embedding_norm_outliers(spark, SF).collect()
    assert rows
    mean_q = sum(r.norm_q for r in rows) / len(rows)
    for r in rows:
        assert not (r.is_high and r.is_low)
        assert r.is_high == (r.norm_q > 2 * mean_q)
        assert r.is_low == (2 * r.norm_q < mean_q)


def test_keep_best_prefers_english(spark):
    from pyspark.sql import functions as F

    from db_migrator_spark.io import load_table

    docs = load_table(spark, SF, "documents")
    out = {r.content_hash: r for r in dedup_keep_best(spark, SF).collect()}
    by_hash = (
        docs.select(
            F.md5(F.col("text").cast("binary")).alias("h"), "doc_id", "lang"
        )
        .collect()
    )
    groups: dict[str, list] = {}
    for r in by_hash:
        groups.setdefault(r.h, []).append(r)
    for h, members in groups.items():
        kept = out[h]
        assert kept.n_copies == len(members)
        en = sorted(m.doc_id for m in members if m.lang == "en")
        expect = en[0] if en else min(m.doc_id for m in members)
        assert kept.keep_doc_id == expect
        assert kept.n_en == len(en)


def test_corpus_build_pipeline_consistency(spark):
    from pyspark.sql import functions as F

    from db_migrator_spark.io import load_table
    from db_migrator_spark.operators.corpus import PACK_BUDGET
    from db_migrator_spark.operators.corpus3 import N_SHARDS, corpus_build_pipeline

    rows = corpus_build_pipeline(spark, SF).collect()
    assert rows
    # sequences are contiguous from 0, shard is seq_id mod N_SHARDS
    assert [r.seq_id for r in rows] == list(range(len(rows)))
    for r in rows:
        assert r.shard == r.seq_id % N_SHARDS
        assert r.first_doc <= r.last_doc
        assert r.n_docs >= 1
    # every sequence except possibly the last starts under budget and the
    # doc count matches the quality+dedup survivor count
    total_docs = sum(r.n_docs for r in rows)
    docs = load_table(spark, SF, "documents")
    w = F.split(F.col("text"), " ")
    nw = F.size(w)
    div = F.size(F.array_distinct(w)).cast("double") / nw
    quality = docs.filter((nw >= 20) & (nw <= 2000) & (div >= 0.08))
    norm = F.lower(F.regexp_replace(F.col("text"), r"\s+", " "))
    n_unique = (
        quality.select(F.md5(norm.cast("binary")).alias("fp")).distinct().count()
    )
    assert total_docs == n_unique
    # token conservation: packed totals equal the survivor token sum exactly
    keep = (
        quality.withColumn("fp", F.md5(norm.cast("binary")))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    survivor_tokens = (
        quality.join(keep, "doc_id", "left_semi")
        .select(F.sum(nw).alias("t"))
        .collect()[0]
        .t
    )
    assert sum(r.total_tokens for r in rows) == survivor_tokens
    # occupancy: every sequence except possibly the last STARTS under budget,
    # so at least (len(rows) - 1) full budgets of tokens exist
    assert survivor_tokens > PACK_BUDGET * (len(rows) - 1)
