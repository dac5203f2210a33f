"""Deterministic dataset splitting for training pipelines (round 7).

The reference is a 1:1 table copier with no corpus operators (cited for
scope: /root/reference/src/migrate/table_migrator.rs:43-114 is its whole
data path); these supply the split stage every training-data pipeline
runs between curation and training:

- ``corpus_train_split``: leakage-safe train/val/test assignment keyed on
  the CONTENT hash, not the row id — byte-identical documents land in the
  same split by construction (the classic eval-leakage bug is splitting
  by id while duplicates straddle the boundary). A salt constant makes
  the split re-drawable without touching the data.
- ``corpus_split_summary``: per-(split, lang) counts + token totals — the
  audit a 100 TB split job ships with (fractions within tolerance, no
  language collapsed into one side).

Both are engine-exact and fully hash-checked: md5 is bit-identical across
Spark and DuckDB (proven by ``dedup_exact``), and the bucket decision is
a LEXICOGRAPHIC comparison on the hex digest — no hex-to-int conversion,
whose SQL surface differs between engines. The first two hex chars are
uniform over 256 values, so prefix thresholds give exact n/256 fractions:
< 'cd' = 205/256 ~ 80.1% train, < 'e7' = +26/256 ~ 10.2% val, rest
~9.8% test.

Scale notes (100 TB): assignment is a pure projection — one codegen'd
md5 + two string compares per row, zero shuffle, trivially parallel; the
summary is one map-side-combined groupBy on (split, lang) — ~hundreds of
groups regardless of corpus size. Nothing here collects, joins, or sorts
the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table

# Salt folded into the content hash so a pipeline can re-draw independent
# splits (v2, v3, ...) without rewriting data; part of the split contract.
SPLIT_SALT = "split-v1"
# Lexicographic thresholds on the first two hex chars (see module doc).
SPLIT_TRAIN_UPPER = "cd"  # 205/256 ~ 80.1%
SPLIT_VAL_UPPER = "e7"  # +26/256 ~ 10.2%


def _split_col() -> F.Column:
    bucket = F.substring(
        F.md5(F.concat(F.lit(SPLIT_SALT), F.col("text")).cast("binary")), 1, 2
    )
    return (
        F.when(bucket < SPLIT_TRAIN_UPPER, "train")
        .when(bucket < SPLIT_VAL_UPPER, "val")
        .otherwise("test")
    )


def corpus_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document split assignment, leakage-safe by construction:
    the key is md5(salt || text), so byte-identical duplicates always
    co-locate (their hash is equal) and the draw is reproducible from
    the data alone — no RNG, no row order, no partitioning dependence.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            "lang",
            F.md5(F.col("text").cast("binary")).alias("content_hash"),
            _split_col().alias("split"),
        )
        .orderBy("doc_id")
    )


def corpus_split_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split audit: per-(split, lang) document counts and whitespace
    token totals — the numbers a split job asserts before shipping
    (fractions near 80/10/10, every language present on every side
    that has enough mass)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "lang",
            _split_col().alias("split"),
            F.size(F.split(F.col("text"), " ")).alias("n_tok"),
        )
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
        )
        .orderBy("split", "lang")
    )


QUERIES = {
    "corpus_train_split": corpus_train_split,
    "corpus_split_summary": corpus_split_summary,
}

_SPLIT_SQL = f"""
    CASE WHEN substr(md5('{SPLIT_SALT}' || text), 1, 2) < '{SPLIT_TRAIN_UPPER}'
             THEN 'train'
         WHEN substr(md5('{SPLIT_SALT}' || text), 1, 2) < '{SPLIT_VAL_UPPER}'
             THEN 'val'
         ELSE 'test' END
"""

ORACLES = {
    "corpus_train_split": f"""
        SELECT doc_id, lang, md5(text) AS content_hash,
               {_SPLIT_SQL} AS split
        FROM documents
        ORDER BY doc_id
    """,
    "corpus_split_summary": f"""
        SELECT {_SPLIT_SQL} AS split, lang,
               COUNT(*) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents
        GROUP BY 1, 2
        ORDER BY split, lang
    """,
}
