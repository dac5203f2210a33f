"""Readability scoring (round 8).

The reference has no text surface (scope:
/root/reference/src/migrate/table_migrator.rs:43-114); this extends the
text-analysis family (stats, lang-id, quality, tokens, Gopher/C4) with
the standard readability grade a corpus-quality pipeline bins documents
by.

Coleman-Liau is chosen over Flesch precisely because it needs NO
syllable counting and NO logarithms: CLI = 0.0588*L - 0.296*S - 15.8
with L = letters per 100 words and S = sentences per 100 words — a
single rational function of three counts, so the whole metric is exact
integer micros: cli_micro = (5880000*letters - 29600000*sents
- 15800000*words) div words. Both engines truncate integer division
identically (Spark `div` == DuckDB `//`, verified on negatives in
tests/test_exact_primitives.py), so even negative grades (degenerate
docs) hash-match.

Scale notes (100 TB): pure per-row column expressions (length /
translate / split) — whole-stage codegen, zero shuffle for the per-doc
scores; the grade histogram is one map-side-combined groupBy with
bucket-count output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table

# Coleman-Liau coefficients scaled to micros (0.0588*100, 0.296*100,
# 15.8 — exact decimal literals, no floats anywhere).
CLI_L_MICRO = 5_880_000
CLI_S_MICRO = 29_600_000
CLI_C_MICRO = 15_800_000


def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Coleman-Liau readability: letter/word/sentence
    counts, the exact micro grade, and the whole-grade band (clamped to
    [0, 20], the conventional dashboard range)."""
    docs = load_table(spark, sf_dir, "documents")
    letters = F.length(F.translate(F.col("text"), " .,!?;:'\"", ""))
    words = F.size(F.split(F.col("text"), " "))
    sents = F.greatest(
        F.lit(1),
        F.length(F.col("text"))
        - F.length(F.translate(F.col("text"), ".!?", "")),
    )
    base = docs.select(
        "doc_id",
        letters.cast("bigint").alias("n_letters"),
        words.cast("bigint").alias("n_words"),
        sents.cast("bigint").alias("n_sentences"),
    )
    scored = base.select(
        "*",
        F.expr(
            f"({CLI_L_MICRO} * n_letters - {CLI_S_MICRO} * n_sentences"
            f" - {CLI_C_MICRO} * n_words) div n_words"
        ).alias("cli_micro"),
    )
    return scored.select(
        "*",
        F.greatest(
            F.lit(0).cast("bigint"),
            F.least(
                F.lit(20).cast("bigint"), F.expr("cli_micro div 1000000")
            ),
        ).alias("grade_band"),
    ).orderBy("doc_id")


QUERIES = {"text_readability": text_readability}

ORACLES = {
    "text_readability": f"""
        WITH base AS (
            SELECT doc_id,
                   CAST(len(translate(text, ' .,!?;:''"', '')) AS BIGINT)
                       AS n_letters,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
                   CAST(GREATEST(1, len(text) - len(translate(text, '.!?', '')))
                        AS BIGINT) AS n_sentences
            FROM documents)
        SELECT doc_id, n_letters, n_words, n_sentences,
               ({CLI_L_MICRO} * n_letters - {CLI_S_MICRO} * n_sentences
                - {CLI_C_MICRO} * n_words) // n_words AS cli_micro,
               GREATEST(CAST(0 AS BIGINT), LEAST(CAST(20 AS BIGINT),
                   (({CLI_L_MICRO} * n_letters - {CLI_S_MICRO} * n_sentences
                     - {CLI_C_MICRO} * n_words) // n_words) // 1000000))
                   AS grade_band
        FROM base
        ORDER BY doc_id
    """,
}
