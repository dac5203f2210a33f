"""Python UDTF surface (PySpark 4): table-valued per-row expansion.

Completes the Python-execution API inventory alongside pandas_udf
(similarity.py), applyInPandas (grouped.py), mapInPandas (multimodal.py)
and applyInPandasWithState (streaming/windows.py): a user-defined TABLE
function invoked via LATERAL, yielding multiple rows per input row.

``text_word_chunks_udtf`` splits each document into fixed-width word
chunks — the tokenize-and-window step of retrieval/embedding prep — and
is deliberately oracle-twinned so the driver hash-match proves the UDTF
path end-to-end (serialization, LATERAL correlation, Arrow transfer).

UDTFs are the SLOW path: per-row Python with pickled state. The
production chunker stays ``text_chunk_documents`` (corpus.py — pure
codegen explode, no Python). This operator exists because the API
surface itself is part of the engine contract: when a user's expansion
logic genuinely can't be expressed as generators + array lambdas
(stateful tokenizers, sentencepiece, custom parsers), this is the shape
it runs as, with ``useArrow=True`` batching the transfer.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import fan_out, load_table

CHUNK_WORDS = 20


class _WordChunks:
    """Yield (chunk_id, n_words, md5(chunk)) per CHUNK_WORDS-word window."""

    def eval(self, text: str):  # noqa: D102 — UDTF contract method
        words = (text or "").split(" ")
        for ci, start in enumerate(range(0, len(words), CHUNK_WORDS)):
            seg = words[start : start + CHUNK_WORDS]
            joined = " ".join(seg)
            yield ci, len(seg), hashlib.md5(joined.encode("utf-8")).hexdigest()


def text_word_chunks_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract entry: LATERAL word-chunk expansion via Python UDTF."""
    from pyspark.sql.functions import udtf

    chunker = udtf(
        _WordChunks,
        returnType="chunk_id bigint, n_words int, chunk_digest string",
        useArrow=True,
    )
    spark.udtf.register("word_chunks_udtf", chunker)
    import uuid

    # fan_out: the per-row Python UDTF fuses into the scan stage, which
    # has as many tasks as the parquet has file splits (2 at sf1 — 5s/task
    # while 30 cores idle, measured r15); spreading the narrow projection
    # to defaultParallelism bounds the Python wall by cores, not splits.
    docs = fan_out(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        "doc_id",
    )
    # unique view name: concurrent driver harnesses share one session
    view = f"__udtf_docs_src_{uuid.uuid4().hex[:8]}"
    docs.createOrReplaceTempView(view)
    out = spark.sql(
        f"""
        SELECT d.doc_id, c.chunk_id, c.n_words, c.chunk_digest
        FROM {view} AS d, LATERAL word_chunks_udtf(d.text) AS c
        """
    ).orderBy("doc_id", "chunk_id")
    return out


QUERIES = {
    "text_word_chunks_udtf": text_word_chunks_udtf,
}

ORACLES = {
    # DuckDB list slices are 1-based inclusive; range(0, n) excludes n.
    # ''.split(' ') == [''] in Python and string_split('', ' ') == ['']
    # in DuckDB, so the empty-text edge produces one empty chunk in both.
    "text_word_chunks_udtf": f"""
        WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             ex AS (SELECT doc_id, w,
                           unnest(range(0, CAST(ceil(len(w) / {CHUNK_WORDS}.0) AS BIGINT))) AS ci
                    FROM words)
        SELECT doc_id, ci AS chunk_id,
               CAST(len(w[ci * {CHUNK_WORDS} + 1 : ci * {CHUNK_WORDS} + {CHUNK_WORDS}]) AS INT)
                   AS n_words,
               md5(array_to_string(
                   w[ci * {CHUNK_WORDS} + 1 : ci * {CHUNK_WORDS} + {CHUNK_WORDS}], ' '))
                   AS chunk_digest
        FROM ex
        ORDER BY doc_id, chunk_id
    """,
}


# Polymorphic UDTF: output schema resolved by a static analyze() from
# the call-site LITERAL — the Spark 4 table-function contract the
# word-chunk UDTF (fixed returnType) doesn't exercise. TopWords(text,
# k) emits each document's top-k words; k arrives as a literal, is
# validated in analyze(), and parameterizes the plan-time schema
# (rank column width is k-independent here, but the validation +
# AnalyzeResult path is the point being pinned).
TOPWORDS_K = 3


def _make_top_words_udtf():
    from pyspark.sql.functions import AnalyzeArgument, AnalyzeResult, udtf
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    class TopWords:
        @staticmethod
        def analyze(text: AnalyzeArgument, k: AnalyzeArgument) -> AnalyzeResult:
            if k.value is None or not isinstance(k.value, int) or k.value < 1:
                raise ValueError("k must be a positive integer literal")
            return AnalyzeResult(
                StructType(
                    [
                        StructField("rank", IntegerType()),
                        StructField("word", StringType()),
                        StructField("cnt", LongType()),
                    ]
                )
            )

        def eval(self, text: str, k: int):
            from collections import Counter

            words = [w for w in (text or "").split(" ") if w]
            # deterministic tiebreak: count desc, then word asc
            top = sorted(
                Counter(words).items(), key=lambda wc: (-wc[1], wc[0])
            )[:k]
            for rank, (word, cnt) in enumerate(top, start=1):
                yield rank, word, cnt

    return udtf(TopWords, useArrow=False)


def text_top_words_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract entry: per-document top-K words via a
    POLYMORPHIC UDTF (static analyze() resolves the schema and
    validates the k literal at plan time — module comment)."""
    import uuid

    spark.udtf.register("top_words_udtf", _make_top_words_udtf())
    # fan_out ahead of the per-row Python stage — same reasoning as
    # text_word_chunks_udtf above.
    docs = fan_out(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        "doc_id",
    )
    view = f"__udtf_topw_src_{uuid.uuid4().hex[:8]}"
    docs.createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT d.doc_id, t.rank, t.word, t.cnt
        FROM {view} AS d,
             LATERAL top_words_udtf(d.text, {TOPWORDS_K}) AS t
        """
    ).orderBy("doc_id", "rank")


QUERIES["text_top_words_udtf"] = text_top_words_udtf

ORACLES["text_top_words_udtf"] = f"""
    WITH words AS (
        SELECT doc_id, w
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents)
        WHERE w != ''),
    counts AS (
        SELECT doc_id, w AS word, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM words GROUP BY 1, 2),
    ranked AS (
        SELECT doc_id, word, cnt,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY cnt DESC, word) AS rank
        FROM counts)
    SELECT doc_id, CAST(rank AS INTEGER) AS rank, word, cnt
    FROM ranked
    WHERE rank <= {TOPWORDS_K}
    ORDER BY doc_id, rank
"""
