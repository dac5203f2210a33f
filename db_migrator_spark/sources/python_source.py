"""Custom Python DataSource (Spark 4 API): partitioned deterministic rows,
as a batch source AND a micro-batch stream source.

The modern pure-Python answer to the reference's Extractor seam
(/root/reference/src/extract/extractor.rs:96-128 — a hand-rolled row
stream): ``spark.dataSource.register`` plugs a user source into the
DataFrame reader with real partition parallelism — each InputPartition
is read by a separate task, so a custom feed (an internal API, a
proprietary format, a synthetic generator) scales out like any file
source instead of funneling through the driver.

``SeqSource`` generates a deterministic keyed sequence (id, md5(id),
id%buckets): the simplest source whose output an independent engine can
reproduce exactly, which is what makes it oracle-checkable — the DuckDB
twin rebuilds the same rows from generate_series. The PARTITIONING /
BATCHING, not the data, is what's under test: rows must come back
identical no matter how many tasks or micro-batches produced them.

The classes are defined INSIDE a factory (``_make_seq_source``) so
cloudpickle serializes them BY VALUE: Python data sources are planned in
helper Python processes that do not have this package on sys.path (the
addPyFile shipping that covers pandas_udf workers does not reach the
data-source planner), so a module-level class would die with
ModuleNotFoundError there.

UDF-speed caveat applies (per-row Python): production sources should
implement the Arrow batch reader path; this module pins the API surface
and partition/offset semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

SEQ_N = 10_000
SEQ_PARTS = 8
SEQ_BUCKETS = 7
STREAM_STEP = 2_500  # ids per micro-batch in the streaming reader


def _make_seq_source():
    import hashlib

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    seq_n, seq_parts, buckets, step_default = SEQ_N, SEQ_PARTS, SEQ_BUCKETS, STREAM_STEP

    def _rows(start: int, end: int):
        return [
            (i, hashlib.md5(str(i).encode()).hexdigest(), i % buckets)
            for i in range(start, end)
        ]

    class _SeqPartition(InputPartition):
        def __init__(self, start: int, end: int) -> None:
            self.start = start
            self.end = end

    class _SeqReader(DataSourceReader):
        def __init__(self, options: dict) -> None:
            self.n = int(options.get("n", seq_n))
            self.parts = int(options.get("partitions", seq_parts))

        def partitions(self):
            step = (self.n + self.parts - 1) // self.parts
            return [
                _SeqPartition(i, min(i + step, self.n))
                for i in range(0, self.n, step)
            ]

        def read(self, partition):
            return iter(_rows(partition.start, partition.end))

    class _SeqStreamReader:
        """SimpleDataSourceStreamReader: the same sequence as micro-
        batches. Offsets are ``{"i": next_id}``; each batch emits
        ``step`` ids until the cap, then reports no progress — which is
        what lets a bounded ``processAllAvailable`` replay terminate.
        ``readBetweenOffsets`` re-derives any batch deterministically
        from its offset pair: the exactly-once replay contract."""

        def __init__(self, options: dict) -> None:
            self.n = int(options.get("n", seq_n))
            self.step = int(options.get("step", step_default))

        def initialOffset(self):
            return {"i": 0}

        def read(self, start: dict):
            lo = start["i"]
            hi = min(lo + self.step, self.n)
            return iter(_rows(lo, hi)), {"i": hi}

        def readBetweenOffsets(self, start: dict, end: dict):
            return iter(_rows(start["i"], end["i"]))

        def commit(self, end: dict) -> None:
            pass

    class SeqSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "seq_source"

        def schema(self) -> str:
            return "id bigint, id_md5 string, bucket int"

        def reader(self, schema) -> DataSourceReader:
            return _SeqReader(self.options)

        def simpleStreamReader(self, schema):
            return _SeqStreamReader(self.options)

    return SeqSource


def _register(spark: SparkSession) -> None:
    try:
        spark.dataSource.register(_make_seq_source())
    except Exception as exc:
        # Only duplicate registration is benign; a genuine failure
        # (pickling error, API mismatch) must surface HERE, not later as
        # an unrelated "format not found" read error.
        msg = str(exc).lower()
        if "already" not in msg and "exists" not in msg and "registered" not in msg:
            raise


def _seq_agg(df: DataFrame) -> DataFrame:
    return df.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("id").cast("long").alias("id_sum"),
        F.min("id_md5").alias("min_md5"),
        F.max("id_md5").alias("max_md5"),
    )


def q_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract entry: read the custom Python source (8 parallel
    partitions), then aggregate per bucket — proving rows survive the
    task-parallel read identically to the single-threaded oracle."""
    _register(spark)
    df = spark.read.format("seq_source").option("n", str(SEQ_N)).load()
    return _seq_agg(df).orderBy("bucket")


def streaming_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract entry: the SAME source consumed as a STREAM (four
    2500-id micro-batches via SimpleDataSourceStreamReader), complete-mode
    aggregated — must equal the batch read, which is the oracle."""
    from ..streaming.windows import run_bounded

    _register(spark)
    stream = spark.readStream.format("seq_source").option("n", str(SEQ_N)).load()
    return run_bounded(_seq_agg(stream), "complete").orderBy("bucket")


QUERIES = {
    "q_python_datasource": q_python_datasource,
    "streaming_python_datasource": streaming_python_datasource,
}

_SEQ_AGG_SQL = f"""
        WITH s AS (SELECT i AS id, md5(CAST(i AS VARCHAR)) AS id_md5,
                          CAST(i % {SEQ_BUCKETS} AS INT) AS bucket
                   FROM range({SEQ_N}) t(i))
        SELECT bucket, COUNT(*) AS n_rows,
               CAST(SUM(id) AS BIGINT) AS id_sum,
               MIN(id_md5) AS min_md5, MAX(id_md5) AS max_md5
        FROM s GROUP BY bucket ORDER BY bucket
    """

ORACLES = {
    "q_python_datasource": _SEQ_AGG_SQL,
    "streaming_python_datasource": _SEQ_AGG_SQL,
}
