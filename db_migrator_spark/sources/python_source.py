"""Custom Python DataSource (Spark 4 API): partitioned deterministic rows.

The modern pure-Python answer to the reference's Extractor seam
(/root/reference/src/extract/extractor.rs:96-128 — a hand-rolled row
stream): ``spark.dataSource.register`` plugs a user source into the
DataFrame reader with real partition parallelism — each InputPartition
is read by a separate task, so a custom feed (an internal API, a
proprietary format, a synthetic generator) scales out like any file
source instead of funneling through the driver.

``SeqSource`` generates a deterministic keyed sequence (id, md5(id),
id%buckets) across N partitions — the simplest source whose output an
independent engine can reproduce exactly, which is what makes it
oracle-checkable: the DuckDB twin rebuilds the same rows from
generate_series. The PARTITIONING, not the data, is what's under test:
rows must come back identical no matter how many tasks produced them.

UDF-speed caveat applies (per-row Python): production sources should
implement the Arrow batch reader path; this module pins the API surface
and partition semantics.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SEQ_N = 10_000
SEQ_PARTS = 8
SEQ_BUCKETS = 7


class _SeqPartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class _SeqReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", SEQ_N))
        self.parts = int(options.get("partitions", SEQ_PARTS))

    def partitions(self):
        step = (self.n + self.parts - 1) // self.parts
        return [
            _SeqPartition(i, min(i + step, self.n)) for i in range(0, self.n, step)
        ]

    def read(self, partition: _SeqPartition):
        for i in range(partition.start, partition.end):
            yield (i, hashlib.md5(str(i).encode()).hexdigest(), i % SEQ_BUCKETS)


class SeqSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "seq_source"

    def schema(self) -> str:
        return "id bigint, id_md5 string, bucket int"

    def reader(self, schema) -> DataSourceReader:
        return _SeqReader(self.options)


def q_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract entry: read the custom Python source (8 parallel
    partitions), then aggregate per bucket — proving rows survive the
    task-parallel read identically to the single-threaded oracle."""
    try:
        spark.dataSource.register(SeqSource)
    except Exception:
        pass  # already registered in this session
    df = spark.read.format("seq_source").option("n", str(SEQ_N)).load()
    return (
        df.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("id").cast("long").alias("id_sum"),
            F.min("id_md5").alias("min_md5"),
            F.max("id_md5").alias("max_md5"),
        )
        .orderBy("bucket")
    )


QUERIES = {"q_python_datasource": q_python_datasource}

ORACLES = {
    "q_python_datasource": f"""
        WITH s AS (SELECT i AS id, md5(CAST(i AS VARCHAR)) AS id_md5,
                          CAST(i % {SEQ_BUCKETS} AS INT) AS bucket
                   FROM range({SEQ_N}) t(i))
        SELECT bucket, COUNT(*) AS n_rows,
               CAST(SUM(id) AS BIGINT) AS id_sum,
               MIN(id_md5) AS min_md5, MAX(id_md5) AS max_md5
        FROM s GROUP BY bucket ORDER BY bucket
    """,
}
