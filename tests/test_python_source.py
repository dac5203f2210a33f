"""Custom Python DataSource: batch/stream parity and partition counts."""

from db_migrator_spark.sources.python_source import (
    SEQ_BUCKETS,
    SEQ_N,
    q_python_datasource,
    streaming_python_datasource,
)


def test_batch_and_stream_reads_agree(spark):
    batch = {tuple(r) for r in q_python_datasource(spark, "unused").collect()}
    stream = {tuple(r) for r in streaming_python_datasource(spark, "unused").collect()}
    assert batch == stream
    assert len(batch) == SEQ_BUCKETS
    assert sum(r[1] for r in batch) == SEQ_N
