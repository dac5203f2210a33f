"""foreachBatch exactly-once sink: batch replays must not double-count,
and the compacted stream result must equal the all-at-once batch result."""

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.01"


def test_stream_equals_batch(spark):
    from db_migrator_spark.io import load_table
    from db_migrator_spark.streaming.foreach_batch import streaming_foreachbatch_totals

    got = {
        r.event_type: (r.n, r.total_value)
        for r in streaming_foreachbatch_totals(spark, SF).collect()
    }
    want = {
        r.event_type: (r.n, r.total_value)
        for r in (
            load_table(spark, SF, "events")
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("total_value"),
            )
        ).collect()
    }
    assert got == want


def test_batch_replay_is_idempotent(spark, tmp_path):
    from db_migrator_spark.streaming.foreach_batch import (
        compact_partials,
        write_batch_partial,
    )

    sink = str(tmp_path / "sink")
    b0 = spark.createDataFrame(
        [("click", 1.0), ("view", 2.0), ("click", 3.0)], "event_type string, value double"
    )
    b1 = spark.createDataFrame([("view", 5.0)], "event_type string, value double")
    write_batch_partial(b0, 0, sink)
    write_batch_partial(b1, 1, sink)
    once = sorted(compact_partials(spark, sink).collect())
    # at-least-once delivery: batch 0 is replayed (e.g. after a sink
    # failure) — the overwrite must replace, not append
    write_batch_partial(b0, 0, sink)
    twice = sorted(compact_partials(spark, sink).collect())
    assert once == twice
    assert [(r.event_type, r.n, r.total_value) for r in once] == [
        ("click", 2, 4.0),
        ("view", 2, 7.0),
    ]
