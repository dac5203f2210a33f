"""foreachBatch exactly-once sink + stream-static enrichment."""

import os

import pyspark.sql.functions as F

from db_migrator_spark.streaming.sinks import (
    enrich_with_dimension,
    start_exactly_once_parquet_sink,
)
from db_migrator_spark.streaming.windows import stream_events

SF = "/root/testdata/sf0.001"


def test_exactly_once_sink_idempotent_on_replay(spark, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ev = stream_events(spark, f"{SF}/events.parquet")
    q = start_exactly_once_parquet_sink(ev.select("event_id", "user_id", "value"), out, ckpt)
    q.processAllAvailable()
    q.stop()

    first = spark.read.parquet(out)
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    assert first.count() == n_events

    # simulate a restart replay: re-run batch 0's write directly
    batch0 = first.filter(F.col("batch_id") == 0).drop("batch_id")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (batch0.withColumn("batch_id", F.lit(0))
        .write.mode("overwrite").partitionBy("batch_id").parquet(out))
    assert spark.read.parquet(out).count() == n_events  # no duplication
    assert {d for d in os.listdir(out) if d.startswith("batch_id=")} >= {"batch_id=0"}


def test_stream_static_enrichment(spark, tmp_path):
    from db_migrator_spark.io import load_table
    from db_migrator_spark.streaming.windows import run_bounded

    ev = stream_events(spark, f"{SF}/events.parquet")
    cust = load_table(spark, SF, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    enriched = enrich_with_dimension(ev, cust, "user_id")
    got = run_bounded(
        enriched.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n")), "complete"
    )
    want = (
        load_table(spark, SF, "events")
        .join(cust, "user_id", "left")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_checkpoint_restart_resumes_without_reprocessing(spark, tmp_path):
    """A restarted query on the SAME checkpoint resumes from recorded
    offsets: the pre-restart file is not reprocessed, the new file is,
    and the sink holds exactly one copy of each."""
    import shutil
    import time

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    shutil.copy(f"{SF}/events.parquet", os.path.join(src, "a.parquet"))

    ev = stream_events(spark, src)
    q = start_exactly_once_parquet_sink(
        ev.select("event_id", "user_id", "value"), out, ckpt
    )
    q.processAllAvailable()
    q.stop()
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    assert spark.read.parquet(out).count() == n_events

    time.sleep(1.1)  # distinct mtime so the file source sees a new file
    shutil.copy(f"{SF}/events.parquet", os.path.join(src, "b.parquet"))
    ev2 = stream_events(spark, src)
    q2 = start_exactly_once_parquet_sink(
        ev2.select("event_id", "user_id", "value"), out, ckpt
    )
    q2.processAllAvailable()
    q2.stop()

    final = spark.read.parquet(out)
    # both files exactly once: batch 0 was NOT re-emitted on restart
    assert final.count() == 2 * n_events
    batch_ids = {r.batch_id for r in final.select("batch_id").distinct().collect()}
    assert len(batch_ids) >= 2
    per_event = final.groupBy("event_id").count().collect()
    assert all(r["count"] == 2 for r in per_event)  # one per file, not more
