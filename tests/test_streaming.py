"""Structured Streaming tests: streaming results vs batch twins, watermark
late-data semantics, sessionization, custom stateful operator."""

import os
import time

import pytest
from pyspark.sql import functions as F

from db_migrator_spark.streaming.windows import (
    RAW_SCHEMA,
    run_bounded,
    session_windows,
    stream_events,
    streaming_tumbling_hourly,
    streaming_user_milestones,
    tumbling_with_watermark,
)

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_streaming_tumbling_equals_batch(spark):
    from db_migrator_spark.operators.events import events_tumbling_hourly

    got = {tuple(r) for r in streaming_tumbling_hourly(spark, SF01).collect()}
    want = {tuple(r) for r in events_tumbling_hourly(spark, SF01).collect()}
    assert got == want


def test_streaming_sliding_windows_equal_batch(spark):
    """Sliding-window streaming aggregation (complete mode over the finite
    source) must equal the batch twin exactly."""
    from db_migrator_spark.operators.events import events_sliding_windows
    from pyspark.sql import functions as F

    ev = stream_events(spark, f"{SF01}/events.parquet")
    agg = (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"),
             (F.sum(F.col("value").cast("decimal(25,6)")).cast("double")
              / F.count(F.lit(1))).alias("avg_value"))
        .select(F.col("w.start").alias("w_start"), "n", "avg_value")
    )
    got = {tuple(r) for r in run_bounded(agg, "complete").collect()}
    want = {tuple(r) for r in events_sliding_windows(spark, SF01).collect()}
    assert got == want


def test_watermark_drops_late_events(spark, tmp_path):
    """Append mode with 30-min watermark: windows emit once closed; events
    later than the watermark are dropped."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    H = 3_600_000_000_000  # 1 hour in ns
    names = ["event_id", "ts", "user_id", "event_type", "value", "props"]

    def write_file(name, rows):
        # plain single parquet FILES (the streaming file source does not
        # recurse into Spark-written dataset directories by default)
        cols = list(zip(*rows))
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(cols[0], pa.int64()),
                    "ts": pa.array(cols[1], pa.int64()),
                    "user_id": pa.array(cols[2], pa.int64()),
                    "event_type": pa.array(cols[3], pa.string()),
                    "value": pa.array(cols[4], pa.float64()),
                    "props": pa.array(cols[5], pa.string()),
                }
            ),
            os.path.join(src, name),
        )
        time.sleep(1.1)  # order micro-batches by modification time

    base = 10 * H
    # batch 1: three events in the 10:00 window + one at 12:00 that pushes
    # the watermark to 11:30 (applied from the next batch on)
    write_file(
        "b1.parquet",
        [
            (1, base + 60_000_000_000, 1, "click", 1.0, "{}"),
            (2, base + 120_000_000_000, 1, "click", 1.0, "{}"),
            (3, base + 180_000_000_000, 2, "view", 1.0, "{}"),
            (4, 12 * H, 1, "click", 1.0, "{}"),
        ],
    )
    # batch 2: watermark 11:30 active -> the 10:00 window is evicted and
    # EMITTED during this batch; new event at 14:00 advances it to 13:30
    write_file("b2.parquet", [(5, 14 * H, 2, "view", 1.0, "{}")])
    # batch 3: a too-late event for the (already evicted) 10:00 window —
    # its state is gone and the watermark filter drops it
    write_file(
        "b3.parquet",
        [
            (6, base + 300_000_000_000, 3, "click", 1.0, "{}"),  # dropped
            (7, 16 * H, 2, "view", 1.0, "{}"),
        ],
    )
    # batch 4: flush far in the future so 12:00 and 14:00 windows emit
    write_file("b4.parquet", [(8, 18 * H, 2, "view", 1.0, "{}")])

    ev = stream_events(spark, src)
    out = run_bounded(tumbling_with_watermark(ev), "append")
    rows = {(r.w_start.hour, r.event_type): r.n for r in out.collect()}
    # late event neither re-opened the 10:00 window nor duplicated output
    assert rows == {
        (10, "click"): 2,
        (10, "view"): 1,
        (12, "click"): 1,
        (14, "view"): 1,
        (16, "view"): 1,
    }, rows


def test_session_windows_match_batch_sessionization(spark, tmp_path):
    """Append-mode session windows: once the watermark passes every real
    session (driven by a far-future flush event), the emitted sessions must
    equal the batch gap-sessionization exactly."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from db_migrator_spark.operators.events import events_sessionization

    src = str(tmp_path / "sess_src")
    os.makedirs(src)
    shutil.copy(f"{SF}/events.parquet", os.path.join(src, "a_events.parquet"))
    time.sleep(1.1)
    FLUSH_USER = 10**9
    # The flush file's ts must use the SAME physical type as the fixture
    # file sharing the stream directory (the file source reads one schema).
    fixture_ts = pq.ParquetFile(f"{SF}/events.parquet").schema_arrow.field("ts").type
    if pa.types.is_timestamp(fixture_ts):
        flush_ts = pa.array([4_102_444_800 * 1_000_000], pa.timestamp("us")).cast(fixture_ts)
    else:
        flush_ts = pa.array([4_102_444_800 * 1_000_000_000], pa.int64())  # year 2100, ns
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([999_999], pa.int64()),
                "ts": flush_ts,
                "user_id": pa.array([FLUSH_USER], pa.int64()),
                "event_type": pa.array(["flush"], pa.string()),
                "value": pa.array([0.0], pa.float64()),
                "props": pa.array(["{}"], pa.string()),
            }
        ),
        os.path.join(src, "b_flush.parquet"),
    )

    ev = stream_events(spark, src)
    got = {
        (r.user_id, r.session_start, r.n_events, round(r.total_value, 6))
        for r in run_bounded(session_windows(ev), "append").collect()
        if r.user_id != FLUSH_USER
    }
    want = {
        (r.user_id, r.session_start, r.n_events, round(r.total_value, 6))
        for r in events_sessionization(spark, SF).collect()
    }
    assert got == want


def test_user_milestones_stateful(spark):
    from db_migrator_spark.io import load_table

    out = streaming_user_milestones(spark, SF).collect()
    ev = load_table(spark, SF, "events")
    counts = {r.user_id: r.n for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    per_user = {}
    for r in out:
        per_user.setdefault(r.user_id, []).append(r.milestone)
    for user, n in counts.items():
        expected = n // 10
        got = sorted(per_user.get(user, []))
        assert got == list(range(1, expected + 1)), (user, n, got)


def test_segment_enrichment_stream_batch_parity(spark):
    from db_migrator_spark.io import load_table
    from db_migrator_spark.streaming.joins import streaming_segment_enrichment

    got = {
        (r.c_mktsegment, r.n_events, round(r.total_value, 6))
        for r in streaming_segment_enrichment(spark, SF).collect()
    }
    ev = load_table(spark, SF, "events")
    cust = load_table(spark, SF, "customer")
    want = {
        (r.c_mktsegment, r.n_events, round(r.total_value, 6))
        for r in ev.join(cust, ev.user_id == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("total_value"),
        )
        .collect()
    }
    assert got == want and got
