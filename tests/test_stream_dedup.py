"""Streaming dedup: duplicates within the watermark horizon are dropped
across micro-batches; state is evicted past the horizon."""

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from db_migrator_spark.streaming.windows import dedup_stream, run_bounded, stream_events


def _write(src, name, rows):
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
    time.sleep(1.1)


def test_streaming_dedup_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    M = 60_000_000_000  # 1 minute in ns
    # batch 1: ids 1,2,3 (3 duplicated in-batch)
    _write(src, "b1.parquet", [
        (1, 10 * M, 1, "click", 1.0, "{}"),
        (2, 11 * M, 1, "click", 1.0, "{}"),
        (3, 12 * M, 2, "view", 1.0, "{}"),
        (3, 12 * M, 2, "view", 1.0, "{}"),
    ])
    # batch 2: id 2 again (duplicate within horizon -> dropped), id 4 new
    _write(src, "b2.parquet", [
        (2, 13 * M, 1, "click", 1.0, "{}"),
        (4, 14 * M, 2, "view", 1.0, "{}"),
    ])
    ev = stream_events(spark, src)
    out = run_bounded(dedup_stream(ev), "append")
    ids = sorted(r.event_id for r in out.collect())
    assert ids == [1, 2, 3, 4]
