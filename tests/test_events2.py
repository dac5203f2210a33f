"""Planted-scenario tests for the temporal overlap join and linear
interpolation (events2)."""

from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.parquet as pq


def _write_events(tmp_path, rows):
    """rows: list of (event_id, ts, user_id, value)."""
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["click"] * len(rows), pa.string()),
            "value": pa.array([float(r[3]) for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))


def _ts(h, m=0, s=0):
    return datetime(2024, 1, 1, h, m, s)


def test_overlap_sessions_planted(spark, tmp_path):
    """Two users whose padded sessions overlap by a known amount produce
    exactly one pair with that duration; a third user hours away pairs
    with nobody."""
    from db_migrator_spark.operators.events2 import events_overlap_sessions

    rows = [
        # user 0: events 10:00-10:10 -> padded session 09:30-10:40
        (1, _ts(10, 0), 0, 1.0),
        (2, _ts(10, 10), 0, 1.0),
        # user 1: events 10:30-10:45 -> padded 10:00-11:15;
        # overlap with user 0 = 10:00..10:40 = 2400 s
        (3, _ts(10, 30), 1, 1.0),
        (4, _ts(10, 45), 1, 1.0),
        # user 2: far away (18:00) -> padded 17:30-18:30, no overlap
        (5, _ts(18, 0), 2, 1.0),
    ]
    _write_events(tmp_path, rows)
    got = events_overlap_sessions(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.u1, r.u2) == (0, 1)
    assert abs(r.overlap_sec - 2400.0) < 1e-9


def test_overlap_sessions_spanning_many_hours_dedups(spark, tmp_path):
    """A pair overlapping across several hour chunks appears once, not
    once per shared chunk."""
    from db_migrator_spark.operators.events2 import events_overlap_sessions

    rows = [
        # events every 20 min (< the 30-min gap) keep ONE session each:
        # user 0 at 10:00..11:20, user 1 at 10:30..11:50
        *[(i, _ts(10 + (i * 20) // 60, (i * 20) % 60), 0, 1.0) for i in range(5)],
        *[(10 + i, _ts(10 + (30 + i * 20) // 60, (30 + i * 20) % 60), 1, 1.0) for i in range(5)],
    ]
    _write_events(tmp_path, rows)
    got = events_overlap_sessions(spark, str(tmp_path)).collect()
    assert len(got) == 1
    # padded: user0 09:30-11:50, user1 10:00-12:20 -> overlap 10:00-11:50
    assert abs(got[0].overlap_sec - (1 * 3600 + 50 * 60)) < 1e-9


def test_interpolate_linear_planted(spark, tmp_path):
    """Observations value=0 at hour 10 and value=8 at hour 14 interpolate
    the gap hours to 2, 4, 6; observed hours keep their exact value."""
    from db_migrator_spark.operators.events2 import events_interpolate_linear

    rows = [(1, _ts(10, 0), 0, 0.0), (2, _ts(14, 0), 0, 8.0)]
    _write_events(tmp_path, rows)
    got = {r.epoch_hour: r for r in events_interpolate_linear(spark, str(tmp_path)).collect()}
    assert len(got) == 5
    hours = sorted(got)
    vals = [got[h].value_interp for h in hours]
    assert vals == [0.0, 2.0, 4.0, 6.0, 8.0]
    gaps = [got[h].was_gap for h in hours]
    assert gaps == [False, True, True, True, False]
