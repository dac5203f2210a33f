"""The Monday-aligned integer week index must agree across engines on
EVERY post-1970 day — including 1970-01-01..04, where the round-9 form
had a negative dividend (Spark div truncated to 0, DuckDB // floored to
-1; ADVICE r9). Pins the offset form on both engines against Python's
true floor reference."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F


def test_week_index_matches_floor_on_edge_days(spark):
    days = list(range(0, 30)) + [19000, 19001, 19723]
    # reference: true Monday week via floor((day - 4) / 7)
    want = {d: (d - 4) // 7 for d in days}

    got_spark = {
        r.d: r.wk
        for r in spark.createDataFrame([(d,) for d in days], "d long")
        .select("d", F.expr("(d + 3) div 7 - 1").alias("wk"))
        .collect()
    }
    assert got_spark == want

    con = duckdb.connect()
    got_duck = dict(
        con.execute(
            "SELECT d, (d + 3) // 7 - 1 FROM (SELECT UNNEST(?) AS d)",
            [days],
        ).fetchall()
    )
    con.close()
    assert got_duck == want

    # day 0-3 land in week -1 (the prior Monday's week), day 4 opens week 0
    assert [want[d] for d in range(0, 8)] == [-1, -1, -1, -1, 0, 0, 0, 0]
