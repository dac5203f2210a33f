"""Quality operators: z-score flags and distributed exact median."""

from db_migrator_spark.io import load_table
from db_migrator_spark.operators.quality import (
    events_anomaly_zscore,
    q_exact_median,
)

SF = "/root/testdata/sf0.001"


def test_zscore_flags_are_3sigma(spark):
    rows = events_anomaly_zscore(spark, SF).collect()
    assert rows
    flagged = [r for r in rows if r.is_outlier]
    for r in rows:
        if r.z is not None:
            assert r.is_outlier == (abs(r.z) > 3.0)
    # 3-sigma outliers must be rare
    assert len(flagged) < len(rows) * 0.05


def test_exact_median_matches_sorted_selection(spark):
    row = q_exact_median(spark, SF).collect()[0]
    vals = sorted(
        r.o_totalprice
        for r in load_table(spark, SF, "orders").select("o_totalprice").collect()
    )
    k = (len(vals) + 1) // 2
    assert row.n_rows == len(vals)
    assert row.median_price == vals[k - 1]
