"""Z-order layout: Morton math, rectangle bucket covers, real pruning."""

from pyspark.sql import functions as F

from db_migrator_spark.operators.zorder import (
    BUCKET_SHIFT,
    Z_BITS,
    _interleave_py,
    buckets_for_rect,
    q_zorder_index,
)

SF = "/root/testdata/sf0.01"


def test_z_value_matches_python_reference(spark):
    rows = q_zorder_index(spark, SF).limit(500).collect()
    for r in rows:
        assert r.z == _interleave_py(r.u_key, r.h_key)
        assert r.z_bucket == r.z >> BUCKET_SHIFT


def test_bucket_cover_is_correct_and_small(spark):
    # a 2-D rectangle must be fully covered by its bucket set, and the
    # set must be much smaller than the full bucket space (the pruning win)
    rows = q_zorder_index(spark, SF).collect()
    u_lo, u_hi, h_lo, h_hi = 16, 47, 8, 23
    cover = set(buckets_for_rect(u_lo, u_hi, h_lo, h_hi))
    n_buckets_total = 1 << (2 * Z_BITS - BUCKET_SHIFT)
    assert len(cover) < n_buckets_total / 4
    for r in rows:
        if u_lo <= r.u_key <= u_hi and h_lo <= r.h_key <= h_hi:
            assert r.z_bucket in cover, (r.u_key, r.h_key, r.z_bucket)


def test_partition_pruning_on_zorder_layout(spark, tmp_path):
    """Writing partitionBy(z_bucket) and filtering with the rectangle's
    bucket cover must (a) return exactly the rows the raw predicate
    returns and (b) show partition pruning in the scan."""
    out = str(tmp_path / "zorder")
    idx = q_zorder_index(spark, SF)
    idx.write.partitionBy("z_bucket").parquet(out)

    u_lo, u_hi, h_lo, h_hi = 16, 47, 8, 23
    cover = buckets_for_rect(u_lo, u_hi, h_lo, h_hi)
    laid = spark.read.parquet(out)
    rect = (
        (F.col("u_key") >= u_lo) & (F.col("u_key") <= u_hi)
        & (F.col("h_key") >= h_lo) & (F.col("h_key") <= h_hi)
    )
    pruned = laid.filter(F.col("z_bucket").isin(cover)).filter(rect)
    direct = laid.filter(rect)
    assert sorted(r.event_id for r in pruned.collect()) == sorted(
        r.event_id for r in direct.collect()
    )
    # the pruned plan carries the bucket cover as a PARTITION filter —
    # evaluated against directory names at planning, so every other
    # z_bucket=N directory is never opened
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "z_bucket" in plan.split(
        "PartitionFilters", 1
    )[1].splitlines()[0]
