"""Sketch accuracy bounds: HLL distinct estimates and CMS overcounts."""

from pyspark.sql import functions as F

from db_migrator_spark.io import load_table
from db_migrator_spark.operators.sketches import (
    q_cms_heavy_hitters,
    q_hll_distinct_by_type,
)

SF = "/root/testdata/sf0.01"


def test_hll_estimates_close_to_exact(spark):
    est = {r.event_type: r.n_users_est for r in q_hll_distinct_by_type(spark, SF).collect()}
    ev = load_table(spark, SF, "events")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact["__ALL__"] = ev.select("user_id").distinct().count()
    assert set(est) == set(exact)
    for k, e in exact.items():
        assert abs(est[k] - e) / e < 0.05, (k, est[k], e)


def test_hll_union_merges_not_sums(spark):
    # users appear under many event types: the merged row must be far
    # below the per-type sum (double counting) and >= the per-type max.
    rows = {r.event_type: r.n_users_est for r in q_hll_distinct_by_type(spark, SF).collect()}
    merged = rows.pop("__ALL__")
    assert merged < sum(rows.values())
    assert merged >= max(rows.values()) * 0.95


def test_cms_never_undercounts(spark):
    rows = q_cms_heavy_hitters(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_cms >= r.n_exact
        # eps=1e-4 over a ~500k-token stream allows ~tens of overcount
        assert r.n_cms - r.n_exact <= 0.001 * 1_000_000


def test_hll_intersection_inclusion_exclusion_bounds(spark):
    """Contract (docs/OPERATORS.md): per event-type pair, the
    inclusion-exclusion estimate deviates from the exact intersection
    by at most 10% of the UNION size (the scale IE error lives on),
    and every union estimate is within 5% of the exact union."""
    from db_migrator_spark.io import load_table
    from db_migrator_spark.operators.sketches import q_hll_intersection

    sf = "/root/testdata/sf0.01"
    rows = q_hll_intersection(spark, sf).collect()
    assert len(rows) >= 3
    ut = (
        load_table(spark, sf, "events")
        .select("user_id", "event_type")
        .distinct()
        .collect()
    )
    by_type = {}
    for r in ut:
        by_type.setdefault(r.event_type, set()).add(r.user_id)
    for r in rows:
        exact_union = len(by_type[r.type_a] | by_type[r.type_b])
        exact_int = len(by_type[r.type_a] & by_type[r.type_b])
        assert r.exact_intersection == exact_int
        assert abs(r.est_union - exact_union) <= 0.05 * exact_union
        assert abs(r.est_intersection - exact_int) <= 0.10 * exact_union
        assert r.est_intersection >= 0
