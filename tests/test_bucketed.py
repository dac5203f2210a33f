"""Bucketed co-located join: correct revenue AND an exchange-free plan."""

import re

from db_migrator_spark.plans import plan_string

SF = "/root/testdata/sf0.01"


def test_bucketed_join_has_no_exchange_or_sort(spark):
    from db_migrator_spark.operators.bucketed import q_bucketed_join_revenue

    df = q_bucketed_join_revenue(spark, SF)
    plan = plan_string(df)
    assert "SortMergeJoin" in plan
    # everything BEFORE the join must be exchange-free (bucketed reads);
    # the only allowed exchange is the final groupBy/orderBy above the join
    join_pos = plan.find("SortMergeJoin")
    pre_join = plan[join_pos:]
    # formatted plan lists nodes bottom-up after the tree; check the tree
    # section instead: no Exchange between scans and the join
    tree = plan[: plan.find("(1) ")]
    join_line = next(i for i, l in enumerate(tree.splitlines()) if "SortMergeJoin" in l)
    below = "\n".join(tree.splitlines()[join_line:])
    assert "Exchange" not in below, below


def test_bucketed_join_matches_plain_join(spark):
    import pyspark.sql.functions as F

    from db_migrator_spark.io import load_table
    from db_migrator_spark.operators.bucketed import q_bucketed_join_revenue
    from db_migrator_spark.operators.relational import _revenue_dec

    got = {
        r.o_orderpriority: (r.revenue, r.n_items)
        for r in q_bucketed_join_revenue(spark, SF).collect()
    }
    orders = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    want = {
        r.o_orderpriority: (r.revenue, r.n_items)
        for r in (
            orders.join(li, orders.o_orderkey == li.l_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.sum(_revenue_dec()).cast("decimal(38,6)").cast("double").alias("revenue"),
                F.count(F.lit(1)).alias("n_items"),
            )
        ).collect()
    }
    assert got == want
