"""Skew utilities + layout writers: result-equivalence and pruning."""

import pyspark.sql.functions as F

from db_migrator_spark.io import load_table
from db_migrator_spark.operators.skew import salted_join, two_phase_agg
from db_migrator_spark.plans.inspect import plan_string
from db_migrator_spark.sinks.layout import read_partition_pruned, write_partitioned

SF = "/root/testdata/sf0.01"


def test_salted_join_equals_plain_join(spark):
    li = load_table(spark, SF, "lineitem").limit(5000)
    part = load_table(spark, SF, "part").select("p_partkey", "p_brand")
    li = li.withColumnRenamed("l_partkey", "p_partkey")
    plain = li.join(part, "p_partkey").groupBy("p_brand").count()
    salted = salted_join(li, part, "p_partkey").groupBy("p_brand").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_spreads_hot_key(spark):
    # one key holds 90% of rows -> salted big side spreads it over salts
    hot = spark.range(0, 9000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    cold = spark.range(0, 1000).select((F.col("id") % 50 + 2).alias("k"), F.col("id").alias("v"))
    big = hot.unionByName(cold)
    small = spark.createDataFrame([(i, f"dim{i}") for i in range(1, 52)], "k long, name string")
    out = salted_join(big, small, "k")
    assert out.count() == 10000
    # equivalence with the plain join
    plain = big.join(small, "k")
    assert out.groupBy("k").count().orderBy("k").collect() == \
        plain.groupBy("k").count().orderBy("k").collect()


def test_two_phase_agg_matches_direct(spark):
    orders = load_table(spark, SF, "orders")
    direct = (
        orders.groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(25,6)")).cast("double").alias("total"),
             F.count(F.lit(1)).alias("n"))
    )
    salted = two_phase_agg(orders, "o_custkey", "o_totalprice")
    assert sorted(map(tuple, direct.collect())) == sorted(map(tuple, salted.collect()))


def test_partitioned_write_prunes(spark, tmp_path):
    path = str(tmp_path / "orders_by_status")
    orders = load_table(spark, SF, "orders")
    write_partitioned(orders, path, partition_by=["o_orderstatus"], sort_by=["o_orderdate"])

    back = read_partition_pruned(spark, path)
    assert back.count() == orders.count()

    pruned = back.filter(F.col("o_orderstatus") == "F")
    plan = plan_string(pruned)
    # partition filter is applied at planning time, not as a data filter
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan, plan
    want = orders.filter(F.col("o_orderstatus") == "F").count()
    assert pruned.count() == want

    # partition dirs exist
    import os

    dirs = {d for d in os.listdir(path) if d.startswith("o_orderstatus=")}
    assert dirs == {"o_orderstatus=F", "o_orderstatus=O", "o_orderstatus=P"}
