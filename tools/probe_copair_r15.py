"""Round-15 probe #3: _copair_explode formulations (shared by triangle
edges, kcore, basket rules/triples, and every _sparse_arcs consumer).

A) r14: flatten/transform/filter lambda C(k,2) explode
B) double Generate: posexplode + explode(slice) + v > u filter

Parity: count + checksum over the pair multiset must match exactly.
Usage: python tools/probe_copair_r15.py [sf_dir] [reps]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from db_migrator_spark.session import get_spark
    from db_migrator_spark.io import load_table

    spark = get_spark("probe-copair")
    sc = spark.sparkContext
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")

    ps = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list("l_partkey")).alias("ps")
    )

    pairsA = ps.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (x, i) -> "
                "transform(filter(slice(ps, i + 2, size(ps)), y -> y > x), "
                "y -> struct(x AS u, y AS v))))"
            )
        ).alias("p")
    ).select("p.u", "p.v")

    p1 = ps.select("ps", F.posexplode("ps").alias("i", "u"))
    pairsB = (
        p1.select("u", F.explode(F.expr("slice(ps, i + 2, size(ps))")).alias("v"))
        .filter(F.col("v") > F.col("u"))
    )

    for name, df in (("A", pairsA), ("B", pairsB)):
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("u") * 7 + F.col("v") * 13).alias("chk"),
        ).first()
        print(f"{name}: n={r.n} chk={r.chk}")

    # also time the full co-purchase edge build (explode + distinct)
    for rep in range(reps):
        for name, df in (("A", pairsA), ("B", pairsB)):
            sc.setJobDescription(f"copair {name} rep{rep}")
            t = noop(df)
            td = noop(df.distinct())
            print(f"rep{rep} {name}: explode {t:.2f}s  +distinct {td:.2f}s",
                  flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
