"""Round-15 probe #2: wedge-generation formulations for
graph_triangle_counts. The r14 flatten/transform C(k,2) explode runs
through interpreted HigherOrderFunction lambdas building 41M structs;
this A/Bs (same multiset of wedges, same closing probe):

A) r14 baseline: struct ns + flatten/transform struct wedges
B) packed-long ns + flatten/transform packed wedge keys (no structs,
   primitive long arrays, xy emitted directly)
C) double Generate: posexplode(ns) then explode(slice(ns, i+2, ...)) —
   no lambdas at all (codegen'd Generates + native arraycopy slice)

Usage: python tools/probe_triangle2_r15.py [sf_dir] [reps]
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
    from db_migrator_spark.operators.graph2 import _copurchase_edges

    spark = get_spark("probe-triangle2")
    sc = spark.sparkContext

    edges = _copurchase_edges(spark, sf_dir).localCheckpoint()
    deg = (
        edges.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("degree").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("degree").alias("deg_v"))
    ranked = edges.join(du, "u").join(dv, "v")
    u_first = (F.col("deg_u") < F.col("deg_v")) | (
        (F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))
    )
    oriented = ranked.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(u_first, F.col("deg_v")).otherwise(F.col("deg_u")).alias("deg_dst"),
    ).localCheckpoint()

    closing = F.broadcast(
        oriented.select((F.shiftleft(F.col("src"), 32) + F.col("dst")).alias("xy"))
    )

    # A) r14 baseline
    nbrsA = oriented.groupBy("src").agg(
        F.sort_array(F.collect_list(F.struct("deg_dst", "dst"))).alias("ns")
    )
    wedgesA = nbrsA.select(
        "src",
        F.explode(
            F.expr(
                "flatten(transform(ns, (a, i) -> "
                "transform(slice(ns, i + 2, size(ns)), "
                "b -> struct(a.dst AS x, b.dst AS y))))"
            )
        ).alias("p"),
    ).select("src", "p.x", "p.y")
    triA = wedgesA.withColumn(
        "xy", F.shiftleft(F.col("x"), 32) + F.col("y")
    ).join(closing, "xy")
    credA = (
        triA.select(F.explode(F.array("src", "x", "y")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("tri_count"))
    )

    # B) packed-long ns, packed wedge key emitted directly
    nbrsB = oriented.groupBy("src").agg(
        F.sort_array(
            F.collect_list(F.shiftleft(F.col("deg_dst"), 32) + F.col("dst"))
        ).alias("ns")
    )
    wedgesB = nbrsB.select(
        "src",
        F.explode(
            F.expr(
                "flatten(transform(ns, (a, i) -> "
                "transform(slice(ns, i + 2, size(ns)), "
                "b -> shiftleft(a & 4294967295, 32) + (b & 4294967295))))"
            )
        ).alias("xy"),
    )
    triB = wedgesB.join(closing, "xy")
    credB = (
        triB.select(
            F.explode(
                F.array(
                    F.col("src"),
                    F.shiftright(F.col("xy"), 32),
                    F.col("xy").bitwiseAND(F.lit(4294967295)),
                )
            ).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("tri_count"))
    )

    # C) double Generate, no lambdas (struct ns kept for ordering)
    nbrsC = oriented.groupBy("src").agg(
        F.sort_array(
            F.collect_list(F.shiftleft(F.col("deg_dst"), 32) + F.col("dst"))
        ).alias("ns")
    )
    w1 = nbrsC.select("src", "ns", F.posexplode("ns").alias("i", "a"))
    wedgesC = w1.select(
        "src",
        F.col("a"),
        F.explode(F.expr("slice(ns, i + 2, size(ns))")).alias("b"),
    ).select(
        "src",
        (
            F.shiftleft(F.col("a").bitwiseAND(F.lit(4294967295)), 32)
            + F.col("b").bitwiseAND(F.lit(4294967295))
        ).alias("xy"),
    )
    triC = wedgesC.join(closing, "xy")
    credC = (
        triC.select(
            F.explode(
                F.array(
                    F.col("src"),
                    F.shiftright(F.col("xy"), 32),
                    F.col("xy").bitwiseAND(F.lit(4294967295)),
                )
            ).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("tri_count"))
    )

    variants = {"A_r14": credA, "B_packed": credB, "C_double_gen": credC}
    # parity check first (cheap, via checksum)
    sums = {}
    for k, df in variants.items():
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("node") * F.col("tri_count")).alias("chk"),
            F.sum("tri_count").alias("tot"),
        ).first()
        sums[k] = (r.n, r.chk, r.tot)
        print(f"{k}: rows={r.n} chk={r.chk} tot={r.tot}")
    assert len(set(sums.values())) == 1, f"MISMATCH {sums}"

    for rep in range(reps):
        for k, df in variants.items():
            sc.setJobDescription(f"probe2 {k} rep{rep}")
            print(f"rep{rep} {k}: {noop(df):.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
