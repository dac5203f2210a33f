"""Round-15 probe for graph_triangle_counts (VERDICT r14 #2): where does
the wedge Generate stage's parallelism come from after the nbrs groupBy?

Reports, at the given SF:
- partition count of the nbrs aggregate output (post-AQE),
- noop-sink wall of the wedge explode alone, the wedge+probe, and the
  full query,
so the serialization hypothesis (AQE coalescing the small nbrs shuffle
to ~1 partition, making the 41M-wedge Generate + probe run serially) is
measured rather than assumed.

Usage: python tools/probe_triangle_r15.py [sf_dir]
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
    from db_migrator_spark.session import get_spark
    from db_migrator_spark.operators.graph2 import (
        _copurchase_edges,
    )

    spark = get_spark("probe-triangle")
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
    print(f"edges={edges.count()}  oriented parts={oriented.rdd.getNumPartitions()}")

    nbrs = oriented.groupBy("src").agg(
        F.sort_array(F.collect_list(F.struct("deg_dst", "dst"))).alias("ns")
    )
    sc.setJobDescription("probe: nbrs partitions (materializes agg)")
    print(f"nbrs post-AQE partitions = {nbrs.rdd.getNumPartitions()}")

    wedges = nbrs.select(
        "src",
        F.explode(
            F.expr(
                "flatten(transform(ns, (a, i) -> "
                "transform(slice(ns, i + 2, size(ns)), "
                "b -> struct(a.dst AS x, b.dst AS y))))"
            )
        ).alias("p"),
    ).select("src", "p.x", "p.y")

    sc.setJobDescription("probe: wedge explode noop")
    print(f"wedge explode noop: {noop(wedges):.2f}s")
    sc.setJobDescription("probe: wedge explode noop (warm)")
    print(f"wedge explode noop warm: {noop(wedges):.2f}s")

    xy = F.shiftleft(F.col("x"), 32) + F.col("y")
    closing = F.broadcast(
        oriented.select((F.shiftleft(F.col("src"), 32) + F.col("dst")).alias("xy"))
    )
    triangles = wedges.withColumn("xy", xy).join(closing, "xy")
    credits = (
        triangles.select(F.explode(F.array("src", "x", "y")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("tri_count"))
    )
    sc.setJobDescription("probe: wedge+probe+credits noop")
    print(f"wedge+probe+credits noop: {noop(credits):.2f}s")
    print(f"wedge+probe+credits noop warm: {noop(credits):.2f}s")

    # Fanned variant: explicit repartition of nbrs before the explode.
    fanned = nbrs.repartition(sc.defaultParallelism, "src")
    fw = fanned.select(
        "src",
        F.explode(
            F.expr(
                "flatten(transform(ns, (a, i) -> "
                "transform(slice(ns, i + 2, size(ns)), "
                "b -> struct(a.dst AS x, b.dst AS y))))"
            )
        ).alias("p"),
    ).select("src", "p.x", "p.y")
    ft = fw.withColumn("xy", xy).join(closing, "xy")
    fc = (
        ft.select(F.explode(F.array("src", "x", "y")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("tri_count"))
    )
    sc.setJobDescription("probe: FANNED wedge+probe+credits noop")
    print(f"FANNED wedge+probe+credits noop: {noop(fc):.2f}s")
    print(f"FANNED wedge+probe+credits noop warm: {noop(fc):.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
