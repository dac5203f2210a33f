"""Round-15 probe #4: 3-gram shingle formulations.

A) r9-r14: explode(transform(slice(ws,1,n-2), (w,i) -> concat_ws(' ',
   w, ws[i+1], ws[i+2]))) — one linear interpreted lambda per doc
B) zip-explode: explode(arrays_zip(slice(ws,1,n-2), slice(ws,2,n-2),
   slice(ws,3,n-2))) then concat_ws on the struct fields — no lambdas
   (native slices + codegen'd Generate + post-explode projection)

Parity: distinct (doc_id, shingle) count + length checksum.
Usage: python tools/probe_shingle_r15.py [sf_dir] [reps]
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
    from db_migrator_spark.io import fan_out, load_table

    spark = get_spark("probe-shingle")
    sc = spark.sparkContext
    docs = load_table(spark, sf_dir, "documents")
    ws = docs.select("doc_id", F.split(F.col("text"), " ").alias("ws"))

    shA = (
        ws.filter(F.size("ws") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.slice(F.col("ws"), 1, F.size("ws") - 2),
                    lambda w, i: F.concat_ws(
                        " ", w, F.col("ws")[i + 1], F.col("ws")[i + 2]
                    ),
                )
            ).alias("s"),
        )
        .distinct()
    )

    shB = (
        ws.filter(F.size("ws") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("ws"), 1, F.size("ws") - 2).alias("a"),
                    F.slice(F.col("ws"), 2, F.size("ws") - 2).alias("b"),
                    F.slice(F.col("ws"), 3, F.size("ws") - 2).alias("c"),
                )
            ).alias("z"),
        )
        .select(
            "doc_id",
            F.concat_ws(" ", F.col("z.a"), F.col("z.b"), F.col("z.c")).alias("s"),
        )
        .distinct()
    )

    for name, df in (("A", shA), ("B", shB)):
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("s") * (F.col("doc_id") % 97 + 1)).alias("chk"),
        ).first()
        print(f"{name}: n={r.n} chk={r.chk}")

    for rep in range(reps):
        for name, df in (("A", shA), ("B", shB)):
            sc.setJobDescription(f"shingle {name} rep{rep}")
            print(f"rep{rep} {name}: {noop(df):.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
