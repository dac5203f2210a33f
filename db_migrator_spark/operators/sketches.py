"""Mergeable-sketch operators: HLL distinct counting and count-min
heavy hitters.

Sketches are the 100 TB answer to "how many distinct / how frequent"
questions: fixed-size state, map-side partial aggregation, and —
critically — MERGEABILITY, so per-shard sketches built independently
(per day, per source, per executor) union into the global answer
without rescanning. The reference has no aggregation surface at all
(its reads are 1:1 row streams, /root/reference/src/extract/extractor.rs:96-128);
this module supplies the sketch tier Spark-natively:

- ``q_hll_distinct_by_type``: Datasketches HLL per event type, PLUS the
  union of the per-type sketches as the global row — proving the
  merge path (union estimate computed FROM the sketches, not the data).
- ``q_cms_heavy_hitters``: count-min sketch over the corpus word
  stream; the sketch is built distributed, then probed for the exact
  top-K words. CMS never under-counts (estimate >= truth, bounded
  overcount) — pinned in tests.

Both are rows-only driver checks (DuckDB has no sketch twin); accuracy
against exact answers is asserted in tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession, functions as F

from ..io import load_table

HLL_LG_K = 12  # 2^12 registers — ~1.6% relative standard error
CMS_EPS = 0.0001
CMS_CONF = 0.99
CMS_SEED = 42
CMS_TOP_K = 20


def q_hll_distinct_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct users via HLL sketches + merged global row.

    Plan shape: ONE aggregation pass builds a fixed-size sketch per type
    (map-side partial merge — each task contributes a sketch, bytes not
    rows cross the wire); the global row is ``hll_union_agg`` over the
    six per-type sketches, never a rescan. At 100 TB this is the shape
    of every daily-rollup job: persist per-partition sketches, union on
    demand for any grouping.
    """
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg(F.col("user_id").cast("string"), F.lit(HLL_LG_K)).alias(
            "sketch"
        )
    )
    typed = per_type.select(
        "event_type",
        F.hll_sketch_estimate("sketch").alias("n_users_est"),
    )
    merged = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("n_users_est")
    ).select(F.lit("__ALL__").alias("event_type"), "n_users_est")
    return typed.unionByName(merged).orderBy("event_type")


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min estimates vs exact counts for the corpus's top-K words.

    The sketch builds in one distributed pass (``DataFrame.stat``'s CMS
    aggregate — sub-linear state, mergeable across partitions); the
    driver then probes it for the exact top-K words (a metadata-scale
    list, same class as collecting quantile cut-points). Output carries
    the exact count next to the estimate so consumers (and tests) can
    see the guaranteed-overcount property: est >= exact, bounded by
    eps * stream length with the configured confidence.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(F.split(F.col("text"), " ")).alias("word")).filter(
        F.col("word") != ""
    )
    top = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.desc("n_exact"), "word")
        .limit(CMS_TOP_K)
        .collect()
    )
    # The sketch aggregates distributed (SQL count_min_sketch, partial
    # merges per partition); the returned bytes deserialize through the
    # public org.apache.spark.util.sketch.CountMinSketch API for the
    # driver-side probes (PySpark exposes the aggregate but not the
    # probe; estimateCount(String) hashes the same UTF-8 bytes the
    # aggregate fed in).
    blob = words.agg(
        F.count_min_sketch(
            "word", F.lit(CMS_EPS), F.lit(CMS_CONF), F.lit(CMS_SEED)
        ).alias("s")
    ).head()["s"]
    jvm = spark.sparkContext._jvm
    sketch = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytes(blob))
    )
    rows = [
        Row(word=r["word"], n_exact=r["n_exact"], n_cms=sketch.estimateCount(r["word"]))
        for r in top
    ]
    return spark.createDataFrame(rows).orderBy(F.desc("n_exact"), "word")


QUERIES = {
    "q_hll_distinct_by_type": q_hll_distinct_by_type,
    "q_cms_heavy_hitters": q_cms_heavy_hitters,
}

# No ORACLES: DuckDB has no Datasketches HLL / CMS twin — rows-only driver
# checks; accuracy bounds are pinned against exact answers in
# tests/test_sketches.py.
ORACLES: dict[str, str] = {}
