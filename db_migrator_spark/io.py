"""Parquet table loading for the synthetic TPC-H-ish corpus.

The fixture tables (see TESTDATA.md) live as one parquet file per table in a
scale-factor directory. ``load_table`` is the single normalization point:

- ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark cannot
  represent natively; with ``spark.sql.legacy.parquet.nanosAsLong`` it reads
  as nanoseconds-since-epoch (bigint) and is converted here to a microsecond
  ``timestamp_ntz`` — identical truncation to DuckDB's ``CAST(ts AS
  TIMESTAMP)``.

Scale notes: a plain ``spark.read.parquet`` keeps every Catalyst scan
optimization on the table (column pruning, predicate pushdown into the
parquet footer, partition-file splitting by ``maxPartitionBytes``), so the
same loader serves sf0.001 and 100 TB — only the file listing grows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .session import configure

DEFAULT_SF_DIR = "/root/testdata/sf0.1"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def sf_dir_from_env() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, normalizing physical quirks.

    Dimension tables (region/nation) are tiny at every scale factor — join
    sides coming from here should be wrapped in ``F.broadcast`` by callers.
    """
    if name == "events":
        configure(spark)  # ensure nanosAsLong before schema resolution
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ns -> us truncating division, matching DuckDB CAST(ts AS TIMESTAMP).
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"))
    return df


def fan_out(df: DataFrame, *keys: str) -> DataFrame:
    """Guarantee at least the cluster's parallelism ahead of CPU-heavy
    map work (guide §2.5 input parallelism).

    A fixture-scale base table arrives as ONE scan task (one small
    parquet file holding one row group — no file-split config can break
    a single row group apart), so everything fused into the scan stage
    (word/shingle explodes, per-word md5, vectorized-UDF matmuls,
    decode) runs serially regardless of core count. One hash
    repartition on the table's unique key spreads the narrow base rows
    across ``defaultParallelism`` partitions for the price of shuffling
    the (small) base table once. Scale-adaptive by construction: when
    the scan already carries >= defaultParallelism partitions — any
    production-sized input — this is the identity and adds nothing to
    the plan. Callers apply it ONLY where the pre-shuffle map work is
    the measured wall (see OPTIMIZATION_r14.md); a cheap scan->filter->
    aggregate pipeline is faster without the extra exchange."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *keys) if keys else df.repartition(target)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register fixture tables as temp views for the SQL API path."""
    for n, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(n)
