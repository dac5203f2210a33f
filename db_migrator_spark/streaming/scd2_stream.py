"""Streaming SCD2 dimension maintenance via foreachBatch (round 8c).

The reference migrates dimension tables as 1:1 snapshots
(/root/reference/src/migrate/table_migrator.rs:43-114); this keeps a
Type-2 HISTORY of a dimension attribute maintained INCREMENTALLY from
an ordered change feed — the streaming sibling of the batch
``splits.q_scd2_dimension`` family and the lambda-architecture answer
to "no MERGE-capable table format in this environment" (Delta/Iceberg
jars absent — the documented anti-join+union upsert, here per
micro-batch).

Design:

- CDC grain is DAILY: per (customer, order date) the latest order's
  priority wins (max orderkey — deterministic last-write-wins), so
  change events are unique per (key, date) and version validity
  ranges never collide.
- The replay feed is DATE-BUCKETED (4 year-range parquet files, one
  per micro-batch): per key, event time is monotone ACROSS batches —
  the physical property a real CDC topic partitioned by time gives.
- The foreachBatch merge is the re-collapse trick: the previous
  state's OPEN versions re-enter the collapse as pseudo-events
  ordered before the batch (orderkey -1, their original valid_from),
  so "batch starts with the same value" extends the open version
  (no spurious row), a changed value closes it, and consecutive
  duplicates WITHIN the batch collapse — making the final history
  INDEPENDENT of micro-batch boundaries (property: 4-batch replay ==
  one-shot batch twin, which is exactly what the oracle checks).
- Exactly-once: each batch writes the ENTIRE new state to
  ``state/batch_id=N`` with overwrite (idempotent under replay, the
  foreach_batch.py pattern); the final read picks the highest batch
  directory. Full-state rewrite per batch is the right call at
  dimension size (dimensions are the SMALL side); at fact scale the
  same merge lands on a MERGE-capable format, partition-pruned to
  open versions (docs/SCALING.md).

Version numbers materialize once at read time (keyed row_number over
valid_from — unique per key by the daily grain), never stored, so no
cross-batch renumbering.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from ..io import load_table

# Year boundaries splitting the orders fixture into 4 replay buckets
# (one micro-batch each). Literal cut points — no sampling, so the
# bucketing is deterministic at any scale.
_CUTS = ("1994-01-01", "1996-01-01", "1997-01-01")

_STATE_SCHEMA = (
    "o_custkey bigint, attr string, valid_from date, valid_to date"
)


def _daily_cdc(df: DataFrame) -> DataFrame:
    """Collapse a slice of orders to the daily CDC grain: per
    (customer, date) the max-orderkey order's priority."""
    w = W.partitionBy("o_custkey", "d").orderBy(F.desc("k"))
    return (
        df.select(
            F.col("o_custkey"),
            F.col("o_orderdate").cast("date").alias("d"),
            F.col("o_orderkey").alias("k"),
            F.col("o_orderpriority").alias("attr"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "d", "attr")
    )


def _merge_batch(
    spark: SparkSession, bdf: DataFrame, bid: int, state_dir: str
) -> None:
    """The foreachBatch body: re-collapse merge of the batch's daily
    CDC events into the previous state (module doc), full new state
    written idempotently under batch_id=bid."""
    prev_dir = os.path.join(state_dir, f"batch_id={bid - 1}")
    if os.path.isdir(prev_dir):
        prev = spark.read.schema(_STATE_SCHEMA).parquet(prev_dir)
    else:
        prev = spark.createDataFrame([], _STATE_SCHEMA)
    closed = prev.filter(F.col("valid_to").isNotNull())
    open_v = prev.filter(F.col("valid_to").isNull())
    events = _daily_cdc(bdf).select(
        "o_custkey",
        F.col("d").alias("ord_d"),
        F.lit(0).alias("is_open"),
        F.col("d").alias("orig_from"),
        "attr",
    )
    carried = open_v.select(
        "o_custkey",
        F.col("valid_from").alias("ord_d"),
        F.lit(-1).alias("is_open"),  # sorts before same-day events
        F.col("valid_from").alias("orig_from"),
        "attr",
    )
    allev = carried.unionByName(events)
    wseq = W.partitionBy("o_custkey").orderBy("ord_d", "is_open")
    starts = allev.withColumn(
        "pattr", F.lag("attr").over(wseq)
    ).filter(F.col("pattr").isNull() | (F.col("pattr") != F.col("attr")))
    wver = W.partitionBy("o_custkey").orderBy("orig_from")
    versions = starts.select(
        "o_custkey",
        "attr",
        F.col("orig_from").alias("valid_from"),
        F.lead("orig_from").over(wver).alias("valid_to"),
    )
    out = closed.unionByName(versions)
    out.write.mode("overwrite").parquet(
        os.path.join(state_dir, f"batch_id={bid}")
    )


def streaming_scd2_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Driver-contract entry: SCD2 customer-priority history maintained
    over a 4-micro-batch date-ordered replay of orders; final state
    equals the one-shot batch collapse (the oracle)."""
    import shutil

    from .sinks import fixture_state_key

    key = fixture_state_key(sf_dir, "orders")  # size+mtime fingerprint
    base = os.path.join(
        tempfile.gettempdir(), f"db_migrator_spark_scd2_{key}"
    )
    # Replay staging (a date-bucketed re-arrangement of the INPUT rows —
    # no computed results) is shared across runs; ALL computation — the
    # stream's checkpoint and the per-batch merged state — happens in a
    # per-invocation scratch dir and is deleted after the materialized
    # result (round 14: the cross-run ckpt/state dirs made a repeat run
    # a warm no-op, which the optimization-round no-precomputation rule
    # forbids; every invocation now replays all four micro-batches).
    replay = os.path.join(base, "replay")
    run_dir = tempfile.mkdtemp(prefix="db_migrator_spark_scd2_run_")
    state = os.path.join(run_dir, "state")
    if not os.path.isdir(replay):
        orders = load_table(spark, sf_dir, "orders").select(
            "o_custkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_orderkey",
            "o_orderpriority",
        )
        d = F.col("o_orderdate")
        buckets = [
            d < F.lit(_CUTS[0]).cast("date"),
            (d >= F.lit(_CUTS[0]).cast("date"))
            & (d < F.lit(_CUTS[1]).cast("date")),
            (d >= F.lit(_CUTS[1]).cast("date"))
            & (d < F.lit(_CUTS[2]).cast("date")),
            d >= F.lit(_CUTS[2]).cast("date"),
        ]
        # one file per bucket, file NAME order == date order (readStream
        # lists lexicographically within a modification-time tier; the
        # explicit p=N prefix pins it)
        for i, pred in enumerate(buckets):
            orders.filter(pred).coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(replay, f"p{i}"))
    ev = (
        spark.readStream.schema(
            "o_custkey bigint, o_orderdate date, o_orderkey bigint,"
            " o_orderpriority string"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(replay, "p*"))
    )
    try:
        q = (
            ev.writeStream.foreachBatch(
                lambda bdf, bid: _merge_batch(spark, bdf, bid, state)
            )
            .option("checkpointLocation", os.path.join(run_dir, "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        last = max(
            int(n.split("=")[1])
            for n in os.listdir(state)
            if n.startswith("batch_id=")
        )
        final = spark.read.schema(_STATE_SCHEMA).parquet(
            os.path.join(state, f"batch_id={last}")
        )
        wver = W.partitionBy("o_custkey").orderBy("valid_from")
        return (
            final.select(
                "o_custkey",
                F.row_number().over(wver).cast("bigint").alias("version"),
                "attr",
                "valid_from",
                "valid_to",
                F.col("valid_to").isNull().alias("is_current"),
            )
            .orderBy("o_custkey", "version")
            .localCheckpoint()  # materialize before the scratch dir goes away
        )
    finally:
        shutil.rmtree(run_dir, ignore_errors=True)


QUERIES = {"streaming_scd2_maintenance": streaming_scd2_maintenance}

ORACLES = {
    # the one-shot batch collapse over the same daily CDC grain —
    # equality with the 4-batch incremental merge IS the check that
    # the maintenance is boundary-independent
    "streaming_scd2_maintenance": """
        WITH daily AS (
            SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
                   o_orderpriority AS attr,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey,
                                          CAST(o_orderdate AS DATE)
                                      ORDER BY o_orderkey DESC) AS rn
            FROM orders),
        cdc AS (SELECT o_custkey, d, attr FROM daily WHERE rn = 1),
        seq AS (
            SELECT *, LAG(attr) OVER (PARTITION BY o_custkey
                                      ORDER BY d) AS pattr
            FROM cdc),
        starts AS (
            SELECT o_custkey, d, attr FROM seq
            WHERE pattr IS NULL OR pattr != attr),
        v AS (
            SELECT o_custkey, attr, d AS valid_from,
                   LEAD(d) OVER (PARTITION BY o_custkey ORDER BY d)
                       AS valid_to,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY d)
                       AS version
            FROM starts)
        SELECT o_custkey, CAST(version AS BIGINT) AS version, attr,
               valid_from, valid_to, valid_to IS NULL AS is_current
        FROM v
        ORDER BY o_custkey, version
    """,
}
