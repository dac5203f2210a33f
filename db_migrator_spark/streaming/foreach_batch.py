"""foreachBatch exactly-once sink: idempotent per-batch writes.

Structured Streaming guarantees at-least-once delivery of each micro-batch
to ``foreachBatch``; exactly-once comes from making the batch write
IDEMPOTENT on ``batch_id`` — a replayed batch overwrites its own previous
output instead of double-counting. The standard pattern (Spark docs'
"reuse existing batch data sources / write to multiple locations"):

- each batch writes its *partial aggregate* to ``<sink>/batch_id=<id>/``
  with ``mode("overwrite")`` — a retry of batch N replaces batch N's
  directory, never appends;
- partials hold DECIMAL sums (associative, order-independent), so the
  final compaction ``sum(partials)`` equals the all-at-once batch result
  bit-for-bit — the same map-side-combine algebra Spark's own partial
  aggregation uses, just persisted between stages.

The compaction read prunes on the ``batch_id`` partition column; at scale
a periodic job folds old batch directories into a base table (classic
lambda-architecture compaction) — here the fold runs at read time.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F



def write_batch_partial(batch_df: DataFrame, batch_id: int, sink_dir: str) -> None:
    """The foreachBatch body: per-type partial aggregate, written
    idempotently under the batch's own directory."""
    (
        batch_df.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(25,6)")).alias("total_dec"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(sink_dir, f"batch_id={batch_id}"))
    )


def compact_partials(spark: SparkSession, sink_dir: str) -> DataFrame:
    """Fold all batch partials into the final aggregate. Decimal partial
    sums re-sum associatively; the double surface cast happens once."""
    partials = spark.read.option("basePath", sink_dir).parquet(f"{sink_dir}/batch_id=*")
    return (
        partials.groupBy("event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum("total_dec").cast("decimal(25,6)").cast("double").alias("total_value"),
        )
        .orderBy("event_type")
    )


def streaming_foreachbatch_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract entry: per-type totals via a 4-micro-batch stream
    with an idempotent foreachBatch parquet sink, compacted at the end.
    Oracle: the plain batch GROUP BY over the same events."""
    import shutil

    from .sinks import fixture_state_key

    key = fixture_state_key(sf_dir)  # size+mtime fingerprint (sinks.py)
    base = os.path.join(tempfile.gettempdir(), f"db_migrator_spark_fb_{key}")
    # Replay staging (a 4-file re-arrangement of the INPUT columns, no
    # computed results) is shared across runs; the checkpoint and the
    # batch-partial sink are per-invocation scratch, deleted after the
    # materialized result (round 14 — the cross-run ckpt/sink made a
    # repeat run a warm no-op; the no-precomputation rule forbids that).
    replay = os.path.join(base, "replay")
    run_dir = tempfile.mkdtemp(prefix="db_migrator_spark_fb_run_")
    sink = os.path.join(run_dir, "sink")
    if not os.path.isdir(replay):
        # split the fixture into 4 files -> 4 micro-batches (one per
        # trigger); only the aggregate's input columns travel
        from ..io import load_table

        load_table(spark, sf_dir, "events").select(
            "event_type", "value"
        ).repartition(4).write.mode("overwrite").parquet(replay)
    ev = (
        spark.readStream.schema("event_type string, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(replay)
    )
    try:
        q = (
            ev.writeStream.foreachBatch(
                lambda bdf, bid: write_batch_partial(bdf, bid, sink)
            )
            .option("checkpointLocation", os.path.join(run_dir, "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        # materialize before the scratch dir goes away
        return compact_partials(spark, sink).localCheckpoint()
    finally:
        shutil.rmtree(run_dir, ignore_errors=True)


QUERIES = {"streaming_foreachbatch_totals": streaming_foreachbatch_totals}

ORACLES = {
    "streaming_foreachbatch_totals": """
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
}
