"""Streaming sinks: exactly-once foreachBatch and stream enrichment.

``foreachBatch`` is THE production sink pattern for destinations without a
native streaming writer (JDBC, bespoke formats): each micro-batch arrives
as a static DataFrame with a monotonically increasing ``batch_id``. The
engine guarantees at-least-once delivery of batches after a restart, so the
sink must be idempotent on ``batch_id`` — here by writing each batch to a
``batch_id=N`` parquet partition directory with dynamic partition
overwrite, making replays overwrite rather than duplicate (the same recipe
works for MERGE-on-batch_id into a warehouse table).

``enrich_with_dimension`` is the stream-static join: every micro-batch
joins against a (broadcast) dimension snapshot — the streaming side stays
append-only, no state store involved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery


def fixture_state_key(sf_dir: str, source: str = "events") -> str:
    """Stable /tmp state-dir key for a fixture directory, fingerprinted
    by the source table's files (size+mtime_ns via the ANN-index
    ``dataset_fingerprint``). The streaming ops persist replay copies
    and checkpoints under tempfile.gettempdir() keyed by this — keying
    by sf NAME alone (round 8) meant a regenerated fixture with the
    same name would silently replay the OLD data out of the stale
    checkpoint. An mtime bump costs one harmless rebuild; a content
    change can never be served from stale state."""
    import os

    from ..operators.similarity_ivf import dataset_fingerprint

    base = os.path.basename(os.path.abspath(sf_dir))
    return f"{base}_{dataset_fingerprint(sf_dir, source)[:10]}"


def start_exactly_once_parquet_sink(
    stream: DataFrame, path: str, checkpoint: str
) -> StreamingQuery:
    """Idempotent-on-replay parquet sink via foreachBatch.

    Each batch lands in ``batch_id=<n>/``; a replayed batch id overwrites
    its own partition only (dynamic partitionOverwriteMode), so restart
    replays cannot duplicate rows. The checkpoint dir carries the stream
    offsets — together they give effective exactly-once on files.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            # writer-level option, NOT a session conf: mutating the shared
            # session's partitionOverwriteMode would change unrelated
            # writers' overwrite semantics behind their backs
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(path)
        )

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def enrich_with_dimension(stream: DataFrame, dim: DataFrame, key: str) -> DataFrame:
    """Stream-static join: micro-batches join the dimension snapshot
    (broadcast — no shuffle of the stream, no state)."""
    return stream.join(F.broadcast(dim), key, "left")
