"""Streaming sinks: idempotent ``foreachBatch`` writer + availableNow
batch-catchup driver (SURVEY §2.12 stretch; absent from the batch-only
reference).

``foreachBatch`` is THE production sink pattern for Structured
Streaming when the target isn't one of the built-in exactly-once
sinks: the function receives (batch_df, batch_id) and can use any
batch writer.  Exactly-once then hinges on idempotence — Spark may
re-run a batch after failure with the SAME batch_id, so the write must
be a no-op the second time.  Here that is ``partitionBy(batch_id)``
with dynamic partition overwrite: a replayed batch overwrites its own
partition instead of appending duplicates.

``availableNow`` runs the stream as a bounded job over everything
currently in the source, checkpointing along the way — the standard
nightly-catchup / backfill trigger that shares ALL the streaming
logic (watermarks, state, sink) with the 24/7 deployment.

Scale notes: each micro-batch writes through the normal parquet
committer (one task per shuffle partition); the batch_id partition
column adds one directory level and keeps replay idempotent without a
transactional table format.  With a lakehouse format (Delta/Iceberg),
swap the body for a MERGE keyed on batch_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def idempotent_parquet_batch_writer(path: str):
    """Returns a ``foreachBatch`` function writing each micro-batch to
    ``path`` partitioned by ``batch_id`` with dynamic partition
    overwrite — replaying a batch after failure overwrites its own
    partition (idempotent), never duplicates it."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        # per-WRITE dynamic overwrite (not the session conf): toggling
        # the global setting races with concurrent writers sharing the
        # session — a concurrently-restored 'static' would turn this
        # overwrite into a full-sink truncation
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(path)
        )

    return write_batch


def run_available_now_to_parquet(
    stream_df: DataFrame, out_path: str, checkpoint_path: str
) -> None:
    """Drain everything currently available in the source through the
    streaming plan into the idempotent parquet sink, then stop —
    the bounded backfill/catchup run.  Synchronous (awaits
    termination); state and progress live in ``checkpoint_path``, so a
    rerun resumes instead of reprocessing."""
    q = (
        stream_df.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(idempotent_parquet_batch_writer(out_path))
        .start()
    )
    q.awaitTermination()
