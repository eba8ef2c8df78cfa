"""Streaming table maintenance — CDC merge via ``foreachBatch``.

The production pattern for keeping a serving table current from a
change stream: Structured Streaming handles source tracking /
exactly-once batch ids, and each micro-batch applies the SAME
``operators/relational.py::merge_upsert`` used by the batch CDC job —
stream/batch parity by construction, not by re-implementation.

Scale notes
-----------
* ``foreachBatch`` is the right tool when the sink needs MERGE
  semantics: append-mode file sinks can't update, and
  ``update``-mode state would hold the whole table in the state
  store.  Here the state lives in the target table itself.
* Each micro-batch does one anti-join shuffle keyed on the merge key
  against the current target.  With the target bucketed by the key
  (``sources/writers.py::write_bucketed``) the target side reads
  bucket files with no Exchange and only the (small) batch shuffles —
  the same incremental economics as the batch CDC job.
* The swap is write-new-then-point (write to a versioned directory,
  then atomically repoint) — plain-parquet stand-in for a lakehouse
  table format's transactional MERGE; the versioned layout keeps a
  failed batch from corrupting the serving copy.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from prod_recommendation_pyspark_spark.operators.relational import merge_upsert


class StreamMergeTarget:
    """A versioned parquet table maintained by streaming CDC merges.

    ``apply_batch`` is the ``foreachBatch`` body: read current version,
    merge the micro-batch, write version+1, repoint.  Kept as a small
    class so tests (and batch backfills) can drive the identical code
    path synchronously."""

    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        keys: list[str],
        delete_col: str | None = None,
    ):
        self.spark = spark
        self.base_dir = base_dir
        self.keys = keys
        self.delete_col = delete_col
        # Recover from the durable pointer so a fresh driver (streaming
        # restart) resumes at the real latest version, not v0 — and so
        # checkpoint-replayed batch ids can be recognized and skipped.
        self.version, self.last_batch_id = self._read_pointer()

    def _path(self, version: int) -> str:
        return os.path.join(self.base_dir, f"v{version}")

    def _pointer_path(self) -> str:
        return os.path.join(self.base_dir, "_LATEST")

    def _read_pointer(self) -> tuple[int, int]:
        try:
            with open(self._pointer_path()) as f:
                version, last_id = f.read().split()
                return int(version), int(last_id)
        except (OSError, ValueError):
            return 0, -1

    def _write_pointer(self) -> None:
        # write-then-rename: the pointer is either the old or the new
        # value, never a torn read
        tmp = self._pointer_path() + ".tmp"
        os.makedirs(self.base_dir, exist_ok=True)
        with open(tmp, "w") as f:
            f.write(f"{self.version} {self.last_batch_id}")
        os.replace(tmp, self._pointer_path())

    def init(self, initial: DataFrame) -> None:
        initial.write.mode("overwrite").parquet(self._path(0))
        self.version = 0
        self.last_batch_id = -1
        self._write_pointer()

    def current(self) -> DataFrame:
        return self.spark.read.parquet(self._path(self.version))

    def apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        # Idempotent replay: after a driver restart the checkpoint
        # re-delivers the in-flight batch; the durable pointer carries
        # the last APPLIED id across restarts, so a replayed id is a
        # no-op instead of a double merge against a stale version.
        if batch_id <= self.last_batch_id:
            return
        merged = merge_upsert(
            self.current(), batch, self.keys, delete_col=self.delete_col
        )
        nxt = self.version + 1
        merged.write.mode("overwrite").parquet(self._path(nxt))
        self.version = nxt
        self.last_batch_id = batch_id
        self._write_pointer()


def stream_merge_upsert(
    changes: DataFrame,
    target: StreamMergeTarget,
    checkpoint_dir: str,
):
    """Attach a change stream to a merge target; returns the started
    StreamingQuery (caller drives/stops it).  ``changes`` is any
    streaming DataFrame whose columns match the target (+ optional
    delete flag)."""
    return (
        changes.writeStream.foreachBatch(target.apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
