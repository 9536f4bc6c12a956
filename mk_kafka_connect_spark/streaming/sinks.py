"""Idempotent streaming sinks via ``foreachBatch`` — the engine-side form
of the reference's at-least-once + replay posture (a failed batch is
re-covered by the next poll, ``CO-README:512-525``; give-up path
``ChargeOverSourceTask.java:346-368``).

``foreachBatch`` hands each micro-batch a batch DataFrame + a monotonically
increasing epoch id. Exactly-once = at-least-once delivery (checkpoint
replays the batch after a crash) × idempotent apply (keyed on epoch id, so
a replayed batch overwrites instead of duplicating). Used with the merge
operator, this is the streaming CDC → SCD-1 table maintenance loop.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["epoch_partitioned_writer", "run_foreach_batch"]


def epoch_partitioned_writer(path: str) -> Callable[[DataFrame, int], None]:
    """Idempotent parquet apply: each epoch overwrites ITS OWN partition
    directory (``_epoch=<id>``), so replaying an epoch after a crash
    rewrites the same files instead of appending duplicates."""

    def apply(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.withColumn("_epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_epoch")
            .parquet(path)
        )

    return apply


def run_foreach_batch(
    stream_df: DataFrame,
    apply: Callable[[DataFrame, int], None],
    checkpoint: str,
    timeout_s: int = 300,
) -> None:
    """Drain a bounded stream through ``foreachBatch`` with a checkpoint
    (AvailableNow trigger)."""
    q = (
        stream_df.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
