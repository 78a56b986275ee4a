"""Exactly-once file sinks for Structured Streaming via ``foreachBatch``.

Structured Streaming's delivery guarantee is *at-least-once* per micro-batch
into ``foreachBatch``: after a crash between "batch written" and "offsets
committed", the restarted query re-runs the same ``batch_id`` with the same
data.  The standard exactly-once-on-files recipe is to make the batch write
*idempotent*: every batch overwrites its own ``batch_id=N`` directory, so a
replay replaces identical output instead of appending duplicates.  (This is
the pattern the Spark docs recommend for non-transactional sinks; tables
with real transactions — Delta/Iceberg — get it from the commit protocol
instead.)

Scale notes: each batch directory holds one file per shuffle partition (no
coalesce(1) — a single writer task would serialize the sink at 100 TB/day
rates), and the layout is hive-partitioned on ``batch_id`` so downstream
batch readers get partition pruning over ingestion time for free.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


def batch_writer(path: str) -> Callable[[DataFrame, int], None]:
    """The idempotent per-batch write: overwrite ``path/batch_id=<id>``.

    Exposed as a standalone factory (rather than a closure hidden inside the
    sink) so a restart replay — same ``batch_id``, same rows — can be driven
    directly in tests: calling it twice must leave exactly one batch's worth
    of output."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")

    return write_batch


def idempotent_parquet_sink(stream_df: DataFrame, path: str, checkpoint: str):
    """Attach the idempotent parquet sink; returns the unstarted writer so
    callers pick trigger/output mode.  Read the result back with a plain
    ``spark.read.parquet(path)`` — ``batch_id`` surfaces as a partition
    column."""
    return (
        stream_df.writeStream.foreachBatch(batch_writer(path))
        .option("checkpointLocation", checkpoint)
    )
