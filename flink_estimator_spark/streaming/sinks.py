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


def rollup_maintenance_sink(stream_df: DataFrame, state_path: str,
                            checkpoint: str):
    """Exactly-once incremental state maintenance on plain parquet: each
    micro-batch's partial rollup (``operators.incremental``) is monoid-merged
    into a versioned state table.

    foreachBatch delivery is at-least-once, and a merge is NOT naturally
    idempotent (re-folding a replayed batch double-counts), so the sink uses
    the version-pointer commit protocol non-transactional stores need:

    1. read the current version pointer (``_current``); if it already names
       this ``batch_id`` or later, the batch is a replay — skip it;
    2. merge the previous state (if any) with this batch's partial rollup
       and write it to a NEW directory ``state_v<batch_id>``;
    3. last, atomically repoint ``_current`` at the new version.

    A crash between (2) and (3) leaves the pointer on the old version, so
    the engine's replay of the same batch redoes the merge against the OLD
    state — no loss, no double count.  Readers always go through the
    pointer.  (Transactional table formats bake exactly this into their
    commit log; this is the minimal file-layout equivalent.)

    Assumptions — stated so this isn't mistaken for an object-store sink:

    * The pointer protocol uses LOCAL-POSIX primitives (``os.path.exists`` /
      ``open`` / ``os.replace``); ``os.replace`` is atomic on one POSIX
      filesystem but those calls don't resolve ``hdfs://``/``s3a://`` paths
      at all.  Porting to a cluster store means routing the pointer
      read/rename through the Hadoop ``FileSystem`` API (atomic rename on
      HDFS) or, on S3 where rename isn't atomic, a conditional-put object —
      at which point a transactional table format is the better answer.
    * Read-check-write on the pointer is single-writer-safe only.  That
      matches Structured Streaming's model — one query per checkpoint
      directory owns the sink — but two concurrent queries pointed at the
      same ``state_path`` could interleave (1) and (3) and lose a merge.
    """
    import os

    from ..operators.incremental import merge_rollups, partial_rollup

    def current_state(spark):
        ptr = os.path.join(state_path, "_current")
        if not os.path.exists(ptr):
            return None, -1
        with open(ptr) as fh:
            v = int(fh.read().strip())
        return spark.read.parquet(os.path.join(state_path, f"state_v{v}")), v

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        prev, last = current_state(spark)
        if batch_id <= last:
            return  # replayed micro-batch: already folded into the state
        delta = partial_rollup(batch_df)
        merged = delta if prev is None else merge_rollups(prev, delta)
        os.makedirs(state_path, exist_ok=True)
        merged.write.mode("overwrite").parquet(
            os.path.join(state_path, f"state_v{batch_id}")
        )
        tmp = os.path.join(state_path, "_current.tmp")
        with open(tmp, "w") as fh:
            fh.write(str(batch_id))
        os.replace(tmp, os.path.join(state_path, "_current"))

    # old state_v* directories are retained for in-flight readers; pruning
    # them is a retention policy (keep last k versions), out of scope here
    sink = (
        stream_df.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
    )
    return sink, current_state, upsert
