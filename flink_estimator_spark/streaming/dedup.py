"""Streaming deduplication.

``dropDuplicatesWithinWatermark`` keeps one row per key while the key is
inside the watermark horizon — bounded state, the streaming dual of the batch
``q_dedup_by_key`` query.  (Plain ``dropDuplicates`` on a stream would keep
unbounded state; never do that at 100 TB/day.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    keys = keys or ["event_id"]
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)
