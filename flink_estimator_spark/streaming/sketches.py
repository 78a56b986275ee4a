"""Streaming mergeable sketches: windowed count-min grids.

The streaming dual of ``operators/sketches.py``'s CMS (already proven as a
complete-mode global grid): per event-time tumbling window, emit the d x w
counter cells when the watermark closes the window.  Cells are plain sums,
so the emitted per-window grids are the MERGEABLE state — a consumer
point-queries heavy hitters per window (min across rows), or cell-wise adds
windows into coarser horizons (hour -> day -> month) without ever re-seeing
raw events.  That rollup-by-addition is the 100 TB posture: the stream job
keeps only in-horizon window state (bounded by watermark), and history lives
as tiny d*w-cell artifacts.

The bucket hash is the engine-portable md5 arithmetic (sketches.cms_bucket),
so a batch rebuild of any window's grid is bit-identical — which is exactly
how the streaming test verifies it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sketches import CMS_DEPTH, CMS_WIDTH, cms_bucket


def windowed_cms_cells(
    events: DataFrame,
    key: str = "user_id",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Per-window CMS counter cells, append-mode-ready.

    (win_start epoch-sec, row_i, bucket, c): one aggregate keyed on
    (window, row_i, bucket) — the explode multiplies rows by d=4 map-side,
    partials combine before the shuffle, and state per window is at most
    d x w cells regardless of event volume."""
    rows = F.explode(F.array(*[F.lit(i) for i in range(CMS_DEPTH)])).alias("row_i")
    exp = (
        events.withWatermark("ts", watermark)
        .select("ts", F.col(key), rows)
        .withColumn("bucket", cms_bucket(F.col(key), F.col("row_i"), width))
    )
    return (
        exp.groupBy(F.window("ts", window).alias("win"), "row_i", "bucket")
        .agg(F.count("*").alias("c"))
        .select(
            F.col("win").start.cast("long").alias("win_start"),
            "row_i",
            "bucket",
            "c",
        )
    )
