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


# ---------------------------------------------------------------------------
# Windowed KMV (theta) distinct sketch — the O(k)-state streaming dual of
# operators/sketches.py's theta set algebra: per tumbling window, keep only
# the k smallest md5-52 hashes of the key and emit them when the watermark
# closes the window.  Unlike a streaming count-distinct (state = every
# distinct key in the window), KMV state is k values REGARDLESS of window
# cardinality, and the emitted per-window sketches merge downstream by the
# k-smallest-of-union rule — distinct counts AND set algebra (union /
# intersection) over any window combination without re-seeing raw events.
# ---------------------------------------------------------------------------

import pandas as _pd
from typing import Any as _Any, Iterator as _Iterator

from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.dedup import md5_word

KMV_K = 16

_KMV_OUTPUT = T.StructType(
    [
        T.StructField("win_start", T.LongType()),
        T.StructField("rn", T.IntegerType()),
        T.StructField("h", T.LongType()),
    ]
)

_KMV_STATE = T.StructType([T.StructField("hs", T.ArrayType(T.LongType()))])

_KMV_BY_OUTPUT = T.StructType(
    [
        T.StructField("win_start", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("rn", T.IntegerType()),
        T.StructField("h", T.LongType()),
    ]
)


def windowed_kmv(
    events: DataFrame,
    key: str = "user_id",
    watermark: str = "30 minutes",
    window_s: int = 3600,
    k: int = KMV_K,
    by: "str | None" = None,
) -> DataFrame:
    """Per-window k-minimum-values sketch of ``key``, emitted once as
    (win_start[, source], rn, h) rows when the event-time timeout at
    window end fires (the window_topn timer pattern).  Hashing runs
    JVM-side (md5_word projection before the stateful op); the Python
    state body only merges already-hashed longs and truncates to k —
    state is a sorted ≤ k-long array per open window.

    ``by`` adds a second grouping dimension (e.g. event_type): one
    sketch per (window, source), the shape whose emitted artifacts feed
    the downstream theta PAIR algebra (windowed Jaccard between sources)
    without re-seeing raw events — state stays k longs per open
    (window, source) at any cardinality."""
    grouped = by is not None

    def _emit(key_: _Any, state: GroupState) -> _Iterator[_pd.DataFrame]:
        (hs,) = state.get
        state.remove()
        if not hs:
            return
        out = {
            "win_start": [int(key_[0])] * len(hs),
            "rn": list(range(1, len(hs) + 1)),
            "h": [int(x) for x in hs],
        }
        if grouped:
            out["source"] = [str(key_[1])] * len(hs)
        yield _pd.DataFrame(out)

    def _kmv(
        key_: _Any, pdfs: _Iterator[_pd.DataFrame], state: GroupState
    ) -> _Iterator[_pd.DataFrame]:
        if state.hasTimedOut:
            yield from _emit(key_, state)
            return
        cur: set[int] = set()
        if state.exists:
            (hs,) = state.get
            cur.update(int(x) for x in hs)
        for pdf in pdfs:
            cur.update(int(x) for x in pdf["h"].to_numpy("int64"))
        state.update((sorted(cur)[:k],))
        state.setTimeoutTimestamp((int(key_[0]) + window_s) * 1000)
        return

    win_start = (F.floor(F.unix_timestamp("ts") / window_s) * window_s).cast("long")
    cols = ["ts", md5_word(F.col(key).cast("string"), 1, 13).alias("h")]
    group = ["win_start"]
    if grouped:
        cols.append(F.col(by).cast("string").alias("source"))
        group.append("source")
    return (
        events.withWatermark("ts", watermark)
        .select(*cols)
        .withColumn("win_start", win_start)
        .groupBy(*group)
        .applyInPandasWithState(
            func=_kmv,
            outputStructType=_KMV_BY_OUTPUT if grouped else _KMV_OUTPUT,
            stateStructType=_KMV_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
