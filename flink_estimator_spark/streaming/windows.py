"""Streaming event-time windows: TUMBLE / HOP / SESSION with watermarks.

These are the streaming duals of the batch queries ``q_tumble_window`` /
``q_hop_window`` / ``q_sessionization`` — same output schema (window start as
epoch seconds), so the batch results are the oracle for the streaming path
(tests/test_streaming.py drives both and compares).

Late data: ``withWatermark`` bounds state; in append mode a window emits only
once the watermark passes its end — the Flink-equivalent completeness/latency
trade the estimator's latency input models.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _win_agg(df: DataFrame, win) -> DataFrame:
    return (
        df.groupBy(win, "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("window").start.cast("long").alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def tumble_agg(events: DataFrame, size: str = "10 minutes", watermark: str = "30 minutes") -> DataFrame:
    """TUMBLE: non-overlapping event-time windows."""
    return _win_agg(
        events.withWatermark("ts", watermark), F.window("ts", size).alias("window")
    )


def hop_agg(
    events: DataFrame,
    size: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """HOP: overlapping sliding windows (each event in size/slide windows)."""
    return _win_agg(
        events.withWatermark("ts", watermark), F.window("ts", size, slide).alias("window")
    )


def tumble_distinct_users(
    events: DataFrame, size: str = "1 hour", watermark: str = "30 minutes"
) -> DataFrame:
    """Approximate distinct users per tumbling window — the streaming face
    of the mergeable-sketch family (q_hll_rollup).  An EXACT streaming
    count-distinct would hold every key seen per open window; the HLL++
    state behind ``approx_count_distinct`` is a few KB per window
    regardless of cardinality, which is the only shape that survives
    billion-user windows.  The estimator is deterministic for a given
    input set (hash-based, order-independent), so the batch run of this
    same function is an exact-equality shadow, not an approximate one."""
    wm = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        wm.groupBy(F.window("ts", size).alias("w"))
        .agg(
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.count("*").alias("n_events"),
        )
        .select(
            F.col("w").start.cast("long").alias("win_start"),
            "approx_users",
            "n_events",
        )
    )


def session_agg(events: DataFrame, gap: str = "30 minutes", watermark: str = "30 minutes") -> DataFrame:
    """SESSION: dynamic-width windows closed by a gap of inactivity, keyed by
    user (the streaming dual of batch gaps-and-islands sessionization)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w").start.cast("long").alias("sess_start"),
            F.col("w").end.cast("long").alias("sess_end"),
            "n_events",
        )
    )


def session_agg_dynamic(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """SESSION with a *dynamic* gap expression (SURVEY §4's named hole):
    each event extends its session by an event-type-dependent horizon —
    purchases 40 min, errors 5 min, everything else 15 min.  Spark merges
    the per-event intervals [ts, ts+gap); the batch shadow is
    plans.analytic.q_session_dynamic_gap (running-max gaps-and-islands with
    the same gap table)."""
    gap = (
        F.when(F.col("event_type") == "purchase", "40 minutes")
        .when(F.col("event_type") == "error", "5 minutes")
        .otherwise("15 minutes")
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w").start).alias("sess_start_us"),
            F.unix_micros(F.col("w").end).alias("sess_end_us"),
            "n_events",
        )
    )


def cumulate_agg(
    events: DataFrame,
    step_s: int = 600,
    size_s: int = 1800,
    watermark: str = "30 minutes",
) -> DataFrame:
    """CUMULATE windows (Flink window TVF with no Spark built-in): every
    ``size_s`` window emits expanding partials at each ``step_s`` boundary —
    [start, start+step), [start, start+2*step), ... [start, start+size).

    Implementation: explode each event into the sub-window indices that
    contain it, then run ONE standard windowed aggregate grouped by
    (window(ts, size), j).  The event-time column survives the explode, so
    the watermark bounds state exactly as for a tumble — a cumulate is just
    a tumble whose groups are (window, step) pairs.  Append-mode caveat,
    honestly: Spark emits all of a window's partials when the watermark
    passes the window END; Flink fires each partial at its own step
    boundary.  The VALUES are identical (the batch shadow
    plans.window_tvf.q_cumulate_window is the oracle); the firing schedule
    is Spark's.
    """
    steps = size_s // step_s
    e = F.unix_timestamp("ts")
    ws = F.floor(e / size_s) * size_s
    jmin = (F.floor((e - ws) / step_s) + 1).cast("int")
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.select(
            "ts", "value", F.explode(F.sequence(jmin, F.lit(steps))).alias("j")
        )
        .groupBy(F.window("ts", f"{size_s} seconds").alias("w"), "j")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w").start.cast("long").alias("win_start"),
            (F.col("w").start.cast("long") + F.col("j") * step_s).alias("win_end"),
            "n",
            "sum_value",
        )
    )


def multistage_agg(
    events: DataFrame,
    inner: str = "1 minute",
    outer: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Multi-level window pipeline — the reference's complex class names
    "Multi-level window operations" (estimation.html:231-245): a fine
    1-minute tumble aggregates raw events, then a second windowed aggregate
    rolls the minute buckets into 10-minute totals with the peak minute.

    Streaming uses Spark's chained time-window aggregation (grouping by
    ``window(window_col, outer)`` over the first stage's window column),
    i.e. two stateful operators in one query — supported in append mode
    since multiple-stateful-operator support landed in Spark 3.4+.  The
    map-side benefit at scale: the second stage consumes pre-aggregated
    minute rows (~1/60th of the raw volume), so the wide-window state stays
    tiny no matter the event rate.
    """
    streaming = events.isStreaming
    src = events.withWatermark("ts", watermark) if streaming else events
    minute = src.groupBy(
        F.window("ts", inner).alias("mw"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("minute_value"),
    )
    return (
        minute.groupBy(F.window(F.col("mw"), outer).alias("w"), "event_type")
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("minute_value").cast("double").alias("sum_value"),
            F.max("n").alias("peak_minute_events"),
        )
        .select(
            F.col("w").start.cast("long").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
            "peak_minute_events",
        )
    )
