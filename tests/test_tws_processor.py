"""Typed-state processors (SequenceMatchProcessor / WindowTopNProcessor)
— dependency-free unit differentials through faked typed state.

Since round 7 the REAL transformWithState runtime also executes here
(``ensure_typed_state_runtime`` locates a pure-Python protobuf at
runtime; full-stream differentials live in test_streaming.py and the
driver gate ``q_stream_tws_topn_runtime``).  These faked-state tests
remain as the fast unit layer: they drive handleInputRows /
handleExpiredTimer directly — single- and split-batch invariance against
the gated batch queries, plus timer-lifecycle checks neither the batch
shadow nor a bounded stream can isolate.  One caveat the real store
taught us: ListState.put([]) is ILLEGAL there (EMPTY_LIST_VALUE), so
processors must clear() empty lists — pinned by the full-stream tests.
"""

from __future__ import annotations

import os

import pandas as pd

import flink_estimator_spark.plans  # noqa: F401  (finish registry init first)
from flink_estimator_spark.streaming.stateful import SequenceMatchProcessor
from tests.conftest import SF_SMALL


class FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def clear(self):
        self._v = None


class FakeListState:
    def __init__(self):
        self._rows = []

    def get(self):
        return iter(list(self._rows))

    def put(self, rows):
        self._rows = [tuple(r) for r in rows]

    def appendValue(self, v):
        self._rows.append(tuple(v))

    def clear(self):
        self._rows = []


class FakeMapState:
    def __init__(self):
        self._m = {}

    def exists(self):
        return bool(self._m)

    def getValue(self, key):
        return self._m.get(tuple(key))

    def containsKey(self, key):
        return tuple(key) in self._m

    def updateValue(self, key, value):
        self._m[tuple(key)] = tuple(value)

    def iterator(self):
        return iter(list(self._m.items()))

    def keys(self):
        return iter(list(self._m))

    def values(self):
        return iter(list(self._m.values()))

    def removeKey(self, key):
        self._m.pop(tuple(key), None)

    def clear(self):
        self._m = {}


class FakeHandle:
    """Key-scoped stand-in for StatefulProcessorHandle: typed state vars by
    name plus the timer registry (registerTimer/deleteTimer semantics as
    documented — delete of a registered expiry removes it)."""

    def __init__(self):
        self._states = {}
        self.timers = []

    def getListState(self, name, schema):
        return self._states.setdefault(name, FakeListState())

    def getValueState(self, name, schema):
        return self._states.setdefault(name, FakeValueState())

    def getMapState(self, name, key_schema, value_schema):
        return self._states.setdefault(name, FakeMapState())

    def registerTimer(self, expiry_ms):
        self.timers.append(int(expiry_ms))

    def deleteTimer(self, expiry_ms):
        self.timers.remove(int(expiry_ms))

    def listTimers(self):
        return iter(self.timers)


STEPS = ["signup", "view", "click", "purchase"]
WITHIN_S = 172800
ABSENT = "error"


def _drive(events_pdf, batches=1):
    """Run one processor per key over its events split into ``batches``
    event-time-ordered chunks; returns (emitted row tuples, handles)."""
    out_rows = []
    handles = {}
    for uid, grp in events_pdf.groupby("user_id"):
        proc = SequenceMatchProcessor(STEPS, within_s=WITHIN_S, absent=ABSENT)
        h = FakeHandle()
        handles[uid] = h
        proc.init(h)
        grp = grp.sort_values(["ts", "event_id"]).reset_index(drop=True)
        n = len(grp)
        for b in range(batches):
            chunk = grp.iloc[b * n // batches : (b + 1) * n // batches]
            if chunk.empty:
                continue
            for pdf in proc.handleInputRows((uid,), iter([chunk]), None):
                out_rows.extend(map(tuple, pdf.itertuples(index=False)))
    return out_rows, handles


def _fixture_events(spark):
    from flink_estimator_spark.sources.tables import read_table

    return (
        read_table(spark, os.path.join(SF_SMALL, "events.parquet"))
        .select("user_id", "event_id", "ts", "event_type")
        .toPandas()
    )


def _batch_expected(spark):
    from flink_estimator_spark.plans import QUERIES

    return sorted(
        tuple(r)
        for r in QUERIES["q_cep_four_step"].builder(spark, SF_SMALL).collect()
    )


def test_processor_matches_batch_single_batch(spark):
    ev = _fixture_events(spark)
    got, _ = _drive(ev, batches=1)
    assert sorted(got) == _batch_expected(spark)
    assert got, "fixture produced no matches — vacuous differential"


def test_processor_matches_batch_split_batches(spark):
    """State must carry chains across micro-batch boundaries: splitting
    each key's event-time-ordered stream into 3 chunks must not change a
    single emission."""
    ev = _fixture_events(spark)
    got, _ = _drive(ev, batches=3)
    assert sorted(got) == _batch_expected(spark)


def _mk(uid, rows):
    return pd.DataFrame(
        {
            "user_id": [uid] * len(rows),
            "event_id": list(range(len(rows))),
            "ts": [pd.Timestamp(s, unit="s") for s, _ in rows],
            "event_type": [et for _, et in rows],
        }
    )


def test_timer_registered_at_t0_and_deleted_on_resolution():
    proc = SequenceMatchProcessor(STEPS, within_s=WITHIN_S, absent=ABSENT)
    h = FakeHandle()
    proc.init(h)
    pdf = _mk(7, [(100, "signup"), (200, "view")])
    list(proc.handleInputRows((7,), iter([pdf]), None))
    # chain open: exactly one timer, at (t0_us + bound_us) // 1000 ms
    assert h.timers == [(100 * 1_000_000 + WITHIN_S * 1_000_000) // 1000]
    pdf2 = _mk(7, [(300, "click"), (400, "purchase")])
    emitted = [
        t
        for df in proc.handleInputRows((7,), iter([pdf2]), None)
        for t in map(tuple, df.itertuples(index=False))
    ]
    assert emitted == [(7, 100_000_000, 200_000_000, 300_000_000, 400_000_000, 300)]
    assert h.timers == []  # resolved chains leave no timer behind


def test_expired_timer_resolves_dead_chain_and_sheds_state():
    proc = SequenceMatchProcessor(STEPS, within_s=WITHIN_S, absent=ABSENT)
    h = FakeHandle()
    proc.init(h)
    list(proc.handleInputRows((9,), iter([_mk(9, [(100, "signup")])]), None))
    assert list(h.getListState("anchors", None).get())  # chain open
    assert list(proc.handleExpiredTimer((9,), None, None)) == []
    # resolved dead: anchors shed, done tombstone set
    assert not list(h.getListState("anchors", None).get())
    assert h.getValueState("meta", None).get()[1] is True
    # post-expiry events can never re-anchor (earliest-match-once per key)
    late = _mk(9, [(200, "view"), (250, "click"), (300, "purchase")])
    assert list(proc.handleInputRows((9,), iter([late]), None)) == []
    assert not list(h.getListState("anchors", None).get())


def test_expired_timer_is_noop_after_match():
    proc = SequenceMatchProcessor(["signup", "purchase"], within_s=1000)
    h = FakeHandle()
    proc.init(h)
    pdf = _mk(3, [(10, "signup"), (20, "purchase")])
    emitted = list(proc.handleInputRows((3,), iter([pdf]), None))
    assert len(emitted) == 1
    meta_before = h.getValueState("meta", None).get()
    assert list(proc.handleExpiredTimer((3,), None, None)) == []
    assert h.getValueState("meta", None).get() == meta_before


def _counting(state):
    """Wrap a fake state object so every read/write method bumps a counter
    — the unit-level stand-in for state-server RPC counting."""
    counts = {"reads": 0, "writes": 0}
    cls = type(state)

    class Counting(cls):  # noqa: N801
        def get(self):
            counts["reads"] += 1
            return cls.get(self)

        def exists(self):
            counts["reads"] += 1
            return cls.exists(self)

        def update(self, v):
            counts["writes"] += 1
            return cls.update(self, v)

        def put(self, rows):
            counts["writes"] += 1
            return cls.put(self, rows)

        def clear(self):
            counts["writes"] += 1
            return cls.clear(self)

    wrapped = Counting()
    wrapped.__dict__.update(state.__dict__)
    return wrapped, counts


def test_untouched_and_resolved_keys_write_no_state():
    """The r9 RPC-skip contract (SCALE.md 7o): a batch that changes
    nothing must issue ZERO state writes — untouched keys keep zero
    state, open-but-unprogressed chains are not rewritten, and resolved
    (done) keys skip even the anchors READ."""
    proc = SequenceMatchProcessor(STEPS, within_s=WITHIN_S, absent=ABSENT)
    h = FakeHandle()
    proc.init(h)
    proc._anchors, anchor_counts = _counting(h._states["anchors"])
    proc._meta, meta_counts = _counting(h._states["meta"])

    # 1. irrelevant events only: no writes at all, key keeps zero state
    noise = _mk(5, [(50, "view"), (60, "click")])  # no signup -> no chain
    assert list(proc.handleInputRows((5,), iter([noise]), None)) == []
    assert anchor_counts["writes"] == 0 and meta_counts["writes"] == 0
    assert not proc._meta.exists()

    # 2. progress: writes happen exactly once each (anchors put + meta)
    list(proc.handleInputRows((5,), iter([_mk(5, [(100, "signup")])]), None))
    assert anchor_counts["writes"] == 1 and meta_counts["writes"] == 1

    # 3. open chain, batch with no progress: zero additional writes
    w_a, w_m = anchor_counts["writes"], meta_counts["writes"]
    again = _mk(5, [(150, "click")])  # wrong next step
    assert list(proc.handleInputRows((5,), iter([again]), None)) == []
    assert anchor_counts["writes"] == w_a and meta_counts["writes"] == w_m

    # 4. resolve via timer, then feed more rows: no anchors READ, no writes
    list(proc.handleExpiredTimer((5,), None, None))
    r_a, w_a = anchor_counts["reads"], anchor_counts["writes"]
    w_m = meta_counts["writes"]
    late = _mk(5, [(200, "view"), (300, "purchase")])
    assert list(proc.handleInputRows((5,), iter([late]), None)) == []
    assert anchor_counts["reads"] == r_a, "done key must skip the list read"
    assert anchor_counts["writes"] == w_a and meta_counts["writes"] == w_m


# ---------------------------------------------------------------------------
# WindowTopNProcessor (transformWithStateInPandas port of the event-time-
# timer window top-N) — same faked-typed-state differential harness; the
# batch contract is the gated q_window_topn (600 s tumbles, top-3 by exact
# DECIMAL sum, ties broken by user_id).
# ---------------------------------------------------------------------------

from flink_estimator_spark.streaming.stateful import WindowTopNProcessor

WIN_S = 600


def _drive_topn(events_pdf, batches=1, window_s=WIN_S, top_k=3):
    """One processor per window key: feed event-time-ordered chunks, then
    fire the timer (watermark passes every window at end of a bounded
    stream); returns emitted tuples + the handles for state inspection."""
    out_rows = []
    handles = {}
    ep = events_pdf.copy()
    ep["win_start"] = (ep["ts"].astype("int64") // 1_000_000_000) // window_s * window_s
    for ws, grp in ep.groupby("win_start"):
        proc = WindowTopNProcessor(window_s=window_s, top_k=top_k)
        h = FakeHandle()
        handles[ws] = h
        proc.init(h)
        grp = grp.sort_values(["ts", "event_id"]).reset_index(drop=True)
        n = len(grp)
        for b in range(batches):
            chunk = grp.iloc[b * n // batches : (b + 1) * n // batches]
            if chunk.empty:
                continue
            assert list(proc.handleInputRows((int(ws),), iter([chunk]), None)) == []
        for pdf in proc.handleExpiredTimer((int(ws),), None, None):
            out_rows.extend(map(tuple, pdf.itertuples(index=False)))
    return out_rows, handles


def _topn_fixture_events(spark):
    from flink_estimator_spark.sources.tables import read_table

    return (
        read_table(spark, os.path.join(SF_SMALL, "events.parquet"))
        .select("user_id", "event_id", "ts", "value")
        .toPandas()
    )


def _topn_batch_expected(spark):
    from flink_estimator_spark.plans import QUERIES

    return sorted(
        tuple(r)
        for r in QUERIES["q_window_topn"].builder(spark, SF_SMALL).collect()
    )


def test_topn_processor_matches_batch_single_batch(spark):
    ev = _topn_fixture_events(spark)
    got, _ = _drive_topn(ev, batches=1)
    assert sorted(got) == _topn_batch_expected(spark)
    assert got, "fixture produced no windows — vacuous differential"


def test_topn_processor_matches_batch_split_batches(spark):
    """MapState accumulation must be batch-split invariant: 3 chunks per
    window produce identical emissions."""
    ev = _topn_fixture_events(spark)
    got, _ = _drive_topn(ev, batches=3)
    assert sorted(got) == _topn_batch_expected(spark)


def test_topn_timer_armed_once_and_state_freed_on_fire():
    proc = WindowTopNProcessor(window_s=600, top_k=3)
    h = FakeHandle()
    proc.init(h)
    pdf1 = pd.DataFrame(
        {"user_id": [1, 2], "event_id": [0, 1],
         "ts": pd.to_datetime([1200, 1300], unit="s"), "value": [1.0, 2.0]}
    )
    pdf2 = pd.DataFrame(
        {"user_id": [1], "event_id": [2],
         "ts": pd.to_datetime([1400], unit="s"), "value": [0.5]}
    )
    assert list(proc.handleInputRows((1200,), iter([pdf1]), None)) == []
    assert h.timers == [(1200 + 600) * 1000]
    # second batch must NOT re-arm (the open flag gates registration)
    assert list(proc.handleInputRows((1200,), iter([pdf2]), None)) == []
    assert h.timers == [(1200 + 600) * 1000]
    emitted = [
        t
        for df in proc.handleExpiredTimer((1200,), None, None)
        for t in map(tuple, df.itertuples(index=False))
    ]
    # user 2: 200 cents; user 1: 150 cents over two batches
    assert emitted == [
        (1200, 2, 1, 2.0, 1),
        (1200, 1, 2, 1.5, 2),
    ]
    # all window state freed at emission
    assert not h.getMapState("totals", None, None).exists()
    assert not h.getValueState("open", None).exists()


def test_topn_tie_break_and_truncation():
    """Equal cents rank by ascending user_id; only top_k rows emit."""
    proc = WindowTopNProcessor(window_s=600, top_k=2)
    h = FakeHandle()
    proc.init(h)
    pdf = pd.DataFrame(
        {"user_id": [5, 3, 9], "event_id": [0, 1, 2],
         "ts": pd.to_datetime([0, 1, 2], unit="s"),
         "value": [1.0, 1.0, 0.25]}
    )
    list(proc.handleInputRows((0,), iter([pdf]), None))
    emitted = [
        t
        for df in proc.handleExpiredTimer((0,), None, None)
        for t in map(tuple, df.itertuples(index=False))
    ]
    assert emitted == [(0, 3, 1, 1.0, 1), (0, 5, 1, 1.0, 2)]
