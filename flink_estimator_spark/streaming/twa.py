"""Streaming time-weighted average: the stateful dual of
``operators/timeseries.q_time_weighted_avg``.

State per key is three integers — (last_ts_us, last_cents, acc_num) plus
the accumulated duration — O(1) forever: each arriving event closes the
segment the PREVIOUS event opened (value held for Δt), adds cents·Δt to
the integral, and re-arms.  Emitted rows carry the exact integer integral
(numerator) and span (denominator), so the shadow test compares integers
against the batch query's DECIMAL arithmetic, not floats.

Same cents discipline as streaming/anomaly.py: the decimal→cents cast
happens JVM-side with the batch query's exact expression before rows reach
Python, and Python-side arithmetic is arbitrary-precision int — the
int64-overflow ceiling of the Arrow state row is the documented limit
(cents·Δt_us sums: ~1e17 at fixture scale; a production deployment stores
the numerator as two 64-bit limbs or scales Δt to millis).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

TWA_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_segments", T.LongType()),
        T.StructField("span_us", T.LongType()),
        T.StructField("num_cents_us", T.LongType()),
    ]
)

TWA_STATE = T.StructType(
    [
        T.StructField("last_us", T.LongType()),
        T.StructField("last_cents", T.LongType()),
        T.StructField("n_seg", T.LongType()),
        T.StructField("span_us", T.LongType()),
        T.StructField("num", T.LongType()),
    ]
)


def _integrate(key, pdfs, state):
    last_us, last_cents, n_seg, span, num = None, None, 0, 0, 0
    if state.exists:
        last_us, last_cents, n_seg, span, num = (int(x) for x in state.get)
        if last_us == -1:
            last_us, last_cents = None, None
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["ts_us", "event_id"])
    for _, r in rows.iterrows():
        t_us, cents = int(r["ts_us"]), int(r["cents"])
        if last_us is not None:
            dt = t_us - last_us
            n_seg += 1
            span += dt
            num += last_cents * dt
        last_us, last_cents = t_us, cents
    state.update(
        (
            -1 if last_us is None else last_us,
            0 if last_cents is None else last_cents,
            n_seg,
            span,
            num,
        )
    )
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_segments": [n_seg],
            "span_us": [span],
            "num_cents_us": [num],
        }
    )


def time_weighted_totals(events: DataFrame) -> DataFrame:
    """Per-user streaming TWA accumulators (emits the updated integral for
    every key seen in each micro-batch; the latest emission per key is the
    prefix-exact answer).  CAVEAT the batch dual does not have: segments
    SPANNING a micro-batch boundary are integrated when the next batch's
    first event arrives — identical final state, but an intermediate
    emission excludes the still-open segment, exactly like the batch query
    excludes each user's final (unclosed) observation."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    prepared = events.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "ts",
        cents.alias("cents"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _integrate,
        outputStructType=TWA_OUTPUT,
        stateStructType=TWA_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
