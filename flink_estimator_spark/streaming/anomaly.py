"""Streaming anomaly detection: per-key running 3-sigma test, exact.

The streaming dual of ``plans/advanced.q_running_anomaly``: each event is
tested against the mean/variance of the same user's strictly-prior events.
State per key is three integers — (n, sum_cents, sumsq_cents) — O(1)
forever, and the test ``(n·x − s)² > 9·n·(n·q − s²)`` runs in Python
arbitrary-precision ints, which agrees bit-for-bit with the batch query's
DECIMAL(38,0) arithmetic.

The cents projection happens JVM-side with the SAME decimal expression as
the batch query (``CAST(value AS DECIMAL(18,2)) * 100``) BEFORE rows reach
the stateful operator — the Python side never rounds a float, so streaming
and batch cannot disagree on a boundary cent.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ANOMALY_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("n_prior", T.LongType()),
    ]
)

ANOMALY_STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.LongType()),
        T.StructField("q", T.LongType()),
    ]
)

MIN_PRIOR = 5


def _detect(key, pdfs, state):
    n, s, q = 0, 0, 0
    if state.exists:
        n, s, q = (int(x) for x in state.get)
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["ts_us", "event_id"])
    out = []
    for _, r in rows.iterrows():
        v = int(r["v"])
        if n >= MIN_PRIOR:
            dev = n * v - s
            if dev * dev > 9 * n * (n * q - s * s):
                out.append((key[0], int(r["event_id"]), int(r["ts_us"]), n))
        n += 1
        s += v
        q += v * v
    state.update((n, s, q))
    if out:
        yield pd.DataFrame(out, columns=["user_id", "event_id", "ts_us", "n_prior"])


def running_anomalies(events: DataFrame) -> DataFrame:
    """Per-user streaming 3-sigma anomaly flags on ``applyInPandasWithState``
    (dependency-free stateful API).  Emits a row the moment an event breaks
    3 sigma against its key's accumulated history; state never grows."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    v = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    prepared = events.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "ts",
        v.alias("v"),
    )
    return (
        prepared.groupBy("user_id")
        .applyInPandasWithState(
            _detect,
            outputStructType=ANOMALY_OUTPUT,
            stateStructType=ANOMALY_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
