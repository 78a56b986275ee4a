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
