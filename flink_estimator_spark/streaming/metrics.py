"""Pipeline observability: per-micro-batch metrics via ``Dataset.observe``.

``observe`` attaches aggregate metrics to a plan node; for streams they are
computed per micro-batch ON the data already flowing (no second pass, no
extra action) and surface in every ``StreamingQueryProgress`` under
``observedMetrics`` — the mechanism production monitoring hangs off
(row rates, event-time lag, null-rate canaries) without touching the query
result.  The same call works on batch DataFrames through
``pyspark.sql.Observation``.

The event-time lag metric is the one that matters operationally at scale:
``max(ts)`` per batch vs the batch's processing time bounds how far the
pipeline is behind, and a growing gap is the first symptom of an
under-provisioned stream — exactly the signal the reference's estimator
sizes clusters to avoid (SURVEY §2.1 A10-A17).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

INGEST_METRIC = "ingest"


def with_ingest_metrics(df: DataFrame, ts_col: str = "ts",
                        name: str = INGEST_METRIC) -> DataFrame:
    """Attach row-count / event-time-span / null-id canary metrics.

    Reading them: for a stream, each progress object carries
    ``observedMetrics[name]``; sum ``rows`` across batches == rows ingested
    (asserted in ``tests/test_streaming.py``)."""
    return df.observe(
        name,
        F.count(F.lit(1)).alias("rows"),
        F.min(F.col(ts_col)).cast("long").alias("min_ts_s"),
        F.max(F.col(ts_col)).cast("long").alias("max_ts_s"),
        F.sum(F.when(F.col("event_id").isNull(), 1).otherwise(0)).alias(
            "null_ids"
        ),
    )


def observed(progresses) -> list[dict]:
    """Extract the ingest metrics rows from a list of progress dicts (a
    query's ``recentProgress``)."""
    out = []
    for p in progresses:
        m = (p or {}).get("observedMetrics", {}).get(INGEST_METRIC)
        if m:
            out.append(m)
    return out
