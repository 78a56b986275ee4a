"""Incremental aggregate maintenance: mergeable partial states.

At 100 TB a daily rollup is never recomputed from scratch — yesterday's
materialized aggregate is *merged* with today's delta.  That works exactly
when the aggregate state is a commutative monoid: (count, sum, min, max)
merge by (+, +, least, greatest); avg is derived sum/count at read time,
never stored.  This module implements the pattern over plain parquet:

    partial = partial_rollup(events_of_day)          # one day's state
    merged  = merge_rollups(prev_state, partial)     # monoid combine

``merge_rollups(partial_rollup(A), partial_rollup(B)) ==
partial_rollup(A ∪ B)`` is the contract — asserted both in pytest (split
at an arbitrary cutoff) and by the registered query's DuckDB oracle (which
recomputes the same rollup from scratch: if merging lost or double-counted
anything, the gate row goes red).

Sums accumulate in DECIMAL so the merged result is independent of both
partial-aggregation order and the A/B split point (CLAUDE.md rule).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans._helpers import t
from ..plans.registry import query

KEYS = ["day", "event_type"]


def partial_rollup(events: DataFrame) -> DataFrame:
    """One increment's mergeable state: map-side-combining hash aggregate
    keyed on (day, event_type)."""
    return (
        events.select(
            F.to_date("ts").alias("day"),
            "event_type",
            F.col("value").cast("decimal(18,2)").alias("v"),
        )
        .groupBy(*KEYS)
        .agg(
            F.count("*").alias("n"),
            F.sum("v").alias("sum_v"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
    )


def merge_rollups(*states: DataFrame) -> DataFrame:
    """Monoid combine of any number of partial states — the incremental
    refresh.  Cost is proportional to the STATE size (days x types), not the
    event volume that produced it; the shuffle key space is identical to the
    rollup's, so at scale this is a metadata-sized job."""
    unioned = reduce(DataFrame.unionByName, states)
    return unioned.groupBy(*KEYS).agg(
        F.sum("n").alias("n"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


@query(
    "q_incremental_rollup",
    oracle="""
        SELECT CAST(day AS VARCHAR) AS day, event_type,
               n, avg_v, min_v, max_v
        FROM (
            SELECT CAST(ts AS DATE) AS day, event_type,
                   count(*) AS n,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                        / count(*) AS avg_v,
                   CAST(min(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_v,
                   CAST(max(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_v
            FROM events
            GROUP BY 1, 2
        )
        ORDER BY day, event_type
    """,
    tags=("incremental", "rollup", "materialized-view"),
)
def q_incremental_rollup(spark, sf_dir):
    """Daily rollup maintained incrementally: the corpus is split at its
    median timestamp into 'history' and 'delta', each rolled up
    independently, then monoid-merged.  The oracle recomputes the rollup
    from scratch — merge loss or double counting fails the gate.  The
    split is derived from the data (approx median), so the same query
    exercises the merge at every scale factor."""
    ev = t(spark, sf_dir, "events")
    cutoff = ev.agg(
        F.expr("approx_percentile(unix_micros(ts), 0.5)").alias("c")
    )
    with_c = ev.crossJoin(F.broadcast(cutoff))
    history = with_c.filter(F.unix_micros("ts") <= F.col("c")).drop("c")
    delta = with_c.filter(F.unix_micros("ts") > F.col("c")).drop("c")
    merged = merge_rollups(partial_rollup(history), partial_rollup(delta))
    return (
        merged.select(
            F.col("day").cast("string").alias("day"),
            "event_type",
            "n",
            # divide in DOUBLE after the exact DECIMAL sum: a decimal
            # quotient would round at the decimal scale, not at binary64
            (F.col("sum_v").cast("double") / F.col("n")).alias("avg_v"),
            F.col("min_v").cast("double").alias("min_v"),
            F.col("max_v").cast("double").alias("max_v"),
        )
        .orderBy("day", "event_type")
    )
