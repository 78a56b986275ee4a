"""Time-series operators over the event stream: exact-moment outlier
detection and grid resampling with forward fill.

Both are "advanced analytical queries" in the reference's complex class
(`/root/reference/src/templates/estimation.html:231-245`), re-expressed with
deterministic cross-engine arithmetic:

* moments (mean/variance) accumulate through DECIMAL sums — exact and
  order-independent — then finish in double, where every op (div, mul,
  sqrt) is IEEE-correctly-rounded and therefore bit-identical in Spark and
  DuckDB;
* the resample grid comes from ``sequence()``/``generate_series`` literals,
  so the plan is a bounded explode, not a driver loop.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..plans._helpers import dec, t
from ..plans.registry import query


@query(
    "q_value_outliers",
    oracle="""
        WITH stats AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s,
                   CAST(sum(CAST(value AS DECIMAL(18,2))
                            * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sq
            FROM events
            GROUP BY event_type
        ),
        m AS (
            SELECT event_type, s / n AS mean,
                   sqrt((sq - s * s / n) / n) AS sigma
            FROM stats
        )
        SELECT e.event_id, e.event_type, e.value,
               (e.value - m.mean) / m.sigma AS z
        FROM events e JOIN m USING (event_type)
        WHERE abs(e.value - m.mean) > 2.5 * m.sigma
        ORDER BY e.event_id
    """,
    tags=("llm", "timeseries", "stats"),
)
def q_value_outliers(spark, sf_dir):
    """Events whose value sits more than 2.5 population-sigmas from their
    event-type mean.  Moments are computed once per type (decimal sums →
    exact regardless of partitioning), broadcast back onto the stream, and
    the filter is a scan-local predicate — one aggregate shuffle total."""
    e = t(spark, sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(dec("value")).cast("double").alias("s"),
        F.sum(dec("value") * dec("value")).cast("double").alias("sq"),
    )
    m = stats.select(
        "event_type",
        (F.col("s") / F.col("n")).alias("mean"),
        F.sqrt((F.col("sq") - F.col("s") * F.col("s") / F.col("n")) / F.col("n")).alias("sigma"),
    )
    return (
        e.join(F.broadcast(m), "event_type")
        .filter(F.abs(F.col("value") - F.col("mean")) > 2.5 * F.col("sigma"))
        .select(
            "event_id",
            "event_type",
            "value",
            ((F.col("value") - F.col("mean")) / F.col("sigma")).alias("z"),
        )
        .orderBy("event_id")
    )


_GRID_START = "2024-01-01 00:00:00"
_GRID_END = "2024-01-30 23:00:00"


@query(
    "q_resample_ffill",
    oracle=f"""
        WITH grid AS (
            SELECT u.user_id, g.h
            FROM range(0, 5) u(user_id)
            CROSS JOIN (
                SELECT unnest(generate_series(
                    TIMESTAMP '{_GRID_START}', TIMESTAMP '{_GRID_END}',
                    INTERVAL 1 HOUR)) AS h
            ) g
        ),
        obs AS (
            SELECT user_id, h, value FROM (
                SELECT user_id, date_trunc('hour', ts) AS h, value,
                       row_number() OVER (
                           PARTITION BY user_id, date_trunc('hour', ts)
                           ORDER BY ts DESC, event_id DESC
                       ) AS rn
                FROM events WHERE user_id < 5
            ) WHERE rn = 1
        )
        SELECT grid.user_id AS user_id,
               CAST(epoch(grid.h) AS BIGINT) AS hour_s,
               last_value(obs.value IGNORE NULLS) OVER (
                   PARTITION BY grid.user_id ORDER BY grid.h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS filled_value
        FROM grid LEFT JOIN obs
          ON obs.user_id = grid.user_id AND obs.h = grid.h
        ORDER BY grid.user_id, hour_s
    """,
    tags=("llm", "timeseries", "resample"),
)
def q_resample_ffill(spark, sf_dir):
    """Hourly resampling with forward fill: a fixed user×hour grid
    (sequence + explode — no driver loop), each cell taking the hour's
    latest observation, gaps carrying the previous value forward via
    last(ignorenulls) over an unbounded-preceding frame.  Hours before a
    user's first event stay NULL (and are verified as NULL).

    Scale shape: the grid explode is |users|×|hours| rows partitioned by
    user; the observation side pre-reduces to one row per user-hour before
    the join; the fill window never re-sorts (grid is generated ordered)."""
    e = t(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    obs = (
        e.select(
            "user_id",
            F.date_trunc("hour", F.col("ts")).alias("h"),
            "value",
            F.row_number()
            .over(
                W.partitionBy("user_id", F.date_trunc("hour", F.col("ts")))
                .orderBy(F.col("ts").desc(), F.col("event_id").desc())
            )
            .alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    grid = (
        spark.range(5)
        .select(F.col("id").alias("user_id"))
        .crossJoin(
            spark.sql(
                f"SELECT explode(sequence(TIMESTAMP '{_GRID_START}', "
                f"TIMESTAMP '{_GRID_END}', INTERVAL 1 HOUR)) AS h"
            )
        )
    )
    filled = F.last(F.col("value"), ignorenulls=True).over(
        W.partitionBy(grid.user_id).orderBy("h").rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        grid.join(obs, ["user_id", "h"], "left")
        .select(
            "user_id",
            F.unix_timestamp("h").alias("hour_s"),
            filled.alias("filled_value"),
        )
        .orderBy("user_id", "hour_s")
    )
