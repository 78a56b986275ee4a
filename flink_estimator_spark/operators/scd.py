"""CDC / SCD2 (type-2 slowly-changing dimension) without a table format.

Delta/Iceberg expose this as MERGE INTO; on plain parquet the same
semantics decompose into pure DataFrame ops (the pyspark guide's
"anti-join + union + window" recipe):

* **history build** — turn an update log into versioned rows: one window
  pass per key gives each update a validity interval
  [ts, next_ts) and an ``is_current`` flag.  Single shuffle on the key.
* **merge** — fold a new batch of updates into an existing SCD2 table:
  untouched keys pass through (anti-join), touched keys' histories are
  rebuilt from their old versions + new updates (union + the same window).
  Only touched keys are rewritten — the partition-overwrite pattern that
  scales to dimension tables of any size.

The log here is the ``events`` stream read as (user_id, ts, value) updates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def scd2_from_log(
    updates: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    attrs: tuple[str, ...] = ("value",),
) -> DataFrame:
    """Versioned SCD2 rows from an update log: per key, each update is
    valid from its timestamp until the next update (epoch micros; open
    validity encoded as NULL valid_to)."""
    w = W.partitionBy(key).orderBy(ts, *attrs)
    cols = [F.col(key), *[F.col(a) for a in attrs]]
    return (
        updates.select(*cols, F.unix_micros(F.col(ts)).alias("valid_from_us"))
        .withColumn(
            "valid_to_us",
            F.lead("valid_from_us").over(
                W.partitionBy(key).orderBy("valid_from_us", *attrs)
            ),
        )
        .withColumn("is_current", F.col("valid_to_us").isNull())
    )


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    attrs: tuple[str, ...] = ("value",),
) -> DataFrame:
    """MERGE a batch of updates into an SCD2 table (Delta-free MERGE INTO).

    Keys untouched by the batch pass through unchanged (left-anti join);
    touched keys are rebuilt from their existing versions plus the new
    updates — equivalent to ``scd2_from_log`` over the full combined log,
    which is the correctness contract the test asserts.
    """
    upd_keys = updates.select(F.col(key)).distinct()
    untouched = current.join(upd_keys, key, "left_anti")
    touched_old = current.join(upd_keys, key, "left_semi").select(
        F.col(key),
        *[F.col(a) for a in attrs],
        F.col("valid_from_us"),
    )
    new_rows = updates.select(
        F.col(key),
        *[F.col(a) for a in attrs],
        F.unix_micros(F.col(ts)).alias("valid_from_us"),
    )
    rebuilt = (
        touched_old.unionByName(new_rows)
        .withColumn(
            "valid_to_us",
            F.lead("valid_from_us").over(
                W.partitionBy(key).orderBy("valid_from_us", *attrs)
            ),
        )
        .withColumn("is_current", F.col("valid_to_us").isNull())
    )
    return untouched.unionByName(rebuilt)


from ..plans._helpers import t  # noqa: E402
from ..plans.registry import query  # noqa: E402


@query(
    "q_scd2_history",
    oracle="""
        SELECT user_id, value, valid_from_us,
               lead(valid_from_us) OVER w AS valid_to_us,
               lead(valid_from_us) OVER w IS NULL AS is_current
        FROM (
            SELECT user_id, value, epoch_us(ts) AS valid_from_us
            FROM events WHERE user_id < 30
        )
        WINDOW w AS (PARTITION BY user_id ORDER BY valid_from_us, value)
        ORDER BY user_id, valid_from_us, value
    """,
    tags=("complex", "cdc", "scd2"),
)
def q_scd2_history(spark, sf_dir):
    """SCD2 history build: each user's event log becomes versioned rows
    with [valid_from, valid_to) intervals and an is_current flag."""
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    return scd2_from_log(ev).orderBy("user_id", "valid_from_us", "value")
