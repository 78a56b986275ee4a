"""Skew mitigation: salted two-phase aggregation and salted broadcast join.

A hot grouping key (here: ``event_type``, 5 distinct values over the whole
corpus) funnels every row of the key into one reducer — at 100 TB that one
task runs for hours while the rest of the cluster idles.  Salting splits
each hot key into ``n_salts`` sub-keys for a parallel partial aggregate,
then a second (tiny) aggregate folds the sub-results.  The result is
identical to the direct groupBy; only the shuffle layout changes.

AQE (``spark.sql.adaptive.skewJoin.enabled``, on in session.py) handles
skewed *sort-merge joins* automatically by splitting oversized partitions;
explicit salting remains the tool for skewed *aggregations* and for
broadcast-join fan-out, which AQE does not rebalance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..plans._helpers import t
from ..plans.registry import query


def with_salt(df: DataFrame, n_salts: int = 16, from_col: str | None = None) -> DataFrame:
    """Add a ``_salt`` column in [0, n_salts).  Derived from a hash of an
    existing column (deterministic) when given, else from the partition id
    (cheapest; still valid — any distribution works for correctness)."""
    src = F.xxhash64(from_col) if from_col else F.spark_partition_id().cast("long")
    return df.withColumn("_salt", F.pmod(src, F.lit(n_salts)).cast("int"))


def salted_agg(
    df: DataFrame,
    key: str,
    value: str,
    n_salts: int = 16,
    salt_from: str | None = None,
) -> DataFrame:
    """Two-phase salted aggregation: count + decimal-exact sum per key.

    Phase 1 shuffles on (key, salt) — n_salts-way parallelism per hot key;
    phase 2 shuffles only ``distinct_keys x n_salts`` partial rows.  Decimal
    accumulation makes the fold order irrelevant, so the output is
    bit-identical to a direct groupBy.
    """
    partial = (
        with_salt(df, n_salts, salt_from)
        .groupBy(key, "_salt")
        .agg(
            F.count("*").alias("_n"),
            F.sum(F.col(value).cast("decimal(27,6)")).alias("_s"),
        )
    )
    return partial.groupBy(key).agg(
        F.sum("_n").alias("n"),
        F.sum("_s").alias("sum_value"),
    )


def salted_broadcast_join(
    fact: DataFrame, dim: DataFrame, key: str, n_salts: int = 8
) -> DataFrame:
    """Skew-proof small-dim join: replicate the dim across every salt value
    and join on (key, salt).  With a broadcast dim the salt is free insurance;
    the same shape also fixes skewed shuffle joins where one key floods a
    partition (there, the replication cost is real but bounded: |dim| x
    n_salts rows)."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    dim_rep = dim.select("*", salts)
    f = with_salt(fact, n_salts)
    return f.join(F.broadcast(dim_rep), [key, "_salt"]).drop("_salt")


@query(
    "q_skew_salted_agg",
    oracle="""
        SELECT event_type, count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("complex", "skew", "salting"),
)
def q_skew_salted_agg(spark, sf_dir):
    """Hot-key aggregation via salting: 5 event types over the whole corpus,
    pre-aggregated 16-way per type before the final fold.  Same answer as the
    direct groupBy (the oracle) — only the shuffle layout differs."""
    ev = t(spark, sf_dir, "events")
    out = salted_agg(ev, "event_type", "value", n_salts=16, salt_from="event_id")
    return out.select(
        "event_type", "n", F.col("sum_value").cast("double").alias("sum_value")
    ).orderBy("event_type")


def salted_shuffle_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skewed SHUFFLE join for dims beyond broadcast: fact rows get a
    row-level salt, the dim is replicated once per salt value, and the join
    runs on (key, salt) — a hot key's rows land in n_salts partitions
    instead of one.  Replication cost is bounded (|dim| x n_salts) and the
    result is row-identical to the plain equi-join; AQE's skew-join split
    handles moderate skew on its own, explicit salting is for the key so
    hot a single post-split partition still exceeds one executor.
    Inner-join semantics (every fact row carries exactly one salt that the
    replicated dim is guaranteed to cover)."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    dim_rep = dim.select("*", salts).withColumn(
        "_salt", F.col("_salt").cast("int")
    )
    f = with_salt(fact, n_salts)
    cond = (f[fact_key] == dim_rep[dim_key]) & (f["_salt"] == dim_rep["_salt"])
    return f.join(dim_rep, cond).drop("_salt")


@query(
    "q_skew_salted_join",
    oracle="""
        SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY s_nationkey
        ORDER BY s_nationkey
    """,
    tags=("complex", "skew", "salting", "join"),
)
def q_skew_salted_join(spark, sf_dir):
    """The join dual of q_skew_salted_agg: lineitem joined to supplier
    through the salted (key, salt) layout, then aggregated per nation.
    The oracle is the PLAIN join — salting must change only the shuffle
    geometry, never a row.  (At fixture scale AQE may still broadcast the
    replicated dim; test_salted_join_shuffles pins broadcast off and
    asserts the salted-key shuffle join plus row-identity with the plain
    join — the beyond-broadcast regime this operator exists for.)"""
    li = t(spark, sf_dir, "lineitem").select("l_suppkey", "l_quantity")
    sup = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    joined = salted_shuffle_join(li, sup, "l_suppkey", "s_suppkey", n_salts=8)
    return (
        joined.groupBy("s_nationkey")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
        .orderBy("s_nationkey")
    )
