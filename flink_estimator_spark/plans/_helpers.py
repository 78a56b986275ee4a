"""Shared builder helpers for the declared query inventory.

Hash-parity conventions (see registry.py docstring): money columns are
2-decimal values stored as doubles, so aggregates go through DECIMAL(18,2)
arithmetic (exact, order-independent) and are cast back to DOUBLE at the end
— both engines then produce bit-identical numbers regardless of row order.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import read_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, os.path.join(sf_dir, f"{name}.parquet"))


def dec(col: str | Column, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def as_double(c: Column) -> Column:
    return c.cast("double")


# revenue := extendedprice * (1 - discount), exact decimal arithmetic
def revenue_expr() -> Column:
    return dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))


# the matching DuckDB fragment
REVENUE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)


def eager_checkpoint(df: DataFrame) -> DataFrame:
    """Materialize ``df`` once with ZERO persistent-RDD footprint.

    The cache -> reliable checkpoint -> unpersist sequence: the checkpoint
    job populates the cache blocks (computed once), the checkpoint write
    drains them to the session checkpoint dir, and the unpersist releases
    the blocks — ``getPersistentRDDs()`` is empty afterwards, unlike
    ``.cache()`` (pins until someone remembers to release, the r3 verdict's
    session-hygiene bug) or ``.localCheckpoint()`` (pins block-manager
    storage for its lifetime AND dies with an executor).  Later actions
    read the checkpoint files.  This is the GraphFrames pattern for
    iterative algorithms: it also truncates lineage, so loop operators
    don't grow a plan per iteration.

    Cost: one disk round-trip of ``df``'s rows.  Use for (a) loop state
    that must survive many iterations, (b) shared subtrees too expensive
    to recompute that ``ReusedExchange`` cannot cover.  For cheap shared
    subtrees prefer no pinning at all — identical Exchange subtrees are
    deduplicated by Catalyst for free.
    """
    sc = df.sparkSession.sparkContext
    if sc._jsc.sc().getCheckpointDir().isEmpty():
        # The driver gate builds queries with ITS OWN SparkSession (not our
        # session factory), which has no checkpoint dir — and, unlike the
        # factory, almost certainly lacks
        # spark.cleaner.referenceTracking.cleanCheckpoints, so files written
        # by iterative operators would accumulate for the session lifetime.
        # Mitigation: key the fallback dir by applicationId so each foreign
        # session's leftovers are an isolated subdirectory that the factory
        # (session.py) prunes on next startup (ADVICE r4).
        repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        sc.setCheckpointDir(os.path.join(
            repo_root, "spark-warehouse", "_checkpoints", sc.applicationId))
    cached = df.cache()
    out = cached.checkpoint(eager=True)
    cached.unpersist()
    return out


def spread(df: DataFrame, key: str) -> DataFrame:
    """Repartition a small-but-compute-heavy input across the cluster.

    Small parquet tables scan as a single split, so any downstream stage
    with heavy per-row compute (all-pairs scoring, shingle explosion,
    wide partial aggregates, nested-loop joins) runs in ONE task.  A hash
    repartition on the row id costs a shuffle of the (tiny) input and buys
    full parallelism — the inverse of the minimize-shuffle rule, applied
    exactly when per-partition compute dwarfs per-partition bytes.
    """
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(n, F.col(key))
