"""Shared builder helpers for the declared query inventory.

Hash-parity conventions (see registry.py docstring): money columns are
2-decimal values stored as doubles, so aggregates go through DECIMAL(18,2)
arithmetic (exact, order-independent) and are cast back to DOUBLE at the end
— both engines then produce bit-identical numbers regardless of row order.
"""

from __future__ import annotations

import itertools
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


_MAT_N = itertools.count()


def materialize(df: DataFrame) -> DataFrame:
    """Materialize ``df`` once in a SINGLE job: parquet write + read-back.

    ``eager_checkpoint`` costs two jobs per call (the eager count that
    fills the cache, then the RDD-checkpoint write) because RDD
    checkpointing always recomputes under a second action; a parquet
    round-trip folds compute and write into ONE job.  Measured same-process
    A/B at sf0.1 (optimization r10, tools/exp_materialize.py): q_emb_pq_adc
    3.37 -> 2.83 s, q_emb_ivfpq_adc 5.2 -> 4.6 s, q_theta_setops
    3.1 -> 2.6 s, q_bfs_levels 2.85 -> 2.61 s — identical rows everywhere.

    NOT a drop-in replacement for ``eager_checkpoint``:

    * tight per-round loop state loses (per-write commit overhead —
      q_kcore_peel flat-to-worse, q_emb_graph_ann's beam 3.5 -> 5.8 s);
    * a materialized table feeding compute-heavy map work loses the
      checkpoint's preserved partition count to read-back split packing
      (q_mutual_knn_pairs / q_emb_matryoshka coded: mat slower);
    * results consumed from a still-warm ``.cache()`` keep the checkpoint
      (q_dedup_clusters: mat slower).

    Use it for ONE-SHOT trained/shared intermediates whose consumers are
    shuffle-bound or broadcast-tiny.  Files land under the checkpoint
    dir keyed by applicationId ("local-..." prefix), so the session
    factory's startup prune bounds the on-disk footprint exactly as it
    does for foreign-session checkpoint leftovers."""
    spark = df.sparkSession
    sc = spark.sparkContext
    if sc._jsc.sc().getCheckpointDir().isEmpty():
        repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        sc.setCheckpointDir(os.path.join(
            repo_root, "spark-warehouse", "_checkpoints", sc.applicationId))
    base = sc._jsc.sc().getCheckpointDir().get()
    path = os.path.join(base, f"{sc.applicationId}_mat", f"m{next(_MAT_N)}")
    df.write.mode("overwrite").parquet(path)
    return spark.read.schema(df.schema).parquet(path)


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
