"""Adaptive Query Execution posture, proven at runtime (not just configured):
the session claims AQE handles residual skew and right-sizes reducer counts
(SCALE.md §1) — these tests force both behaviors locally and read the
ADAPTIVE executed plan for the evidence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _executed_plan(df) -> str:
    df.collect()  # AQE finalizes the plan only after execution
    return df._jdf.queryExecution().executedPlan().toString()


def test_aqe_splits_skewed_join_partitions(spark):
    # one hot key holding ~all build-side rows; thresholds lowered so the
    # fixture-sized partitions count as "skewed" exactly as a 100 TB hot
    # key would against production defaults
    conf = spark.conf
    old = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.forceOptimizeSkewedJoin",
        )
    }
    try:
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        # the aggregate after the join needs its own exchange, and by default
        # Spark SKIPS skew splitting when it would add a shuffle — the split
        # breaks the join's hash-partitioning guarantee.  force* opts in
        # (worth it exactly when the skew dominates, as a hot key does)
        conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")

        # payloads are hashed so the hot partition's SHUFFLE BYTES stay big:
        # skew detection reads compressed sizes, and a constant-key/sequential
        # payload compresses straight through the threshold
        hot = spark.range(300_000).select(
            F.lit(0).alias("k"),
            F.xxhash64("id").alias("p1"),
            F.xxhash64("id", F.lit(1)).alias("p2"),
        )
        tail = spark.range(1000).select(
            (F.col("id") + 1).alias("k"),
            F.xxhash64("id").alias("p1"),
            F.xxhash64("id", F.lit(2)).alias("p2"),
        )
        left = hot.unionAll(tail)
        right = spark.range(1001).select(
            F.col("id").alias("k"), F.lit("dim").alias("tag")
        )
        joined = left.join(right, "k").groupBy("tag").count()
        plan = _executed_plan(joined)
        assert "skew=true" in plan, f"no skew split in adaptive plan:\n{plan[:2000]}"
    finally:
        for k, v in old.items():
            conf.set(k, v)


def test_aqe_coalesces_tiny_shuffle_partitions(spark):
    # a 5-group aggregate shuffles KBs; AQE must collapse the configured 32
    # reducers down to a handful instead of scheduling 32 near-empty tasks
    n_conf = int(spark.conf.get("spark.sql.shuffle.partitions"))
    agg = (
        spark.range(10_000)
        .select((F.col("id") % 5).alias("g"))
        .groupBy("g")
        .count()
    )
    agg.collect()
    n_actual = agg.rdd.getNumPartitions()
    assert n_actual < n_conf, (n_actual, n_conf)
