"""Close the loop with the reference's purpose: the estimator configures the
stream runtime.

The reference *estimates* a Flink deployment (parallelism, checkpoint
interval, TM count) from a workload description; here the same calculus
(Plane A) emits the equivalent Structured Streaming configuration —
shuffle partitions from recommended parallelism, trigger interval from the
latency target, checkpoint location policy from the checkpoint interval.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession

from ..estimator.calculus import Scenario, estimate_scenario


@dataclass
class StreamConfig:
    shuffle_partitions: int
    max_partitions: int
    trigger_processing_time: str
    checkpoint_interval_ms: int
    n_task_slots: int


def stream_config_from_estimate(scenario: Scenario) -> StreamConfig:
    """Map an EstimationResult onto Structured Streaming knobs
    (SURVEY.md §2.2 'streaming-semantics knobs' table)."""
    r = estimate_scenario(scenario)
    if r.get("error"):
        raise ValueError(r["error"])
    sc = r["scaling_recommendations"]
    tm = r["cluster_recommendations"]["taskmanagers"]
    trigger_s = max(min(scenario.expected_latency_seconds / 2.0, 60.0), 0.1)
    slots = max(1, -(-tm["total_cpus"] // tm["count"])) if tm["count"] else 1
    return StreamConfig(
        shuffle_partitions=max(1, sc["recommended_parallelism"]),
        max_partitions=max(1, sc["max_parallelism"]),
        trigger_processing_time=f"{trigger_s} seconds",
        checkpoint_interval_ms=sc["checkpointing_interval_ms"],
        n_task_slots=slots,
    )


def apply_stream_config(spark: SparkSession, cfg: StreamConfig) -> None:
    spark.conf.set("spark.sql.shuffle.partitions", str(cfg.shuffle_partitions))
    spark.conf.set(
        "spark.sql.streaming.stateStore.maintenanceInterval",
        f"{max(cfg.checkpoint_interval_ms // 1000, 1)}s",
    )
