"""Plane-A kernel tests: BASELINE.md §C goldens, reference invariants, and
validation — no Spark required (fast)."""

from __future__ import annotations

import pytest

from flink_estimator_spark.estimator.calculus import (
    Scenario,
    estimate_scenario,
    free_mem_per_node,
    greedy_pack,
    validate_scenario,
)
from tests.scenarios import BASELINE_EXPECT, GOLDEN, INVALID


@pytest.mark.parametrize("kw", [g for g in GOLDEN if g["project_name"] in BASELINE_EXPECT],
                         ids=lambda g: g["project_name"])
def test_baseline_goldens(kw):
    exp = BASELINE_EXPECT[kw["project_name"]]
    r = estimate_scenario(Scenario(**kw))
    assert r["error"] is None
    re_ = r["resource_estimates"]
    tm = r["cluster_recommendations"]["taskmanagers"]
    jm = r["cluster_recommendations"]["jobmanager"]
    sc = r["scaling_recommendations"]
    assert re_["total_memory_mb"] == exp["total_memory_mb"]
    assert re_["total_cpus"] == exp["total_cpus"]
    assert re_["total_worker_node_needed"] == exp["nodes"]
    assert re_["processing_load_score"] == 1.0
    assert tm["count"] == exp["tms"]
    assert tm["memory_mb_each"] == exp["tm_mb_each"]
    assert (jm["total_cpus"], jm["memory_mb"]) == (float(exp["jm"][0]), exp["jm"][1])
    assert (sc["min_parallelism"], sc["recommended_parallelism"], sc["max_parallelism"]) == exp["par"]
    assert sc["checkpointing_interval_ms"] == exp["ckpt"]


def test_free_mem_per_node_golden():
    # reference test golden: VM-S x3 with JM 2048 -> [13824, 15872, 15872]
    s = Scenario(project_name="g", worker_node_type="VM", worker_node_t_size="S", nb_worker_nodes=3)
    from flink_estimator_spark.estimator.calculus import normalize_scenario

    s = normalize_scenario(s)
    free, total = free_mem_per_node(s, 2048, 3)
    assert free == [13824, 15872, 15872]
    assert total == sum(free)


def test_greedy_pack_invariants():
    alloc, mx, ok, rem = greedy_pack([10000.0, 8000.0, 8000.0], 4, 4096)
    assert ok and sum(alloc) == 4 and mx == max(alloc) == 2
    assert alloc == [2, 1, 1]  # most-free-first, ties to lowest index
    assert all(r >= 0 for r in rem)
    # not enough room anywhere
    alloc, mx, ok, _ = greedy_pack([1000.0], 1, 4096)
    assert not ok and sum(alloc) == 0


def test_state_pass_goldens():
    # 20M keys @ 1KiB on VM-S -> 12 TMs, alloc [3,3,3,3]
    from flink_estimator_spark.estimator.calculus import (
        normalize_scenario,
        taskmanagers_from_state,
    )

    s = normalize_scenario(
        Scenario(project_name="s", worker_node_type="VM", worker_node_t_size="S",
                 num_distinct_keys=20_000_000, avg_record_size_bytes=1024,
                 medium_statements=1, complex_statements=0, simple_statements=0)
    )
    _, nb_tm, alloc, _, _ = taskmanagers_from_state(s, 2048, s.nb_worker_nodes)
    assert nb_tm == 12
    assert alloc == [3, 3, 3, 3]


def test_scaling_invariants():
    from tests.scenarios import random_scenarios

    for kw in random_scenarios(60):
        r = estimate_scenario(Scenario(**kw))
        if r.get("error"):
            continue
        sc = r["scaling_recommendations"]
        assert sc["min_parallelism"] <= sc["recommended_parallelism"] <= sc["max_parallelism"]
        assert 5000 <= sc["checkpointing_interval_ms"] <= 60000


def test_skew_and_bandwidth_do_not_affect_cpus():
    base = dict(project_name="x", messages_per_second=20000, avg_record_size_bytes=1024)
    cpus = {
        estimate_scenario(Scenario(**base, data_skew_risk=s, bandwidth_capacity_gbps=g))[
            "resource_estimates"
        ]["total_cpus"]
        for s in ("low", "medium", "high")
        for g in (1, 100)
    }
    assert len(cpus) == 1


def test_validation_errors():
    for kw in INVALID[:4]:
        assert validate_scenario(Scenario(**kw)), kw
    # tiny worker is *valid* input but fails placement
    r = estimate_scenario(Scenario(**INVALID[4]))
    assert r["error"] and "task manager" in r["error"]


def test_apps_double_count_quirk():
    # capacity_analysis.total_flink_statements multiplies apps twice
    r = estimate_scenario(Scenario(project_name="q", number_flink_applications=10,
                                   simple_statements=5, medium_statements=3,
                                   complex_statements=2, num_distinct_keys=1000,
                                   nb_worker_nodes=3))
    assert r["error"] is None
    assert r["capacity_analysis"]["total_flink_statements"] == 1000
