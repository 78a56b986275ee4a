"""Shared scenario corpus: the reference's golden cases + a seeded random
sweep (domain kept inside the regime where the reference itself terminates)."""

from __future__ import annotations

import random

GOLDEN = [
    dict(project_name="default_vm_s", worker_node_type="VM", worker_node_t_size="S"),
    dict(project_name="readme", messages_per_second=10000, avg_record_size_bytes=1024,
         simple_statements=2, medium_statements=1, complex_statements=1,
         num_distinct_keys=100000, expected_latency_seconds=5.0,
         worker_node_memory_mb=16384.0, worker_node_cpu_max=8, nb_worker_nodes=3),
    dict(project_name="simple_vm_s", worker_node_type="VM", worker_node_t_size="S",
         messages_per_second=10000, avg_record_size_bytes=1024,
         simple_statements=1, medium_statements=1, complex_statements=1,
         num_distinct_keys=10_000_000),
    dict(project_name="tight_latency", messages_per_second=200000, avg_record_size_bytes=1024,
         simple_statements=1, medium_statements=0, complex_statements=0,
         num_distinct_keys=5000, expected_latency_seconds=0.5,
         worker_node_memory_mb=65536.0, worker_node_cpu_max=32),
    dict(project_name="high_volume_10apps", messages_per_second=50000, avg_record_size_bytes=2048,
         simple_statements=5, medium_statements=3, complex_statements=2,
         number_flink_applications=10, num_distinct_keys=10_000_000,
         worker_node_memory_mb=65536.0, worker_node_cpu_max=8),
    dict(project_name="zero_stmts", simple_statements=0, medium_statements=0, complex_statements=0),
    dict(project_name="big_records", messages_per_second=100,
         avg_record_size_bytes=10 * 1024 * 1024, num_distinct_keys=1000),
    dict(project_name="many_small_msgs", messages_per_second=1_000_000, avg_record_size_bytes=10),
]

# Expected structs for the five BASELINE.md §C rows, keyed by project_name.
BASELINE_EXPECT = {
    "default_vm_s": dict(total_memory_mb=6144, total_cpus=4, nodes=1, tms=1,
                         tm_mb_each=4096.0, jm=(1, 2048), par=(1, 3, 6), ckpt=9000),
    "readme": dict(total_memory_mb=10240, total_cpus=8, nodes=2, tms=2,
                   tm_mb_each=4096.0, jm=(1, 2048), par=(3, 7, 14), ckpt=9000),
    "simple_vm_s": dict(total_memory_mb=51200, total_cpus=48, nodes=4, tms=12,
                        tm_mb_each=4096.0, jm=(1, 2048), par=(23, 47, 94), ckpt=9000),
    "tight_latency": dict(total_memory_mb=10240, total_cpus=8, nodes=1, tms=2,
                          tm_mb_each=4096.0, jm=(1, 2048), par=(3, 14, 14), ckpt=5000),
    "high_volume_10apps": dict(total_memory_mb=2447360, total_cpus=2388, nodes=41, tms=597,
                               tm_mb_each=4096.0, jm=(1, 2048), par=(1193, 2387, 4774), ckpt=9000),
}

INVALID = [
    dict(project_name="   "),
    dict(project_name="no_rate", messages_per_second=0),
    dict(project_name="neg_stmts", simple_statements=-1),
    dict(project_name="vm_no_size", worker_node_type="VM"),
    dict(project_name="tiny_worker", worker_node_memory_mb=1024.0, worker_node_cpu_max=2),
]


def random_scenarios(n: int = 100, seed: int = 7) -> list[dict]:
    rng = random.Random(seed)
    out = []
    for i in range(n):
        kw = dict(
            project_name=f"rnd{i}",
            messages_per_second=rng.choice([1, 100, 5000, 10000, 200000, 1_000_000]),
            avg_record_size_bytes=rng.choice([10, 100, 512, 1024, 10240]),
            number_flink_applications=rng.choice([1, 1, 2, 10]),
            num_distinct_keys=rng.choice([1, 5000, 100_000, 10_000_000, 100_000_001]),
            data_skew_risk=rng.choice(["low", "medium", "high"]),
            bandwidth_capacity_gbps=rng.choice([1, 10, 100]),
            expected_latency_seconds=rng.choice([0.1, 0.5, 1.0, 2.5, 5.0, 10.0]),
            simple_statements=rng.randint(0, 6),
            medium_statements=rng.randint(0, 5),
            complex_statements=rng.randint(0, 4),
            worker_node_memory_mb=float(rng.choice([4096, 8192, 16384, 65536, 524288])),
            worker_node_cpu_max=rng.choice([2, 4, 8, 16, 48, 256]),
            nb_worker_nodes=rng.choice([1, 1, 3, 10]),
        )
        if kw["num_distinct_keys"] >= 100_000_001:
            kw["avg_record_size_bytes"] = min(kw["avg_record_size_bytes"], 512)
            kw["number_flink_applications"] = 1
        if rng.random() < 0.4:
            kw["worker_node_type"] = "VM"
            kw["worker_node_t_size"] = rng.choice(["S", "M", "L"])
        out.append(kw)
    return out
