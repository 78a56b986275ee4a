"""Vectorized Spark engine for the estimation calculus (Plane A).

The reference estimates one record per HTTP call; this engine estimates N
scenarios in one DataFrame pass:

    scenarios --normalize(Catalyst)--> sizing core (Arrow Pandas UDF)
              --assembly + scaling recommendations (Catalyst)--> results

Design split (SURVEY.md §4):
* Everything closed-form — defaulting, T-shirt normalization, derived
  throughput/statement columns, JobManager tiers, scaling recommendations,
  result-struct assembly and rounding — is Catalyst column expressions
  (whole-stage codegen'd, no Python in the hot path).
* The genuinely iterative steps — the state/throughput sizing passes, the
  TM memory/count fixpoint, and greedy bin-packing with node growth
  (reference estimation.py:205-281,428-457,556-597) — run the pure-Python
  kernel from ``calculus.py`` inside one Arrow-batched Pandas UDF.  Python
  arithmetic inside the kernel also gives bit-exact ``math.ceil``/``round``
  semantics where Spark's SQL functions differ (banker's rounding etc.).

At scale: the UDF is embarrassingly parallel per row (no shuffle), so a
scenario table partitions freely across executors; all pre/post stages are
narrow column transformations.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .calculus import (
    JM_TSHIRT_CPU_MB,
    TM_VCPUS,
    VM_TSHIRT_MB_CPU,
    Scenario,
    normalize_scenario,
    sizing_core,
    validate_scenario,
)

# ---------------------------------------------------------------------------
# Schemas
# ---------------------------------------------------------------------------

scenario_schema = T.StructType(
    [
        T.StructField("project_name", T.StringType(), False),
        T.StructField("messages_per_second", T.LongType(), True),
        T.StructField("avg_record_size_bytes", T.LongType(), True),
        T.StructField("number_flink_applications", T.IntegerType(), True),
        T.StructField("num_distinct_keys", T.LongType(), True),
        T.StructField("data_skew_risk", T.StringType(), True),
        T.StructField("bandwidth_capacity_gbps", T.IntegerType(), True),
        T.StructField("expected_latency_seconds", T.DoubleType(), True),
        T.StructField("simple_statements", T.IntegerType(), True),
        T.StructField("medium_statements", T.IntegerType(), True),
        T.StructField("complex_statements", T.IntegerType(), True),
        T.StructField("worker_node_memory_mb", T.DoubleType(), True),
        T.StructField("worker_node_cpu_max", T.IntegerType(), True),
        T.StructField("nb_worker_nodes", T.IntegerType(), True),
        T.StructField("worker_node_type", T.StringType(), True),
        T.StructField("worker_node_t_size", T.StringType(), True),
    ]
)

_SCENARIO_DEFAULTS: dict[str, object] = {
    "messages_per_second": 5000,
    "avg_record_size_bytes": 512,
    "number_flink_applications": 1,
    "num_distinct_keys": 100_000,
    "data_skew_risk": "low",
    "bandwidth_capacity_gbps": 10,
    "expected_latency_seconds": 5.0,
    "simple_statements": 2,
    "medium_statements": 1,
    "complex_statements": 1,
    "worker_node_memory_mb": 16384.0,
    "worker_node_cpu_max": 8,
    "nb_worker_nodes": 1,
    "worker_node_type": "bare_metal",
}

_core_schema = T.StructType(
    [
        T.StructField("jm_cpu", T.IntegerType()),
        T.StructField("jm_memory", T.IntegerType()),
        T.StructField("raw_state_process_mb", T.DoubleType()),
        T.StructField("nb_tm_state", T.LongType()),
        T.StructField("nb_tm_cpu", T.LongType()),
        T.StructField("total_cpu_throughput", T.LongType()),
        T.StructField("nodes_from_cpu", T.LongType()),
        T.StructField("tm_process_memory_mb", T.LongType()),
        T.StructField("nb_task_managers", T.LongType()),
        T.StructField("total_cpu_needs", T.LongType()),
        T.StructField("total_memory_mb", T.LongType()),
        T.StructField("node_allocations", T.ArrayType(T.LongType())),
        T.StructField("nb_worker_nodes_final", T.LongType()),
        T.StructField("total_nodes", T.LongType()),
        T.StructField("error", T.StringType()),
    ]
)


# ---------------------------------------------------------------------------
# Catalyst stages
# ---------------------------------------------------------------------------


def _tshirt_lookup(idx: int, otherwise: Column) -> Column:
    """VM T-shirt table as a CASE WHEN chain (broadcast-literal lookup)."""
    expr = otherwise
    for size, tup in VM_TSHIRT_MB_CPU.items():
        expr = F.when(F.col("worker_node_t_size") == size, F.lit(tup[idx])).otherwise(expr)
    return expr


def apply_defaults(df: DataFrame) -> DataFrame:
    """Pydantic-style defaulting only (reference models.py:67-84) — no
    T-shirt overwrite, so the result still carries the *raw* capacity values
    the reference validates against."""
    out = df
    for name, default in _SCENARIO_DEFAULTS.items():
        out = out.withColumn(name, F.coalesce(F.col(name), F.lit(default)))
    if "worker_node_t_size" not in out.columns:
        out = out.withColumn("worker_node_t_size", F.lit(None).cast("string"))
    return out.withColumn("project_name", F.trim(F.col("project_name")))


def normalize(df: DataFrame) -> DataFrame:
    """Defaulting + T-shirt normalization + derived columns, all Catalyst
    (reference models.py:67-84, estimation.py:601-606)."""
    out = apply_defaults(df)
    is_vm = (F.col("worker_node_type") == "VM") & F.col("worker_node_t_size").isNotNull()
    out = (
        out
        .withColumn(
            "worker_node_memory_mb",
            F.when(is_vm, _tshirt_lookup(0, F.col("worker_node_memory_mb")).cast("double"))
            .otherwise(F.col("worker_node_memory_mb")),
        )
        .withColumn(
            "worker_node_cpu_max",
            F.when(is_vm, _tshirt_lookup(1, F.col("worker_node_cpu_max")).cast("int"))
            .otherwise(F.col("worker_node_cpu_max")),
        )
        .withColumn(
            "total_statements",
            (
                (F.col("simple_statements") + F.col("medium_statements") + F.col("complex_statements"))
                * F.col("number_flink_applications")
            ).cast("long"),
        )
        .withColumn(
            "total_throughput_mb_per_sec",
            F.col("messages_per_second") * F.col("avg_record_size_bytes") / F.lit(1048576.0),
        )
    )
    return out


def validation_errors_col() -> Column:
    """Per-row validation-error array (Catalyst mirror of the kernel's
    ``validate_scenario``; empty array == valid row)."""
    checks: list[tuple[Column, str]] = [
        (F.col("project_name").isNull() | (F.trim(F.col("project_name")) == ""),
         "project_name: must be non-blank"),
        (F.length("project_name") > 100, "project_name: longer than 100 characters"),
        (F.col("messages_per_second") <= 0, "messages_per_second: must be > 0"),
        (F.col("avg_record_size_bytes") <= 0, "avg_record_size_bytes: must be > 0"),
        (F.col("number_flink_applications") < 1, "number_flink_applications: must be >= 1"),
        (F.col("num_distinct_keys") < 1, "num_distinct_keys: must be >= 1"),
        (~F.col("data_skew_risk").isin("low", "medium", "high"),
         "data_skew_risk: must be one of low|medium|high"),
        (F.col("bandwidth_capacity_gbps") <= 0, "bandwidth_capacity_gbps: must be > 0"),
        (F.col("expected_latency_seconds") <= 0, "expected_latency_seconds: must be > 0"),
        (F.col("simple_statements") < 0, "simple_statements: must be >= 0"),
        (F.col("medium_statements") < 0, "medium_statements: must be >= 0"),
        (F.col("complex_statements") < 0, "complex_statements: must be >= 0"),
        ((F.col("worker_node_memory_mb") <= 0) | (F.col("worker_node_memory_mb") > 512 * 1024),
         "worker_node_memory_mb: must be in (0, 524288]"),
        ((F.col("worker_node_cpu_max") < 2) | (F.col("worker_node_cpu_max") > 256),
         "worker_node_cpu_max: must be in [2, 256]"),
        (F.col("nb_worker_nodes") < 1, "nb_worker_nodes: must be >= 1"),
        (~F.col("worker_node_type").isin("bare_metal", "VM"),
         "worker_node_type: must be bare_metal|VM"),
        ((F.col("worker_node_type") == "VM") & F.col("worker_node_t_size").isNull(),
         "worker_node_t_size: required when worker_node_type is VM"),
        (F.col("worker_node_t_size").isNotNull() & ~F.col("worker_node_t_size").isin("S", "M", "L"),
         "worker_node_t_size: must be S|M|L"),
    ]
    arr = F.array(*[F.when(cond, F.lit(msg)) for cond, msg in checks])
    return F.array_compact(arr)


def validate(df: DataFrame) -> DataFrame:
    """Attach a ``validation_errors`` array column (error-side channel:
    ``df.filter(F.size('validation_errors') > 0)``)."""
    return df.withColumn("validation_errors", validation_errors_col())


def jobmanager_columns(df: DataFrame) -> DataFrame:
    """JM tier by distinct keys as a CASE WHEN chain (estimation.py:418-425)."""
    keys = F.col("num_distinct_keys")
    tier = (
        F.when(keys <= 10_000_000, F.lit("S"))
        .when(keys <= 100_000_000, F.lit("M"))
        .otherwise(F.lit("L"))
    )
    cpu = tier
    mem = tier
    for size, (c, m) in JM_TSHIRT_CPU_MB.items():
        cpu = F.when(tier == size, F.lit(c)).otherwise(cpu)
        mem = F.when(tier == size, F.lit(m)).otherwise(mem)
    return df.withColumn("jm_cpu_expr", cpu.cast("int")).withColumn("jm_mem_expr", mem.cast("int"))


# ---------------------------------------------------------------------------
# The iterative core as an Arrow-batched Pandas UDF
# ---------------------------------------------------------------------------

_KERNEL_FIELDS = [f.name for f in scenario_schema.fields]


def _run_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """Run the pure-Python sizing kernel over one Arrow batch of scenarios."""
    out: list[dict] = []
    for row in pdf.itertuples(index=False):
        kw = dict(zip(pdf.columns, row))
        t_size = kw.get("worker_node_t_size")
        if t_size is not None and not isinstance(t_size, str) and pd.isna(t_size):
            kw["worker_node_t_size"] = None
        s = Scenario(
            project_name=str(kw["project_name"]),
            messages_per_second=int(kw["messages_per_second"]),
            avg_record_size_bytes=int(kw["avg_record_size_bytes"]),
            number_flink_applications=int(kw["number_flink_applications"]),
            num_distinct_keys=int(kw["num_distinct_keys"]),
            data_skew_risk=str(kw["data_skew_risk"]),
            bandwidth_capacity_gbps=int(kw["bandwidth_capacity_gbps"]),
            expected_latency_seconds=float(kw["expected_latency_seconds"]),
            simple_statements=int(kw["simple_statements"]),
            medium_statements=int(kw["medium_statements"]),
            complex_statements=int(kw["complex_statements"]),
            worker_node_memory_mb=float(kw["worker_node_memory_mb"]),
            worker_node_cpu_max=int(kw["worker_node_cpu_max"]),
            nb_worker_nodes=int(kw["nb_worker_nodes"]),
            worker_node_type=str(kw["worker_node_type"]),
            worker_node_t_size=kw["worker_node_t_size"],
        )
        errs = validate_scenario(s)
        if errs:
            rec = {f.name: None for f in _core_schema.fields}
            rec["error"] = "; ".join(errs)
        else:
            # validation sees RAW capacity values (reference order:
            # validate first, then T-shirt normalization — estimation.py
            # rejects out-of-range worker_node_memory_mb even when a VM
            # t-size would overwrite it); normalize only after it passes
            core = sizing_core(normalize_scenario(s))
            rec = {
                "jm_cpu": core.jm_cpu,
                "jm_memory": core.jm_memory,
                "raw_state_process_mb": float(core.raw_state_process_mb),
                "nb_tm_state": core.nb_tm_state,
                "nb_tm_cpu": core.nb_tm_cpu,
                "total_cpu_throughput": core.total_cpu_throughput,
                "nodes_from_cpu": core.nodes_from_cpu,
                "tm_process_memory_mb": core.tm_process_memory_mb,
                "nb_task_managers": core.nb_task_managers,
                "total_cpu_needs": core.total_cpu_needs,
                "total_memory_mb": core.total_memory_mb,
                "node_allocations": core.node_allocations,
                "nb_worker_nodes_final": core.nb_worker_nodes_final,
                "total_nodes": core.total_nodes,
                "error": core.error,
            }
            if core.error is not None:
                rec = {f.name: None for f in _core_schema.fields}
                rec["error"] = core.error
        out.append(rec)
    return pd.DataFrame(out, columns=[f.name for f in _core_schema.fields])


@F.pandas_udf(_core_schema)
def _sizing_core_udf(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        yield _run_kernel(pdf)


# ---------------------------------------------------------------------------
# Scaling recommendations + assembly (Catalyst)
# ---------------------------------------------------------------------------


def _scaling_columns(tm_cpus: Column) -> dict[str, Column]:
    """Skew/latency parallelism bands + checkpoint interval as column
    expressions (estimation.py:500-553; ``processing_load`` folded at 1)."""
    keys = F.col("num_distinct_keys")
    lat = F.col("expected_latency_seconds")
    skew = F.col("data_skew_risk")
    half = F.floor(tm_cpus / 2).cast("long")
    min_par = (
        F.when(skew == "high", F.greatest(F.lit(1).cast("long"), F.floor(tm_cpus / 3).cast("long")))
        .otherwise(F.greatest(F.lit(1).cast("long"), half))
    )
    rec_par = (
        F.when(skew == "high",
               F.greatest(half, F.least(F.floor(keys / 1000).cast("long"), tm_cpus.cast("long"))))
        .when(skew == "medium",
              F.least(tm_cpus.cast("long"), F.greatest(half, F.floor(keys / 2000).cast("long"))))
        .otherwise(tm_cpus.cast("long"))
    )
    max_par = F.when(skew == "high", tm_cpus.cast("long")).otherwise((tm_cpus * 2).cast("long"))
    base_ckpt = (
        F.when(skew == "high", F.lit(16000))
        .when(skew == "medium", F.lit(11000))
        .otherwise(F.lit(9000))
    )
    ckpt = (
        F.when(lat <= 0.5, F.least(base_ckpt, F.lit(5000)))
        .when(lat <= 1.0, F.least(base_ckpt, F.lit(10000)))
        .when(lat <= 5.0, F.least(base_ckpt, F.lit(20000)))
        .otherwise(base_ckpt)
    )
    boost = F.greatest(F.lit(1).cast("long"), F.floor(F.lit(2.0) / lat).cast("long"))
    rec_par = F.when(lat <= 1.0, F.least(max_par, rec_par * boost)).otherwise(rec_par)
    return {
        "min_parallelism": min_par,
        "recommended_parallelism": rec_par,
        "max_parallelism": max_par,
        "checkpointing_interval_ms": ckpt.cast("long"),
    }


def estimate_df(df: DataFrame) -> DataFrame:
    """Estimate every scenario row; returns the nested ``EstimationResult``
    struct columns plus an ``error`` string column (null == success).

    Input: any DataFrame with the ``scenario_schema`` columns (missing
    nullable values are defaulted, as the reference's Pydantic layer does).
    """
    df = apply_defaults(df)
    # stash the raw (pre-T-shirt) capacity values: the kernel validates raw
    # input exactly like the reference, then normalizes internally
    df = df.withColumn("_raw_memory_mb", F.col("worker_node_memory_mb")).withColumn(
        "_raw_cpu_max", F.col("worker_node_cpu_max")
    )
    df = normalize(df)
    _raw_aliases = {
        "worker_node_memory_mb": "_raw_memory_mb",
        "worker_node_cpu_max": "_raw_cpu_max",
    }
    kernel_struct = F.struct(
        *[F.col(_raw_aliases.get(n, n)).alias(n) for n in _KERNEL_FIELDS]
    )
    core = (
        df.withColumn("core", _sizing_core_udf(kernel_struct))
        .select("*", "core.*")
        .drop("_raw_memory_mb", "_raw_cpu_max")
    )

    ok = F.col("error").isNull()
    tm_total_mem = F.ceil(F.col("nb_task_managers") * F.col("tm_process_memory_mb")).cast("long")
    tm_cpus = F.ceil(F.col("total_cpu_needs") - F.col("jm_cpu")).cast("long")
    n_tm = F.col("nb_task_managers")
    memory_mb_each = F.when(n_tm > 0, F.bround(tm_total_mem / n_tm, 0)).otherwise(F.lit(0.0))

    input_summary = F.struct(
        F.col("messages_per_second"),
        F.col("avg_record_size_bytes"),
        F.bround(F.col("total_throughput_mb_per_sec"), 2).alias("total_throughput_mb_per_sec"),
        F.col("num_distinct_keys"),
        F.col("data_skew_risk"),
        F.round(F.col("bandwidth_capacity_gbps") * 1000).cast("long").alias("bandwidth_capacity_mbps"),
        F.col("expected_latency_seconds"),
        F.col("simple_statements"),
        F.col("medium_statements"),
        F.col("complex_statements"),
        F.col("total_statements"),
        F.col("worker_node_memory_mb").alias("worker_node_memory_capacity_mb"),
        F.col("worker_node_cpu_max").alias("worker_node_cpu_capacity"),
        F.col("nb_worker_nodes_final").alias("nb_worker_nodes"),
        F.col("worker_node_t_size"),
    )
    resource_estimates = F.struct(
        F.col("total_memory_mb"),
        F.col("total_cpu_needs").alias("total_cpus"),
        F.col("total_nodes").alias("total_worker_node_needed"),
        F.lit(1.0).alias("processing_load_score"),
    )
    cluster_recommendations = F.struct(
        F.struct(
            F.lit(1).alias("count"),
            F.col("jm_memory").alias("memory_mb"),
            F.col("jm_cpu").cast("double").alias("total_cpus"),
        ).alias("jobmanager"),
        F.struct(
            n_tm.alias("count"),
            tm_total_mem.alias("total_memory_mb"),
            tm_cpus.alias("total_cpus"),
            memory_mb_each.alias("memory_mb_each"),
        ).alias("taskmanagers"),
    )
    sc = _scaling_columns(tm_cpus)
    scaling_recommendations = F.struct(
        sc["min_parallelism"].alias("min_parallelism"),
        sc["recommended_parallelism"].alias("recommended_parallelism"),
        sc["max_parallelism"].alias("max_parallelism"),
        sc["checkpointing_interval_ms"].alias("checkpointing_interval_ms"),
    )
    capacity_analysis = F.struct(
        (F.col("total_statements") * F.col("number_flink_applications"))
        .cast("long")
        .alias("total_flink_statements"),
        F.col("number_flink_applications").alias("total_flink_applications"),
    )

    return core.select(
        F.col("project_name"),
        F.when(ok, input_summary).alias("input_summary"),
        F.when(ok, resource_estimates).alias("resource_estimates"),
        F.when(ok, cluster_recommendations).alias("cluster_recommendations"),
        F.when(ok, scaling_recommendations).alias("scaling_recommendations"),
        F.when(ok, capacity_analysis).alias("capacity_analysis"),
        F.col("error"),
    )
