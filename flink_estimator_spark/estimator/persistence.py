"""Persistence of estimation runs (reference: estimation.py:611-656 save,
main.py:388-520 list/load/delete).

Two write paths:

* ``save_estimations_df`` — the engine path: a whole results DataFrame is
  written as JSON-lines envelopes in one distributed write (no collect).
  Estimation ids are content hashes (sha2 of the input row), so re-running
  the same scenarios produces identical ids — the deterministic analogue of
  the reference's uuid4 prefix.
* ``save_estimation`` — single-record convenience mirroring the reference's
  filename contract ``{sanitized_project}_{ts}_{id}.json`` (A19's sanitizer:
  keep alnum/space/dash/underscore, strip, spaces -> underscores).

Read-back keeps the reference's round-trip property: what was written is
re-read against the declared envelope schema (write-schema == read-schema).
"""

from __future__ import annotations

import json
import os
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .engine import _SCENARIO_DEFAULTS, scenario_schema

VERSION = "1.0"
_FORBIDDEN = ("..", "/", "\\")


def _sanitize_project(name: str) -> str:
    safe = "".join(c for c in name if c.isalnum() or c in (" ", "-", "_")).rstrip()
    return safe.replace(" ", "_")


def envelope_df(inputs: DataFrame, results: DataFrame, saved_at: str) -> DataFrame:
    """Join inputs and results into SavedEstimation envelopes (one row per
    scenario).  ``saved_at`` is supplied by the caller — never wall clock
    inside the plan — so writes are reproducible."""
    inp_struct = F.struct(*[F.col(f"i.{f.name}").alias(f.name) for f in scenario_schema.fields])
    res_struct = F.struct(
        F.col("r.input_summary").alias("input_summary"),
        F.col("r.resource_estimates").alias("resource_estimates"),
        F.col("r.cluster_recommendations").alias("cluster_recommendations"),
        F.col("r.scaling_recommendations").alias("scaling_recommendations"),
        F.col("r.capacity_analysis").alias("capacity_analysis"),
    )
    meta = F.struct(
        F.substring(F.sha2(F.to_json(inp_struct), 256), 1, 8).alias("estimation_id"),
        F.lit(saved_at).alias("timestamp"),
        F.col("i.project_name").alias("project_name"),
        F.lit(saved_at).alias("saved_at"),
    )
    # Join on the full scenario identity, not project_name alone: two
    # scenarios sharing a name must each pair with their own result, never
    # cross-product.  The result side only carries the *defaulted* input
    # echo (input_summary), so the input side is defaulted the same way
    # before comparing; null-safe equality covers worker_node_t_size.
    join_cond = F.trim(F.col("i.project_name")) == F.col("r.project_name")
    for iname, rcol in [
        ("messages_per_second", "r.input_summary.messages_per_second"),
        ("avg_record_size_bytes", "r.input_summary.avg_record_size_bytes"),
        ("num_distinct_keys", "r.input_summary.num_distinct_keys"),
        ("data_skew_risk", "r.input_summary.data_skew_risk"),
        ("expected_latency_seconds", "r.input_summary.expected_latency_seconds"),
        ("simple_statements", "r.input_summary.simple_statements"),
        ("medium_statements", "r.input_summary.medium_statements"),
        ("complex_statements", "r.input_summary.complex_statements"),
        ("worker_node_t_size", "r.input_summary.worker_node_t_size"),
    ]:
        default = _SCENARIO_DEFAULTS.get(iname)
        lhs = F.col(f"i.{iname}")
        if default is not None:
            lhs = F.coalesce(lhs, F.lit(default))
        join_cond = join_cond & lhs.eqNullSafe(F.col(rcol))
    return (
        inputs.alias("i")
        .join(results.alias("r"), join_cond)
        .filter(F.col("r.error").isNull())
        .select(
            meta.alias("metadata"),
            inp_struct.alias("input_parameters"),
            res_struct.alias("estimation_results"),
            F.lit(VERSION).alias("version"),
        )
        # byte-identical duplicate scenarios still multiply through the join;
        # their envelopes are identical (content-addressed ids), so collapse
        .dropDuplicates()
    )


def save_estimations_df(envelopes: DataFrame, directory: str) -> None:
    """Distributed JSON-lines write of envelope rows."""
    envelopes.write.mode("append").json(directory)


def save_estimation(input_row: dict, result: dict, directory: str,
                    now: datetime | None = None) -> str:
    """Single-envelope file with the reference's filename contract."""
    os.makedirs(directory, exist_ok=True)
    now = now or datetime.now()
    blob = json.dumps(input_row, sort_keys=True, default=str)
    import hashlib

    estimation_id = hashlib.sha256(blob.encode()).hexdigest()[:8]
    meta = {
        "estimation_id": estimation_id,
        "timestamp": now.isoformat(),
        "project_name": input_row.get("project_name", ""),
        "saved_at": now.strftime("%Y-%m-%d %H:%M:%S"),
    }
    envelope = {
        "metadata": meta,
        "input_parameters": input_row,
        "estimation_results": result,
        "version": VERSION,
    }
    fname = f"{_sanitize_project(meta['project_name'])}_{now.strftime('%Y%m%d_%H%M%S')}_{estimation_id}.json"
    with open(os.path.join(directory, fname), "w", encoding="utf-8") as f:
        json.dump(envelope, f, indent=2, default=str)
    return fname


def list_saved(directory: str) -> list[dict]:
    """Directory-of-JSON-files as a table, newest first (A20 semantics)."""
    out = []
    if not os.path.isdir(directory):
        return out
    for entry in os.scandir(directory):
        if not entry.name.endswith(".json"):
            continue
        item = {
            "filename": entry.name,
            "size_bytes": entry.stat().st_size,
            "modified_time": entry.stat().st_mtime,
            "project_name": None,
            "saved_at": None,
        }
        try:
            with open(entry.path, encoding="utf-8") as f:
                meta = json.load(f).get("metadata", {})
            item["project_name"] = meta.get("project_name")
            item["saved_at"] = meta.get("saved_at")
        except (OSError, json.JSONDecodeError):
            pass
        out.append(item)
    return sorted(out, key=lambda d: d["modified_time"], reverse=True)


def load_saved_df(spark: SparkSession, directory: str, schema=None) -> DataFrame:
    """Schema-validated read of saved envelopes (write-schema==read-schema:
    pass the schema captured at write time, or let Spark infer and validate
    the version column)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.json(directory)
    return df.filter(F.col("version") == VERSION)


def delete_saved(directory: str, filename: str) -> bool:
    """Path-traversal-guarded delete (A22: reject '..', '/', '\\\\')."""
    if any(tok in filename for tok in _FORBIDDEN) or not filename.endswith(".json"):
        raise ValueError(f"invalid filename: {filename!r}")
    path = os.path.join(directory, filename)
    if not os.path.isfile(path):
        return False
    os.remove(path)
    return True


def coerce_form_params(params: dict) -> dict:
    """Form/query-param coercion (A23): typed casts, GB->MB, t-size
    normalization (blank -> None, lower-case s/m/l -> upper)."""
    out = dict(params)
    if "worker_node_memory_gb" in out and out.get("worker_node_memory_gb") is not None:
        out["worker_node_memory_mb"] = float(out.pop("worker_node_memory_gb")) * 1024
    ts = out.get("worker_node_t_size")
    if ts is not None:
        ts = str(ts).strip().upper()
        out["worker_node_t_size"] = ts if ts in ("S", "M", "L") else None
    int_fields = (
        "messages_per_second", "avg_record_size_bytes", "number_flink_applications",
        "num_distinct_keys", "bandwidth_capacity_gbps", "simple_statements",
        "medium_statements", "complex_statements", "worker_node_cpu_max",
        "nb_worker_nodes",
    )
    for k in int_fields:
        if k in out and out[k] is not None and not isinstance(out[k], int):
            out[k] = int(str(out[k]).strip())
    for k in ("expected_latency_seconds", "worker_node_memory_mb"):
        if k in out and out[k] is not None and not isinstance(out[k], float):
            out[k] = float(str(out[k]).strip())
    return out
