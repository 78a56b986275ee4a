"""Persistence round-trip: estimate -> envelope -> write -> list/load/delete."""

from __future__ import annotations

import os
from datetime import datetime

import pytest

from flink_estimator_spark.estimator import Scenario, estimate_df, estimate_scenario, scenario_schema
from flink_estimator_spark.estimator.persistence import (
    coerce_form_params,
    delete_saved,
    envelope_df,
    list_saved,
    load_saved_df,
    save_estimation,
    save_estimations_df,
)
from tests.scenarios import GOLDEN


def _inputs_df(spark, cases):
    rows = []
    for kw in cases:
        s = Scenario(**kw)
        rows.append(tuple(getattr(s, f.name) for f in scenario_schema.fields))
    return spark.createDataFrame(rows, scenario_schema)


def test_envelope_roundtrip(spark, tmp_path):
    d = str(tmp_path / "saved")
    inputs = _inputs_df(spark, GOLDEN[:3])
    results = estimate_df(inputs)
    env = envelope_df(inputs, results, saved_at="2026-08-13T00:00:00")
    schema = env.schema
    save_estimations_df(env, d)

    loaded = load_saved_df(spark, d, schema=schema)
    assert loaded.count() == 3
    row = {r["metadata"]["project_name"]: r.asDict(recursive=True) for r in loaded.collect()}
    exp = estimate_scenario(Scenario(**GOLDEN[0]))
    got = row["default_vm_s"]["estimation_results"]["resource_estimates"]
    assert got["total_memory_mb"] == exp["resource_estimates"]["total_memory_mb"]
    assert got["total_cpus"] == exp["resource_estimates"]["total_cpus"]
    # deterministic ids: re-building the envelope yields identical ids
    ids1 = sorted(r["metadata"]["estimation_id"] for r in env.collect())
    ids2 = sorted(
        r["metadata"]["estimation_id"]
        for r in envelope_df(inputs, results, saved_at="2026-08-13T00:00:00").collect()
    )
    assert ids1 == ids2


def test_envelope_no_cross_product_on_shared_project_name(spark):
    """Two scenarios sharing a project name must each pair with their own
    result — never a cross-product of mismatched input/result envelopes."""
    a = dict(GOLDEN[0])
    b = dict(GOLDEN[0])
    b["messages_per_second"] = a.get("messages_per_second", 5000) * 7
    inputs = _inputs_df(spark, [a, b])
    results = estimate_df(inputs)
    env = envelope_df(inputs, results, saved_at="2026-08-13T00:00:00")
    rows = [r.asDict(recursive=True) for r in env.collect()]
    assert len(rows) == 2
    for r in rows:
        # each envelope's echoed input must match its own result's echo
        assert (
            r["input_parameters"]["messages_per_second"]
            == r["estimation_results"]["input_summary"]["messages_per_second"]
        )


def test_single_save_list_delete(tmp_path):
    d = str(tmp_path / "saved_single")
    r = estimate_scenario(Scenario(project_name="My Proj #1"))
    fname = save_estimation(
        {"project_name": "My Proj #1"}, r, d, now=datetime(2026, 8, 13, 1, 2, 3)
    )
    assert fname.startswith("My_Proj_1_20260813_010203_")
    listing = list_saved(d)
    assert len(listing) == 1 and listing[0]["filename"] == fname
    assert listing[0]["project_name"] == "My Proj #1"

    with pytest.raises(ValueError):
        delete_saved(d, "../evil.json")
    with pytest.raises(ValueError):
        delete_saved(d, "sub/dir.json")
    assert delete_saved(d, fname) is True
    assert delete_saved(d, fname) is False
    assert list_saved(d) == []


def test_coerce_form_params():
    out = coerce_form_params(
        {"worker_node_memory_gb": "16", "worker_node_t_size": " s ",
         "messages_per_second": "5000", "expected_latency_seconds": "2.5"}
    )
    assert out["worker_node_memory_mb"] == 16384.0
    assert "worker_node_memory_gb" not in out
    assert out["worker_node_t_size"] == "S"
    assert out["messages_per_second"] == 5000
    assert out["expected_latency_seconds"] == 2.5
    assert coerce_form_params({"worker_node_t_size": "  "})["worker_node_t_size"] is None
