"""Live differential against the reference implementation: every golden and
seeded-random scenario must produce a result dict *identical* to
``flink_estimator.estimation.calculate_flink_estimation`` — field names,
nesting, ints-vs-floats, and every rounded value.

Skipped when the read-only reference checkout is absent (CI elsewhere); the
vendored goldens in tests/scenarios.py remain the fallback corpus.
"""

from __future__ import annotations

import os
import sys

import pytest

from flink_estimator_spark.estimator import Scenario, estimate_scenario
from tests.scenarios import GOLDEN, INVALID, random_scenarios

REF_SRC = "/root/reference/src"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_SRC), reason="reference checkout not available"
)


@pytest.fixture(scope="module")
def ref():
    sys.path.insert(0, REF_SRC)
    try:
        from flink_estimator.estimation import calculate_flink_estimation
        from flink_estimator.models import EstimationInput
        yield EstimationInput, calculate_flink_estimation
    finally:
        sys.path.remove(REF_SRC)


CASES = GOLDEN + random_scenarios(150, seed=7)


@pytest.mark.parametrize("kw", CASES, ids=[c["project_name"] for c in CASES])
def test_matches_reference_exactly(ref, kw):
    EstimationInput, calculate = ref
    ours = estimate_scenario(Scenario(**kw))
    try:
        theirs = calculate(EstimationInput(**kw)).model_dump()
    except ValueError as e:
        # reference refuses the scenario (placement impossible) — we must
        # report the same condition through the error channel
        assert ours["error"] is not None, f"reference raised ({e}), we succeeded"
        return
    assert ours["error"] is None, ours["error"]
    mine = {k: v for k, v in ours.items() if k != "error"}
    assert mine == theirs


@pytest.mark.parametrize("kw", INVALID, ids=[c["project_name"] for c in INVALID])
def test_invalid_rejected_by_both(ref, kw):
    EstimationInput, calculate = ref
    ours = estimate_scenario(Scenario(**kw))
    ref_fails = False
    try:
        calculate(EstimationInput(**kw))
    except Exception:
        ref_fails = True
    assert ref_fails == (ours["error"] is not None), (kw, ours["error"])
