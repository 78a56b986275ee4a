"""Import-order hygiene: every public namespace must be importable as the
FIRST touch of the package in a fresh interpreter.  Pins the round-5 fix
for the functions-first circular import (similarity -> plans ->
streaming_runtime -> streaming.curation -> similarity), which only
reproduces when nothing else has initialized the package."""

from __future__ import annotations

import subprocess
import sys

import pytest

FIRST_TOUCHES = [
    "flink_estimator_spark.functions",
    "flink_estimator_spark.operators.similarity",
    "flink_estimator_spark.streaming",
    "flink_estimator_spark.plans",
    "flink_estimator_spark.estimator",
]


@pytest.mark.parametrize("module", FIRST_TOUCHES)
def test_first_touch_import(module):
    proc = subprocess.run(
        [sys.executable, "-c", f"import {module}"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
