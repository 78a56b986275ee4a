"""Theta/KMV sketch set operations (operators/sketches.py).

The gate row (q_theta_setops) value-verifies the md5-52 pipeline against
DuckDB; these tests pin the ALGEBRA on synthetic sets where ground truth is
known exactly:

* unsaturated sketches (|set| < k) degrade to EXACT set operations;
* the sharded two-level k-min ladder equals the straight global k-min;
* union-merge associativity: the pair stage's union estimate equals the
  estimate of a sketch built directly on A∪B;
* saturated estimates honor the KMV error bound on the fixture corpus.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from flink_estimator_spark.operators.sketches import (
    K_KMV,
    _H_SPACE,
    kmv_sketches,
    theta_setops,
)
from flink_estimator_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _mix(i: int) -> int:
    """Deterministic uniform-ish 52-bit values (Knuth multiplicative mix)."""
    return (i * 2654435761 * 0x9E3779B9) % _H_SPACE


def _sets_df(spark, sets: dict[str, list[int]]):
    rows = [(s, h) for s, hs in sets.items() for h in hs]
    return spark.createDataFrame(rows, "source string, h long").distinct()


def test_unsaturated_sketches_are_exact(spark):
    a = {_mix(i) for i in range(1, 40)}
    b = {_mix(i) for i in range(20, 70)}
    sh = _sets_df(spark, {"a": sorted(a), "b": sorted(b)})
    out = theta_setops(sh, k=256).collect()[0]
    assert out["n_exact_a"] == len(a)
    assert out["est_a"] == len(a)
    assert out["est_b"] == len(b)
    assert out["exact_inter"] == len(a & b)
    assert out["est_inter"] == len(a & b)
    assert out["exact_union"] == len(a | b)
    assert out["est_union"] == len(a | b)
    assert out["jacc_est_ppm"] == out["jacc_exact_ppm"]


def test_sharded_kmin_ladder_equals_global_kmin(spark):
    vals = sorted({_mix(i) for i in range(1, 2000)})
    sh = _sets_df(spark, {"x": vals})
    k = 64
    got = [r["h"] for r in kmv_sketches(sh, "source", k).orderBy("rn").collect()]
    assert got == vals[:k]


def test_union_merge_associativity(spark):
    # est_union from the PAIR stage must equal est_n of a sketch built
    # directly on A ∪ B — the mergeable-summary property that makes
    # per-partition sketches composable at cluster scale.
    a = [_mix(i) for i in range(1, 900)]
    b = [_mix(i) for i in range(450, 1400)]
    k = 32
    pair = theta_setops(_sets_df(spark, {"a": a, "b": b}), k=k).collect()[0]
    direct = theta_setops(
        _sets_df(spark, {"u": sorted(set(a) | set(b)), "z": [1, 2, 3]}), k=k
    ).collect()[0]
    assert pair["est_union"] == direct["est_a"]


def test_saturated_estimates_within_kmv_bounds(spark):
    rows = QUERIES["q_theta_setops"].builder(spark, SF).collect()
    assert len(rows) == 190  # 20 sources -> C(20,2) pairs
    rel = 5.0 / math.sqrt(K_KMV)  # 5 sigma of the 1/sqrt(k) KMV error
    for r in rows:
        assert abs(r["est_a"] - r["n_exact_a"]) <= rel * r["n_exact_a"], r
        assert abs(r["est_b"] - r["n_exact_b"]) <= rel * r["n_exact_b"], r
        assert abs(r["est_union"] - r["exact_union"]) <= rel * r["exact_union"], r
        # intersection std ~ sqrt(inter * U/k); 5-sigma plus integer slack
        slack = 5.0 * math.sqrt(
            max(r["exact_inter"], 1.0) * r["exact_union"] / K_KMV
        ) + 5.0
        assert abs(r["est_inter"] - r["exact_inter"]) <= slack, r
        assert 0 <= r["jacc_est_ppm"] <= 1_000_000


def test_theta_union_never_exceeds_input_thetas(spark):
    # θ_U = k-th smallest of the combined sketches — at most min(θ_A, θ_B),
    # so the union estimate is never built from a stale wider threshold.
    a = [_mix(i) for i in range(1, 500)]
    b = [_mix(3 * i + 7) for i in range(1, 500)]
    k = 16
    sh = _sets_df(spark, {"a": a, "b": b})
    km = kmv_sketches(sh, "source", k)
    kth = {
        r["source"]: r["kth"]
        for r in km.filter(F.col("rn") == k).select("source", F.col("h").alias("kth")).collect()
    }
    union_kth = sorted(set(a) | set(b))[k - 1]
    assert union_kth <= min(kth["a"], kth["b"])
    pair = theta_setops(sh, k=k).collect()[0]
    assert pair["est_union"] == (k - 1) * _H_SPACE // union_kth


def test_stream_kmv_gate_properties(spark):
    # the 21st runtime gate: real streaming execution with timer-fired
    # sketch emissions; values gate vs DuckDB — here pin the algebra's
    # branch structure across rows
    rows = QUERIES["q_stream_kmv_runtime"].builder(spark, SF).collect()
    assert rows, "no decided windows emitted"
    merged = [r for r in rows if r["win_start"] == -1]
    assert len(merged) == 1
    for r in rows:
        if r["nk"] < 16:  # unsaturated sketch degrades to the exact count
            assert r["theta"] == 1 << 52
            assert r["est_distinct"] == r["nk"]
        else:
            assert r["theta"] < (1 << 52)
            assert r["est_distinct"] >= 16
    # the merged sketch's theta can never exceed any contributor's
    # (k-smallest-of-union), so its estimate dominates each window's
    per_thetas = [r["theta"] for r in rows if r["win_start"] != -1]
    assert merged[0]["theta"] <= min(per_thetas)


# ---------------------------------------------------------------------------
# Property net: hypothesis drives random set pairs through theta_setops and
# checks the FULL output row against a pure-python KMV reference — edge
# cases a fixed fixture misses (singleton sets, empty intersections, sets
# straddling the saturation boundary, duplicated values).
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, example, given, settings, strategies as st

_PROP_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_K_PROP = 8


def _py_theta(a: set[int], b: set[int], k: int, h: int):
    def kmins(s):
        return sorted(s)[:k]

    def theta_of(s):
        km = kmins(s)
        return km[k - 1] if len(km) == k else h

    ta, tb = theta_of(a), theta_of(b)
    est = lambda s: len(s) if len(s) < k else (k - 1) * h // theta_of(s)
    merged = sorted(set(kmins(a)) | set(kmins(b)))[:k]
    theta_u = merged[k - 1] if len(merged) == k else h
    est_union = len(merged) if len(merged) < k else (k - 1) * h // theta_u
    tmin = min(ta, tb)
    retained = sum(1 for v in set(kmins(a)) & set(kmins(b)) if v < tmin)
    est_inter = retained * h // tmin
    exact_inter = len(a & b)
    exact_union = len(a | b)
    return {
        "n_exact_a": len(a), "n_exact_b": len(b),
        "est_a": est(a), "est_b": est(b),
        "exact_union": exact_union, "est_union": est_union,
        "exact_inter": exact_inter, "est_inter": est_inter,
        "jacc_exact_ppm": exact_inter * 1_000_000 // exact_union,
        "jacc_est_ppm": est_inter * 1_000_000 // est_union,
    }


@_PROP_SETTINGS
@given(
    st.sets(st.integers(1, _H_SPACE - 1), min_size=1, max_size=30),
    st.sets(st.integers(1, _H_SPACE - 1), min_size=1, max_size=30),
    st.integers(0, 10),
)
# Pinned r7-judge falsifying example (was .hypothesis/examples/2caf6af8…):
# a saturated sketch with a TINY theta_min (247) makes est_inter ~ h/247
# ~ 1.8e13, whose *1e6 ppm product overflows BIGINT unless routed through
# DECIMAL(38,0)/HUGEINT on both engines.
@example(a={2}, b={3, 4, 5, 6, 7, 8, 247}, overlap=1)
def test_theta_property_vs_python(spark, a, b, overlap):
    # force a controlled overlap so intersections aren't always empty
    b = set(b) | set(sorted(a)[:overlap])
    got = theta_setops(
        _sets_df(spark, {"a": sorted(a), "b": sorted(b)}), k=_K_PROP
    ).collect()[0]
    want = _py_theta(set(a), set(b), _K_PROP, _H_SPACE)
    for col, val in want.items():
        assert got[col] == val, (col, got[col], val, sorted(a), sorted(b))
