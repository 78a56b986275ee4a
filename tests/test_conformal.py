"""Split-conformal intervals (plans/diagnostics.py): the finite-sample
coverage bound, ceil-rank quantile differential vs numpy, and structural
sanity.  Values are gate-verified against DuckDB; these tests pin the
GUARANTEE the operator exists to provide."""

from __future__ import annotations

import math

import duckdb
import numpy as np

from flink_estimator_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _rows(spark):
    return QUERIES["q_conformal_interval"].builder(spark, SF).collect()


def test_finite_sample_coverage_bound(spark):
    # split conformal guarantees E[coverage] >= 1 - alpha over exchangeable
    # splits; a single split fluctuates ~ binomial, so assert >= 1 - alpha
    # minus 3 binomial sigmas (never vacuous at fixture sizes)
    for r in _rows(spark):
        p = 0.9
        slack = 3 * math.sqrt(p * (1 - p) / max(r["n_test"], 1))
        assert r["coverage_ppm"] / 1e6 >= p - slack, r


def test_qhat_matches_numpy_ceil_rank(spark):
    con = duckdb.connect()
    got = {r["event_type"]: r for r in _rows(spark)}
    rows = con.execute(
        f"""SELECT event_type,
                   CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
                   user_id % 2 AS grp
            FROM '{SF}/events.parquet'"""
    ).fetchall()
    by_type: dict[str, list[int]] = {}
    for et, cents, grp in rows:
        if grp == 0:
            by_type.setdefault(et, []).append(cents)
    for et, cal in by_type.items():
        n = len(cal)
        s = sum(cal)
        r = np.sort(np.abs(np.array(cal, dtype=np.int64) * n - s))
        rank = -((-(n + 1) * 9) // 10)  # ceil((n+1)*0.9)
        q_hat = int(r[min(rank, n) - 1])
        assert got[et]["halfwidth_cents"] == q_hat // n, et
        assert got[et]["n_cal"] == n


def test_structure(spark):
    rows = _rows(spark)
    assert len(rows) == 5  # one Mondrian group per event type
    for r in rows:
        assert r["halfwidth_cents"] > 0
        assert 0 <= r["covered"] <= r["n_test"]
