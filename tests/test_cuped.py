"""CUPED lift (plans/diagnostics.py): numpy differential + bounds."""

from __future__ import annotations

import math

import duckdb
import numpy as np

from flink_estimator_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _numpy_reference():
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT user_id,
                   CAST(sum(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT),
                   count(*)
            FROM '{SF}/events.parquet' GROUP BY user_id"""
    ).fetchall()
    uid = np.array([r[0] for r in rows], dtype=np.int64)
    y = np.array([r[1] for r in rows], dtype=np.float64)
    x = np.array([r[2] for r in rows], dtype=np.float64)
    a, b = uid % 2 == 0, uid % 2 == 1
    theta = np.cov(x, y, bias=True)[0, 1] / np.var(x)
    rho2 = np.corrcoef(x, y)[0, 1] ** 2
    lift_raw = y[a].mean() - y[b].mean()
    lift_adj = lift_raw - theta * (x[a].mean() - x[b].mean())
    return {
        "n_a": int(a.sum()),
        "n_b": int(b.sum()),
        "theta": theta,
        "lift_raw": lift_raw,
        "lift_adj": lift_adj,
        "varred": 1.0 - rho2,
    }


def test_cuped_matches_numpy(spark):
    got = QUERIES["q_cuped_lift"].builder(spark, SF).collect()[0]
    ref = _numpy_reference()
    assert got["n_a"] == ref["n_a"] and got["n_b"] == ref["n_b"]
    # quantized outputs vs float reference: within one quantum + float slack
    def close(q6, val):
        return abs(q6 / 1e6 - val) <= max(1e-6 + 1e-9 * abs(val), 1e-3)

    assert close(got["theta_q6"], ref["theta"]), (got["theta_q6"], ref["theta"])
    assert close(got["lift_raw_q6"], ref["lift_raw"])
    assert close(got["lift_adj_q6"], ref["lift_adj"])
    assert abs(got["varred_ppm"] / 1e6 - ref["varred"]) <= 1e-3


def test_cuped_bounds(spark):
    got = QUERIES["q_cuped_lift"].builder(spark, SF).collect()[0]
    # rho^2 in [0,1] -> variance-reduction ratio in [0, 1e6] ppm
    assert 0 <= got["varred_ppm"] <= 1_000_000
    # adjustment must not flip an order-of-magnitude: |adj| <= |raw| + |theta*dx|
    theta = got["theta_q6"] / 1e6
    assert math.isfinite(theta)


def _delta_ratio_numpy():
    # numpy reference for the delta-method ratio inference
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT user_id,
                   CAST(sum(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT),
                   count(*)
            FROM '{SF}/events.parquet' GROUP BY user_id"""
    ).fetchall()
    uid = np.array([r[0] for r in rows], dtype=np.int64)
    y = np.array([r[1] for r in rows], dtype=np.float64)
    e = np.array([r[2] for r in rows], dtype=np.float64)

    def stats(mask):
        yy, ee = y[mask], e[mask]
        n = mask.sum()
        r = yy.sum() / ee.sum()
        vy, ve = np.var(yy), np.var(ee)
        cye = np.mean(yy * ee) - yy.mean() * ee.mean()
        var_r = (vy - 2 * r * cye + r * r * ve) / (n * ee.mean() ** 2)
        return n, r, var_r

    n_a, r_a, v_a = stats(uid % 2 == 0)
    n_b, r_b, v_b = stats(uid % 2 == 1)
    return n_a, r_a, v_a, n_b, r_b, v_b


def test_delta_ratio_spark_vs_numpy(spark):
    got = QUERIES["q_delta_ratio"].builder(spark, SF).collect()[0]
    n_a, r_a, v_a, n_b, r_b, v_b = _delta_ratio_numpy()
    assert got["n_a"] == n_a and got["n_b"] == n_b
    assert abs(got["ratio_a_q6"] / 1e6 - r_a) <= 1e-3
    assert abs(got["ratio_b_q6"] / 1e6 - r_b) <= 1e-3
    assert abs(got["se_a_q9"] / 1e9 - math.sqrt(v_a)) <= 1e-3
    assert abs(got["se_b_q9"] / 1e9 - math.sqrt(v_b)) <= 1e-3
    z = (r_a - r_b) / math.sqrt(v_a + v_b)
    assert abs(got["z_q6"] / 1e6 - z) <= 1e-3


def test_power_mde_scaling(spark):
    rows = QUERIES["q_power_mde"].builder(spark, SF).orderBy("n_per_arm").collect()
    assert len(rows) == 4
    # MDE ~ 1/sqrt(n): mde * sqrt(n) constant within quantization slack
    prods = [r["mde_cents_q2"] * math.sqrt(r["n_per_arm"]) for r in rows]
    for p in prods[1:]:
        assert abs(p - prods[0]) / prods[0] < 1e-3
    # sigma matches numpy population sd on the per-user cents relation
    con = duckdb.connect()
    y = np.array([r[0] for r in con.execute(
        f"""SELECT CAST(sum(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT)
            FROM '{SF}/events.parquet' GROUP BY user_id"""
    ).fetchall()], dtype=np.float64)
    assert abs(rows[0]["sigma_q2"] / 100 - y.std()) <= 0.02
