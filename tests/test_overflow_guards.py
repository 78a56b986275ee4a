"""Boundary tests for the ×1e6 product-DIV overflow protocol (SCALE.md §7m).

Every ppm/q6 site whose product can exceed BIGINT at 100 TB operand
magnitudes routes through DECIMAL(38,0) on the Spark side and HUGEINT in
the DuckDB oracle.  These tests drive the EXACT expression shapes the
queries use with operands at 100 TB scale — magnitudes the sf fixtures
never reach (the r7 judge falsified theta_setops exactly this way) — and
pin Spark == DuckDB == arbitrary-precision Python.

Sites covered (the r7-verdict sweep list plus the ADVICE wasserstein item):
  * q_theta_setops jacc ppm        operators/sketches.py
  * q_skew_advisor skew factor     plans/diagnostics.py
  * q_seasonal_index index         plans/analytic.py
  * q_basket_rules conf/lift       plans/analytic.py  (divisor n_a·n_b too)
  * q_attribution_linear credits   plans/analytic.py  (DECIMAL accumulator)
  * q_wasserstein_drift terms      operators/timeseries.py
"""

from __future__ import annotations

import duckdb
import pytest


def _spark_one(spark, sql: str):
    return spark.sql(sql).collect()[0]


def _duck_one(sql: str):
    return duckdb.sql(sql).fetchone()


def test_theta_jaccard_ppm_at_tiny_theta(spark):
    # the r7 falsifying regime: saturated sketch, theta_min ~ 247 =>
    # est_inter ~ 2^52/247 ~ 1.8e13; old BIGINT *1e6 product = 1.8e19 > 2^63
    h = 2**52
    est_inter = (1 * h) // 247
    est_union = (7 * h) // 247
    want = est_inter * 1_000_000 // est_union
    got_s = _spark_one(
        spark,
        f"SELECT CAST((CAST({est_inter} AS DECIMAL(38,0)) * 1000000)"
        f" DIV {est_union} AS BIGINT) AS v",
    )["v"]
    got_d = _duck_one(
        f"SELECT CAST(CAST({est_inter} AS HUGEINT) * 1000000"
        f" // {est_union} AS BIGINT) AS v"
    )[0]
    assert got_s == got_d == want


def test_skew_factor_at_corpus_counts(spark):
    # lineitem at ~SF100k: max_per_key ~1e12 rows, ~1e10 keys
    cnts = [10**12, 4 * 10**12]
    want = max(cnts) * len(cnts) * 1_000_000 // sum(cnts)
    got_s = _spark_one(
        spark,
        "SELECT (CAST(max(cnt) AS DECIMAL(38,0)) * count(*) * 1000000)"
        " DIV sum(cnt) AS v FROM VALUES "
        + ", ".join(f"({c})" for c in cnts)
        + " AS t(cnt)",
    )["v"]
    got_d = _duck_one(
        "SELECT CAST((CAST(max(cnt) AS HUGEINT) * count(*) * 1000000)"
        " // sum(cnt) AS BIGINT) AS v FROM (VALUES "
        + ", ".join(f"({c})" for c in cnts)
        + ") t(cnt)"
    )[0]
    assert got_s == got_d == want


def test_seasonal_index_at_corpus_revenue(spark):
    # monthly revenue sum at 100 TB ~ 1e16 cents; x12e6 = 1.2e23 > 2^63
    rev, total = 10**16, 12 * 10**16
    want = rev * 12 * 1_000_000 // total
    got_s = _spark_one(
        spark,
        f"SELECT (CAST({rev} AS DECIMAL(38,0)) * 12 * 1000000)"
        f" DIV {total} AS v",
    )["v"]
    got_d = _duck_one(
        f"SELECT CAST((CAST({rev} AS HUGEINT) * 12 * 1000000)"
        f" // {total} AS BIGINT) AS v"
    )[0]
    assert got_s == got_d == want


def test_basket_lift_divisor_exceeds_bigint(spark):
    # n_a*n_b ~ 7.2e21 alone exceeds BIGINT; numerator ~1.5e28
    n_pair, n, n_a, n_b = 10**11, 15 * 10**10, 9 * 10**10, 8 * 10**10
    want_conf = n_pair * 1_000_000 // n_a
    want_lift = n_pair * n * 1_000_000 // (n_a * n_b)
    row = _spark_one(
        spark,
        f"SELECT (CAST({n_pair} AS DECIMAL(38,0)) * 1000000) DIV {n_a} AS c,"
        f" (CAST({n_pair} AS DECIMAL(38,0)) * {n} * 1000000)"
        f" DIV (CAST({n_a} AS DECIMAL(38,0)) * {n_b}) AS l",
    )
    drow = _duck_one(
        f"SELECT CAST((CAST({n_pair} AS HUGEINT) * 1000000) // {n_a}"
        f" AS BIGINT) AS c,"
        f" CAST((CAST({n_pair} AS HUGEINT) * {n} * 1000000)"
        f" // (CAST({n_a} AS HUGEINT) * {n_b}) AS BIGINT) AS l"
    )
    assert row["c"] == drow[0] == want_conf
    assert row["l"] == drow[1] == want_lift


def test_attribution_decimal_accumulator(spark):
    # micro-credit SUM is corpus-scaled; near the BIGINT output boundary
    # the DECIMAL(38,0) accumulator must agree with DuckDB's HUGEINT sum
    terms = [(9 * 10**11, 1)] * 10  # 10 credits of 9e17 ucents = 9e18
    want = sum(rc * 1_000_000 // nt for rc, nt in terms)
    assert want < 2**63 - 1
    vals = ", ".join(f"({rc}, {nt})" for rc, nt in terms)
    got_s = _spark_one(
        spark,
        "SELECT CAST(sum(CAST((rev_cents * 1000000) DIV n_touch"
        " AS DECIMAL(38,0))) AS BIGINT) AS v"
        f" FROM VALUES {vals} AS t(rev_cents, n_touch)",
    )["v"]
    got_d = _duck_one(
        "SELECT CAST(sum((rev_cents * 1000000) // n_touch) AS BIGINT) AS v"
        f" FROM (VALUES {vals}) t(rev_cents, n_touch)"
    )[0]
    assert got_s == got_d == want


def test_attribution_fails_loud_past_bigint_output(spark):
    # past the output boundary BOTH engines error (never wrap): 11 credits
    # of 9e17 ucents = 9.9e18 > 2^63-1
    vals = ", ".join("(900000000000, 1)" for _ in range(11))
    with pytest.raises(Exception):
        _spark_one(
            spark,
            "SELECT CAST(sum(CAST((rev_cents * 1000000) DIV n_touch"
            " AS DECIMAL(38,0))) AS BIGINT) AS v"
            f" FROM VALUES {vals} AS t(rev_cents, n_touch)",
        )
    with pytest.raises(Exception):
        _duck_one(
            "SELECT CAST(sum((rev_cents * 1000000) // n_touch) AS BIGINT)"
            f" AS v FROM (VALUES {vals}) t(rev_cents, n_touch)"
        )


def test_wasserstein_terms_at_corpus_counts(spark):
    # cum·n_other ~ (1e12)^2 = 1e24 per TERM; divisor n_a·n_b > BIGINT
    rows = [  # (cum_a, cum_b, gap)
        (9 * 10**11, 8 * 10**11, 3),
        (95 * 10**10, 9 * 10**11, 2),
    ]
    n_view, n_purchase = 10**12, 95 * 10**10
    want_sum = sum(
        abs(ca * n_purchase - cb * n_view) * g for ca, cb, g in rows
    )
    want = want_sum * 1_000_000 // (n_view * n_purchase)
    vals = ", ".join(f"({ca}, {cb}, {g})" for ca, cb, g in rows)
    got_s = _spark_one(
        spark,
        "SELECT CAST(CAST(sum(abs(CAST(cum_a AS DECIMAL(38,0))"
        f" * {n_purchase} - CAST(cum_b AS DECIMAL(38,0)) * {n_view})"
        " * gap) * 1000000 AS DECIMAL(38,0))"
        f" div (CAST({n_view} AS DECIMAL(38,0)) * {n_purchase}) AS BIGINT)"
        f" AS v FROM VALUES {vals} AS t(cum_a, cum_b, gap)",
    )["v"]
    got_d = _duck_one(
        "SELECT CAST(sum(abs(CAST(cum_a AS HUGEINT)"
        f" * {n_purchase} - CAST(cum_b AS HUGEINT) * {n_view})"
        " * gap) * 1000000"
        f" // (CAST({n_view} AS HUGEINT) * {n_purchase}) AS BIGINT)"
        f" AS v FROM (VALUES {vals}) t(cum_a, cum_b, gap)"
    )[0]
    assert got_s == got_d == want
