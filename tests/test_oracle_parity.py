"""Replica of the driver's t2 correctness gate: every registered query with an
oracle runs on Spark AND DuckDB over the same parquet tables; row counts,
column names, and values must match exactly (order-insensitive).

Run at sf0.001 by default (fast); set SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01
to mirror the driver's exact scale.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from flink_estimator_spark.plans import QUERIES
from flink_estimator_spark.sources import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(SF_DIR, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


def _canon(rows, cols):
    """Order-insensitive canonical form: sort columns by name, then rows."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])

    def key(row):
        out = []
        for i in idx:
            v = row[i]
            if isinstance(v, float):
                out.append(("f", repr(v)))
            elif v is None:
                out.append(("n", ""))
            else:
                out.append(("x", str(v)))
        return tuple(out)

    return sorted(key(r) for r in rows)


ORACLED = sorted(n for n, s in QUERIES.items() if s.oracle)
ROWS_ONLY = sorted(n for n, s in QUERIES.items() if not s.oracle)


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, ddb, name):
    spec = QUERIES[name]
    sdf = spec.builder(spark, SF_DIR)
    spark_cols = sorted(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(spec.oracle)
    duck_cols = sorted(d[0] for d in res.description)
    duck_rows = res.fetchall()

    assert spark_cols == duck_cols, f"{name}: columns {spark_cols} != {duck_cols}"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} != {len(duck_rows)}"
    )
    a = _canon(spark_rows, sdf.columns)
    b = _canon(duck_rows, [d[0] for d in res.description])
    if a != b:
        # find first diff for the error message
        for i, (ra, rb) in enumerate(zip(a, b)):
            if ra != rb:
                raise AssertionError(
                    f"{name}: first differing row #{i}\n  spark: {ra}\n  duck : {rb}"
                )
        raise AssertionError(f"{name}: canonical forms differ in tails")


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    spec = QUERIES[name]
    sdf = spec.builder(spark, SF_DIR)
    rows = sdf.collect()
    assert rows is not None
    # deterministic: second run returns identical rows
    rows2 = spec.builder(spark, SF_DIR).collect()
    assert rows == rows2, f"{name}: nondeterministic output"


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 30
    assert all(not callable(v) for v in osql.values())


def test_no_nan_explosions(spark, ddb):
    # guard: oracle'd queries never emit NaN/inf (would break value hashing)
    for name in ORACLED[:5]:
        for row in QUERIES[name].builder(spark, SF_DIR).collect():
            for v in row:
                if isinstance(v, float):
                    assert not (math.isnan(v) or math.isinf(v)), (name, row)
