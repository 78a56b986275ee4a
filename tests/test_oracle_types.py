"""Dtype-parity sweep: every oracle's DuckDB column types must map exactly to
the Spark plan's schema.

The driver's value hash is type-sensitive: round 1 lost two gate rows to
value-identical results where DuckDB's integer ``SUM`` returned HUGEINT
(int128) against Spark's BIGINT.  The local value-parity test compares
``str(v)`` and cannot see that class of defect, so this sweep checks the
*types* head-on.  The DuckDB side is metadata-only (``DESCRIBE``); the Spark
side calls each ``spec.builder`` for its schema, and a handful of builders
run real jobs during *construction* (connected-components' convergence
loop, LSH's adaptive-plane ``count()``, the incremental rollup's percentile
collection), so the sweep is cheap-but-not-free — schemas are derived once
per query in a module-scoped cache shared by both tests.
"""

from __future__ import annotations

import os
import re

import duckdb
import pytest

from flink_estimator_spark.plans import QUERIES
from flink_estimator_spark.sources import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

ORACLED = sorted(n for n, s in QUERIES.items() if s.oracle)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(SF_DIR, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    yield con
    con.close()


def _expected_duck(spark_dtype: str) -> set[str]:
    """Spark simpleString dtype -> acceptable DuckDB column types."""
    m = {
        "bigint": {"BIGINT"},
        "int": {"INTEGER"},
        "smallint": {"SMALLINT"},
        "tinyint": {"TINYINT"},
        "double": {"DOUBLE"},
        "float": {"FLOAT", "REAL"},
        "string": {"VARCHAR"},
        "boolean": {"BOOLEAN"},
        "date": {"DATE"},
        "binary": {"BLOB"},
    }
    if spark_dtype in m:
        return m[spark_dtype]
    dec = re.fullmatch(r"decimal\((\d+),(\d+)\)", spark_dtype)
    if dec:
        return {f"DECIMAL({dec.group(1)},{dec.group(2)})"}
    if spark_dtype.startswith("array<"):
        inner = spark_dtype[len("array<") : -1]
        return {f"{t}[]" for t in _expected_duck(inner)}
    return set()  # unmapped -> always flagged; extend the map deliberately


_SCHEMA_CACHE: dict[str, list] = {}


def _spark_fields(spark, name: str) -> list:
    if name not in _SCHEMA_CACHE:
        _SCHEMA_CACHE[name] = list(
            QUERIES[name].builder(spark, SF_DIR).schema.fields
        )
    return _SCHEMA_CACHE[name]


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_types_match_spark(spark, ddb, name):
    spec = QUERIES[name]
    spark_types = {f.name: f.dataType.simpleString()
                   for f in _spark_fields(spark, name)}
    duck_types = {
        r[0]: r[1] for r in ddb.execute(f"DESCRIBE {spec.oracle}").fetchall()
    }
    assert sorted(spark_types) == sorted(duck_types), (
        f"{name}: column names {sorted(spark_types)} != {sorted(duck_types)}"
    )
    bad = []
    for col, sp in spark_types.items():
        want = _expected_duck(sp)
        got = duck_types[col]
        if got not in want:
            bad.append(f"{col}: spark={sp} duck={got} (accepts {sorted(want)})")
    assert not bad, f"{name}: dtype drift would break the driver hash:\n  " + (
        "\n  ".join(bad)
    )


def test_no_timestamp_outputs(spark):
    """Repo rule: no raw timestamps in query output (epoch BIGINT or string)."""
    offenders = []
    for name in ORACLED:
        for f in _spark_fields(spark, name):
            if "timestamp" in f.dataType.simpleString():
                offenders.append(f"{name}.{f.name}")
    assert not offenders, offenders


def test_no_decimal_outputs(spark):
    """Repo rule (round 4): no raw DECIMAL columns in query output.  The
    engines agree on DECIMAL arithmetic internally, but the comparison
    stacks around them do not — DuckDB's pandas bridge degrades wide
    decimals to float64 while Spark keeps Decimal objects — so any decimal
    survives only as an intermediate; outputs are BIGINT (exact integral
    division / quantization) or DOUBLE (one final cast)."""
    offenders = []
    for name in ORACLED:
        for f in _spark_fields(spark, name):
            if "decimal" in f.dataType.simpleString():
                offenders.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not offenders, offenders
