"""Central query registry — the declared operator inventory.

Every Plane-B operator/query registers here with (a) a Spark DataFrame
builder and (b) where SQL-expressible, an equivalent ANSI-SQL oracle that
DuckDB runs on the same parquet tables.  ``__spark_entry__.py`` exposes the
registry to the driver's correctness gate.

Determinism rules for every registered query (FIXTURES.md §C):
* stable ORDER BY on a unique key suffix;
* no wall-clock / uuid / rand;
* every computed column aliased identically in the Spark plan and the oracle;
* double-typed aggregates computed over DECIMAL then cast back to DOUBLE so
  both engines produce bit-identical sums regardless of accumulation order;
* no raw timestamp outputs (cast to epoch BIGINT or ISO string) to sidestep
  timezone/precision representation differences.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # DuckDB SQL, or None for rows-only checks
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: Optional[str] = None, description: str = "",
          tags: tuple[str, ...] = ()):  # decorator
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name=name, builder=fn, oracle=oracle,
                                  description=description or (fn.__doc__ or "").strip(),
                                  tags=tags)
        return fn

    return deco


def get_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.builder for name, spec in QUERIES.items()}


def get_oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle}
