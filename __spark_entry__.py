"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``     — flagship: the vectorized Plane-A estimation engine
  run over the five BASELINE.md golden scenarios (plus the synthetic tables'
  own workload profile), returning the nested EstimationResult rows.
- ``queries()``        — the declared Plane-B operator inventory
  (flink_estimator_spark.plans.registry; one entry per operator from
  SURVEY.md §2.2 + the LLM-pipeline extensions).
- ``oracle_sql()``     — DuckDB-equivalent SQL for every SQL-expressible
  query (rows-only operators omit theirs).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: estimate the golden scenario corpus in one DataFrame pass."""
    from flink_estimator_spark.estimator import Scenario, estimate_df, scenario_schema
    from tests.scenarios import GOLDEN

    rows = []
    for kw in GOLDEN:
        s = Scenario(**kw)
        rows.append(tuple(getattr(s, f.name) for f in scenario_schema.fields))
    df = spark.createDataFrame(rows, scenario_schema)
    return estimate_df(df)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from flink_estimator_spark.plans import get_queries

    return get_queries()


def oracle_sql() -> dict[str, str]:
    from flink_estimator_spark.plans import get_oracle_sql

    return get_oracle_sql()
