"""Streaming estimation ingestion — the reference's request path
(`POST /api/estimate`, main.py:274-283) re-expressed as Structured
Streaming: a stream of scenario records flows through the SAME
``estimate_df`` transformation the batch engine uses.

Every stage of the engine is a narrow transformation (column expressions +
a stateless Arrow UDF, no shuffle), so the plan is streaming-compatible in
append mode with no watermark needed, and each micro-batch estimates its
scenarios in one vectorized pass — the throughput dual of the reference's
one-record-per-HTTP-call loop.  In production the file source below swaps
for Kafka without touching the transformation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .engine import estimate_df, scenario_schema


def scenarios_stream(spark: SparkSession, directory: str) -> DataFrame:
    """File-source stream of scenario records (one JSON object per line)."""
    return spark.readStream.schema(scenario_schema).json(directory)


def estimate_stream(spark: SparkSession, directory: str) -> DataFrame:
    """Streaming estimation results for every scenario file that lands in
    ``directory`` — identical rows to ``estimate_df`` on the same input."""
    return estimate_df(scenarios_stream(spark, directory))
