"""Parquet table sources for the Plane-B operator surface.

The driver generates a TPC-H-ish star schema plus an event stream and the
LLM-pipeline tables (documents, embeddings) at several scale factors
(TESTDATA.md).  All reads go through ``spark.read.parquet`` so Catalyst gets
predicate pushdown, column pruning and partition pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables that are always small relative to the facts; join sides we
# actively broadcast where Catalyst's size estimate might not (at 100 TB the
# facts are lineitem/orders/events — these stay broadcastable).
DIMENSIONS = ("region", "nation", "supplier", "part")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every table of one scale factor as a dict of DataFrames."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = read_table(spark, path)
    return out


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Read one parquet table, normalizing nanosecond timestamp columns.

    Parquet TIMESTAMP(NANOS) is read as a nanos-since-epoch long (see
    session.py); convert to Spark's native microsecond TimestampType here —
    the fixture's values are microsecond-aligned, so this is lossless.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for field in df.schema.fields:
        meta_ok = field.name == "ts" and isinstance(field.dataType, T.LongType)
        if meta_ok:
            # integer division — float division would lose precision at 1e18 ns
            df = df.withColumn(
                field.name, F.timestamp_micros(F.expr(f"{field.name} div 1000"))
            )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load and register each table as a temp view (for the SQL surface)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
