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
    """Read one parquet table, normalizing the timestamp column's encoding.

    The fixture generator has shipped ``ts`` as parquet TIMESTAMP(NANOS) in
    one round and TIMESTAMP(MICROS, isAdjustedToUTC=false) in another, so
    this reader accepts all three encodings and lands every one on Spark's
    session-zoned microsecond TimestampType (session tz is pinned UTC, so
    wall-clock values match DuckDB's naive TIMESTAMP reads bit-for-bit):

    * TIMESTAMP(NANOS) — Spark 4 refuses it unless read as a nanos long
      (see session.py's ``nanosAsLong``); converted here by integer div.
    * TIMESTAMP_NTZ — parquet micros with isAdjustedToUTC=false; cast to
      TimestampType reinterprets the wall clock in UTC, lossless, and keeps
      ``unix_micros`` / ``window()`` / ``session_window`` applicable.
    * TimestampType — already native, untouched.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for field in df.schema.fields:
        if field.name != "ts":
            continue
        if isinstance(field.dataType, T.LongType):
            # integer division — float division would lose precision at 1e18 ns
            df = df.withColumn(
                field.name, F.timestamp_micros(F.expr(f"{field.name} div 1000"))
            )
        elif isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load and register each table as a temp view (for the SQL surface)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
