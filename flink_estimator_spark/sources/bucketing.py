"""Bucketed table layout — the co-located-join strategy for repeated big
joins.

At 100 TB the lineitem⋈orders join shuffles both sides on every query.
Writing both tables bucketed (and sorted) by the join key pins rows of equal
keys to equal bucket files, so Catalyst plans a sort-merge join with **no
Exchange on either side** — the shuffle is paid once at write time and
amortized over every subsequent join, the same trade Hive/Iceberg bucketing
and Flink's hash-distributed tables make.

``tests/test_bucketing.py`` asserts the no-Exchange plan property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 8,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a parquet table bucketed and sorted by ``key``.

    ``path`` makes it an external table (useful for tests); bucket count
    should divide evenly into executor parallelism at the target scale —
    at 100 TB think thousands of buckets, not eight.
    """
    writer = (
        df.write.mode("overwrite").format("parquet").bucketBy(buckets, key).sortBy(key)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def drop_table(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
