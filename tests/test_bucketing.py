"""Bucketed-join co-location: equal-key rows land in equal bucket files, so
the repeated fact⋈fact join plans with zero Exchange operators — the
write-once/join-many layout strategy for the biggest joins at scale."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from flink_estimator_spark.sources.bucketing import drop_table, write_bucketed
from flink_estimator_spark.sources.tables import read_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = read_table(spark, f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    lineitem = read_table(spark, f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", 8, str(base / "o"))
    write_bucketed(lineitem, "b_lineitem", "l_orderkey", 8, str(base / "l"))
    yield orders, lineitem
    drop_table(spark, "b_orders")
    drop_table(spark, "b_lineitem")


def _join(spark):
    return spark.table("b_lineitem").join(
        spark.table("b_orders"), F.col("l_orderkey") == F.col("o_orderkey")
    )


def test_bucketed_join_plans_no_exchange(spark, bucketed_tables):
    # force the sort-merge path (the sizes here would otherwise broadcast)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            _join(spark).explain("simple")
        plan = buf.getvalue()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    orders, lineitem = bucketed_tables
    expected = lineitem.join(
        orders, F.col("l_orderkey") == F.col("o_orderkey")
    ).count()
    assert _join(spark).count() == expected
