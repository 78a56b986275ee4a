"""SCD2 merge correctness: folding a later batch of updates into the
history built from earlier updates must equal the history built from the
full log — the MERGE INTO contract, emulated on plain DataFrames."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_estimator_spark.operators.scd import scd2_from_log, scd2_merge
from flink_estimator_spark.sources.tables import read_table
from tests.conftest import SF_SMALL


def test_scd2_merge_equals_full_rebuild(spark):
    ev = read_table(spark, f"{SF_SMALL}/events.parquet").filter(
        F.col("user_id") < 40
    )
    cutoff = ev.agg(F.expr("percentile(cast(ts as double), 0.6)")).collect()[0][0]
    before = ev.filter(F.col("ts").cast("double") <= cutoff)
    after = ev.filter(F.col("ts").cast("double") > cutoff)

    merged = scd2_merge(scd2_from_log(before), after)
    full = scd2_from_log(ev)

    cols = ["user_id", "value", "valid_from_us", "valid_to_us", "is_current"]
    assert sorted(map(tuple, merged.select(cols).collect())) == sorted(
        map(tuple, full.select(cols).collect())
    )
    # exactly one open (current) version per key
    per_key = merged.groupBy("user_id").agg(
        F.sum(F.col("is_current").cast("int")).alias("n_open")
    )
    assert per_key.filter(F.col("n_open") != 1).count() == 0
