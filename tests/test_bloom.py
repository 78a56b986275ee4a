"""Bloom runtime-prune contract: the prefilter passes a superset of the true
semi-join (no false negatives — the exactness of the downstream join depends
on it) while actually pruning non-matching probe rows, and the packed filter
stays O(m) regardless of key count."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from flink_estimator_spark.operators.bloom import (
    bloom_build,
    bloom_prefilter,
)
from flink_estimator_spark.plans._helpers import t

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_bloom_prefilter_superset_and_prunes(spark):
    c = t(spark, SF_DIR, "customer")
    o = t(spark, SF_DIR, "orders")
    keys = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")

    survivors = bloom_prefilter(o, "o_custkey", keys, "c_custkey").select(
        "o_orderkey"
    )
    true_hits = o.join(
        keys.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey"
    ).select("o_orderkey")

    n_total = o.count()
    n_surv = survivors.count()
    n_true = true_hits.count()

    # no false negatives: every true match survives the bloom
    missed = true_hits.join(survivors, "o_orderkey", "left_anti").count()
    assert missed == 0
    # and the filter genuinely prunes (BUILDING is ~1/5 of customers)
    assert n_true <= n_surv < n_total


def test_bloom_size_bounded_by_m_not_keys(spark):
    c = t(spark, SF_DIR, "customer")
    m_bits = 1 << 10  # deliberately tiny: saturation, not growth
    row = bloom_build(c.select("c_custkey"), "c_custkey", m_bits=m_bits).collect()[0]
    # the packed map can never exceed m/64 words however many keys went in
    assert len(row["bloom"]) <= m_bits // 64
