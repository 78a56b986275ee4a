"""Prefix-filter losslessness: the PPJoin-style candidate generator must find
exactly the pairs the exhaustive shingle self-join finds, at any threshold —
the pigeonhole guarantee the operator's scale story rests on."""

from __future__ import annotations

import os

import flink_estimator_spark.plans  # noqa: F401  (finish registry init first)
from flink_estimator_spark.operators.dedup import (
    jaccard_pairs,
    prefix_jaccard_pairs,
)
from flink_estimator_spark.plans._helpers import t

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _pairs(df):
    return sorted(
        (r["id_a"], r["id_b"], r["inter"]) for r in df.collect()
    )


def test_prefix_join_equals_exhaustive_join(spark):
    docs = t(spark, SF_DIR, "documents")
    # t = 2/5 — a different threshold from the registered query's 1/2, so
    # the ceil(t*n)+1 prefix arithmetic is exercised on a non-trivial case
    got = _pairs(prefix_jaccard_pairs(docs, threshold_num=2, threshold_den=5))
    want = _pairs(jaccard_pairs(docs, threshold=0.4))
    assert got == want
    assert len(got) > 0, "fixture should contain at least one near-dup pair"


def test_prefix_is_smaller_than_full_set(spark):
    # sanity on the filter itself: prefixes must be a strict subset of the
    # shingle stream for multi-shingle docs (|prefix| = n - ceil(t n) + 1 < n)
    from pyspark.sql import functions as F

    from flink_estimator_spark.operators.dedup import shingle_df

    docs = t(spark, SF_DIR, "documents")
    sh = shingle_df(docs)
    n_total = sh.count()
    # re-create the prefix stream (t = 1/2) to measure it
    from pyspark.sql import Window as W

    freq = sh.groupBy("shingle").agg(F.count("*").alias("df_"))
    wdoc = W.partitionBy("doc_id")
    ranked = sh.join(freq, "shingle").select(
        "doc_id",
        F.row_number().over(wdoc.orderBy("df_", "shingle")).alias("pos"),
        F.count("*").over(wdoc).alias("n_sh"),
    )
    n_pref = ranked.filter(
        F.col("pos")
        <= F.col("n_sh") - F.floor((F.col("n_sh") + 1) / 2) + 1
    ).count()
    assert n_pref < n_total
