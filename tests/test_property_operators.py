"""Property-based invariants for the probabilistic/filtered operators:
hypothesis drives randomized key sets and corpora through the Bloom filter
and the prefix-filtered Jaccard join, asserting the guarantees the scale
story rests on (no false negatives; prefix losslessness) with shrinking to
a minimal counterexample on failure.

Spark round-trips are slow per example, so example counts are small — the
point is adversarial SHAPES (duplicates, empty sets, single keys, shared
tokens), which shrinking finds quickly, not volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

import flink_estimator_spark.plans  # noqa: F401  (finish registry init first)
from flink_estimator_spark.operators.bloom import bloom_prefilter
from flink_estimator_spark.operators.dedup import (
    jaccard_pairs,
    prefix_jaccard_pairs,
)

# derandomize: a fixed example sequence — run time is then reproducible
# (a randomized seed once drove an unlucky shrink sequence past 25 minutes
# late in a long suite JVM, where accumulated operator caches slow every
# job); the fixed sequence still covers the adversarial shapes (empty,
# duplicates, single keys) that matter
_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@given(
    keys=st.lists(st.integers(-(2**40), 2**40), min_size=0, max_size=40),
    probe=st.lists(st.integers(-(2**40), 2**40), min_size=1, max_size=120),
)
@_SETTINGS
def test_bloom_never_drops_a_member(spark, keys, probe):
    spark.catalog.clearCache()  # shed operator caches from earlier tests
    kdf = spark.createDataFrame(
        [(k,) for k in keys] or [(None,)], "k long"
    ).filter(F.col("k").isNotNull())
    pdf = spark.createDataFrame([(p,) for p in probe], "k long")
    survivors = {
        r["k"] for r in bloom_prefilter(pdf, "k", kdf, "k", m_bits=1 << 10).collect()
    }
    members = set(probe) & set(keys)
    # every true member must survive — the bloom may pass extras, never drop
    assert members <= survivors


_words = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
)
_doc = st.lists(_words, min_size=5, max_size=14).map(" ".join)


@given(docs=st.lists(_doc, min_size=2, max_size=8))
@_SETTINGS
def test_prefix_jaccard_equals_exhaustive(spark, docs):
    spark.catalog.clearCache()  # prefix/jaccard cache per example otherwise
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )

    def key(rows):
        return sorted((r["id_a"], r["id_b"], r["inter"]) for r in rows)

    got = key(prefix_jaccard_pairs(df, n=3, threshold_num=1, threshold_den=2).collect())
    want = key(
        jaccard_pairs(df, n=3, threshold=0.5).collect()
    )
    assert got == want
