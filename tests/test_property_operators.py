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


_lsh_words = st.sampled_from(
    # adversarial token shapes: unicode, punctuation, case (lower() path),
    # a repeated boilerplate token (duplicate grams exercise the in-row
    # multiset-min == distinct-set-min equivalence)
    ["alpha", "Alpha", "héllo", "жук", "a.b,", "x", "the", "the", "42"]
)
_lsh_doc = st.lists(_lsh_words, min_size=0, max_size=12).map(" ".join)


@given(docs=st.lists(_lsh_doc, min_size=1, max_size=6))
@_SETTINGS
def test_streaming_hof_minhash_equals_batch_aggregate(spark, docs):
    """The per-row HOF MinHash (streaming/dedup.lsh_banded_signatures) must
    equal the batch explode->groupBy-min portable pipeline on ANY text:
    same doc set (docs under 5 words dropped by both), same signatures,
    same band keys — the equivalence the streaming near-dup gate's oracle
    rests on, under adversarial token shapes the fixture lacks."""
    from flink_estimator_spark.operators.dedup import (
        md5_word,
        minhash_signatures,
        shingle_df,
    )
    from flink_estimator_spark.streaming.dedup import lsh_banded_signatures

    spark.catalog.clearCache()
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    ).withColumn("ts", F.timestamp_seconds(F.lit(86400) + F.col("doc_id")))

    got = {
        (r["doc_id"], r["band"]): (r["key"], tuple(r["sig"]))
        for r in lsh_banded_signatures(df, num_hashes=8, bands=2).collect()
    }

    sig = minhash_signatures(shingle_df(df, portable=True), num_hashes=8,
                             portable=True)
    for b in range(2):
        sig = sig.withColumn(
            f"key{b}",
            md5_word(
                F.concat_ws(
                    "#", *[F.col(f"h{b * 4 + r}").cast("string") for r in range(4)]
                ),
                1,
                15,
            ),
        )
    want = {}
    for r in sig.collect():
        hs = tuple(r[f"h{i}"] for i in range(8))
        for b in range(2):
            want[(r["doc_id"], b)] = (r[f"key{b}"], hs)

    assert got == want
