"""Partitioning invariance — the 100 TB correctness claim, tested.

SCALE.md's central cross-engine discipline is that every value-sensitive
reduction (DECIMAL sums, floor-quantized BIGINT terms, integer folds) is
ORDER-INDEPENDENT, so results do not depend on data layout: shuffle
partition count, scan split sizes, or AQE coalescing.  On a real cluster
those knobs all change with cluster size and file layout — a query whose
answer moves with them is silently wrong at scale even if it gate-matches
at one fixed local configuration.

These tests re-run a value-sensitive sample of the registry under a very
different shuffle-partition count and under tiny scan splits (forcing a
different input-split decomposition), and require bit-identical collected
results.  The sample deliberately covers each arithmetic family: DECIMAL
money sums cast to double, floor-quantized OLS/centroid math, fold-based
cosine scores, md5-portable LSH candidate sets, the unrolled quantized
Lloyd loop, exact integral division, and quantized entropy sums.
"""

from __future__ import annotations

import pytest

from flink_estimator_spark.plans.registry import QUERIES

from tests.conftest import SF_SMALL

# one query per arithmetic family (keep the list small: every entry runs
# three times under different layouts)
SAMPLE = [
    "q1_pricing_summary",      # DECIMAL(18,2) sums -> double
    "q_linreg_by_group",       # DECIMAL(38,0) moments, floor-quantized slope
    "q_emb_centroids",         # floor-quantized BIGINT component means
    "q_emb_lsh_ann",           # fold cosine + md5-portable buckets
    "q_dedup_minhash_lsh",     # md5-word signatures + band joins
    "q_kmeans_iterate",        # unrolled quantized iterative loop
    "q_time_weighted_avg",     # exact integral division (div / HUGEINT //)
    "q_token_entropy",         # quantized 1e-6 log terms summed as BIGINT
    "q_tfidf_cosine_pairs",    # integer weights, DECIMAL dots, quantized cos
    "q_autocorrelation",       # DECIMAL(38,0) paired moments
    # r4 curation family: fold-cosine + quantized argmin under join
    # reordering (VERDICT r4 item 6)
    "q_semdedup_prune",        # quantized argmin clustering + fold cosine pairs
    "q_emb_outliers",          # quantized distance-to-own-centroid top-k
    "q_triplet_mining",        # fold cosine argmax margins over anchor scan
    # r5 additions: rank-fusion and string-fold families
    "q_hybrid_rrf",            # two TakeOrdered top-K lists + integer RRF div
    "q_bpe_encode_cert",       # replace-chain greedy BPE token counts
    "q_curation_funnel",       # composed md5-fingerprint funnel counts
    # r5 second batch: trained-scorer and compressed-domain families
    "q_quality_classifier",    # ln-quantized trained NB weights + hashed buckets
    "q_emb_pq_adc",            # unrolled PQ Lloyd + ADC sums + exact rerank
    # r5 third batch: sequence-scorer and linear-dedup-screen families
    "q_markov_anomaly",        # ln-quantized transition weights via lag window
    "q_dup_ngram_fraction",    # hashed-shingle docfreq counts, integer bp
    "q_bfs_levels",            # iterative cached reach-expansion, min levels
    # r6 additions: evaluation-metric and local-fingerprint families
    "q_classifier_auc",        # Mann-Whitney 2U over distinct-bucket window
    "q_retrieval_ndcg",        # literal-discount DCG over TakeOrdered lists
    "q_psi_drift",             # per-bin floor-quantized ln terms summed
    "q_winnow_shared_pairs",   # per-doc window minima met by value join
    # r6 fourth batch: sequential-div chi-square and cross-multiplied kappa
    "q_chi2_terms",            # DECIMAL numerator, chained integral divisions
    "q_cohen_kappa",           # n2-cross-multiplied agreement, one division
    # r6 fifth batch: correctly-rounded-sqrt ratio and single-ratio ln
    "q_silhouette",            # sqrt of exact BIGINT d2, scale-cancelling ratio
    "q_bigram_nll",            # interpolated-LM ln of one exact integer ratio
    # r6 sixth batch: double-ordered median over exact-ratio slopes
    "q_theil_sen",             # BIGINT/BIGINT double slopes, ordered median pick
    # r6 seventh batch: IVF routing composed over PQ, diagonal islands
    "q_emb_ivfpq_adc",         # coarse probe -> ADC -> rerank, all quantized
    "q_longest_shared_run",    # positional equi-join + per-diagonal islands
    # r7 additions: span-surgery rewrite and normalization-screen families
    "q_dedup_rewrite",         # island spans -> distinct removals -> md5 sig
    "q_url_dedup_rate",        # regex/array canonical form, distinct-count agg
    "q_kanonymity",            # coarsening-ladder census over hash aggregates
    # r7 second batch: k-min rank ladder + sketch set algebra
    "q_theta_setops",          # md5-52 KMV k-mins, theta division estimates
    # r7 third batch: navigated-graph search over quantized distances
    "q_emb_graph_ann",         # kNN-graph beam hops, int8-L2 rank windows
    # r7 fourth batch: iterative argmax selection + CDF-gap transport
    "q_kcenter_coreset",       # broadcast-center rounds, TakeOrdered argmax
    "q_wasserstein_drift",     # integer CDF-gap terms, one integral division
]


def _rows(spark, name):
    return sorted(tuple(r) for r in QUERIES[name].builder(spark, SF_SMALL).collect())


@pytest.fixture(scope="module")
def baseline(spark):
    return {name: _rows(spark, name) for name in SAMPLE}


@pytest.fixture()
def restore_conf(spark):
    keys = ["spark.sql.shuffle.partitions", "spark.sql.files.maxPartitionBytes"]
    prev = {k: spark.conf.get(k) for k in keys}
    yield spark
    for k, v in prev.items():
        spark.conf.set(k, v)


@pytest.mark.parametrize("name", SAMPLE)
def test_invariant_under_shuffle_partition_count(restore_conf, baseline, name):
    spark = restore_conf
    spark.conf.set("spark.sql.shuffle.partitions", "7")  # coprime with 32
    assert _rows(spark, name) == baseline[name], (
        f"{name}: result depends on shuffle partition count — an"
        " order-dependent reduction leaked in"
    )


@pytest.mark.parametrize("name", SAMPLE)
def test_invariant_under_tiny_scan_splits(restore_conf, baseline, name):
    spark = restore_conf
    # force many input splits: different per-task row subsets feed every
    # partial aggregate
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(64 * 1024))
    assert _rows(spark, name) == baseline[name], (
        f"{name}: result depends on scan split layout — an order-dependent"
        " reduction leaked in"
    )


@pytest.fixture()
def restore_aqe(spark):
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    yield spark
    spark.conf.set("spark.sql.adaptive.enabled", prev)


@pytest.mark.parametrize("name", SAMPLE)
def test_invariant_with_aqe_disabled(restore_aqe, baseline, name):
    """AQE re-plans at runtime (partition coalescing, join strategy swaps);
    results must not move when it is switched off — the baseline ran with
    the session default (AQE on)."""
    spark = restore_aqe
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    assert _rows(spark, name) == baseline[name], (
        f"{name}: result depends on adaptive execution"
    )
