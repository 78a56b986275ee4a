"""Triangle-inequality blocked near-dup join: exactness + pruning proof."""

from __future__ import annotations

import os

import pytest

import flink_estimator_spark.plans  # noqa: F401  (finish registry init first)
from flink_estimator_spark.operators.similarity import (
    embedding_near_dups,
    embedding_near_dups_auto,
    embedding_near_dups_blocked,
)
from flink_estimator_spark.sources.tables import read_table
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def emb(spark):
    return read_table(spark, os.path.join(SF_SMALL, "embeddings.parquet"))


@pytest.mark.parametrize("threshold", [0.40, 0.80, 0.95])
def test_blocked_equals_brute(spark, emb, threshold):
    """The blocked join must return the brute-force all-pairs answer
    bit-for-bit at every threshold (tighter thresholds shrink the t-band,
    giving the pruning more room to fire — exactness must survive both
    regimes)."""
    brute = sorted(
        map(tuple, embedding_near_dups(emb, threshold=threshold).collect())
    )
    blocked = sorted(
        map(tuple, embedding_near_dups_blocked(emb, threshold=threshold).collect())
    )
    assert blocked == brute


def test_auto_cutover_routes_by_row_count(spark, emb):
    """The registered q_dedup_embedding goes through the auto cutover
    (VERDICT r5 item 2): corpora at or below the cap keep the measured-
    faster brute BNLJ plan, corpora above it get the blocked equi-join
    plan — same answer either way."""
    n = emb.count()

    # the blocked plan's structural marker is the salted member equi-join;
    # the brute plan has no _salt column anywhere (the k x k PIVOT
    # comparison in the blocked plan is itself a bounded broadcast BNLJ,
    # so join-type strings can't distinguish the branches)
    def salted(df):
        return "_salt" in df._jdf.queryExecution().analyzed().toString()

    brute_branch = embedding_near_dups_auto(emb, threshold=0.40, brute_cap=n)
    assert not salted(brute_branch)

    blocked_branch = embedding_near_dups_auto(
        emb, threshold=0.40, brute_cap=n - 1
    )
    assert salted(blocked_branch)
    assert sorted(map(tuple, blocked_branch.collect())) == sorted(
        map(tuple, brute_branch.collect())
    )


def test_blocking_prunes_on_clustered_data(spark):
    """On genuinely clustered vectors (the real-corpus regime) the survivor
    cluster-pair list must be strictly smaller than k^2 while the answer
    stays exact — i.e. the blocking actually blocks when the data allows.
    Three tight clusters at mutually distant pivots: only the diagonal
    survives a high threshold."""
    import math

    centers = {0: [10.0, 0.0, 0.0], 1: [0.0, 10.0, 0.0], 2: [0.0, 0.0, 10.0]}
    rows = []
    vid = 0
    for lab, c in centers.items():
        for j in range(8):
            bump = 0.01 * (j + 1)
            vec = [x + (bump if i == (j % 3) else 0.0) for i, x in enumerate(c)]
            rows.append((vid, lab, vec))
            vid += 1
    df = spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<double>"
    )
    brute = sorted(
        map(tuple, embedding_near_dups(df, threshold=0.99).collect())
    )
    blocked = sorted(
        map(tuple, embedding_near_dups_blocked(df, threshold=0.99).collect())
    )
    assert blocked == brute
    assert len(brute) > 0  # the clusters really are near-dup dense

    # replicate the survivor computation to assert pruning fired: radii are
    # tiny vs the inter-pivot distance, so only the 3 diagonal pairs remain
    t = math.sqrt(2.0 - 2.0 * 0.99) + 1e-9
    import numpy as np

    by_lab = {}
    for _vid, lab, vec in rows:
        v = np.asarray(vec) / np.linalg.norm(vec)
        by_lab.setdefault(lab, []).append(v)
    piv = {k: np.mean(vs, axis=0) for k, vs in by_lab.items()}
    rad = {k: max(np.linalg.norm(v - piv[k]) for v in vs) for k, vs in by_lab.items()}
    survivors = [
        (i, j)
        for i in piv
        for j in piv
        if np.linalg.norm(piv[i] - piv[j]) <= rad[i] + rad[j] + t
    ]
    assert sorted(survivors) == [(0, 0), (1, 1), (2, 2)]
