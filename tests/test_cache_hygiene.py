"""Session cache hygiene: operators must not leak pinned RDDs.

The r3 verdict's session-hygiene finding: operator-internal ``.cache()`` /
``.localCheckpoint()`` pins accumulated across a long-lived session and
taxed every later query's GC (~1.4x uniform drift, traced in round 3) —
the fix then lived in bench.py's ``clearCache()`` instead of the library.
Round 4 moved materialization to ``plans._helpers.eager_checkpoint``
(cache -> reliable checkpoint -> unpersist: computed once, lineage
truncated, zero persistent footprint), so after ANY registered builder
runs to completion, ``getPersistentRDDs()`` must be empty and bench.py's
``clearCache()`` is belt-and-braces, not load-bearing.
"""

from __future__ import annotations

import pytest

from flink_estimator_spark.plans.registry import QUERIES

from tests.conftest import SF_SMALL

# The builders that historically pinned: every operator family that
# materializes an internal stage (shingle tables, CC/k-means/BPE loops,
# fingerprint tables, graph edge tables, certificate sides).
HEAVY = [
    "q_dedup_jaccard_pairs",
    "q_dedup_clusters",
    "q_minhash_recall",
    "q_simhash_recall",
    "q_jaccard_prefix_pairs",
    "q_containment_pairs",
    "q_incremental_dedup",
    "q_multimodal_phash",
    "q_triangle_count",
    "q_kmeans_iterate",
    "q_bpe_merges",
]


@pytest.mark.parametrize("name", HEAVY)
def test_no_persistent_rdds_after_builder(spark, name):
    df = QUERIES[name].builder(spark, SF_SMALL)
    df.count()  # run to completion, like the driver gate does
    leaked = dict(spark.sparkContext._jsc.getPersistentRDDs())
    assert not leaked, f"{name} left {len(leaked)} pinned RDD(s): {leaked}"
