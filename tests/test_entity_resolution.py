"""Entity-resolution capstone (q_entity_resolution) and its auto-routed
resolver: the driver-local union-find (under-cap blocks) and the
distributed pointer-doubling CC (beyond-cap) must produce IDENTICAL
component labels, including on the chain-shaped graphs that defeat plain
min-label propagation's O(diameter) iteration count.
"""

from __future__ import annotations

import random

import flink_estimator_spark.plans  # noqa: F401  (finish registry init first)
from flink_estimator_spark.operators.fuzzy import resolve_entities


def _labels(spark, edges, cap):
    df = spark.createDataFrame(edges, "id_a string, id_b string")
    return {
        (r["doc_id"], r["cluster"])
        for r in resolve_entities(spark, df, cap=cap).collect()
    }


def _py_components(edges):
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp = {}
    for v in parent:
        comp.setdefault(find(v), []).append(v)
    out = set()
    for vs in comp.values():
        m = min(vs)
        out |= {(v, m) for v in vs}
    return out


def test_chain_graph_both_paths_agree(spark):
    """A 40-node chain — the shape whose diameter breaks O(diameter) CC:
    the pointer-doubling distributed path (forced via cap=0) must agree
    with local union-find and converge within its round budget."""
    edges = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(39)]
    expect = _py_components(edges)
    assert _labels(spark, edges, cap=10**6) == expect
    assert _labels(spark, edges, cap=0) == expect


def test_random_graphs_both_paths_agree(spark):
    """Random sparse graphs (mixed chains, cliques, singleton-free):
    label sets identical across the local and distributed paths."""
    rng = random.Random(7)
    nodes = [f"v{i:02d}" for i in range(30)]
    edges = list(
        {
            tuple(sorted(rng.sample(nodes, 2)))
            for _ in range(25)
        }
    )
    expect = _py_components(edges)
    assert _labels(spark, edges, cap=10**6) == expect
    assert _labels(spark, edges, cap=0) == expect


def test_er_census_is_consistent(spark):
    """The registered query's census: every entity has >= 2 members (the
    node set is edge endpoints), each cluster label is genuinely the
    MINIMUM of its member names (checked by recomputing the member->label
    assignment via resolve_entities on the same edge set and grouping),
    and labels are unique per output row."""
    from pyspark.sql import functions as F

    from flink_estimator_spark.operators.fuzzy import fuzzy_pairs
    from flink_estimator_spark.plans._helpers import t
    from flink_estimator_spark.plans.registry import QUERIES

    sf_dir = "/root/testdata/sf0.001"
    rows = QUERIES["q_entity_resolution"].builder(spark, sf_dir).collect()
    assert all(r["n_members"] >= 2 for r in rows)
    assert len({r["canonical_name"] for r in rows}) == len(rows)

    # Independent member re-join: recompute labels from the same blocked
    # fuzzy-pair edges and assert canonical == min(member names) per
    # entity and that the census member counts match.
    c = t(spark, sf_dir, "customer").filter(F.col("c_nationkey") == 3)
    edges = fuzzy_pairs(c, "c_name").select(
        F.col("name_a").alias("id_a"), F.col("name_b").alias("id_b")
    )
    members: dict[str, list[str]] = {}
    for r in resolve_entities(spark, edges).collect():
        members.setdefault(r["cluster"], []).append(r["doc_id"])
    census = {r["canonical_name"]: r["n_members"] for r in rows}
    assert set(census) == set(members)
    for label, names in members.items():
        assert label == min(names)
        assert census[label] == len(names)


def test_jump_cc_raises_on_unconverged(spark):
    """Fail-loud contract: a round budget too small for the graph's
    diameter must RAISE, never return partially-converged labels (a
    40-node chain needs ~log2(40) pointer-doubling rounds; 1 is not
    enough)."""
    import pytest

    from flink_estimator_spark.operators.dedup import connected_components_jump

    edges = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(39)],
        "id_a string, id_b string",
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_jump(edges, max_rounds=1).collect()
    # and the default budget converges on the same graph
    labels = {
        (r["doc_id"], r["cluster"])
        for r in connected_components_jump(edges).collect()
    }
    assert labels == {(f"n{i:03d}", "n000") for i in range(40)}
