"""k-core peel (operators/graph.py): trajectory semantics on synthetic
graphs with known cores, plus the fixture gate's convergence certificate."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_estimator_spark.operators.graph import kcore_trajectory
from flink_estimator_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _edges_df(spark, undirected_pairs):
    rows = [(a, b) for a, b in undirected_pairs] + [(b, a) for a, b in undirected_pairs]
    return spark.createDataFrame(rows, "src long, dst long")


def test_clique_survives_chain_peels(spark):
    # 4-clique {1,2,3,4} + pendant chain 4-5-6-7; k=2: the chain peels
    # away one vertex per round from the tail, the clique is the 2-core.
    clique = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    chain = [(4, 5), (5, 6), (6, 7)]
    out = kcore_trajectory(_edges_df(spark, clique + chain), k=2, rounds=5).collect()
    rows = {r["round"]: r for r in out}
    assert rows[0]["n_alive"] == 7 and rows[0]["n_edges"] == 9
    # round 1 drops vertex 7 (deg 1) and its edge; round 2 drops 6; round 3 drops 5
    assert rows[1]["n_alive"] == 6 and rows[1]["n_edges"] == 8
    assert rows[2]["n_alive"] == 5 and rows[2]["n_edges"] == 7
    assert rows[3]["n_alive"] == 4 and rows[3]["n_edges"] == 6
    # fixpoint: the clique, every degree 3 -> checksum = 3*(1+2+3+4)
    assert rows[4]["n_alive"] == 4
    assert rows[4]["deg_checksum"] == 3 * (1 + 2 + 3 + 4)
    assert rows[4]["is_fixpoint"] and rows[5]["is_fixpoint"]
    assert not rows[3]["is_fixpoint"]  # census changed between 2 and 3


def test_whole_graph_vanishes_above_degeneracy(spark):
    # a pure cycle has degeneracy 2: k=3 peels EVERYTHING in one round
    cycle = [(i, i + 1) for i in range(1, 8)] + [(8, 1)]
    out = kcore_trajectory(_edges_df(spark, cycle), k=3, rounds=3).collect()
    rows = {r["round"]: r for r in out}
    assert rows[0]["n_alive"] == 8
    assert rows[1]["n_alive"] == 0 and rows[1]["n_edges"] == 0
    assert rows[1]["deg_checksum"] == 0
    assert rows[2]["is_fixpoint"]


def test_trajectory_is_monotone_and_converges_on_fixture(spark):
    rows = (
        QUERIES["q_kcore_peel"].builder(spark, SF).orderBy("round").collect()
    )
    assert len(rows) == 11
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_alive"] <= prev["n_alive"]
        assert cur["n_edges"] <= prev["n_edges"]
    # the convergence certificate: 10 rounds MUST reach the 3-core at
    # fixture scale (fail-loud if a fixture drift outruns the unroll)
    assert rows[-1]["is_fixpoint"]


def test_fixpoint_edges_all_have_core_degree(spark):
    # independent semantics check: at the fixpoint every surviving vertex
    # has in-subgraph degree >= k (recomputed in python on a synthetic
    # two-community graph)
    import itertools

    g = list(itertools.combinations([1, 2, 3, 4, 5], 2))  # 5-clique
    g += [(5, 10), (10, 11), (11, 12), (12, 10)]  # triangle tail (deg 2)
    k = 3
    out = kcore_trajectory(_edges_df(spark, g), k=k, rounds=4).collect()
    final = [r for r in out if r["round"] == 4][0]
    # the triangle (degeneracy 2) peels, the clique stays
    assert final["n_alive"] == 5 and final["n_edges"] == 10
    assert final["deg_checksum"] == 4 * (1 + 2 + 3 + 4 + 5)
