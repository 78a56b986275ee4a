"""Graph-navigation ANN (operators/similarity.py): recall floor, result
shape, and certificate consistency.  Values are gate-verified against the
full DuckDB replay; these tests pin the OPERATOR-level claims."""

from __future__ import annotations

from flink_estimator_spark.operators.similarity import _GANN_K, _GANN_Q
from flink_estimator_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _rows(spark):
    return QUERIES["q_emb_graph_ann"].builder(spark, SF).collect()


def test_shape_and_certificate_consistency(spark):
    rows = _rows(spark)
    assert len(rows) == _GANN_Q * _GANN_K
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
        # the inline certificate is definitionally tied to true_rk
        assert r["in_exact_topk"] == (r["true_rk"] <= _GANN_K)
        assert r["neighbor_id"] != r["query_id"]
    for q, rs in by_q.items():
        assert sorted(x["rk"] for x in rs) == list(range(1, _GANN_K + 1))
        # navigated distances are non-decreasing in rank
        ds = [x["dist_sq"] for x in sorted(rs, key=lambda x: x["rk"])]
        assert ds == sorted(ds)


def test_recall_floor(spark):
    rows = _rows(spark)
    hits = sum(1 for r in rows if r["in_exact_topk"])
    recall = hits / (_GANN_Q * _GANN_K)
    # numpy prototype measured 0.84-0.94 across fixture SFs for
    # M=8 / B=12 / H=4; the floor leaves headroom for fixture drift
    assert recall >= 0.8, recall


def test_navigation_never_beats_exact(spark):
    # rank-k navigated distance >= rank-k exact distance is NOT generally
    # assertable row-wise, but true_rk >= rk always holds: the navigator
    # can only find a subset of the exact ordering.
    for r in _rows(spark):
        assert r["true_rk"] >= r["rk"], r


def test_mutual_knn_is_symmetric_subset(spark):
    # every reciprocal pair must appear in BOTH directions of the kNN
    # relation; asymmetry shows only in the ranks
    rows = QUERIES["q_mutual_knn_pairs"].builder(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["id_a"] < r["id_b"]
        assert 1 <= r["rk_ab"] <= 8 and 1 <= r["rk_ba"] <= 8
    # hubness filter: strictly fewer mutual pairs than directed edges/2
    n_pairs = len(rows)
    assert n_pairs < 8 * 500 / 2


def test_matryoshka_sweep_bounds(spark):
    rows = {
        r["dim"]: r
        for r in QUERIES["q_emb_matryoshka"].builder(spark, SF).collect()
    }
    assert sorted(rows) == [8, 16, 32, 64]
    # full width vs itself is definitionally perfect recall
    assert rows[64]["recall_ppm"] == 1_000_000
    for r in rows.values():
        assert 0 <= r["hits_at5"] <= 50
        assert 0 <= r["recall_ppm"] <= 1_000_000
