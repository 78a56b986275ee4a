"""k-center greedy coreset (operators/similarity.py): numpy differential
on the full greedy trajectory + structural invariants."""

from __future__ import annotations

import duckdb
import numpy as np

from flink_estimator_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _numpy_trace(steps=10):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    v = np.array([r[1] for r in rows], dtype=np.float64)
    mn, mx = v.min(0), v.max(0)
    rng = np.where(mx == mn, 1.0, mx - mn)
    code = np.where(
        mx == mn, 0, np.clip(np.floor((v - mn) * 256.0 / rng), 0, 255)
    ).astype(np.int64)
    order = np.argsort(ids)
    ids, code = ids[order], code[order]
    center = int(ids.min())
    mind = ((code - code[ids == center][0]) ** 2).sum(1)
    trace = []
    for s in range(steps):
        radius = int(mind.max())
        trace.append((s, center, radius))
        if s == steps - 1:
            break
        nxt = ids[mind == mind.max()].min()
        center = int(nxt)
        mind = np.minimum(mind, ((code - code[ids == center][0]) ** 2).sum(1))
    return trace


def test_kcenter_matches_numpy_greedy(spark):
    got = [
        (r["step"], r["center_id"], r["radius_q"])
        for r in QUERIES["q_kcenter_coreset"].builder(spark, SF).orderBy("step").collect()
    ]
    assert got == _numpy_trace()


def test_kcenter_invariants(spark):
    rows = QUERIES["q_kcenter_coreset"].builder(spark, SF).orderBy("step").collect()
    assert len(rows) == 10
    radii = [r["radius_q"] for r in rows]
    assert radii == sorted(radii, reverse=True) or all(
        a >= b for a, b in zip(radii, radii[1:])
    )
    centers = [r["center_id"] for r in rows]
    assert len(set(centers)) == len(centers)  # greedy never re-picks
