"""Third-opinion differentials for the round-5 third-batch operators: the
Markov sequence scorer, the cross-doc duplicated-ngram screen, BFS levels,
and the rolling 7-day distinct are recomputed by independent pure-Python
implementations (dict counters, math.log, explicit floor quantization,
set-based BFS) and must match bit-for-bit.  The DuckDB oracles already
cross-check engine parity; this pins the MATH and the set semantics to a
reference implementation — including the hashed-shingle screen against
STRING shingles (guarding the xxhash64-injectivity assumption at fixture
scale)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

from flink_estimator_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _rows(spark, name):
    return [tuple(r) for r in QUERIES[name].builder(spark, SF).collect()]


def test_markov_anomaly_matches_python(spark):
    ev = duckdb.sql(
        f"SELECT user_id, event_id, event_type FROM '{SF}/events.parquet' "
        "ORDER BY user_id, ts, event_id"
    ).fetchall()
    seqs: dict[int, list[str]] = defaultdict(list)
    for u, _eid, et in ev:
        seqs[u].append(et)
    trans: Counter = Counter()
    for types in seqs.values():
        for prev, cur in zip(types, types[1:]):
            trans[(prev, cur)] += 1
    tot: Counter = Counter()
    for (prev, _cur), c in trans.items():
        tot[prev] += c
    w_q = {
        pc: math.floor((math.log(tot[pc[0]] + 5) - math.log(c + 1)) * 1_000_000)
        for pc, c in trans.items()
    }
    scored = []
    for u, types in seqs.items():
        pairs = list(zip(types, types[1:]))
        if not pairs:
            continue
        nll = sum(w_q[pc] for pc in pairs)
        scored.append((u, len(pairs), nll, nll // len(pairs)))
    scored.sort(key=lambda r: (-r[3], r[0]))
    expect = [
        (i + 1, u, n, nll, avg) for i, (u, n, nll, avg) in enumerate(scored[:20])
    ]
    assert _rows(spark, "q_markov_anomaly") == expect


def _shingles(text: str, n: int = 5) -> set[str]:
    words = text.strip().lower().split()
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


def test_dup_ngram_fraction_matches_python(spark):
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    sh = {doc_id: _shingles(text) for doc_id, text in docs}
    df: Counter = Counter()
    for s in sh.values():
        df.update(s)
    expect = []
    for doc_id in sorted(sh):
        s = sh[doc_id]
        if not s:
            continue
        dup = sum(1 for g in s if df[g] >= 2)
        bp = dup * 10000 // len(s)
        expect.append((doc_id, len(s), dup, bp, int(dup * 10000 >= 3000 * len(s))))
    assert _rows(spark, "q_dup_ngram_fraction") == expect


def test_bfs_levels_matches_python(spark):
    pairs = duckdb.sql(
        f"""SELECT DISTINCT a.l_partkey, b.l_partkey
            FROM '{SF}/lineitem.parquet' a JOIN '{SF}/lineitem.parquet' b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"""
    ).fetchall()
    adj: dict[int, set[int]] = defaultdict(set)
    for x, y in pairs:
        adj[x].add(y)
        adj[y].add(x)
    seed = min(adj)
    lvl = {seed: 0}
    frontier = {seed}
    for h in (1, 2, 3):
        frontier = {
            v for u in frontier for v in adj[u] if v not in lvl
        }
        for v in frontier:
            lvl[v] = h
    expect = sorted(((n, l) for n, l in lvl.items()), key=lambda r: (r[1], r[0]))
    assert _rows(spark, "q_bfs_levels") == expect


def test_rolling_distinct_matches_python(spark):
    ud = duckdb.sql(
        f"SELECT DISTINCT user_id, CAST(floor(epoch(ts)/86400) AS BIGINT) "
        f"FROM '{SF}/events.parquet'"
    ).fetchall()
    by_day: dict[int, set[int]] = defaultdict(set)
    for u, d in ud:
        by_day[d].add(u)
    expect = []
    for d in sorted(by_day):
        users = set()
        for back in range(7):
            users |= by_day.get(d - back, set())
        expect.append((d, len(users)))
    assert _rows(spark, "q_rolling_distinct") == expect


def test_ks_statistic_matches_python(spark):
    ev = duckdb.sql(
        f"SELECT event_type, value FROM '{SF}/events.parquet' "
        "WHERE event_type IN ('view', 'purchase')"
    ).fetchall()
    a = sorted(math.floor(v * 100) for t, v in ev if t == "view")
    b = sorted(math.floor(v * 100) for t, v in ev if t == "purchase")
    na, nb = len(a), len(b)
    ca: Counter = Counter(a)
    cb: Counter = Counter(b)
    cents = sorted(set(a) | set(b))
    cum_a = cum_b = 0
    best_gap, best_cent = -1, None
    for c in cents:
        cum_a += ca.get(c, 0)
        cum_b += cb.get(c, 0)
        gap = abs(cum_a * nb - cum_b * na)
        if gap > best_gap:
            best_gap, best_cent = gap, c
    expect = [(na, nb, best_gap * 1_000_000 // (na * nb), best_cent)]
    assert _rows(spark, "q_ks_statistic") == expect
