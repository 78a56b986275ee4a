"""Property-based differentials for the round-5 scorer operators: hypothesis
drives randomized event tables through ``markov_sequence_scores`` and
``ks_two_sample`` and compares bit-for-bit against pure-Python scorers —
adversarial SHAPES (single-event keys, one transition total, all-identical
types, duplicate cents, one-point samples) that the fixture differential
(tests/test_round5_differentials.py) cannot reach."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import flink_estimator_spark.plans  # noqa: F401  (finish registry init first)
from flink_estimator_spark.operators.sequence import markov_sequence_scores
from flink_estimator_spark.operators.timeseries import ks_two_sample

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_TYPES = ["view", "click", "purchase"]


@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 4),            # user
            st.integers(0, 100),          # ts seconds (ties allowed)
            st.sampled_from(_TYPES),
        ),
        min_size=1,
        max_size=40,
    )
)
@_SETTINGS
def test_markov_scores_match_python(spark, events):
    spark.catalog.clearCache()
    rows = [
        (u, i, ts, et) for i, (u, ts, et) in enumerate(events)
    ]  # event_id = list index: unique tiebreak
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts long, event_type string"
    )
    got = sorted(
        tuple(r)
        for r in markov_sequence_scores(df, order_cols=("ts", "event_id")).collect()
    )

    seqs: dict[int, list[str]] = defaultdict(list)
    for u, _eid, _ts, et in sorted(rows, key=lambda r: (r[0], r[2], r[1])):
        seqs[u].append(et)
    trans: Counter = Counter()
    for types in seqs.values():
        for pc in zip(types, types[1:]):
            trans[pc] += 1
    tot: Counter = Counter()
    for (prev, _), c in trans.items():
        tot[prev] += c
    w_q = {
        pc: math.floor((math.log(tot[pc[0]] + 5) - math.log(c + 1)) * 1_000_000)
        for pc, c in trans.items()
    }
    expect = []
    for u, types in seqs.items():
        pairs = list(zip(types, types[1:]))
        if not pairs:
            continue
        nll = sum(w_q[pc] for pc in pairs)
        expect.append((u, len(pairs), nll, nll // len(pairs)))
    assert got == sorted(expect)


@given(
    a=st.lists(st.integers(-500, 500), min_size=1, max_size=40),
    b=st.lists(st.integers(-500, 500), min_size=1, max_size=40),
)
@_SETTINGS
def test_ks_two_sample_matches_python(spark, a, b):
    spark.catalog.clearCache()
    rows = [(c, 1, 0) for c in a] + [(c, 0, 1) for c in b]
    df = spark.createDataFrame(rows, "cent long, is_a long, is_b long")
    got = [tuple(r) for r in ks_two_sample(df).collect()]

    na, nb = len(a), len(b)
    ca, cb = Counter(a), Counter(b)
    cum_a = cum_b = 0
    best_gap, best_cent = -1, None
    for c in sorted(set(a) | set(b)):
        cum_a += ca.get(c, 0)
        cum_b += cb.get(c, 0)
        gap = abs(cum_a * nb - cum_b * na)
        if gap > best_gap:
            best_gap, best_cent = gap, c
    assert got == [(na, nb, best_gap * 1_000_000 // (na * nb), best_cent)]


def test_ks_two_sample_overflow_guard(spark):
    """Beyond n_a*n_b <= (2^63-1)/1e6 the scaled gap leaves exact-BIGINT
    range; with ANSI off Spark would wrap silently, so ks_two_sample must
    RAISE instead of returning a wrong ks_e6 (ADVICE r5).  Weighted is_a/
    is_b rows stand in for the ~3e6-rows-per-side corpus that would
    actually trip it."""
    import pytest

    big = 4_000_000  # 4e6 per side -> n_a*n_b = 1.6e13 > 9.2e12 limit
    df = spark.createDataFrame(
        [(0, big, 0), (1, 0, big)], "cent long, is_a long, is_b long"
    )
    with pytest.raises(Exception, match="quantized-fraction"):
        ks_two_sample(df).collect()

    ok = 3_000_000  # 9e12 <= limit: passes the guard, exact answer
    df_ok = spark.createDataFrame(
        [(0, ok, 0), (1, 0, ok)], "cent long, is_a long, is_b long"
    )
    assert [tuple(r) for r in ks_two_sample(df_ok).collect()] == [
        (ok, ok, 1_000_000, 0)
    ]
