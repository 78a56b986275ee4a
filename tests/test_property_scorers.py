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


@given(
    pts=st.lists(
        st.tuples(
            st.integers(-30_000_000, 30_000_000),  # score_q-like values
            st.booleans(),                          # is-positive label
        ),
        min_size=2,
        max_size=60,
    )
)
@_SETTINGS
def test_classifier_auc_matches_python(spark, pts):
    """The relational Mann-Whitney AUC (per-coarse-bucket counts + one
    cumulative window) must equal a direct pure-Python AUC over the SAME
    coarsened scores, with average-rank tie handling — shapes hypothesis
    reaches that the fixture can't (all-one-class inputs are excluded:
    AUC is undefined there and the query's fixture always has both)."""
    if not any(p for _, p in pts) or all(p for _, p in pts):
        return  # AUC undefined without both classes
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(int(s), bool(p)) for s, p in pts], "score_q long, pos boolean"
    )
    sb = (
        df.select(
            F.expr("score_q DIV 10000").alias("s"),
            F.col("pos").cast("bigint").alias("p"),
        )
        .groupBy("s")
        .agg(F.sum("p").alias("np"), F.sum(F.lit(1) - F.col("p")).alias("nn"))
    )
    w = W.orderBy("s").rowsBetween(W.unboundedPreceding, -1)
    c = sb.select(
        "np", "nn", F.coalesce(F.sum("nn").over(w), F.lit(0)).alias("cnb")
    )
    got = c.agg(
        F.sum(F.col("np") * (2 * F.col("cnb") + F.col("nn"))).alias("u2")
    ).collect()[0]["u2"]

    # pure-Python 2U over the same truncating-coarsened scores
    def trunc_div(a, b):
        q = abs(a) // b
        return q if a >= 0 else -q

    coarse = [(trunc_div(s, 10000), p) for s, p in pts]
    u2 = 0
    for sp, pp in coarse:
        if not pp:
            continue
        for sn, pn in coarse:
            if pn:
                continue
            if sp > sn:
                u2 += 2
            elif sp == sn:
                u2 += 1
    assert got == u2


def test_bootstrap_weights_draw_truncated_poisson(spark):
    """The md5-threshold CASE must realize the documented truncated
    Poisson(1): exact branch values at the thresholds, and an empirical
    mean weight near 1 over a deterministic id sweep (the property that
    makes replicate totals unbiased resample sizes)."""
    from pyspark.sql import functions as F

    from flink_estimator_spark.operators.sampling import _BOOT_T, _boot_w_sql

    # threshold semantics: u just below t_k -> weight k, at t_k -> k+1
    probe = [(t - 1, k) for k, t in enumerate(_BOOT_T)]
    probe += [(t, k + 1) for k, t in enumerate(_BOOT_T)]
    df = spark.createDataFrame(probe, "u long, expect int")
    got = df.withColumn("w", F.expr(_boot_w_sql("u"))).collect()
    for r in got:
        assert r["w"] == r["expect"], (r["u"], r["w"], r["expect"])

    # empirical mean over 20k deterministic draws: Poisson(1) mean is 1
    ids = spark.range(20_000).select(
        F.expr(
            _boot_w_sql(
                "CAST(conv(substring(md5(concat(id, '_', 0)), 1, 12), 16, 10) AS BIGINT)"
            )
        ).alias("w")
    )
    mean_w = ids.agg(F.avg("w")).collect()[0][0]
    assert 0.97 <= mean_w <= 1.03, mean_w


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
