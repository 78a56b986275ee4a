"""Unit net for tools/bench_compare.py: the eps-normalization algebra and
noise tagging must stay exactly what SCALE.md 7o describes, because verdict
adjudication cites its rows verbatim."""

from __future__ import annotations

from tools.bench_compare import compare


def _ledger(queries, eps, canary_eps=None, spread=None, sf=0.1):
    d = {
        "sf": sf,
        "queries": queries,
        "estimator_eps": eps,
        "box_hot": eps < 20_000,
        "spread": spread or {},
        "t_off": {k: 1.0 for k in queries},
    }
    if canary_eps is not None:
        d["canary_eps"] = canary_eps
    return d


def test_contention_mover_normalizes_flat():
    # q ran 2x slower on a box whose nearest canary also read 2x slower:
    # raw ratio 2.0, normalized ratio 1.0 -> not a mover
    old = _ledger({"q": 1.0}, eps=22_000, canary_eps={"q": 22_000})
    new = _ledger({"q": 2.0}, eps=22_000, canary_eps={"q": 11_000})
    out = compare(old, new, threshold=1.5)
    assert out["summary"]["shared_queries"] == 1
    assert out["movers"] == []  # norm_ratio == 1.0


def test_real_regression_survives_normalization():
    old = _ledger({"q": 1.0}, eps=22_000, canary_eps={"q": 22_000})
    new = _ledger({"q": 2.0}, eps=22_000, canary_eps={"q": 22_000})
    out = compare(old, new, threshold=1.5)
    assert len(out["movers"]) == 1
    m = out["movers"][0]
    assert m["raw_ratio"] == 2.0 and m["norm_ratio"] == 2.0


def test_pre_timeline_ledger_falls_back_to_headline_eps():
    old = _ledger({"q": 1.0}, eps=20_000)  # no canary_eps map
    new = _ledger({"q": 1.0}, eps=10_000, canary_eps={"q": 10_000})
    out = compare(old, new, threshold=1.5)
    # same wall time on a half-speed box = 2x faster plan, normalized
    assert out["summary"]["eps_granularity"] == "global"
    assert out["movers"][0]["norm_ratio"] == 0.5


def test_granularity_never_mixes_across_ledgers():
    # old ledger has only a global eps; new has a fine timeline whose
    # local point (22k) diverges from its own global (11k).  Mixing
    # old-global with new-local would report norm 2.0 on identical wall
    # times — granularity must drop to global/global instead (norm 1.0,
    # not a mover)
    old = _ledger({"q": 1.0}, eps=11_000)
    new = _ledger({"q": 1.0}, eps=11_000, canary_eps={"q": 22_000})
    out = compare(old, new, threshold=1.5)
    assert out["summary"]["eps_granularity"] == "global"
    assert out["movers"] == []


def test_noisy_spread_is_tagged_and_failures_skipped():
    old = _ledger({"q": 1.0, "f": -1.0}, eps=22_000, spread={"q": 2.0})
    new = _ledger({"q": 3.0, "f": 1.0}, eps=22_000)
    out = compare(old, new, threshold=1.5)
    assert out["summary"]["shared_queries"] == 1  # failed entry skipped
    assert out["movers"][0]["noisy_spread"] is True


def test_sf_mismatch_flagged():
    old = _ledger({"q": 1.0}, eps=22_000, sf=0.01)
    new = _ledger({"q": 1.0}, eps=22_000, sf=0.1)
    assert compare(old, new)["summary"]["sf_mismatch"] is True


def test_hot_window_flag_from_own_timeline():
    # the new ledger's timeline has a dip; the query nearest the dip is
    # flagged hot even though granularity stays global for norm math
    old = _ledger({"q": 1.0}, eps=12_000)
    new = _ledger({"q": 1.5}, eps=14_000, canary_eps={"q": 9_000})
    new["canary_timeline"] = [
        {"t_off": 0.0, "eps": 14_000},
        {"t_off": 100.0, "eps": 9_000},
        {"t_off": 200.0, "eps": 15_000},
    ]
    out = compare(old, new, threshold=1.4)
    (m,) = out["movers"]
    assert m["hot_window_new"] is True
    assert m["hot_window_old"] is None
