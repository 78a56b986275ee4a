"""Registry hygiene — the gate-ordering machinery itself.

The driver's correctness gate processes ``queries()`` in dict order and caps
at ~50 rows per round, so the registry's rotation bookkeeping
(``_GATED_PRIOR_ROUNDS``, ``_SF001_SEC``) decides which queries ever receive
a hard correctness signal.  These checks keep that bookkeeping honest.
"""

from __future__ import annotations

from flink_estimator_spark.plans.registry import (
    QUERIES,
    _EVIDENCE_ROUND,
    _GATED_PRIOR_ROUNDS,
    _SF001_SEC,
    _SF001_SEC_PAIRS,
    _gate_order,
)


def test_no_duplicate_measurement_keys():
    names = [n for n, _ in _SF001_SEC_PAIRS]
    assert len(names) == len(set(names))
    assert set(_SF001_SEC) == set(names)


def test_gated_prior_rounds_are_registered():
    # A typo'd name in the frozenset would silently re-gate a green query
    # (wasting a gate slot) while the typo'd entry matched nothing.
    unknown = _GATED_PRIOR_ROUNDS - set(QUERIES)
    assert not unknown, unknown


def test_gate_order_is_a_permutation_with_ungated_first():
    order = _gate_order()
    assert sorted(order) == sorted(QUERIES)
    seen_gated = False
    for n in order:
        if n in _GATED_PRIOR_ROUNDS:
            seen_gated = True
        else:
            assert not seen_gated, f"ungated {n} after a gated entry"


def test_gated_tail_is_oldest_evidence_first():
    """Regression re-sampling is age-aware (VERDICT r5 item 4): the gated
    tail must be sorted ascending on the round of each query's last green
    driver row, so the ~45 spare gate slots per round always hit the
    stalest evidence first and bound every query's evidence age."""
    tail = [n for n in _gate_order() if n in _GATED_PRIOR_ROUNDS]
    ages = [_EVIDENCE_ROUND[n] for n in tail]
    assert ages == sorted(ages)
    # every gated name carries an evidence round and vice versa
    assert set(_EVIDENCE_ROUND) == set(_GATED_PRIOR_ROUNDS)


def test_ungated_oracled_queries_sort_before_rows_only():
    """Every oracle'd ungated query precedes every rows-only ungated query
    (VERDICT r3 item 1: the capped driver slots must hit value-checkable
    queries first — a rows-only entry can only ever record a row count)."""
    front = [n for n in _gate_order() if n not in _GATED_PRIOR_ROUNDS]
    saw_rows_only = False
    for n in front:
        if QUERIES[n].oracle is None:
            saw_rows_only = True
        else:
            assert not saw_rows_only, f"oracle'd {n} after a rows-only entry"
