"""Third-opinion differentials for the learned relational scorers: the
Spark-trained hashed Naive-Bayes classifier and the DSIR importance weights
are recomputed by an independent pure-Python trainer (hashlib md5, math.log,
explicit floor quantization) and must match bit-for-bit.  The DuckDB oracle
already cross-checks engine parity; this pins the MATH itself (smoothing
constants, OOV handling, prior, hashing) to a reference implementation."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import duckdb
import pytest

from flink_estimator_spark.operators.classifier import (
    _DSIR_BUCKETS,
    _DSIR_TARGET,
    _DSIR_TOP,
    _NB_BUCKETS,
    _NB_HOLD,
    _Q,
)
from flink_estimator_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _docs():
    return duckdb.sql(
        f"SELECT doc_id, lang, source, text FROM '{SF}/documents.parquet' ORDER BY doc_id"
    ).fetchall()


def _bucket(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16) % mod


def _toks(text: str) -> list[str]:
    return re.split(r"\s+", text.strip().lower())


def _q6(x: float) -> int:
    return math.floor(x * _Q)


def test_quality_classifier_matches_python(spark):
    docs = _docs()
    c_pos: Counter = Counter()
    c_neg: Counter = Counter()
    n_pos = n_neg = 0
    for doc_id, lang, _src, text in docs:
        if doc_id % 5 == _NB_HOLD:
            continue
        pos = lang == "en"
        n_pos += pos
        n_neg += not pos
        for tok in _toks(text):
            b = _bucket(tok, _NB_BUCKETS)
            (c_pos if pos else c_neg)[b] += 1
    t_pos, t_neg = sum(c_pos.values()), sum(c_neg.values())
    v = len(set(c_pos) | set(c_neg))
    w = {
        b: _q6(
            math.log(c_pos.get(b, 0) + 1) - math.log(t_pos + v)
            - math.log(c_neg.get(b, 0) + 1) + math.log(t_neg + v)
        )
        for b in set(c_pos) | set(c_neg)
    }
    w_oov = _q6(math.log(t_neg + v) - math.log(t_pos + v))
    prior = _q6(math.log(n_pos) - math.log(n_neg))

    expect = {}
    for doc_id, lang, _src, text in docs:
        if doc_id % 5 != _NB_HOLD:
            continue
        toks = _toks(text)
        score = prior + sum(
            w.get(_bucket(tok, _NB_BUCKETS), w_oov) for tok in toks
        )
        expect[doc_id] = (lang, len(toks), score, 1 if score > 0 else 0)

    got = {
        r["doc_id"]: (r["lang"], r["n_tok"], r["score_q"], r["pred_en"])
        for r in QUERIES["q_quality_classifier"].builder(spark, SF).collect()
    }
    assert got == expect


def test_dsir_select_matches_python(spark):
    docs = _docs()
    raw: Counter = Counter()
    tgt: Counter = Counter()
    doc_buckets: dict[int, list[int]] = defaultdict(list)
    src_of = {}
    for doc_id, _lang, src, text in docs:
        src_of[doc_id] = src
        toks = _toks(text)
        for a, b in zip(toks, toks[1:]):
            h = _bucket(f"{a}_{b}", _DSIR_BUCKETS)
            doc_buckets[doc_id].append(h)
            raw[h] += 1
            if src in _DSIR_TARGET:
                tgt[h] += 1
    t_raw, t_tgt = sum(raw.values()), sum(tgt.values())
    w = {
        b: _q6(
            math.log(tgt.get(b, 0) + 1) - math.log(t_tgt + _DSIR_BUCKETS)
            - math.log(raw[b] + 1) + math.log(t_raw + _DSIR_BUCKETS)
        )
        for b in raw
    }
    scored = sorted(
        (
            (-sum(w[h] for h in hs), doc_id, src_of[doc_id], len(hs))
            for doc_id, hs in doc_buckets.items()
        ),
    )[:_DSIR_TOP]
    expect = [
        (rk + 1, doc_id, src, n, -negw)
        for rk, (negw, doc_id, src, n) in enumerate(scored)
    ]

    got = [
        (r["rank"], r["doc_id"], r["source"], r["n_grams"], r["weight_q"])
        for r in QUERIES["q_dsir_select"].builder(spark, SF).collect()
    ]
    assert got == expect


def test_classifier_holdout_is_exactly_scored(spark):
    """Every held-out doc (doc_id % 5 == HOLD) is scored exactly once; no
    training doc leaks into the output."""
    rows = QUERIES["q_quality_classifier"].builder(spark, SF).collect()
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))
    assert all(i % 5 == _NB_HOLD for i in ids)
    n_hold = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/documents.parquet' WHERE doc_id % 5 = {_NB_HOLD}"
    ).fetchone()[0]
    assert len(ids) == n_hold


def _trunc_div(a: int, b: int) -> int:
    """Truncating integral division — Spark DIV / DuckDB // semantics
    (toward zero, unlike Python's floor //)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_threshold_sweep_matches_python(spark):
    """The sweep's cumulative (tp, fp) and integer precision/recall/F1
    recomputed from the gated per-doc scores by brute force."""
    scored = QUERIES["q_quality_classifier"].builder(spark, SF).collect()
    buckets: Counter = Counter()
    pos: Counter = Counter()
    for r in scored:
        s = _trunc_div(r["score_q"], 10000)
        buckets[s] += 1
        pos[s] += r["lang"] == "en"
    n_pos = sum(pos.values())
    expect = []
    tp = fp = 0
    for s in sorted(buckets, reverse=True):
        tp += pos[s]
        fp += buckets[s] - pos[s]
        expect.append(
            (
                s,
                tp,
                fp,
                _trunc_div(tp * 10000, tp + fp),
                _trunc_div(tp * 10000, n_pos),
                _trunc_div(tp * 20000, tp + fp + n_pos),
            )
        )
    got = [
        tuple(r)
        for r in QUERIES["q_threshold_sweep"].builder(spark, SF).collect()
    ]
    assert got == expect
    # recall is non-decreasing as the threshold drops; the last row is
    # the accept-everything point (recall 10000)
    assert [r[4] for r in got] == sorted(r[4] for r in got)
    assert got[-1][4] == 10000


_LANG_RES = {
    "en": r"\b(the|a|and|of|to|in|is|it)\b",
    "es": r"\b(el|la|de|que|y|en|un|es)\b",
    "de": r"\b(der|die|das|und|ist|von|ein|zu)\b",
    "fr": r"\b(le|la|les|de|et|un|une|est)\b",
}


def _py_lang_guess(text: str) -> str:
    hits = {lg: len(re.findall(rx, text.lower())) for lg, rx in _LANG_RES.items()}
    best = max(hits.values())
    if best == 0:
        return "unknown"
    for lg in _LANG_RES:  # tie order en > es > de > fr
        if hits[lg] == best:
            return lg
    raise AssertionError


def test_cohen_kappa_matches_python(spark):
    """The 2x2 rater cells and the cross-multiplied kappa recomputed in
    Python big-ints: rater A = gated NB predictions, rater B = the
    stopword-vote heuristic re-derived from raw text."""
    pred = {
        r["doc_id"]: r["pred_en"]
        for r in QUERIES["q_quality_classifier"].builder(spark, SF).collect()
    }
    cells = Counter()
    for doc_id, _lang, _src, text in _docs():
        if doc_id % 5 != _NB_HOLD:
            continue
        a = pred[doc_id]
        b = 1 if _py_lang_guess(text) == "en" else 0
        cells[(a, b)] += 1
    n11, n10 = cells[(1, 1)], cells[(1, 0)]
    n01, n00 = cells[(0, 1)], cells[(0, 0)]
    n = n11 + n10 + n01 + n00
    pe_num = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    expect = (
        n, n11, n10, n01, n00,
        _trunc_div((n11 + n00) * 10000, n),
        _trunc_div(pe_num * 10000, n * n),
        _trunc_div((n * (n11 + n00) - pe_num) * 1_000_000, n * n - pe_num),
    )
    [got] = [tuple(r) for r in QUERIES["q_cohen_kappa"].builder(spark, SF).collect()]
    assert got == expect


def test_chi2_terms_matches_python(spark):
    """Top-20 chi-square buckets recomputed with Python big-ints using the
    identical chained truncating divisions (floor(floor(x/p)/q) ==
    floor(x/pq) on nonnegative ints — so the chain equals the exact
    single division)."""
    c_pos: Counter = Counter()
    c_neg: Counter = Counter()
    for doc_id, lang, _src, text in _docs():
        if doc_id % 5 == _NB_HOLD:
            continue
        for tok in _toks(text):
            b = _bucket(tok, _NB_BUCKETS)
            if lang == "en":
                c_pos[b] += 1
            else:
                c_neg[b] += 1
    t_pos, t_neg = sum(c_pos.values()), sum(c_neg.values())
    rows = []
    for b in set(c_pos) | set(c_neg):
        a, bb = c_pos[b], c_neg[b]
        dev = a * (t_neg - bb) - bb * (t_pos - a)
        chi2 = (
            (t_pos + t_neg) * dev * dev * 1000
            // ((a + bb) * (t_pos + t_neg - a - bb))
            // t_pos
            // t_neg
        )
        assert chi2 >= 0
        en_assoc = 1 if a * t_neg > bb * t_pos else -1
        rows.append((-chi2, b, a, bb, en_assoc))
    rows.sort()
    expect = [
        (rk + 1, b, a, bb, en_assoc, -negchi)
        for rk, (negchi, b, a, bb, en_assoc) in enumerate(rows[:20])
    ]
    got = [tuple(r) for r in QUERIES["q_chi2_terms"].builder(spark, SF).collect()]
    assert got == expect
