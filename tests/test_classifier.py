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
