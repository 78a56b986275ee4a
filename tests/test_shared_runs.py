"""Diagonal-island longest-shared-run detector (q_longest_shared_run).

The oracle-parity suite value-checks the full pipeline against DuckDB;
these tests pin the property the operator exists for: the reported
``run_tokens`` is EXACTLY the length of the longest verbatim token run
shared by the pair — not a lower bound, not a fingerprint coincidence —
including runs interrupted by single-token edits and runs repeated at
several offsets (distinct diagonals).
"""

from __future__ import annotations

import random

import flink_estimator_spark.plans  # noqa: F401  (finish registry init first)
from flink_estimator_spark.operators.dedup import _RUN_K, longest_shared_runs


def _py_longest_run(a: list[str], b: list[str]) -> int:
    """O(|a|*|b|) dynamic-programming longest common substring (in tokens)
    — the independent single-node shadow of the distributed reduction."""
    best = 0
    prev = [0] * (len(b) + 1)
    for i in range(1, len(a) + 1):
        cur = [0] * (len(b) + 1)
        for j in range(1, len(b) + 1):
            if a[i - 1] == b[j - 1]:
                cur[j] = prev[j - 1] + 1
                best = max(best, cur[j])
        prev = cur
    return best


def _pairs(spark, docs: list[list[str]]):
    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string",
    )
    return {
        (r["id_a"], r["id_b"]): (r["run_tokens"], r["n_matches"])
        for r in longest_shared_runs(df).collect()
    }


def test_planted_run_length_is_exact(spark):
    """A planted 17-token run between otherwise-unrelated docs reports
    run_tokens == 17 exactly."""
    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(4000)]
    shared = [rng.choice(vocab) for _ in range(17)]
    a = [rng.choice(vocab) for _ in range(40)] + shared + [
        rng.choice(vocab) for _ in range(40)
    ]
    b = [rng.choice(vocab) for _ in range(30)] + shared + [
        rng.choice(vocab) for _ in range(30)
    ]
    got = _pairs(spark, [a, b])
    assert got[(0, 1)][0] == 17


def test_single_token_edit_splits_the_run(spark):
    """Editing ONE token in the middle of a 20-token copy splits it into
    two runs; the detector must report the longer fragment, not 20 —
    the exactness that separates this from fingerprint candidates."""
    rng = random.Random(23)
    vocab = [f"w{i}" for i in range(4000)]
    shared = [rng.choice(vocab) for _ in range(20)]
    edited = list(shared)
    edited[12] = "EDITED"  # fragments: 12 tokens and 7 tokens
    a = [rng.choice(vocab) for _ in range(25)] + shared + [
        rng.choice(vocab) for _ in range(25)
    ]
    b = [rng.choice(vocab) for _ in range(25)] + edited + [
        rng.choice(vocab) for _ in range(25)
    ]
    got = _pairs(spark, [a, b])
    assert got[(0, 1)][0] == 12


def test_runs_below_k_are_invisible(spark):
    """A shared run shorter than the shingle width produces no pair —
    the k-gram floor is the detector's noise gate."""
    rng = random.Random(31)
    vocab = [f"w{i}" for i in range(4000)]
    shared = [rng.choice(vocab) for _ in range(_RUN_K - 1)]
    a = [rng.choice(vocab) for _ in range(30)] + shared + [
        rng.choice(vocab) for _ in range(30)
    ]
    b = [rng.choice(vocab) for _ in range(30)] + shared + [
        rng.choice(vocab) for _ in range(30)
    ]
    got = _pairs(spark, [a, b])
    assert (0, 1) not in got


def test_matches_dp_shadow_on_random_mosaics(spark):
    """Random documents stitched from a small shared phrase pool (so runs
    arise at MANY offsets/diagonals): the reported longest run equals the
    O(n^2) dynamic-programming answer for every pair."""
    rng = random.Random(47)
    vocab = [f"w{i}" for i in range(60)]  # small vocab -> natural repeats
    docs = [[rng.choice(vocab) for _ in range(120)] for _ in range(5)]
    got = _pairs(spark, docs)
    for i in range(5):
        for j in range(i + 1, 5):
            expect = _py_longest_run(docs[i], docs[j])
            reported = got.get((i, j), (0, 0))[0] if expect >= _RUN_K else 0
            if expect >= _RUN_K:
                assert reported == expect, f"pair ({i},{j})"
            else:
                assert (i, j) not in got
