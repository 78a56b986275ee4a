"""Exact-substring dedup REMEDIATION (q_dedup_rewrite): the rewrite must
cut every verbatim shared run >= k tokens from the later doc, keep the
earliest occurrence verbatim, and carry a ZERO-RESIDUE certificate —
re-running the detector on the rewritten corpus finds no shared run at all
(the detect -> remediate contract, PII-redaction pattern applied to
duplication).
"""

from __future__ import annotations

import flink_estimator_spark.plans  # noqa: F401  (finish registry init first)
from pyspark.sql import functions as F

from flink_estimator_spark.operators.dedup import (
    _RUN_K,
    longest_shared_runs,
    rewrite_duplicated_runs,
)
from flink_estimator_spark.plans._helpers import t

SF = "/root/testdata/sf0.001"


def _norm(text: str) -> list[str]:
    return text.strip().lower().split()


def test_zero_residue_certificate(spark):
    """THE certificate: the detector, re-run on the rewritten corpus with
    identical (k, max_df) parameters, finds zero shared runs — neither
    surviving duplicates nor splice artifacts from the span surgery."""
    docs = t(spark, SF, "documents")
    clean = rewrite_duplicated_runs(docs)
    assert longest_shared_runs(clean).count() == 0


def test_earliest_doc_keeps_text_and_counts_conserved(spark):
    """The earliest doc of every pair survives verbatim (its rewritten
    token stream equals its normalized original), and per-doc token
    arithmetic is conserved: kept + removed == original."""
    docs = t(spark, SF, "documents")
    pairs = longest_shared_runs(docs).collect()
    assert pairs, "fixture must contain shared runs for this test to bite"
    later = {r["id_b"] for r in pairs}
    earliest_only = {r["id_a"] for r in pairs} - later

    orig = {r["doc_id"]: r["text"] for r in docs.collect()}
    rewritten = {
        r["doc_id"]: r["text"]
        for r in rewrite_duplicated_runs(docs).collect()
    }
    assert set(rewritten) == set(orig)
    assert earliest_only, "at least one doc should be earliest-only"
    for d in earliest_only:
        assert rewritten[d].split() == _norm(orig[d])
    # every doc that is only ever the later side lost at least one token
    for d in later:
        assert len(rewritten[d].split()) < len(_norm(orig[d]))


def test_planted_run_cut_from_later_doc_only(spark):
    """End-to-end on a planted duplicate: a 12-token run copied from doc
    'a' into doc 'b' disappears from 'b' and stays in 'a'; non-duplicated
    words survive on both sides."""
    run = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    docs = spark.createDataFrame(
        [
            ("a", f"unique opening words {run} unique closing words"),
            ("b", f"other leading tokens {run} other trailing tokens"),
            ("c", "entirely unrelated content with no overlap at all here"),
        ],
        "doc_id string, text string",
    )
    out = {r["doc_id"]: r["text"] for r in rewrite_duplicated_runs(docs).collect()}
    assert out["a"] == f"unique opening words {run} unique closing words"
    assert run not in out["b"]
    for w in ["other", "leading", "tokens", "trailing"]:
        assert w in out["b"].split()
    assert out["c"] == "entirely unrelated content with no overlap at all here"
    assert longest_shared_runs(
        spark.createDataFrame(
            [(k, v) for k, v in out.items()], "doc_id string, text string"
        )
    ).count() == 0


def test_census_matches_rewrite(spark):
    """The registered census rows agree with the rewritten corpus they
    certify: n_kept equals the rewritten token count per doc."""
    from flink_estimator_spark.plans.registry import QUERIES

    census = {
        r["doc_id"]: r
        for r in QUERIES["q_dedup_rewrite"].builder(spark, SF).collect()
    }
    docs = t(spark, SF, "documents")
    for r in rewrite_duplicated_runs(docs).collect():
        got = len(r["text"].split()) if r["text"] else 0
        row = census[r["doc_id"]]
        assert row["n_kept"] == got
        assert row["n_tokens"] == row["n_kept"] + row["n_removed"]
