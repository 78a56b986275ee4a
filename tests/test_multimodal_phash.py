"""Perceptual-hash near-dup contract: banding is lossless for the declared
Hamming threshold (pigeonhole over 8 disjoint 8-bit bands), fingerprints are
deterministic and content-local, and the candidate set equals the brute-force
all-pairs truth at fixture scale."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import flink_estimator_spark.plans  # noqa: F401  (finish registry init first)
from flink_estimator_spark.operators.multimodal import (
    _fake_phash,
    documents_as_media,
    phash_candidates,
    phash_fingerprints,
)
from flink_estimator_spark.plans._helpers import t

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_phash_deterministic_and_content_local():
    base = b"the quick brown fox jumps over the lazy dog " * 10
    assert _fake_phash(base) == _fake_phash(base)
    # a single-byte edit moves few bits; unrelated content moves many
    near = bytearray(base)
    near[17] ^= 0xFF
    far = os.urandom(len(base))  # content only; no Spark determinism at stake
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(_fake_phash(base), _fake_phash(bytes(near))) < 16
    assert ham(_fake_phash(base), _fake_phash(far)) > 16


def test_phash_banding_equals_brute_force(spark):
    media = documents_as_media(t(spark, SF_DIR, "documents"))
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in phash_candidates(media, max_hamming=7).collect()
    }
    fps = {
        r["media_id"]: r["phash"] for r in phash_fingerprints(media).collect()
    }
    ids = sorted(fps)
    want = {
        (a, b, bin(fps[a] ^ fps[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(fps[a] ^ fps[b]).count("1") <= 7
    }
    assert got == want
    assert len(want) > 0, "fixture should contain at least one near-dup pair"


def test_phash_threshold_beyond_band_guarantee_rejected(spark):
    media = documents_as_media(t(spark, SF_DIR, "documents"))
    with pytest.raises(ValueError):
        phash_candidates(media, max_hamming=8)
