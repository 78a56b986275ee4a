"""BPE differential: the distributed trainer must learn EXACTLY the merge
list a straightforward single-machine reference implementation learns from
the same vocabulary — same pairs, same order, same weighted counts."""

from __future__ import annotations

import os
import re
from collections import Counter

import flink_estimator_spark.plans  # noqa: F401  (finish registry init first)
from flink_estimator_spark.operators.bpe import bpe_train
from flink_estimator_spark.plans._helpers import t

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _reference_bpe(texts, iters):
    vocab = Counter()
    for txt in texts:
        for w in re.split(r"\s+", txt.strip().lower()):
            if w:
                vocab[w] += 1
    words = {w: list(w) + ["</w>"] for w in vocab}
    merges = []
    for _ in range(iters):
        counts = Counter()
        for w, syms in words.items():
            f = vocab[w]
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        # (count desc, pair lexicographic) — the determinism contract
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        merges.append((a, b, n))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def test_distributed_bpe_matches_reference_trainer(spark):
    docs = t(spark, SF_DIR, "documents")
    got, _ = bpe_train(docs, iters=6)
    texts = [r["text"] for r in docs.select("text").collect()]
    want = _reference_bpe(texts, iters=6)
    assert got == want
    assert len(got) == 6, "fixture corpus should support 6 merges"


def test_merges_compose_into_multichar_tokens(spark):
    docs = t(spark, SF_DIR, "documents")
    merges, vocab = bpe_train(docs, iters=6)
    # later merges may consume earlier merge outputs (that is the point of
    # BPE); assert the final vocabulary actually contains a token longer
    # than one character + marker
    longest = max(
        (s for r in vocab.select("syms").collect() for s in r["syms"]),
        key=len,
    )
    assert len(longest.replace("</w>", "")) >= 2
