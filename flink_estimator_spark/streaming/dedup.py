"""Streaming deduplication.

``dropDuplicatesWithinWatermark`` keeps one row per key while the key is
inside the watermark horizon — bounded state, the streaming dual of the batch
``q_dedup_by_key`` query.  (Plain ``dropDuplicates`` on a stream would keep
unbounded state; never do that at 100 TB/day.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    keys = keys or ["event_id"]
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def screen_against_ledger(
    events: DataFrame,
    ledger: DataFrame,
    key: str = "event_id",
    m_bits: int = 1 << 16,
    k: int = 3,
) -> DataFrame:
    """Streaming ingest screen: pass through only events whose ``key`` is NOT
    in a static already-processed ledger — the streaming dual of
    ``q_incremental_dedup``'s batch-vs-corpus join, with the Bloom runtime
    filter (operators/bloom.py) in front.

    Why the bloom here: a stream-static LEFT ANTI join re-probes the ledger
    every micro-batch; once the ledger outgrows the broadcast threshold that
    probe becomes a per-batch shuffle of the whole batch.  The packed filter
    stays O(m bits) forever, is embedded as a LITERAL array column (8 KiB in
    the plan — the streaming analogue of broadcasting it), and splits each
    micro-batch column-side: bloom-negative rows are *provably* new (no
    false negatives) and skip the join entirely; only bloom-positive rows —
    true dups plus the small FP fraction — reach the exact anti join that
    rescues the FPs.  Exactness is unchanged; only join traffic shrinks.

    The rescue join carries NO broadcast hint: the bloom front-filter exists
    precisely because the ledger eventually outgrows the broadcast
    threshold, so the join must be allowed to degrade to a shuffle — which
    then moves only the bloom-positive fraction of each micro-batch, not the
    whole batch.  At small ledger sizes AQE still picks a broadcast on its
    own.

    Works identically on a batch DataFrame, so the batch run is the
    streaming test's oracle (tests/test_streaming.py).
    """
    from ..operators.bloom import bloom_build

    word_map = bloom_build(ledger, key, m_bits, k).collect()[0]["bloom"]
    words = F.array(
        *[F.lit(int(word_map.get(i, 0))) for i in range(m_bits // 64)]
    )
    hit = None
    for i in range(k):
        # seed literal must be INT to hash identically to the build side
        p = F.pmod(F.xxhash64(F.lit(i), F.col(key)), F.lit(m_bits))
        word = F.element_at(words, (p / 64).cast("int") + 1)
        mask = F.expr(
            f"shiftleft(1L, CAST(pmod(xxhash64({i}, {key}), {m_bits}) % 64 AS INT))"
        )
        c = word.bitwiseAND(mask) != 0
        hit = c if hit is None else hit & c

    definitely_new = events.filter(~hit)
    candidates = events.filter(hit)
    rescued = candidates.join(ledger.select(key), key, "left_anti")
    return definitely_new.unionByName(rescued)


def screen_docs_against_corpus(
    docs: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Streaming incremental-dedup screen — the streaming dual of batch
    ``q_incremental_dedup`` (operators/dedup.py): every arriving document is
    annotated with the earliest standing-corpus doc sharing its content
    fingerprint (``dup_of`` NULL = genuinely new) and the corpus copy count.

    The corpus side is PRE-AGGREGATED to one row per fingerprint
    (min doc id + count) before the join, which is what makes the streaming
    shape work: the stream-static join is then a plain append-mode
    enrichment — no streaming aggregation, no watermark state — and it is
    the better batch plan too (the corpus collapses once instead of
    re-grouping per arriving batch).  At 100 TB the corpus-fingerprint
    table is the bucketed/sorted index of sources/bucketing.py, so each
    micro-batch joins co-located with zero corpus shuffle.  Works
    identically on a batch DataFrame — the batch run is the streaming
    test's oracle."""
    from ..operators.textstats import fingerprint

    corpus_fp = (
        corpus.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("dup_of"),
            F.count("*").alias("n_corpus_copies"),
        )
    )
    return (
        docs.withColumn("fp", fingerprint(text_col))
        .join(corpus_fp, "fp", "left")
        .select(
            id_col,
            "source",
            "dup_of",
            F.coalesce("n_corpus_copies", F.lit(0)).alias("n_corpus_copies"),
        )
    )
