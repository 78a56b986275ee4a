"""Bloom-filter runtime pruning — semi-join reduction for shuffle joins.

The 100 TB join problem this solves: a selective predicate on one join side
(e.g. a customer segment) should prune the *other* side's scan before the
shuffle, but dynamic partition pruning only fires on partition columns and a
broadcast semi-join needs the whole key set to fit on every executor.  A
Bloom filter decouples the two: the filter is **O(m bits), not O(keys)** —
8 KB–8 MB regardless of how many keys the build side holds — so it stays
broadcastable long after the key set itself has outgrown
``autoBroadcastJoinThreshold``.  False positives are harmless because the
exact join still runs afterwards; the bloom only shrinks what rides the
shuffle (Spark's own optimizer applies the same idea as
``spark.sql.optimizer.runtimeFilter.bloomFilter.enabled``; this operator is
the explicit, engine-portable form).

Construction is fully distributed and JVM-side: each build-side key maps to
``k`` bit positions via seeded ``xxhash64``; positions distinct-reduce
(bounded by m, not by key count), pack into 64-bit words with ``bit_or``
partial aggregation, and collapse to a single ``map<word_idx, word>`` row
that broadcasts to the probe side.  The probe test is pure column
arithmetic (map lookup + mask) inside whole-stage codegen — no UDF, no
driver round-trip.

Reference scope note: the reference models join workloads only as sizing
classes (`/root/reference/src/templates/estimation.html:199-246`); runtime
filtering is part of the at-scale join surface its users would need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans._helpers import dec, t
from ..plans.registry import query

_M_BITS = 1 << 16  # 65,536 bits = 8 KiB packed; sized for fixture key counts
_K = 3  # hash functions; FPR ~ (1 - e^{-kn/m})^k


def bloom_build(keys: DataFrame, key_col: str, m_bits: int = _M_BITS,
                k: int = _K) -> DataFrame:
    """One-row DataFrame holding the packed bloom as map<int, bigint>.

    Distributed build: explode k seeded positions per key, distinct (caps
    the shuffle at m positions however many keys arrive), pack bits into
    64-bit words with bit_or partials.  The single output row is the only
    thing that ever reaches the driver/broadcast, and it is <= m/8 bytes.
    """
    pos = keys.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.lit(i), F.col(key_col)), F.lit(m_bits))
                    for i in range(k)
                ]
            )
        ).alias("pos")
    ).distinct()
    words = pos.select(
        (F.col("pos") / 64).cast("int").alias("word_idx"),
        F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("bit"),
    ).groupBy("word_idx").agg(F.expr("bit_or(bit)").alias("word"))
    return words.agg(
        F.map_from_entries(
            F.collect_list(F.struct("word_idx", "word"))
        ).alias("bloom")
    )


def bloom_might_contain(probe_col: str, m_bits: int = _M_BITS, k: int = _K):
    """Column predicate: all k bloom bits set for probe_col (map in `bloom`)."""
    cond = F.lit(True)
    for i in range(k):
        p = F.pmod(F.xxhash64(F.lit(i), F.col(probe_col)), F.lit(m_bits))
        word = F.coalesce(
            F.element_at(F.col("bloom"), (p / 64).cast("int")), F.lit(0)
        )
        # NOTE: the seed literal must be INT to hash identically to the
        # build side's F.lit(i) — xxhash64 is input-type-sensitive.
        mask = F.expr(
            f"shiftleft(1L, CAST(pmod(xxhash64({i}, {probe_col}), {m_bits}) % 64 AS INT))"
        )
        cond = cond & (word.bitwiseAND(mask) != 0)
    return cond


def bloom_prefilter(probe: DataFrame, probe_col: str, keys: DataFrame,
                    key_col: str, m_bits: int = _M_BITS,
                    k: int = _K) -> DataFrame:
    """Probe rows surviving the bloom — a superset of the true semi-join."""
    bloom = bloom_build(keys, key_col, m_bits, k)
    return probe.crossJoin(F.broadcast(bloom)).filter(
        bloom_might_contain(probe_col, m_bits, k)
    ).drop("bloom")


@query(
    "q_bloom_join_prune",
    oracle="""
        SELECT o.o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                   AS rev_cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = 'BUILDING'
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
    """,
    tags=("scale", "join", "runtime-filter"),
)
def q_bloom_join_prune(spark, sf_dir):
    """Order-priority revenue for one customer segment, with the fact side
    bloom-pruned BEFORE the exact join.  Result is identical to the plain
    join (the oracle): the bloom admits false positives, the exact join
    removes them — only the shuffle volume changes.  At fixture scale the
    dim also fits a broadcast; the operator's value is the regime where it
    does not (the bloom stays 8 KiB regardless of key count) —
    ``tests/test_bloom.py`` proves superset + pruning explicitly."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    seg_keys = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    pruned = bloom_prefilter(o, "o_custkey", seg_keys, "c_custkey")
    return (
        pruned.join(
            seg_keys.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey"
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            (F.sum(dec("o_totalprice")) * 100).cast("bigint").alias("rev_cents"),
        )
        .orderBy("o_orderpriority")
    )
