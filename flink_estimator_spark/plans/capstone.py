r"""Capstone: the end-to-end training-data curation funnel as ONE query.

Every stage exists as a standalone registered operator family (quality
scoring — textstats; exact dedup — dedup; bag-of-words near-dedup —
fingerprints; decontamination — sampling/cleaning).  This query chains
them the way a production corpus build does and reports the funnel, so the
gate value-checks the COMPOSITION, not just the parts: survivors after
each stage over the documents fixture.

Stage semantics (all md5-portable, engine-exact):

1. quality      — trimmed length >= 50 AND >= 10 whitespace tokens
2. exact dedup  — keep min doc_id per md5(lower(trim(text)))
3. near dedup   — keep min doc_id per bag-of-words fingerprint
                  (md5 over the sorted distinct lowercase token set:
                  order/multiplicity-insensitive, the cheap
                  shuffle-once near-dup key)
4. decontam     — drop documents whose bow fingerprint appears in the
                  held-out evaluation split (doc_id % 97 == 0), and the
                  held-out docs themselves

Scale shape: one pass computes both fingerprints (no re-tokenize per
stage); stages 2-3 are hash-groupBy min-aggregates (the exact-dedup
shape); stage 4 is a semi/anti join against the (tiny) held-out
fingerprint set; the funnel is a union of partial-aggregated counts.
Nothing quadratic, nothing collected.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ._helpers import spread, t
from .registry import query

_FUNNEL_SQL = r"""
        WITH base AS (
            SELECT doc_id,
                   length(trim(text)) AS tlen,
                   len(string_split_regex(lower(trim(text)), '\s+')) AS ntok,
                   md5(lower(trim(text))) AS fp_exact,
                   md5(array_to_string(
                       list_sort(list_distinct(
                           string_split_regex(lower(trim(text)), '\s+'))),
                       ' ')) AS fp_bow,
                   (doc_id % 97 = 0) AS heldout
            FROM documents),
        s1 AS (SELECT * FROM base WHERE tlen >= 50 AND ntok >= 10),
        s2 AS (
            SELECT * FROM (
                SELECT *, row_number() OVER (PARTITION BY fp_exact
                                             ORDER BY doc_id) AS rn
                FROM s1) WHERE rn = 1),
        s3 AS (
            SELECT * FROM (
                SELECT *, row_number() OVER (PARTITION BY fp_bow
                                             ORDER BY doc_id) AS rn2
                FROM s2) WHERE rn2 = 1),
        held AS (SELECT DISTINCT fp_bow FROM base WHERE heldout),
        s4 AS (
            SELECT * FROM s3
            WHERE NOT heldout
              AND fp_bow NOT IN (SELECT fp_bow FROM held))
        SELECT * FROM (
            SELECT CAST(0 AS BIGINT) AS stage_no, 'raw' AS stage,
                   CAST(count(*) AS BIGINT) AS survivors FROM base
            UNION ALL
            SELECT 1, 'quality', count(*) FROM s1
            UNION ALL
            SELECT 2, 'exact_dedup', count(*) FROM s2
            UNION ALL
            SELECT 3, 'bow_near_dedup', count(*) FROM s3
            UNION ALL
            SELECT 4, 'decontaminated', count(*) FROM s4)
        ORDER BY stage_no
    """


@query(
    "q_curation_funnel",
    oracle=_FUNNEL_SQL,
    tags=("llm", "curation", "pipeline", "dedup", "decontamination"),
)
def q_curation_funnel(spark, sf_dir):
    """See module docstring — the composed curation funnel, value-gated."""
    d = t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    base = spread(d, "doc_id").select(
        "doc_id",
        F.length(F.trim(F.col("text"))).alias("tlen"),
        F.size(toks).alias("ntok"),
        F.md5(F.lower(F.trim(F.col("text")))).alias("fp_exact"),
        F.md5(
            F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))
        ).alias("fp_bow"),
        (F.col("doc_id") % 97 == 0).alias("heldout"),
    )
    s1 = base.filter((F.col("tlen") >= 50) & (F.col("ntok") >= 10))

    def keep_min(df, key):
        # exact-dedup winner: min-id per fingerprint (groupBy + join back —
        # partial-aggregated min, then one equi-join to recover attributes)
        winners = df.groupBy(key).agg(F.min("doc_id").alias("_keep"))
        return (
            df.join(winners, key)
            .filter(F.col("doc_id") == F.col("_keep"))
            .drop("_keep")
        )

    s2 = keep_min(s1, "fp_exact")
    s3 = keep_min(s2, "fp_bow")
    held = base.filter("heldout").select("fp_bow").distinct()
    s4 = s3.filter(~F.col("heldout")).join(held, "fp_bow", "left_anti")

    def stage(no, name, df):
        return df.agg(
            F.lit(no).cast("bigint").alias("stage_no"),
            F.lit(name).alias("stage"),
            F.count("*").alias("survivors"),
        )

    return (
        stage(0, "raw", base)
        .unionByName(stage(1, "quality", s1))
        .unionByName(stage(2, "exact_dedup", s2))
        .unionByName(stage(3, "bow_near_dedup", s3))
        .unionByName(stage(4, "decontaminated", s4))
        .orderBy("stage_no")
    )
