"""Document chunking for LLM training pipelines: split long documents into
fixed-size overlapping windows.

Every pretraining/RAG pipeline needs this step between raw documents and the
tokenizer: emit ``ceil`` chunks of ``chunk_size`` characters starting every
``stride`` characters (overlap = chunk_size - stride) so no boundary context
is lost.  The operator is pure built-in column functions — ``sequence`` to
enumerate chunk starts, ``posexplode`` to fan out, ``substring`` to slice —
a map-only plan with zero shuffles that scales linearly with corpus bytes
(the one-to-many fan-out happens inside the scan stage, exactly like the
multimodal frame-sampler).

Reference scope note: the reference models operator complexity classes only
(`/root/reference/src/templates/estimation.html:199-246`); chunking is part
of the LLM-pipeline extension surface (SURVEY.md §2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans._helpers import t
from ..plans.registry import query

CHUNK_SIZE = 200
STRIDE = 160  # 40-char overlap between consecutive chunks


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    chunk_size: int = CHUNK_SIZE,
    stride: int = STRIDE,
) -> DataFrame:
    """One row per (doc, chunk): chunk index, start offset (0-based), the
    chunk's actual length, and an md5 fingerprint of the chunk text (the
    fingerprint keeps downstream exact-dedup joins narrow — the text itself
    never needs to ride a shuffle)."""
    if chunk_size < 1 or stride < 1 or stride > chunk_size:
        raise ValueError("need 1 <= stride <= chunk_size")
    n_chunks = (F.floor((F.length(text_col) - 1) / stride) + 1).cast("int")
    starts = F.sequence(F.lit(0), (n_chunks - 1) * stride, F.lit(stride))
    chunk = F.substring(
        F.col(text_col), F.col("chunk_start") + 1, F.lit(chunk_size)
    )
    return (
        df.select("doc_id", text_col, F.posexplode(starts).alias("chunk_idx", "chunk_start"))
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.col("chunk_start").cast("long").alias("chunk_start"),
            F.length(chunk).cast("long").alias("chunk_len"),
            F.md5(chunk).alias("chunk_md5"),
        )
    )


@query(
    "q_doc_chunks",
    oracle=f"""
        SELECT doc_id,
               CAST(i AS BIGINT) AS chunk_idx,
               CAST(i * {STRIDE} AS BIGINT) AS chunk_start,
               CAST(length(substr(text, i * {STRIDE} + 1, {CHUNK_SIZE})) AS BIGINT)
                   AS chunk_len,
               md5(substr(text, i * {STRIDE} + 1, {CHUNK_SIZE})) AS chunk_md5
        FROM documents,
             UNNEST(range(0, CAST(floor((length(text) - 1) / {STRIDE}) AS BIGINT) + 1))
                 AS u(i)
        ORDER BY doc_id, chunk_idx
    """,
    tags=("llm", "chunking", "fanout"),
)
def q_doc_chunks(spark, sf_dir):
    """Overlapping 200/160 character chunking of every document: chunk
    index, offset, length, and md5 fingerprint per chunk — map-only
    fan-out, no shuffle (the ORDER BY is presentation-only)."""
    d = t(spark, sf_dir, "documents")
    return chunk_documents(d).orderBy("doc_id", "chunk_idx")
