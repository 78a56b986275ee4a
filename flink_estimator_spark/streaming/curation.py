"""Streaming embedding curation: the SemDeDup ingest screen.

The streaming dual of batch ``q_semdedup_prune`` (operators/similarity.py):
every arriving embedding is assigned to its nearest corpus centroid and
checked for a semantic near-duplicate among the STANDING corpus members of
that one cluster — the cluster bound is what keeps the per-row work
O(|cluster|), never O(corpus), exactly as in the batch operator.

Streaming constraints shape the implementation:

* the argmin over centroids cannot be a row_number window (unsupported on
  streams), so it runs COLUMN-SIDE: the k centroids are collected once at
  plan-build time (k x dim doubles — scalar setup data, same discipline as
  the bloom filter literal in streaming/dedup.py) and the per-row distance
  is a zip_with/aggregate fold into the SAME floor-quantized BIGINT terms
  the batch window argmin sums — integer addition is order-independent, so
  both forms pick the identical cluster (tie-break: lowest cluster id,
  encoded in the (d2, cid) struct min);
* the near-dup check is a stream-static LEFT SEMI join on the cluster key
  with the cosine threshold in the join condition — no streaming
  aggregation, no watermark state; append-mode safe.  The anti join
  complement marks genuinely-new rows, and the union reassembles the
  annotated stream.

Works identically on a batch DataFrame, so the batch run is the streaming
test's oracle (tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.similarity import cosine_pre, label_centroids, norm


def _quantized_d2(vec: Column, centroid: list[float]) -> Column:
    """Σ floor((v_i - c_i)² · 1e12) as BIGINT — the batch quantizer's exact
    per-position terms, summed by a left-to-right fold (integer addition:
    order-independent, engine-exact)."""
    terms = F.zip_with(
        vec,
        F.lit([float(c) for c in centroid]),
        lambda x, c: F.floor(
            (x.cast("double") - c) * (x.cast("double") - c) * F.lit(1e12)
        ).cast("long"),
    )
    return F.aggregate(terms, F.lit(0).cast("long"), lambda acc, x: acc + x)


def screen_embeddings_against_corpus(
    vecs: DataFrame,
    corpus: DataFrame,
    tau: float = 0.40,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Annotate an arriving embedding stream with ``is_semantic_dup``:
    TRUE iff some standing-corpus member of the row's assigned cluster has
    cosine >= tau.  Returns (id, cluster, is_semantic_dup)."""
    cent_rows = sorted(
        ((r["clabel"], r["pos"], r["c"]) for r in label_centroids(corpus).collect())
    )
    # Codebook keys are the labels ACTUALLY PRESENT in the corpus, not
    # range(max_label+1): a gap in label ids must not yield a phantom
    # all-zero centroid that could win the argmin — the batch
    # _quantized_label_assign only ranks present labels (ADVICE r4).
    labels = sorted({cid for cid, _, _ in cent_rows})
    dim = max(pos for _, pos, _ in cent_rows) + 1
    codebook: dict[int, list[float]] = {cid: [0.0] * dim for cid in labels}
    for cid, pos, c in cent_rows:
        codebook[cid][pos] = c

    def assign(df: DataFrame) -> DataFrame:
        # struct array min == (min d2, then min cid): the batch tie-break
        choices = F.array(
            *[
                F.struct(
                    _quantized_d2(F.col(vec_col), codebook[cid]).alias("d2"),
                    F.lit(cid).alias("cid"),
                )
                for cid in labels
            ]
        )
        return df.withColumn("cluster", F.array_min(choices)["cid"])

    members = assign(corpus).select(
        F.col(id_col).alias("m_id"),
        F.col("cluster").alias("m_cluster"),
        F.col(vec_col).alias("m_vec"),
        norm(F.col(vec_col)).alias("m_nrm"),
    )
    arriving = assign(vecs).select(
        id_col, "cluster", vec_col, norm(F.col(vec_col)).alias("a_nrm")
    )
    cond = (
        (F.col("cluster") == F.col("m_cluster"))
        & (F.col(id_col) != F.col("m_id"))
        & (
            cosine_pre(
                F.col(vec_col), F.col("m_vec"), F.col("a_nrm"), F.col("m_nrm")
            )
            >= tau
        )
    )
    dups = arriving.join(members, cond, "left_semi").select(
        id_col, "cluster", F.lit(True).alias("is_semantic_dup")
    )
    fresh = arriving.join(members, cond, "left_anti").select(
        id_col, "cluster", F.lit(False).alias("is_semantic_dup")
    )
    return dups.unionByName(fresh)
