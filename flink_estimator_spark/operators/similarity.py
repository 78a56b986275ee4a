"""Similarity search over embedding columns (``array<float>``).

Baseline: brute-force cosine top-k — a broadcast of the query set against a
full scan of the candidates (linear in corpus size, the exact answer).
Scale path: random-hyperplane LSH bucketing — candidates are only compared
inside their bucket, turning O(Q x N) into O(Q x bucket).

All arithmetic uses built-in higher-order functions (``zip_with`` +
``aggregate``) — a strict left-to-right fold in DOUBLE, which both Spark and
the DuckDB oracle (list_dot_product over DOUBLE[]) evaluate identically, so
cosine values hash-match bit-for-bit.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..plans._helpers import spread, t
from ..plans.registry import query


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double (deterministic order).

    Deliberately the ``aggregate`` fold, not an unrolled 64-term expression:
    the unrolled form blows past codegen's expression-size limits and runs
    ~2.5x slower on all-pairs workloads (measured at sf0.1)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_pre(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """Cosine with precomputed norms.  ``sqrt(dot(a,a))`` is referentially
    transparent, so ``dot(a,b) / (na * nb)`` is bit-identical to
    ``cosine(a, b)`` — but an all-pairs comparison computes each norm once
    per *vector* instead of once per *pair*, turning three array folds per
    pair into one."""
    return dot(a, b) / (na * nb)


def cosine_topk(
    queries_df: DataFrame,
    candidates_df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors: broadcast queries x scan candidates ->
    per-query ranked window.  (query_id, neighbor_id, cos_sim, rk)."""
    q = queries_df.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("q_nrm"),
    )
    c = spread(candidates_df, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm(F.col(vec_col)).alias("c_nrm"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_pre(
                F.col("q_vec"), F.col("c_vec"), F.col("q_nrm"), F.col("c_nrm")
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )


def _projection_planes(dim: int, planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes for sign-LSH."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(planes)]


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id from random hyperplane projections."""
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(v) for v in plane])
        s = dot(vec, lit_plane)
        bucket = bucket + F.when(s > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def lsh_ann(
    df: DataFrame,
    k: int = 5,
    planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate nearest neighbors: compare only vectors sharing a sign-LSH
    bucket.  Deterministic given the seed (no oracle: approximation is
    engine-specific by construction)."""
    pl = _projection_planes(dim, planes, seed)
    bucketed = df.select(
        F.col(id_col),
        F.col(vec_col),
        norm(F.col(vec_col)).alias("nrm"),
        lsh_bucket(F.col(vec_col), pl).alias("bucket"),
    )
    a = bucketed.select(
        F.col("bucket"), F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"), F.col("nrm").alias("q_nrm"),
    )
    b = bucketed.select(
        F.col("bucket"), F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"), F.col("nrm").alias("c_nrm"),
    )
    scored = (
        a.join(b, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_pre(
                F.col("q_vec"), F.col("c_vec"), F.col("q_nrm"), F.col("c_nrm")
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )


def embedding_near_dups(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above a threshold (exact).

    Catalyst would push a filter on the aliased ``cos_sim`` back below the
    projection by substituting the full expression — evaluating the
    64-element dot fold twice per pair (and, worse, inside the
    nested-loop-join condition, which is interpreted).  The
    ``monotonically_increasing_id`` barrier column makes the projection
    non-pushable, so the fold runs exactly once per pair in the project and
    the threshold tests the already-computed attribute.  The filter must
    *reference* the barrier (always-false disjunct: ids are never negative)
    — otherwise column pruning deletes it and pushdown returns."""
    a = spread(df, id_col).select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
        norm(F.col(vec_col)).alias("na"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
        norm(F.col(vec_col)).alias("nb"),
    )
    scored = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            cosine_pre(F.col("va"), F.col("vb"), F.col("na"), F.col("nb")).alias("cos_sim"),
            F.monotonically_increasing_id().alias("_barrier"),
        )
    )
    return scored.filter(
        (F.col("cos_sim") >= threshold) | (F.col("_barrier") < 0)
    ).drop("_barrier")


# ---------------------------------------------------------------------------
# Registered queries
# ---------------------------------------------------------------------------

_COS_SQL = (
    "list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))"
    " / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))"
    "  * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))))"
)


@query(
    "q_emb_cosine_topk",
    oracle=f"""
        SELECT query_id, neighbor_id, cos_sim, rk FROM (
            SELECT b.vec_id AS query_id, a.vec_id AS neighbor_id,
                   {_COS_SQL} AS cos_sim,
                   row_number() OVER (PARTITION BY b.vec_id
                                      ORDER BY {_COS_SQL} DESC, a.vec_id) AS rk
            FROM embeddings a, embeddings b
            WHERE b.vec_id < 10 AND a.vec_id != b.vec_id
        )
        WHERE rk <= 5
        ORDER BY query_id, rk
    """,
    tags=("llm", "similarity", "ann"),
)
def q_emb_cosine_topk(spark, sf_dir):
    """Exact top-5 cosine neighbors for the first 10 vectors (brute force)."""
    emb = t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    return cosine_topk(q, emb, k=5).orderBy("query_id", "rk")


@query(
    "q_emb_label_knn",
    oracle=f"""
        SELECT label, count(*) AS n_hits FROM (
            SELECT b.vec_id, a.label,
                   row_number() OVER (PARTITION BY b.vec_id
                                      ORDER BY {_COS_SQL} DESC, a.vec_id) AS rk
            FROM embeddings a, embeddings b
            WHERE b.vec_id < 50 AND a.vec_id != b.vec_id
        )
        WHERE rk = 1
        GROUP BY label
        ORDER BY label
    """,
    tags=("llm", "similarity", "knn"),
)
def q_emb_label_knn(spark, sf_dir):
    """1-NN label distribution for the first 50 vectors (similarity join +
    argmax window)."""
    emb = t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 50)
    nn = cosine_topk(q, emb, k=1)
    labels = emb.select(F.col("vec_id").alias("neighbor_id"), "label")
    return (
        nn.join(labels, "neighbor_id")
        .groupBy("label")
        .agg(F.count("*").alias("n_hits"))
        .orderBy("label")
    )


@query(
    "q_emb_lsh_ann",
    oracle=None,  # approximate by construction -> rows-only check
    tags=("llm", "similarity", "lsh", "ann"),
)
def q_emb_lsh_ann(spark, sf_dir):
    """LSH-bucketed approximate top-5 neighbors (8 hyperplanes, seed 42)."""
    emb = t(spark, sf_dir, "embeddings")
    return lsh_ann(emb, k=5).orderBy("query_id", "rk")


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN
# ---------------------------------------------------------------------------


def ivf_centroids(df: DataFrame, n_centroids: int = 8,
                  id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Deterministic IVF centroids: partition vectors by ``id % n_centroids``
    and average element-wise (one k-means-style refinement of a deterministic
    seed assignment).

    The element-wise mean runs as posexplode -> groupBy(cid, pos) -> avg —
    linear in corpus size with a tiny (n_centroids x dim) key space, so it
    scales to any corpus; the result is always a broadcastable
    ``n_centroids``-row table.  The avg accumulates in DECIMAL so the result
    is independent of partial-aggregation order (run-to-run deterministic).
    """
    return (
        df.withColumn("cid", (F.col(id_col) % n_centroids).cast("int"))
        .select("cid", F.posexplode(vec_col).alias("pos", "v"))
        .groupBy("cid", "pos")
        .agg(F.avg(F.col("v").cast("decimal(27,10)")).cast("double").alias("v"))
        .groupBy("cid")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "v"))).alias("pv"))
        .select("cid", F.transform("pv", lambda s: s["v"]).alias("centroid"))
    )


def ivf_ann(
    df: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate nearest neighbors: every vector lives in the inverted
    list of its nearest centroid; a query only scans the ``nprobe`` lists
    whose centroids are closest to it.

    Cost: corpus x n_centroids (broadcast) for assignment, then
    queries x (nprobe/n_centroids) x corpus for scoring — the classic IVF
    recall/cost dial.  Both joins broadcast the tiny side; the big side never
    shuffles except for the final per-query top-k window.
    """
    cent = F.broadcast(
        ivf_centroids(df, n_centroids, id_col, vec_col).withColumn(
            "cent_nrm", norm(F.col("centroid"))
        )
    )

    def nearest(frame: DataFrame, out_id: str, keep_vec: str, keep_nrm: str,
                rk_max: int) -> DataFrame:
        w = W.partitionBy(out_id).orderBy(F.desc("c_sim"), "cid")
        return (
            frame.crossJoin(cent)
            .withColumn(
                "c_sim",
                cosine_pre(F.col(keep_vec), F.col("centroid"),
                           F.col(keep_nrm), F.col("cent_nrm")),
            )
            .withColumn("c_rk", F.row_number().over(w))
            .filter(F.col("c_rk") <= rk_max)
            .select(out_id, keep_vec, keep_nrm, "cid")
        )

    inv = nearest(
        spread(df, id_col).select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"),
                  norm(F.col(vec_col)).alias("c_nrm")),
        "neighbor_id", "c_vec", "c_nrm", 1,
    )
    probes = nearest(
        spread(df, id_col).select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"),
                  norm(F.col(vec_col)).alias("q_nrm")),
        "query_id", "q_vec", "q_nrm", nprobe,
    )
    # join probes->lists on cid: only n_centroids distinct keys, so a shuffle
    # join would bottleneck on n_centroids tasks.  Broadcasting the inverted
    # lists keeps the probe side's query_id partitioning (full parallelism);
    # at corpora beyond broadcast size, salt the cid key instead
    # (operators/skew.py::salted_broadcast_join).
    scored = (
        probes.join(F.broadcast(inv), "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_pre(
                F.col("q_vec"), F.col("c_vec"), F.col("q_nrm"), F.col("c_nrm")
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )


@query(
    "q_emb_ivf_ann",
    oracle=None,  # approximate by construction -> rows-only check
    tags=("llm", "similarity", "ivf", "ann"),
)
def q_emb_ivf_ann(spark, sf_dir):
    """IVF approximate top-5 neighbors (8 inverted lists, nprobe=2)."""
    emb = t(spark, sf_dir, "embeddings")
    return ivf_ann(emb, k=5).orderBy("query_id", "rk")


@query(
    "q_dedup_embedding",
    oracle=f"""
        SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_COS_SQL} AS cos_sim
        FROM embeddings a, embeddings b
        WHERE a.vec_id < b.vec_id AND {_COS_SQL} >= 0.40
        ORDER BY id_a, id_b
    """,
    tags=("llm", "dedup", "embedding"),
)
def q_dedup_embedding(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (exact, threshold 0.40).

    The exact all-pairs baseline; at corpus scale the same threshold filter
    runs over LSH/IVF candidate pairs instead (``lsh_ann`` / ``ivf_ann``
    buckets), turning O(n^2) into O(sum(bucket^2))."""
    emb = t(spark, sf_dir, "embeddings")
    return embedding_near_dups(emb, threshold=0.40).orderBy("id_a", "id_b")
