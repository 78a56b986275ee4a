"""Count-min sketch: mergeable frequency estimation + heavy hitters.

Completes the mergeable-sketch family (q_hll_rollup: distinct counts,
q_kll_rollup: quantiles) with the frequency dual.  A CMS is a d x w grid of
counters; each key increments one counter per row (bucket = hash_i(key) % w)
and a point query reads the MIN across rows — never an underestimate, and
over-estimates are bounded by collisions (~ e/w * N with probability
1 - e^-d).  Counters are plain sums, so per-shard sketches merge by cell-wise
addition: the 100 TB shape is per-partition/per-day partial grids (d*w cells
each, here 4x512) rolled up without ever re-scanning raw events.

Unlike Spark's built-in ``count_min_sketch`` (an opaque binary with no SQL
point-query), this CMS is built from md5 arithmetic that any engine
reproduces bit-for-bit — the DuckDB oracle constructs the identical grid, so
the estimates themselves (not just bounds) are value-gateable.

Reference scope note: the reference models workload taxonomy only
(`/root/reference/src/templates/estimation.html:199-246`); sketches are part
of the approximate-analytics extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..plans._helpers import t
from ..plans.registry import query

CMS_DEPTH = 4
CMS_WIDTH = 512
_TOP_N = 15


def cms_bucket(key: Column, row_i: Column, width: int = CMS_WIDTH) -> Column:
    """Engine-portable CMS bucket for depth row ``row_i``: the i-th 32-bit
    word of ONE md5(key) digest, mod w.

    md5 (not xxhash64/hash) so the grid is identical across engines and
    partitionings — the property that makes the sketch itself, not just its
    error bound, assertable cross-engine.  One digest serves all four depth
    rows (32 hex chars = 4 disjoint 8-hex words) — measured 2.07 s -> this
    form at sf0.1, the per-row concat+md5 was the grid build's hot term.
    Disjoint digest words are independent for CMS purposes (collision in
    one word says nothing about another), which is all the min-over-rows
    bound needs.
    """
    word = F.conv(
        F.substring(F.md5(key.cast("string")), row_i * 8 + 1, 8), 16, 10
    ).cast("long")
    return word % F.lit(width)


def cms_cells(
    df: DataFrame, key: str, shard: str | None = None, width: int = CMS_WIDTH
) -> DataFrame:
    """Build CMS counter cells: one (row_i, bucket) count per key occurrence.

    With ``shard`` set, returns per-shard partial grids (the mergeable
    state); cell-wise SUM over shards reproduces the global grid exactly.
    """
    rows = F.explode(F.array(*[F.lit(i) for i in range(CMS_DEPTH)])).alias("row_i")
    exp = df.select(F.col(key), *( [F.col(shard)] if shard else [] ), rows)
    exp = exp.withColumn("bucket", cms_bucket(F.col(key), F.col("row_i"), width))
    grp = ([shard] if shard else []) + ["row_i", "bucket"]
    return exp.groupBy(*grp).agg(F.count("*").alias("c"))


def _oracle() -> str:
    d, w, k = CMS_DEPTH, CMS_WIDTH, _TOP_N
    rows = ",".join(str(i) for i in range(d))
    return f"""
        WITH cells AS (
            SELECT d.i AS row_i,
                   CAST(('0x' || substr(md5(CAST(e.user_id AS VARCHAR)),
                                        d.i * 8 + 1, 8))
                        AS BIGINT) % {w} AS bucket,
                   count(*) AS c
            FROM events e, (SELECT unnest([{rows}]) AS i) d
            GROUP BY row_i, bucket),
        keys AS (
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_exact
            FROM events GROUP BY user_id),
        top AS (
            SELECT user_id, n_exact FROM keys
            ORDER BY n_exact DESC, user_id LIMIT {k}),
        probes AS (
            SELECT t.user_id, t.n_exact, d.i AS row_i,
                   CAST(('0x' || substr(md5(CAST(t.user_id AS VARCHAR)),
                                        d.i * 8 + 1, 8))
                        AS BIGINT) % {w} AS bucket
            FROM top t, (SELECT unnest([{rows}]) AS i) d),
        est AS (
            SELECT p.user_id, p.n_exact, CAST(min(c.c) AS BIGINT) AS est
            FROM probes p JOIN cells c
              ON c.row_i = p.row_i AND c.bucket = p.bucket
            GROUP BY p.user_id, p.n_exact),
        total AS (SELECT count(*) AS n_total FROM events)
        SELECT user_id, n_exact, est,
               est >= n_exact AS never_under,
               (est - n_exact) <= CAST(ceil(4.0 * n_total / {w}) AS BIGINT)
                   AS bound_ok
        FROM est, total
        ORDER BY n_exact DESC, user_id
    """


@query(
    "q_cms_heavy_hitters",
    oracle=_oracle(),
    tags=("complex", "approx", "sketch", "mergeable", "frequency"),
)
def q_cms_heavy_hitters(spark, sf_dir):
    """Heavy hitters via a merged count-min sketch: the grid is built as
    per-event-type PARTIAL grids first, then cell-wise summed into the
    global sketch (the merge the oracle's direct construction must equal —
    associativity is the thing being verified).  The exact top-15 users are
    then point-queried against the sketch; every row certifies the two CMS
    guarantees: est >= exact always, and overshoot within the collision
    bound 4N/w (deterministic here — both engines build the identical md5
    grid, so est itself hash-matches, not just the booleans).  Scale shape:
    the raw-data pass is one map-side-combinable groupBy of d*w cells per
    shard; everything downstream (2048-cell grid, 15 probes) is broadcast-
    sized."""
    ev = t(spark, sf_dir, "events")
    # mergeable partials per shard -> cell-wise summed global grid
    partial = cms_cells(ev, "user_id", shard="event_type")
    cells = partial.groupBy("row_i", "bucket").agg(F.sum("c").alias("c"))

    keys = ev.groupBy("user_id").agg(F.count("*").alias("n_exact"))
    top = keys.orderBy(F.desc("n_exact"), F.asc("user_id")).limit(_TOP_N)
    probes = top.select(
        "user_id",
        "n_exact",
        F.explode(F.array(*[F.lit(i) for i in range(CMS_DEPTH)])).alias("row_i"),
    ).withColumn("bucket", cms_bucket(F.col("user_id"), F.col("row_i")))
    est = (
        probes.join(F.broadcast(cells), ["row_i", "bucket"])
        .groupBy("user_id", "n_exact")
        .agg(F.min("c").alias("est"))
    )
    total = ev.agg(F.count("*").alias("n_total"))
    margin = F.ceil(F.lit(4.0) * F.col("n_total") / F.lit(CMS_WIDTH)).cast("bigint")
    return (
        est.crossJoin(F.broadcast(total))
        .select(
            "user_id",
            "n_exact",
            "est",
            (F.col("est") >= F.col("n_exact")).alias("never_under"),
            ((F.col("est") - F.col("n_exact")) <= margin).alias("bound_ok"),
        )
        .orderBy(F.desc("n_exact"), F.asc("user_id"))
    )
