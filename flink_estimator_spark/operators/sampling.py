"""Deterministic corpus sampling + benchmark-decontamination screens.

Training-data pipelines need reproducible sampling (the same 10% subset on
every run, on every cluster size) and contamination checks (does the corpus
contain benchmark strings?).  Both are pure column expressions here — a
hash-bucket filter and a conditional aggregate — so they scale to 100 TB as
a single scan with a tiny (num-sources / num-phrases sized) aggregate, no
Python, no join, no extra shuffle beyond the final group-by.

Reference scope note: the reference models only workload taxonomy
(`/root/reference/src/templates/estimation.html:199-246`); sampling and
decontamination are part of the LLM-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..plans._helpers import spread, t
from ..plans.registry import query


def hash_bucket(col: str | Column, buckets: int = 16) -> Column:
    """Deterministic bucket in [0, buckets) from the md5 of the key.

    md5 (not ``hash()``) because the bucket must be stable across engines,
    Spark versions, and partitionings — the property that makes a sample
    reproducible and lets a held-out split stay held out forever.  Uses the
    first 8 hex chars (32 bits) via conv(); buckets must divide evenly for
    an exactly uniform split (any power of two up to 2^32 works).
    """
    c = F.col(col) if isinstance(col, str) else col
    word = F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long")
    return (word % F.lit(buckets)).cast("int")


def sample_flag(col: str | Column, keep: int = 2, buckets: int = 16) -> Column:
    """True for rows in the first `keep` of `buckets` hash buckets."""
    return hash_bucket(col, buckets) < F.lit(keep)


def deterministic_sample(df: DataFrame, key: str, keep: int = 2,
                         buckets: int = 16) -> DataFrame:
    """Filter to a reproducible keep/buckets fraction keyed on `key`."""
    return df.filter(sample_flag(key, keep, buckets))


@query(
    "q_hash_sample",
    oracle="""
        WITH flagged AS (
            SELECT source,
                   CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                             AS BIGINT) % 16 < 2
                        THEN 1 ELSE 0 END AS sampled,
                   doc_id
            FROM documents
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(sampled) AS BIGINT) AS n_sampled,
               CAST(sum(sampled) AS DOUBLE) / count(*) AS sample_rate,
               CAST(min(CASE WHEN sampled = 1 THEN doc_id END) AS BIGINT)
                   AS first_sampled_id
        FROM flagged
        GROUP BY source
        ORDER BY source
    """,
    tags=("llm", "sampling"),
)
def q_hash_sample(spark, sf_dir):
    """Reproducible ~12.5% (2/16 md5-bucket) sample of the document corpus,
    audited per source: totals, sampled counts, realized rate, and the first
    sampled id (value-verifies the membership itself, not just the counts)."""
    d = t(spark, sf_dir, "documents")
    flag = sample_flag("doc_id").cast("int")
    return (
        d.select("source", flag.alias("sampled"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("sampled").alias("n_sampled"),
            (F.sum("sampled").cast("double") / F.count("*")).alias("sample_rate"),
            F.min(F.when(F.col("sampled") == 1, F.col("doc_id"))).alias(
                "first_sampled_id"
            ),
        )
        .orderBy("source")
    )


# Benchmark strings to screen for (stand-ins for eval-set n-grams; on a real
# pipeline this list is the concatenation of every benchmark's test split).
_SCREEN_PHRASES = (
    "key agg row scan",
    "window merge spark",
    "held out benchmark string",  # absent on purpose: the zero row is the point
)


@query(
    "q_contamination_screen",
    oracle="""
        SELECT 'key agg row scan' AS phrase,
               CAST(sum(CASE WHEN contains(text, 'key agg row scan')
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_hit
        FROM documents
        UNION ALL
        SELECT 'window merge spark',
               CAST(sum(CASE WHEN contains(text, 'window merge spark')
                        THEN 1 ELSE 0 END) AS BIGINT)
        FROM documents
        UNION ALL
        SELECT 'held out benchmark string',
               CAST(sum(CASE WHEN contains(text, 'held out benchmark string')
                        THEN 1 ELSE 0 END) AS BIGINT)
        FROM documents
        ORDER BY phrase
    """,
    tags=("llm", "decontamination"),
)
def q_contamination_screen(spark, sf_dir):
    """Benchmark-decontamination screen: how many documents contain each
    benchmark phrase.  The phrase list compiles to one conditional-aggregate
    scan (phrases are broadcast literals inside the plan) and unpivots to one
    row per phrase — at 100 TB this is exactly one pass over the corpus
    regardless of phrase count."""
    d = t(spark, sf_dir, "documents")
    hits = d.agg(
        *[
            F.sum((F.instr(F.col("text"), F.lit(p)) > 0).cast("long")).alias(f"h{i}")
            for i, p in enumerate(_SCREEN_PHRASES)
        ]
    )
    stack_args = ", ".join(
        f"'{p}', h{i}" for i, p in enumerate(_SCREEN_PHRASES)
    )
    return (
        hits.select(
            F.expr(
                f"stack({len(_SCREEN_PHRASES)}, {stack_args}) AS (phrase, n_docs_hit)"
            )
        )
        .orderBy("phrase")
    )


@query(
    "q_reservoir_per_group",
    oracle="""
        SELECT event_type, rn, event_id, user_id
        FROM (
            SELECT event_type, event_id, user_id,
                   row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
            FROM events
        )
        WHERE rn <= 5
        ORDER BY event_type, rn
    """,
    tags=("llm", "sampling", "reservoir"),
)
def q_reservoir_per_group(spark, sf_dir):
    """Deterministic k-per-group reservoir: rank rows inside each group by
    the md5 of their unique id and keep the first k — the distributed,
    re-runnable equivalent of reservoir sampling (a uniform hash order is a
    uniform random order, but stable across runs and engines).  One shuffle
    on the group key; at scale the rank prunes with a per-partition top-k
    before the shuffle (Spark's WindowGroupLimit pushdown)."""
    ev = t(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    rn = F.row_number().over(
        W.partitionBy("event_type").orderBy(
            F.md5(F.col("event_id").cast("string")), "event_id"
        )
    ).cast("long")
    return (
        ev.select("event_type", "event_id", "user_id")
        .withColumn("rn", rn)
        .filter(F.col("rn") <= 5)
        .select("event_type", "rn", "event_id", "user_id")
        .orderBy("event_type", "rn")
    )


def ares_key(id_col: str | Column, weight_col: str | Column) -> Column:
    """A-Res weighted-reservoir rank key: ln(u)/w for a deterministic
    uniform u derived from the row id (Efraimidis-Spirakis: keeping the
    top-k rows by u^(1/w) — equivalently ln(u)/w, same ordering — draws a
    weighted sample without replacement).  The md5-based u makes the
    sample reproducible across engines, cluster sizes, and partitionings,
    like every other sampler in this module."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    x = F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long")
    u = (x.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    return F.log(u) / w.cast("double")


@query(
    "q_weighted_sample",
    oracle="""
        SELECT source, rk, doc_id, n_chars FROM (
            SELECT source, doc_id, n_chars,
                   CAST(row_number() OVER (
                       PARTITION BY source
                       ORDER BY ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                                     AS BIGINT) + 0.5) / 4294967296.0)
                                / CAST(n_chars AS DOUBLE) DESC,
                                doc_id) AS BIGINT) AS rk
            FROM documents
        )
        WHERE rk <= 3
        ORDER BY source, rk
    """,
    tags=("llm", "sampling", "weighted", "reservoir"),
)
def q_weighted_sample(spark, sf_dir):
    """Length-weighted sample without replacement: per source, the 3
    documents drawn by A-Res with weight = n_chars (longer docs
    proportionally likelier).  One window shuffle on the group key — the
    distributed form of a weighted reservoir: each partition keeps its
    top-k by the key, merge keeps the global top-k (the window computes
    exactly that), so the same sample falls out on any cluster size."""
    from pyspark.sql import Window as W

    d = t(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(
        F.desc(ares_key("doc_id", "n_chars")), "doc_id"
    )
    return (
        d.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("source", "rk", "doc_id", "n_chars")
        .orderBy("source", "rk")
    )


@query(
    "q_train_split",
    oracle="""
        WITH assigned AS (
            SELECT doc_id,
                   CASE WHEN b < 18 THEN 'train'
                        WHEN b = 18 THEN 'val'
                        ELSE 'test' END AS split
            FROM (SELECT doc_id,
                         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                              AS BIGINT) % 20 AS b
                  FROM documents)),
        s AS (
            SELECT split,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(doc_id) AS BIGINT) AS id_sum,
                   CAST(min(doc_id) AS BIGINT) AS min_id,
                   CAST(max(doc_id) AS BIGINT) AS max_id
            FROM assigned GROUP BY split)
        SELECT split, n_docs,
               CAST(n_docs AS DOUBLE) / sum(n_docs) OVER () AS frac,
               id_sum, min_id, max_id
        FROM s ORDER BY split
    """,
    tags=("llm", "sampling", "split"),
)
def q_train_split(spark, sf_dir):
    """Deterministic 90/5/5 train/val/test split (md5 bucket 0-19 on doc_id:
    <18 train, 18 val, 19 test) with a membership certificate per split:
    counts, realized fraction, id-sum checksum and id range.  Disjoint and
    exhaustive by construction (CASE over one bucket value); the checksum
    verifies the *membership* is the one the oracle derives, not just the
    sizes — the property that keeps a held-out split held out across
    engines, Spark versions, and repartitionings.  One scan + 3-group
    aggregate; the fraction's total comes from a partition-only window
    over the 3 aggregate rows (no sort, no extra pass)."""
    d = t(spark, sf_dir, "documents")
    b = hash_bucket("doc_id", 20)
    split = (
        F.when(b < 18, "train").when(b == 18, "val").otherwise("test")
    )
    s = (
        d.select(split.alias("split"), "doc_id")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("doc_id").alias("id_sum"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
    )
    from pyspark.sql import Window as W

    total = F.sum("n_docs").over(W.partitionBy())
    return s.select(
        "split",
        "n_docs",
        (F.col("n_docs").cast("double") / total).alias("frac"),
        "id_sum",
        "min_id",
        "max_id",
    ).orderBy("split")


# ---------------------------------------------------------------------------
# Deterministic Poisson bootstrap (Chamandy et al., "Estimating Uncertainty
# for Massive Data Streams", Google 2012) — the distributed bootstrap: each
# (row, replicate) pair draws an independent Poisson(1) resample count, so a
# replicate's weighted aggregate approximates a with-replacement resample
# without ever materializing one, and the whole R-replicate ensemble is ONE
# grouped aggregate over an R-way row explode.
# ---------------------------------------------------------------------------

_BOOT_R = 200          # replicates (2.5%/97.5% picks at ranks 5 / 196)
# truncated-Poisson(1) CDF thresholds scaled to the md5 48-bit word:
# P(0)=e^-1, P(k)=P(k-1)/k; mass beyond 5 (6e-4) collapses into w=6
_BOOT_T = (
    103548857136060, 207097714272121, 258872142840152,
    276130285696162, 280444821410164, 281307728552965,
)


def _boot_w_sql(u: str) -> str:
    """CASE text mapping a 48-bit uniform to its Poisson(1) draw — shared
    verbatim by the Spark builder (via F.expr) and the DuckDB oracle, so
    both engines draw identical weights from identical md5 words."""
    branches = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_BOOT_T)
    )
    return f"CASE {branches} ELSE 6 END"


@query(
    "q_bootstrap_ci",
    oracle=f"""
        WITH base AS (
            SELECT event_id,
                   CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
            FROM events WHERE event_type = 'purchase'
        ),
        draws AS (
            SELECT r, cents,
                   {_boot_w_sql("CAST(('0x' || substr(md5(event_id || '_' || r), 1, 12)) AS BIGINT)")} AS w
            FROM base
            CROSS JOIN (SELECT unnest(range(0, {_BOOT_R})) AS r)
        ),
        reps AS (
            SELECT r,
                   CAST(sum(w * cents) * 10000 // sum(w) AS BIGINT) AS mean_e4
            FROM draws GROUP BY r HAVING sum(w) > 0
        ),
        ranked AS (
            SELECT mean_e4,
                   row_number() OVER (ORDER BY mean_e4, r) AS rk
            FROM reps
        ),
        point AS (
            SELECT CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(cents) * 10000 // count(*) AS BIGINT) AS point_e4
            FROM base
        )
        SELECT point.n_rows,
               CAST({_BOOT_R} AS BIGINT) AS n_replicates,
               point.point_e4 AS point_e4,
               CAST(max(CASE WHEN rk = 5 THEN mean_e4 END) AS BIGINT) AS lo_e4,
               CAST(max(CASE WHEN rk = 196 THEN mean_e4 END) AS BIGINT) AS hi_e4
        FROM ranked CROSS JOIN point
        GROUP BY point.n_rows, point.point_e4
    """,
    tags=("complex", "statistics", "bootstrap", "confidence-interval"),
)
def q_bootstrap_ci(spark, sf_dir):
    """95% bootstrap confidence interval for the mean purchase value via
    the DETERMINISTIC Poisson bootstrap — the uncertainty quantification a
    metrics pipeline attaches to every reported aggregate, in the only
    form that distributes: each (row, replicate) pair draws Poisson(1)
    resample weight from its own md5 word (truncated at 6; the 6e-4 tail
    mass collapses into the last branch), so replicate means are weighted
    aggregates of ONE R-way explode — no resample materialization, no
    driver loop, and bit-reproducible across engines, partitionings, and
    runs (the md5-seeded determinism that makes a CI value-gateable at
    all).

    Scale shape: the explode is map-local (R x rows, combiner-reduced into
    R partial sums per task before the shuffle); the replicate table is R
    rows forever, so the rank window is literal-bounded (q_ntile_rank's
    exemption class).  Exactness: cents are exact DECIMAL-derived BIGINTs,
    replicate means are one truncating integral division at 1e-4 cent
    resolution, and the CI picks are order statistics (ranks 5/196 of
    200), not interpolated quantiles.  BIGINT headroom: sum(w*cents)*1e4
    stays exact below ~9e14 total weighted cents (~1e10 purchase rows at
    fixture prices); beyond that the sums move to DECIMAL(38,0) like the
    KS guard's documented variant."""
    # spread the purchase base BEFORE the R-way explode: the single-split
    # events scan otherwise runs all rows x R md5 draws in ONE task
    # (SCALE.md §4) — measured 5.3 -> 1.3 s warm at sf0.1
    base = spread(
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            (F.col("value").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("cents"),
        ),
        "event_id",
    )
    u = "CAST(conv(substring(md5(concat(event_id, '_', r)), 1, 12), 16, 10) AS BIGINT)"
    draws = base.select(
        "event_id",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_R - 1))).alias("r"),
    ).withColumn("w", F.expr(_boot_w_sql(u)))
    reps = (
        draws.groupBy("r")
        .agg(
            F.sum(F.col("w") * F.col("cents")).alias("swc"),
            F.sum("w").alias("sw"),
        )
        .filter(F.col("sw") > 0)
        .select("r", F.expr("swc * 10000 DIV sw").cast("bigint").alias("mean_e4"))
    )
    from pyspark.sql import Window as W

    ranked = reps.select(
        "mean_e4",
        F.row_number().over(W.orderBy("mean_e4", "r")).alias("rk"),
    )
    point = base.agg(
        F.count("*").alias("n_rows"),
        F.expr("sum(cents) * 10000 DIV count(*)").cast("bigint").alias("point_e4"),
    )
    return (
        ranked.crossJoin(F.broadcast(point))
        .groupBy("n_rows", "point_e4")
        .agg(
            F.lit(_BOOT_R).cast("bigint").alias("n_replicates"),
            F.max(F.when(F.col("rk") == 5, F.col("mean_e4")))
            .cast("bigint")
            .alias("lo_e4"),
            F.max(F.when(F.col("rk") == 196, F.col("mean_e4")))
            .cast("bigint")
            .alias("hi_e4"),
        )
        .select("n_rows", "n_replicates", "point_e4", "lo_e4", "hi_e4")
    )
