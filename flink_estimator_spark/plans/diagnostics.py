"""Profiling + edge-semantics relational operators.

The operators a production engine needs beyond the headline query shapes:
null-aware NOT IN (the anti-join variant with three-valued logic), CDC-style
snapshot diffing, one-pass table profiling (the ANALYZE/data-quality
primitive), deterministic mode, inverse-order window navigation
(first/last/nth), and an exact rolling median — each expressed so the same
value comes out of any engine at any partitioning.

Reference scope note: the reference models workload taxonomy only
(`/root/reference/src/templates/estimation.html:199-246`); these are part of
the engine-completeness surface a user migrating real SQL workloads needs.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ._helpers import dec, t
from .registry import query


@query(
    "q_null_aware_anti",
    oracle="""
        SELECT c_custkey, c_acctbal
        FROM customer
        WHERE (CASE WHEN c_acctbal < 0 THEN NULL ELSE c_nationkey END)
              NOT IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 3)
        ORDER BY c_custkey
    """,
    tags=("medium", "join", "null-semantics"),
)
def q_null_aware_anti(spark, sf_dir):
    """Null-aware anti join — SQL NOT IN under three-valued logic.  A NULL
    probe key can never satisfy NOT IN against a non-empty subquery (the
    comparison is UNKNOWN), so negative-balance customers (whose key is
    NULLed by the CASE) drop out even though no nation matches them.  This
    is a *different operator* from q_anti_join's NOT EXISTS: a plain
    left-anti join would wrongly keep the NULL rows.  Spark plans the
    single-key form as a null-aware BroadcastHashJoin build over the (tiny,
    broadcast) subquery side — same scan+broadcast shape as any dimension
    semi join, no extra shuffle."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("naa_customer")
    t(spark, sf_dir, "nation").createOrReplaceTempView("naa_nation")
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal
        FROM naa_customer
        WHERE (CASE WHEN c_acctbal < 0 THEN NULL ELSE c_nationkey END)
              NOT IN (SELECT n_nationkey FROM naa_nation WHERE n_regionkey = 3)
        ORDER BY c_custkey
        """
    )


_SNAP_A = ("1997-01-01", "1998-01-01")
_SNAP_B = ("1998-01-01", "1999-01-01")


@query(
    "q_snapshot_diff",
    oracle=f"""
        WITH a AS (
            SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_a,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_a
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '{_SNAP_A[0]}'
              AND o_orderdate < TIMESTAMP '{_SNAP_A[1]}'
            GROUP BY o_custkey),
        b AS (
            SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_b,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_b
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '{_SNAP_B[0]}'
              AND o_orderdate < TIMESTAMP '{_SNAP_B[1]}'
            GROUP BY o_custkey),
        j AS (
            SELECT coalesce(a.o_custkey, b.o_custkey) AS o_custkey,
                   n_a, total_a, n_b, total_b,
                   CASE WHEN a.o_custkey IS NULL THEN 'added'
                        WHEN b.o_custkey IS NULL THEN 'removed'
                        WHEN n_a <> n_b OR total_a <> total_b THEN 'changed'
                        ELSE 'unchanged' END AS change
            FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey)
        SELECT o_custkey, change, n_a, total_a, n_b, total_b
        FROM j WHERE change <> 'unchanged'
        ORDER BY change, o_custkey
    """,
    tags=("medium", "join", "cdc"),
)
def q_snapshot_diff(spark, sf_dir):
    """CDC-style snapshot compare: per-customer order activity in 1997 vs
    1998, classified added / removed / changed (unchanged rows suppressed) —
    the keyed diff that drives incremental syncs and reconciliation jobs.
    One aggregate per snapshot (shared scan, partial-combined) and one
    full-outer shuffle join on the customer key; totals are DECIMAL-exact
    before the DOUBLE cast so 'changed' is partitioning-independent."""
    o = t(spark, sf_dir, "orders")

    def snap(lo: str, hi: str, n_name: str, t_name: str):
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(lo).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(hi).cast("timestamp"))
            )
            .groupBy("o_custkey")
            .agg(
                F.count("*").alias(n_name),
                F.sum(dec("o_totalprice")).cast("double").alias(t_name),
            )
        )

    a = snap(*_SNAP_A, "n_a", "total_a").withColumnRenamed("o_custkey", "ck_a")
    b = snap(*_SNAP_B, "n_b", "total_b").withColumnRenamed("o_custkey", "ck_b")
    j = a.join(b, a.ck_a == b.ck_b, "full_outer")
    change = (
        F.when(F.col("ck_a").isNull(), "added")
        .when(F.col("ck_b").isNull(), "removed")
        .when(
            (F.col("n_a") != F.col("n_b")) | (F.col("total_a") != F.col("total_b")),
            "changed",
        )
        .otherwise("unchanged")
    )
    return (
        j.select(
            F.coalesce("ck_a", "ck_b").alias("o_custkey"),
            change.alias("change"),
            "n_a",
            "total_a",
            "n_b",
            "total_b",
        )
        .filter(F.col("change") != "unchanged")
        .orderBy("change", "o_custkey")
    )


_PROFILE_NUM = ("l_quantity", "l_extendedprice", "l_discount")
_PROFILE_STR = ("l_returnflag", "l_linestatus")


def _profile_oracle() -> str:
    parts = []
    for c in _PROFILE_NUM:
        parts.append(f"""
            SELECT '{c}' AS col_name,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(count(*) - count({c}) AS BIGINT) AS n_null,
                   CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
                   CAST(min({c}) AS DOUBLE) AS min_d,
                   CAST(max({c}) AS DOUBLE) AS max_d,
                   CAST(NULL AS VARCHAR) AS min_s,
                   CAST(NULL AS VARCHAR) AS max_s
            FROM lineitem""")
    for c in _PROFILE_STR:
        parts.append(f"""
            SELECT '{c}' AS col_name,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(count(*) - count({c}) AS BIGINT) AS n_null,
                   CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
                   CAST(NULL AS DOUBLE) AS min_d,
                   CAST(NULL AS DOUBLE) AS max_d,
                   min({c}) AS min_s,
                   max({c}) AS max_s
            FROM lineitem""")
    return "SELECT * FROM (" + " UNION ALL ".join(parts) + ") ORDER BY col_name"


@query(
    "q_table_profile",
    oracle=_profile_oracle(),
    tags=("medium", "profiling", "data-quality"),
)
def q_table_profile(spark, sf_dir):
    """One-pass table profiling (the ANALYZE TABLE / data-quality primitive):
    per-column row count, null count, exact distinct count, and typed
    min/max, pivoted to one row per column.  Spark computes every statistic
    in a SINGLE aggregate over one scan (the multi-count-distinct expands
    map-side, still one shuffle of partial states), then explodes the 1-row
    result into the per-column layout — vs the oracle's five separate scans.
    At 100 TB the exact-ndv expand is the costly term; the documented scale
    relaxation is approx_count_distinct per column (same plan, no expand)."""
    li = t(spark, sf_dir, "lineitem")
    aggs = [F.count("*").alias("n_rows")]
    for c in _PROFILE_NUM + _PROFILE_STR:
        aggs += [
            F.count(F.col(c)).alias(f"cnt_{c}"),
            F.countDistinct(F.col(c)).alias(f"ndv_{c}"),
            F.min(F.col(c)).alias(f"min_{c}"),
            F.max(F.col(c)).alias(f"max_{c}"),
        ]
    row = li.agg(*aggs)
    null_s = F.lit(None).cast("string")
    null_d = F.lit(None).cast("double")
    structs = []
    for c in _PROFILE_NUM:
        structs.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("n_rows").alias("n_rows"),
                (F.col("n_rows") - F.col(f"cnt_{c}")).alias("n_null"),
                F.col(f"ndv_{c}").alias("n_distinct"),
                F.col(f"min_{c}").cast("double").alias("min_d"),
                F.col(f"max_{c}").cast("double").alias("max_d"),
                null_s.alias("min_s"),
                null_s.alias("max_s"),
            )
        )
    for c in _PROFILE_STR:
        structs.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("n_rows").alias("n_rows"),
                (F.col("n_rows") - F.col(f"cnt_{c}")).alias("n_null"),
                F.col(f"ndv_{c}").alias("n_distinct"),
                null_d.alias("min_d"),
                null_d.alias("max_d"),
                F.col(f"min_{c}").alias("min_s"),
                F.col(f"max_{c}").alias("max_s"),
            )
        )
    return (
        row.select(F.explode(F.array(*structs)).alias("p"))
        .select("p.*")
        .orderBy("col_name")
    )


@query(
    "q_mode_per_group",
    oracle="""
        WITH c AS (
            SELECT l_returnflag, l_quantity, count(*) AS n
            FROM lineitem GROUP BY l_returnflag, l_quantity),
        r AS (
            SELECT l_returnflag, l_quantity, n,
                   row_number() OVER (PARTITION BY l_returnflag
                                      ORDER BY n DESC, l_quantity ASC) AS rn
            FROM c)
        SELECT l_returnflag, l_quantity AS mode_qty, CAST(n AS BIGINT) AS n
        FROM r WHERE rn = 1
        ORDER BY l_returnflag
    """,
    tags=("medium", "aggregate", "mode"),
)
def q_mode_per_group(spark, sf_dir):
    """Deterministic per-group mode: the most frequent quantity per return
    flag, ties broken toward the smallest value.  The built-in mode() breaks
    ties by accumulation order (not reproducible across engines or
    partitionings), so the portable idiom is count-per-(group,value) then a
    row_number pick over (count DESC, value ASC) — two shuffles, the second
    over distinct (group,value) pairs only."""
    li = t(spark, sf_dir, "lineitem")
    c = li.groupBy("l_returnflag", "l_quantity").agg(F.count("*").alias("n"))
    w = W.partitionBy("l_returnflag").orderBy(F.desc("n"), F.asc("l_quantity"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("l_quantity").alias("mode_qty"),
            "n",
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_first_last_window",
    oracle="""
        WITH w AS (
            SELECT o_custkey,
                   row_number() OVER win AS rn,
                   CAST(count(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n_orders,
                   first_value(o_orderkey) OVER win AS first_ok,
                   nth_value(o_orderkey, 2) OVER winf AS second_ok,
                   last_value(o_orderkey) OVER winf AS last_ok
            FROM orders
            WINDOW win AS (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey),
                   winf AS (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND UNBOUNDED FOLLOWING)
        )
        SELECT o_custkey, n_orders, first_ok, second_ok, last_ok
        FROM w WHERE rn = 1
        ORDER BY o_custkey
    """,
    tags=("medium", "window-analytic", "navigation"),
)
def q_first_last_window(spark, sf_dir):
    """Window navigation family — first_value / nth_value(2) / last_value of
    each customer's order history in (date, key) order, one row per
    customer.  last_value and nth_value require the explicit full frame
    (the default frame ends at CURRENT ROW, a classic silent-wrong-answer);
    the unique (o_orderdate, o_orderkey) sort makes every navigator
    deterministic.  One shuffle on the partition key serves all five window
    functions."""
    o = t(spark, sf_dir, "orders")
    win = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    winf = win.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    winp = W.partitionBy("o_custkey")
    return (
        o.select(
            "o_custkey",
            F.row_number().over(win).alias("rn"),
            F.count("*").over(winp).alias("n_orders"),
            F.first("o_orderkey").over(win).alias("first_ok"),
            F.nth_value("o_orderkey", 2).over(winf).alias("second_ok"),
            F.last("o_orderkey").over(winf).alias("last_ok"),
        )
        .filter(F.col("rn") == 1)
        .select("o_custkey", "n_orders", "first_ok", "second_ok", "last_ok")
        .orderBy("o_custkey")
    )


@query(
    "q_rolling_median",
    oracle="""
        WITH daily AS (
            SELECT epoch_us(o_orderdate) AS day_us,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS rev_cents
            FROM orders GROUP BY o_orderdate),
        num AS (
            SELECT day_us, rev_cents,
                   row_number() OVER (ORDER BY day_us) AS rn
            FROM daily),
        frames AS (
            SELECT a.day_us, a.rn, b.rev_cents,
                   row_number() OVER (PARTITION BY a.rn
                                      ORDER BY b.rev_cents, b.rn) AS vr,
                   count(*) OVER (PARTITION BY a.rn) AS n_win
            FROM num a JOIN num b ON b.rn BETWEEN a.rn - 6 AND a.rn)
        SELECT day_us, CAST(n_win AS BIGINT) AS n_win,
               CAST(max(CASE WHEN vr = (n_win + 1) // 2 THEN rev_cents END)
                    AS BIGINT) AS med_lo_cents,
               CAST(max(CASE WHEN vr = n_win // 2 + 1 THEN rev_cents END)
                    AS BIGINT) AS med_hi_cents
        FROM frames GROUP BY day_us, n_win
        ORDER BY day_us
    """,
    tags=("complex", "window-analytic", "median"),
)
def q_rolling_median(spark, sf_dir):
    """Exact trailing-7-row median of daily order revenue (lower and upper
    middle, in integer cents — engine-exact; averaging the two would
    reintroduce doubles).  No engine gives exact percentiles over a moving
    frame, so the Spark idiom is collect_list over the row frame ->
    array_sort -> element_at, while the oracle re-derives the same values
    relationally (frame self-join + in-frame rank).  The global sort window
    is legitimate here and only here: the input is ONE ROW PER CALENDAR DAY
    (bounded ~2.4k forever, invariant to SF — the daily aggregate upstream
    already did the distributed work)."""
    o = t(spark, sf_dir, "orders")
    daily = o.groupBy("o_orderdate").agg(
        (F.sum(dec("o_totalprice")) * 100).cast("bigint").alias("rev_cents")
    )
    w = W.orderBy("o_orderdate").rowsBetween(-6, 0)
    framed = daily.select(
        # o_orderdate is TIMESTAMP_NTZ; the UTC session timezone makes the
        # cast an identity re-tag, matching the oracle's epoch_us
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("day_us"),
        F.array_sort(F.collect_list("rev_cents").over(w)).alias("arr"),
    )
    n = F.size("arr")
    return framed.select(
        "day_us",
        n.cast("bigint").alias("n_win"),
        F.element_at("arr", F.floor((n + 1) / 2).cast("int")).alias("med_lo_cents"),
        F.element_at("arr", (F.floor(n / 2) + 1).cast("int")).alias("med_hi_cents"),
    ).orderBy("day_us")


@query(
    "q_share_of_total",
    oracle="""
        SELECT o_orderstatus, o_orderpriority, n,
               CAST(n AS DOUBLE)
                   / sum(n) OVER (PARTITION BY o_orderstatus) AS share
        FROM (SELECT o_orderstatus, o_orderpriority,
                     CAST(count(*) AS BIGINT) AS n
              FROM orders GROUP BY o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus, o_orderpriority
    """,
    tags=("medium", "window-analytic", "ratio"),
)
def q_share_of_total(spark, sf_dir):
    """Percent-of-total (RATIO_TO_REPORT): each priority's share of its
    order status.  The aggregate reduces to |status x priority| rows before
    the share window runs — a partition-only window (no sort), so the
    normalization parallelizes per status and touches only aggregate rows,
    never the fact table."""
    o = t(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n")
    )
    total = F.sum("n").over(W.partitionBy("o_orderstatus"))
    return counts.select(
        "o_orderstatus",
        "o_orderpriority",
        "n",
        (F.col("n").cast("double") / total).alias("share"),
    ).orderBy("o_orderstatus", "o_orderpriority")


@query(
    "q_ref_integrity",
    oracle="""
        SELECT check_name, n_violations FROM (
            SELECT 'lineitem_without_order' AS check_name,
                   CAST(count(*) AS BIGINT) AS n_violations
            FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderkey IS NULL
            UNION ALL
            SELECT 'lineitem_without_part',
                   CAST(count(*) AS BIGINT)
            FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
            WHERE p.p_partkey IS NULL
            UNION ALL
            SELECT 'orders_without_customer',
                   CAST(count(*) AS BIGINT)
            FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_custkey IS NULL
            UNION ALL
            SELECT 'supplier_without_nation',
                   CAST(count(*) AS BIGINT)
            FROM supplier s LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
            WHERE n.n_nationkey IS NULL
        ) ORDER BY check_name
    """,
    tags=("medium", "data-quality", "join"),
)
def q_ref_integrity(spark, sf_dir):
    """Referential-integrity audit — the foreign-key half of a data-quality
    suite: violation counts for four FK relationships via anti joins (all
    zero on a consistent fixture; the certificate is that both engines
    derive the same zeros from the same joins).  Each check is an anti
    join against a broadcastable key set except lineitem->orders, which
    shuffles once on the fact's own join key — the same cost as any fact
    join at 100 TB."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    checks = [
        (
            "lineitem_without_order",
            li.join(o, li.l_orderkey == o.o_orderkey, "left_anti"),
        ),
        (
            "lineitem_without_part",
            li.join(
                t(spark, sf_dir, "part"),
                li.l_partkey == F.col("p_partkey"),
                "left_anti",
            ),
        ),
        (
            "orders_without_customer",
            o.join(
                t(spark, sf_dir, "customer"),
                o.o_custkey == F.col("c_custkey"),
                "left_anti",
            ),
        ),
        (
            "supplier_without_nation",
            t(spark, sf_dir, "supplier").join(
                t(spark, sf_dir, "nation"),
                F.col("s_nationkey") == F.col("n_nationkey"),
                "left_anti",
            ),
        ),
    ]
    out = None
    for name, df in checks:
        one = df.agg(F.count("*").alias("n_violations")).select(
            F.lit(name).alias("check_name"), "n_violations"
        )
        out = one if out is None else out.unionByName(one)
    return out.orderBy("check_name")


_SPINE_SQL = """
    WITH RECURSIVE bounds AS (
        SELECT CAST(min(year(o_orderdate) * 12 + month(o_orderdate) - 1) AS BIGINT) AS lo,
               CAST(max(year(o_orderdate) * 12 + month(o_orderdate) - 1) AS BIGINT) AS hi
        FROM {orders}),
    months(mi, hi) AS (
        SELECT lo, hi FROM bounds
        UNION ALL
        SELECT mi + 1, hi FROM months WHERE mi < hi
    ),
    per AS (
        SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS mi,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM {orders} GROUP BY 1)
    SELECT printf('%04d-%02d', mi // 12, mi % 12 + 1) AS month,
           CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders,
           CAST(coalesce(revenue, 0.0) AS DOUBLE) AS revenue
    FROM months LEFT JOIN per USING (mi)
    ORDER BY month
"""


@query(
    "q_month_spine_gapfill",
    oracle=_SPINE_SQL.format(orders="orders"),
    tags=("complex", "recursive-cte", "gap-fill"),
)
def q_month_spine_gapfill(spark, sf_dir):
    """Recursive CTE (Spark 4's WITH RECURSIVE) generating a month spine
    from min to max order month, left-joined to per-month order stats —
    the gap-filling pattern that keeps empty months in a time series
    (a plain GROUP BY silently drops them).  The recursion is bounded by
    the calendar (~80 rows); the bound rides the recursion as a COLUMN —
    a correlated ``(SELECT hi FROM bounds)`` in the recursive WHERE is
    re-evaluated (rescanning orders) on EVERY step, measured 14 s vs 1 s
    for this form at sf0.01.  The real data work is the one per-month
    aggregate the spine joins to.  The builder
    executes the ORACLE STRING VERBATIM via spark.sql — the query is
    written in the dialect-shared subset (printf, integer //, recursive
    CTE), doubling as an engine-portability check."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("spine_orders")
    # Spark's SQL parser accepts `//` only as a comment — give it `DIV`,
    # which DuckDB lacks; everything else is shared verbatim.
    sql = _SPINE_SQL.format(orders="spine_orders").replace(
        "mi // 12", "mi div 12"
    )
    return spark.sql(sql)


@query(
    "q_yoy_growth",
    oracle="""
        WITH m AS (
            SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)
                       AS month_key,
                   CAST(year(o_orderdate) AS BIGINT) AS yr,
                   CAST(month(o_orderdate) AS BIGINT) AS mo,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                       AS rev_cents
            FROM orders
            GROUP BY 1, 2, 3
        ),
        l AS (
            SELECT month_key, yr, mo, rev_cents,
                   lag(rev_cents, 12) OVER (ORDER BY month_key) AS prev_cents
            FROM m
        )
        SELECT yr, mo, rev_cents, prev_cents,
               CAST(rev_cents - prev_cents AS BIGINT) AS diff_cents,
               CAST(rev_cents - prev_cents AS DOUBLE) / prev_cents AS yoy_ratio
        FROM l
        WHERE prev_cents IS NOT NULL
        ORDER BY yr, mo
    """,
    tags=("analytic", "window", "calendar"),
)
def q_yoy_growth(spark, sf_dir):
    """Year-over-year monthly revenue growth — the period-over-period compare
    every BI workload runs.  Months are keyed on the dense integer
    ``year*12 + month - 1`` so ``lag(12)`` lands exactly one calendar year
    back without date arithmetic in the frame (the fixture's order stream is
    gap-free at month grain; a spine join — see q_month_spine_gapfill —
    supplies missing months otherwise).  Revenue is summed in integer cents
    (DECIMAL-exact, order-independent); the growth ratio is one division of
    two exact BIGINTs so the DOUBLE matches bit-for-bit across engines.  At
    scale: one partial-combined aggregate down to ~tens of month rows, then
    a single-partition window over those rows — the window input is
    month-cardinality, not row-cardinality, so the global frame is safe."""
    o = t(spark, sf_dir, "orders")
    m = (
        o.groupBy(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
            .cast("bigint")
            .alias("month_key"),
            F.year("o_orderdate").cast("bigint").alias("yr"),
            F.month("o_orderdate").cast("bigint").alias("mo"),
        )
        .agg(
            (F.sum(dec("o_totalprice")) * 100).cast("bigint").alias("rev_cents")
        )
    )
    w = W.orderBy("month_key")
    l = m.withColumn("prev_cents", F.lag("rev_cents", 12).over(w))
    return (
        l.filter(F.col("prev_cents").isNotNull())
        .select(
            "yr",
            "mo",
            "rev_cents",
            "prev_cents",
            (F.col("rev_cents") - F.col("prev_cents"))
            .cast("bigint")
            .alias("diff_cents"),
            (
                (F.col("rev_cents") - F.col("prev_cents")).cast("double")
                / F.col("prev_cents")
            ).alias("yoy_ratio"),
        )
        .orderBy("yr", "mo")
    )


_CORR_SQL = """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM {orders} o
    WHERE CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
          * (SELECT count(*) FROM {orders} o2
             WHERE o2.o_custkey = o.o_custkey)
          > 2 * (SELECT CAST(sum(CAST(o2.o_totalprice AS DECIMAL(18,2))) * 100
                             AS BIGINT)
                 FROM {orders} o2 WHERE o2.o_custkey = o.o_custkey)
    ORDER BY o_orderkey
"""


@query(
    "q_correlated_subquery",
    oracle=_CORR_SQL.format(orders="orders"),
    tags=("medium", "subquery", "decorrelation"),
)
def q_correlated_subquery(spark, sf_dir):
    """Orders worth more than twice their own customer's average — TWO
    correlated scalar subqueries (per-customer count and sum) in one
    predicate.  The point is Catalyst's decorrelation: both subqueries
    rewrite to ONE per-customer aggregate joined back to the stream, so
    the plan is aggregate + join, never a per-row re-scan (the naive
    nested-loop reading of correlated SQL would be O(n^2) at 100 TB).
    The threshold compare is exact integer arithmetic (cents x count vs
    2 x cent-sum) — no division, no float boundary."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("corr_orders")
    return spark.sql(_CORR_SQL.format(orders="corr_orders"))


_LATERAL_SQL = """
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM {customer} c, LATERAL (
        SELECT o_orderkey, o_totalprice
        FROM {orders}
        WHERE o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 2
    ) t
    WHERE c.c_nationkey = 1
    ORDER BY c.c_custkey, t.o_orderkey
"""


@query(
    "q_lateral_topn",
    oracle=_LATERAL_SQL.format(customer="customer", orders="orders"),
    tags=("medium", "join", "lateral"),
)
def q_lateral_topn(spark, sf_dir):
    """Per-customer top-2 orders via a correlated LATERAL subquery (ANSI
    lateral join, Spark >= 3.2 / DuckDB shared dialect) — the row-generating
    dual of q_topk_per_group's window form.  Catalyst plans the correlated
    LIMIT as a partitioned rank under the hood, so the declared "for each
    row, run a query" semantics execute as one window + join, not a per-row
    probe.  Same answer as the window formulation; a user migrating lateral
    SQL keeps their syntax."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("lat_customer")
    t(spark, sf_dir, "orders").createOrReplaceTempView("lat_orders")
    return spark.sql(_LATERAL_SQL.format(customer="lat_customer", orders="lat_orders"))


@query(
    "q_union_by_name_drift",
    oracle="""
        SELECT doc_id, lang, n_chars, batch
        FROM (
            SELECT doc_id, lang, n_chars, 'v1' AS batch
            FROM documents WHERE doc_id % 2 = 0
            UNION ALL BY NAME
            SELECT 'v2' AS batch, n_chars, doc_id
            FROM documents WHERE doc_id % 2 = 1
        )
        ORDER BY doc_id
    """,
    tags=("medium", "set-ops", "schema-evolution"),
)
def q_union_by_name_drift(spark, sf_dir):
    """Schema-drift union: two feed versions of the same logical table —
    one with columns reordered and one missing a column entirely — unioned
    BY NAME (Spark ``unionByName(allowMissingColumns=True)``, DuckDB
    ``UNION ALL BY NAME``), the absent column null-filled.  Positional
    UNION (q_set_ops) silently mis-binds columns the moment a producer
    reorders fields; by-name union is the ingestion contract that survives
    schema evolution, the batch dual of the mergeSchema read test.  Pure
    map-side concatenation — no shuffle beyond the output sort."""
    d = t(spark, sf_dir, "documents")
    v1 = d.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id", "lang", "n_chars", F.lit("v1").alias("batch")
    )
    v2 = d.filter(F.col("doc_id") % 2 == 1).select(
        F.lit("v2").alias("batch"), "n_chars", "doc_id"
    )
    return (
        v1.unionByName(v2, allowMissingColumns=True)
        .select("doc_id", "lang", "n_chars", "batch")
        .orderBy("doc_id")
    )


@query(
    "q_audience_overlap",
    oracle="""
        WITH ut AS (SELECT DISTINCT event_type, user_id FROM events),
        sizes AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
                  FROM ut GROUP BY 1),
        inter AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(count(*) AS BIGINT) AS n_both
            FROM ut a JOIN ut b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY 1, 2)
        SELECT type_a, type_b, n_both,
               sa.n AS n_a, sb.n AS n_b,
               CAST(n_both AS DOUBLE) / (sa.n + sb.n - n_both) AS overlap_jaccard
        FROM inter
        JOIN sizes sa ON sa.event_type = type_a
        JOIN sizes sb ON sb.event_type = type_b
        ORDER BY type_a, type_b
    """,
    tags=("analytic", "audience", "set-similarity"),
)
def q_audience_overlap(spark, sf_dir):
    """Audience-overlap matrix: Jaccard of user sets between every pair of
    event types — the segment-overlap analysis behind campaign planning
    and feature-adoption dashboards.  The (type, user) distinct relation
    is built once; the pair intersection is a self-join on user_id whose
    fan-out per user is |types present|² — bounded by the type cardinality,
    a constant, never by user count.  Integer counts to the end; the
    Jaccard is one exact-int division.  The distinct-user relation is the
    exact form; at extreme type cardinality the sketch path is HLL unions
    (q_hll_rollup) per pair."""
    e = t(spark, sf_dir, "events")
    ut = e.select("event_type", "user_id").distinct()
    sizes = ut.groupBy("event_type").agg(F.count("*").alias("n"))
    a = ut.select(F.col("event_type").alias("type_a"), "user_id")
    b = ut.select(F.col("event_type").alias("type_b"), "user_id")
    inter = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_both"))
    )
    return (
        inter.join(
            F.broadcast(sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))),
            "type_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))),
            "type_b",
        )
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            (
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both"))
            ).alias("overlap_jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


@query(
    "q_abc_by_brand",
    oracle="""
        WITH rev AS (
            SELECT p.p_brand, l.l_partkey,
                   CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS rev_cents
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY 1, 2),
        ranked AS (
            SELECT p_brand, l_partkey, rev_cents,
                   sum(rev_cents) OVER (PARTITION BY p_brand
                                        ORDER BY rev_cents DESC, l_partkey) AS cum,
                   sum(rev_cents) OVER (PARTITION BY p_brand) AS total
            FROM rev),
        classed AS (
            SELECT p_brand, l_partkey, rev_cents,
                   CASE WHEN 100 * (cum - rev_cents) < 80 * total THEN 'A'
                        WHEN 100 * (cum - rev_cents) < 95 * total THEN 'B'
                        ELSE 'C' END AS abc
            FROM ranked)
        SELECT p_brand, abc,
               CAST(count(*) AS BIGINT) AS n_parts,
               CAST(sum(rev_cents) AS BIGINT) AS class_rev_cents
        FROM classed
        GROUP BY p_brand, abc
        ORDER BY p_brand, abc
    """,
    tags=("analytic", "window", "pareto"),
)
def q_abc_by_brand(spark, sf_dir):
    """ABC / Pareto classification of parts within each brand: a part is
    class A while the revenue accumulated BEFORE it stays under 80% of the
    brand total (B to 95%, else C) — the inventory-management 80/15/5 cut.
    The strictly-before convention (cum − own) makes the boundary exact
    and every comparison is a cross-multiplied integer (100·cum vs
    80·total): no ratio, no float.  The cumulative window is PARTITIONED
    BY BRAND — per-partition input is parts-per-brand, so the sort
    parallelizes across brands at any corpus size; the class rollup reuses
    the same partitioning."""
    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "l_partkey")
        .agg((F.sum(dec("l_extendedprice")) * 100).cast("bigint").alias("rev_cents"))
    )
    wb = W.partitionBy("p_brand")
    ranked = rev.select(
        "p_brand",
        "l_partkey",
        "rev_cents",
        F.sum("rev_cents")
        .over(wb.orderBy(F.desc("rev_cents"), "l_partkey"))
        .alias("cum"),
        F.sum("rev_cents").over(wb).alias("total"),
    )
    before = F.col("cum") - F.col("rev_cents")
    abc = (
        F.when(100 * before < 80 * F.col("total"), "A")
        .when(100 * before < 95 * F.col("total"), "B")
        .otherwise("C")
    )
    return (
        ranked.select("p_brand", "rev_cents", abc.alias("abc"))
        .groupBy("p_brand", "abc")
        .agg(
            F.count("*").alias("n_parts"),
            F.sum("rev_cents").alias("class_rev_cents"),
        )
        .orderBy("p_brand", "abc")
    )


_ALLOC_BUDGET = 1_000_000  # fixed budget units to apportion across segments


@query(
    "q_budget_allocation",
    oracle=f"""
        WITH rev AS (
            SELECT c.c_mktsegment AS segment,
                   CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS rev_cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1),
        tot AS (SELECT CAST(sum(rev_cents) AS BIGINT) AS total FROM rev),
        quota AS (
            SELECT segment, rev_cents,
                   ({_ALLOC_BUDGET} * rev_cents) // total AS base,
                   ({_ALLOC_BUDGET} * rev_cents) % total AS rem
            FROM rev CROSS JOIN tot),
        ranked AS (
            SELECT segment, rev_cents, base, rem,
                   row_number() OVER (ORDER BY rem DESC, segment) AS rr,
                   {_ALLOC_BUDGET} - sum(base) OVER () AS leftover
            FROM quota)
        SELECT segment, rev_cents,
               CAST(base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END
                    AS BIGINT) AS allocation
        FROM ranked
        ORDER BY segment
    """,
    tags=("analytic", "allocation", "exact-integer"),
)
def q_budget_allocation(spark, sf_dir):
    """Proportional budget apportionment by the LARGEST-REMAINDER method:
    each segment gets floor(budget * share), and the unallocated leftover
    units go one-by-one to the largest fractional remainders — the
    classic exact-integer allocation (Hamilton apportionment / financial
    allocation) whose defining invariant is Σ(allocation) == budget
    EXACTLY, which naive per-row rounding violates.  Pure integer
    arithmetic throughout (floor-div + mod against the exact cent total);
    the remainder rank runs over |segments| rows (a constant), so the
    global window is a five-row sort.  The oracle replays the same
    integer protocol — any engine allocates identically."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg((F.sum(dec("o_totalprice")) * 100).cast("bigint").alias("rev_cents"))
    )
    tot = rev.agg(F.sum("rev_cents").alias("total"))
    quota = rev.crossJoin(F.broadcast(tot)).select(
        "segment",
        "rev_cents",
        F.expr(f"({_ALLOC_BUDGET} * rev_cents) DIV total").alias("base"),
        F.expr(f"({_ALLOC_BUDGET} * rev_cents) % total").alias("rem"),
    )
    wall = W.orderBy(F.desc("rem"), "segment").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    ranked = quota.select(
        "segment",
        "rev_cents",
        "base",
        F.row_number().over(W.orderBy(F.desc("rem"), "segment")).alias("rr"),
        (F.lit(_ALLOC_BUDGET) - F.sum("base").over(wall)).alias("leftover"),
    )
    return (
        ranked.select(
            "segment",
            "rev_cents",
            (
                F.col("base")
                + F.when(F.col("rr") <= F.col("leftover"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("allocation"),
        )
        .orderBy("segment")
    )


@query(
    "q_null_ordering",
    oracle="""
        WITH v AS (
            SELECT c_custkey, c_mktsegment,
                   CASE WHEN c_acctbal < 0 THEN NULL
                        ELSE CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                   END AS cents
            FROM customer WHERE c_nationkey = 3)
        SELECT c_custkey, cents,
               CAST(rank() OVER (PARTITION BY c_mktsegment
                                 ORDER BY cents DESC NULLS LAST, c_custkey)
                    AS BIGINT) AS rank_desc_nulls_last,
               CAST(rank() OVER (PARTITION BY c_mktsegment
                                 ORDER BY cents ASC NULLS FIRST, c_custkey)
                    AS BIGINT) AS rank_asc_nulls_first
        FROM v
        ORDER BY c_custkey
    """,
    tags=("medium", "null-semantics", "ordering"),
)
def q_null_ordering(spark, sf_dir):
    """NULL-ordering contract, pinned explicitly: the engines DISAGREE by
    default (Spark sorts NULLS FIRST ascending, DuckDB NULLS LAST), so any
    rank over a nullable key silently diverges across engines unless the
    ordering is spelled out.  Both ranks here carry explicit NULLS
    FIRST/LAST and a unique tie-break — the form every production query
    over nullable keys should use, and the reason this repo's determinism
    rules demand a stable ORDER BY (registry docstring).  Ranks are
    partitioned by segment so the sort parallelizes (plan-audit rule)."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_nationkey") == 3)
    cents = F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(
        (dec("c_acctbal") * 100).cast("bigint")
    )
    v = c.select("c_custkey", "c_mktsegment", cents.alias("cents"))
    wseg = W.partitionBy("c_mktsegment")
    return v.select(
        "c_custkey",
        "cents",
        F.rank()
        .over(wseg.orderBy(F.col("cents").desc_nulls_last(), "c_custkey"))
        .cast("bigint")
        .alias("rank_desc_nulls_last"),
        F.rank()
        .over(wseg.orderBy(F.col("cents").asc_nulls_first(), "c_custkey"))
        .cast("bigint")
        .alias("rank_asc_nulls_first"),
    ).orderBy("c_custkey")


@query(
    "q_mutual_information",
    oracle="""
        WITH j AS (
            SELECT e.event_type, c.c_mktsegment AS segment
            FROM events e JOIN customer c ON e.user_id = c.c_custkey),
        cell AS (
            SELECT event_type, segment, CAST(count(*) AS BIGINT) AS nxy
            FROM j GROUP BY 1, 2),
        mx AS (SELECT event_type, CAST(sum(nxy) AS BIGINT) AS nx
               FROM cell GROUP BY 1),
        my AS (SELECT segment, CAST(sum(nxy) AS BIGINT) AS ny
               FROM cell GROUP BY 1),
        tot AS (SELECT CAST(sum(nxy) AS BIGINT) AS n FROM cell)
        SELECT cell.event_type, cell.segment, nxy,
               CAST(floor(
                   (CAST(nxy AS DOUBLE) / n)
                   * ln((CAST(nxy AS DOUBLE) * n)
                        / (CAST(nx AS DOUBLE) * ny)) * 1000000000
               ) AS BIGINT) AS mi_term_q9
        FROM cell
        JOIN mx USING (event_type)
        JOIN my USING (segment)
        CROSS JOIN tot
        ORDER BY cell.event_type, cell.segment
    """,
    tags=("analytic", "information-theory", "feature-selection"),
)
def q_mutual_information(spark, sf_dir):
    """Pointwise mutual-information terms of the (event_type x customer
    segment) contingency table — the dependency screen feature selection
    and drift detection run on categorical pairs (Σ terms = the MI; a
    near-zero table means the event mix is segment-independent).  The
    contingency cell counts and both marginals are exact integers from ONE
    aggregate each; the p·ln(p·n/(px·py)) term is floor-quantized to 1e-9
    (the q_doc_nll portability contract — order-independent, absorbs
    last-ulp libm divergence).  Fan-out is |types|x|segments| cells — a
    constant — and the raw join is broadcast on the dimension side."""
    e = t(spark, sf_dir, "events")
    c = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    cell = (
        e.join(F.broadcast(c), "user_id")
        .groupBy("event_type", "segment")
        .agg(F.count("*").alias("nxy"))
    )
    mx = cell.groupBy("event_type").agg(F.sum("nxy").alias("nx"))
    my = cell.groupBy("segment").agg(F.sum("nxy").alias("ny"))
    tot = cell.agg(F.sum("nxy").alias("n"))
    term = F.floor(
        (F.col("nxy").cast("double") / F.col("n"))
        * F.log(
            (F.col("nxy").cast("double") * F.col("n"))
            / (F.col("nx").cast("double") * F.col("ny"))
        )
        * 1_000_000_000
    ).cast("bigint")
    return (
        cell.join(F.broadcast(mx), "event_type")
        .join(F.broadcast(my), "segment")
        .crossJoin(F.broadcast(tot))
        .select("event_type", "segment", "nxy", term.alias("mi_term_q9"))
        .orderBy("event_type", "segment")
    )


_BENFORD_Q6 = [(1, 301029), (2, 176091), (3, 124938), (4, 96910), (5, 79181), (6, 66946), (7, 57991), (8, 51152), (9, 45757)]  # floor(log10(1+1/d) * 1e6), precomputed so both
# engines share the SAME integer literals (no runtime log10 divergence)


@query(
    "q_benford_audit",
    oracle="""
        WITH digits AS (
            SELECT CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                          * 100 AS BIGINT) AS VARCHAR), 1, 1)
                        AS BIGINT) AS d
            FROM orders WHERE o_totalprice > 0),
        obs AS (
            SELECT d, CAST(count(*) AS BIGINT) AS n FROM digits GROUP BY d),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM obs),
        exp AS (SELECT * FROM (VALUES (1, 301029), (2, 176091), (3, 124938), (4, 96910), (5, 79181), (6, 66946), (7, 57991), (8, 51152), (9, 45757)) AS t(d, expected_q6))
        SELECT CAST(exp.d AS BIGINT) AS d, coalesce(obs.n, 0) AS n,
               tot.total, CAST(exp.expected_q6 AS BIGINT) AS expected_q6,
               CAST(coalesce(obs.n, 0) * 1000000 // tot.total AS BIGINT)
                   AS observed_q6
        FROM exp LEFT JOIN obs USING (d) CROSS JOIN tot
        ORDER BY exp.d
    """,
    tags=("analytic", "data-quality", "forensics"),
)
def q_benford_audit(spark, sf_dir):
    """Benford first-digit audit of order totals — the data-forensics
    screen for fabricated or truncated numeric columns (natural
    multi-magnitude amounts follow log10(1+1/d); uniform or spiked digits
    flag synthetic data, as they do here on the fixture's uniform prices).
    First digits come from the decimal STRING of exact cents — no
    float log10 anywhere — and the expected shares are shared integer
    literals precomputed at build time.  One map-side digit projection +
    a 9-row aggregate."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    d = F.substring(
        (dec("o_totalprice") * 100).cast("bigint").cast("string"), 1, 1
    ).cast("bigint")
    obs = o.select(d.alias("d")).groupBy("d").agg(F.count("*").alias("n"))
    tot = obs.agg(F.sum("n").alias("total"))
    exp = o.sparkSession.createDataFrame(
        _BENFORD_Q6, "d bigint, expected_q6 bigint"
    )
    return (
        exp.join(obs, "d", "left")
        .select("d", F.coalesce("n", F.lit(0)).alias("n"), "expected_q6")
        .crossJoin(F.broadcast(tot))
        .select(
            "d",
            "n",
            "total",
            "expected_q6",
            F.expr("n * 1000000 DIV total").alias("observed_q6"),
        )
        .orderBy("d")
    )


@query(
    "q_survival_steps",
    oracle="""
        WITH starts AS (
            SELECT user_id, min(ts) AS start_ts
            FROM events WHERE event_type = 'signup' GROUP BY user_id),
        ends AS (
            SELECT e.user_id, min(e.ts) AS end_ts
            FROM events e JOIN starts s ON e.user_id = s.user_id
            WHERE e.event_type = 'error' AND e.ts >= s.start_ts
            GROUP BY e.user_id),
        horizon AS (SELECT max(ts) AS h FROM events),
        subj AS (
            SELECT s.user_id,
                   CASE WHEN e.user_id IS NULL
                        THEN date_diff('day', s.start_ts, horizon.h)
                        ELSE date_diff('day', s.start_ts, e.end_ts) END AS dur_d,
                   CASE WHEN e.user_id IS NULL THEN 0 ELSE 1 END AS observed
            FROM starts s LEFT JOIN ends e ON s.user_id = e.user_id
            CROSS JOIN horizon),
        day_counts AS (
            SELECT dur_d, CAST(count(*) AS BIGINT) AS n_total,
                   CAST(sum(observed) AS BIGINT) AS n_events
            FROM subj GROUP BY dur_d),
        at_risk AS (
            SELECT dur_d, n_events,
                   sum(n_total) OVER (ORDER BY dur_d DESC) AS n_risk
            FROM day_counts),
        steps AS (
            SELECT dur_d, n_events, n_risk,
                   CAST(floor(ln(1.0 - CAST(n_events AS DOUBLE) / n_risk)
                              * 1000000000) AS BIGINT) AS log_term_q9
            FROM at_risk WHERE n_events > 0 AND n_events < n_risk)
        SELECT dur_d,
               CAST(n_risk AS BIGINT) AS n_risk,
               n_events,
               CAST(sum(log_term_q9) OVER (ORDER BY dur_d) AS BIGINT)
                   AS log_survival_q9
        FROM steps
        ORDER BY dur_d
    """,
    tags=("analytic", "survival", "kaplan-meier"),
)
def q_survival_steps(spark, sf_dir):
    """Kaplan-Meier survival steps for signup -> first-error durations
    (users with no error right-censored at the data horizon).  Per event
    day: the at-risk count (subjects whose duration reaches that day,
    censored included — derived from a duration-frequency table by a
    descending cumulative sum, not a per-subject scan) and the cumulative
    log survival Σ ln(1 − d_i/n_i), each step floor-quantized to 1e-9
    BEFORE the sum so the curve is engine-exact (the product form would
    accumulate float drift).  Both windows run over DAY-cardinality rows —
    bounded by the study calendar, not the subject count."""
    ev = t(spark, sf_dir, "events")
    starts = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("start_ts"))
    )
    ends = (
        ev.filter(F.col("event_type") == "error")
        .join(starts, "user_id")
        .filter(F.col("ts") >= F.col("start_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("end_ts"))
    )
    horizon = ev.agg(F.max("ts").alias("h"))
    subj = (
        starts.join(ends, "user_id", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            F.when(
                F.col("end_ts").isNull(),
                F.datediff(F.col("h"), F.col("start_ts")),
            )
            .otherwise(F.datediff(F.col("end_ts"), F.col("start_ts")))
            .cast("bigint")
            .alias("dur_d"),
            F.when(F.col("end_ts").isNull(), 0).otherwise(1).alias("observed"),
        )
    )
    day_counts = subj.groupBy("dur_d").agg(
        F.count("*").alias("n_total"), F.sum("observed").alias("n_events")
    )
    at_risk = day_counts.select(
        "dur_d",
        "n_events",
        F.sum("n_total").over(W.orderBy(F.desc("dur_d"))).alias("n_risk"),
    )
    steps = at_risk.filter(
        (F.col("n_events") > 0) & (F.col("n_events") < F.col("n_risk"))
    ).select(
        "dur_d",
        "n_events",
        "n_risk",
        F.floor(
            F.log(1.0 - F.col("n_events").cast("double") / F.col("n_risk"))
            * 1_000_000_000
        )
        .cast("bigint")
        .alias("log_term_q9"),
    )
    return (
        steps.select(
            "dur_d",
            F.col("n_risk").cast("bigint").alias("n_risk"),
            "n_events",
            F.sum("log_term_q9")
            .over(W.orderBy("dur_d"))
            .cast("bigint")
            .alias("log_survival_q9"),
        )
        .orderBy("dur_d")
    )


@query(
    "q_ab_test_lift",
    oracle="""
        WITH conv AS (
            SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
        groups AS (
            SELECT c.c_mktsegment AS grp,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN conv.user_id IS NULL THEN 0 ELSE 1 END)
                        AS BIGINT) AS conv_n
            FROM customer c LEFT JOIN conv ON conv.user_id = c.c_custkey
            WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
            GROUP BY 1),
        wide AS (
            SELECT
                max(CASE WHEN grp = 'BUILDING' THEN n END) AS n_a,
                max(CASE WHEN grp = 'BUILDING' THEN conv_n END) AS c_a,
                max(CASE WHEN grp = 'MACHINERY' THEN n END) AS n_b,
                max(CASE WHEN grp = 'MACHINERY' THEN conv_n END) AS c_b
            FROM groups)
        SELECT n_a, c_a, n_b, c_b,
               CAST(floor(
                   (CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)
                   / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                          * (1.0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                          * (1.0 / n_a + 1.0 / n_b))
                   * 1000000) AS BIGINT) AS z_q6
        FROM wide
    """,
    tags=("analytic", "ab-test", "statistics"),
)
def q_ab_test_lift(spark, sf_dir):
    """Two-proportion z-test between customer segments (conversion = any
    purchase event) — the experimentation-analytics primitive behind every
    A/B dashboard.  Counts are exact integers from one aggregate; the
    pooled-variance z statistic is a FIXED sequence of IEEE
    correctly-rounded ops on those exact inputs, floor-quantized to 1e-6
    at the end (belt and braces for the engines' printf/last-ulp
    differences).  A significance decision is then a literal comparison
    downstream (|z| > 1.96)."""
    ev = t(spark, sf_dir, "events")
    c = t(spark, sf_dir, "customer")
    conv = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    groups = (
        c.filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .join(conv, c.c_custkey == conv.user_id, "left")
        .groupBy(F.col("c_mktsegment").alias("grp"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("user_id").isNull(), 0).otherwise(1)).alias(
                "conv_n"
            ),
        )
    )
    wide = groups.agg(
        F.max(F.when(F.col("grp") == "BUILDING", F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("grp") == "BUILDING", F.col("conv_n"))).alias("c_a"),
        F.max(F.when(F.col("grp") == "MACHINERY", F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("grp") == "MACHINERY", F.col("conv_n"))).alias("c_b"),
    )
    p_a = F.col("c_a").cast("double") / F.col("n_a")
    p_b = F.col("c_b").cast("double") / F.col("n_b")
    p_pool = (F.col("c_a") + F.col("c_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = (p_a - p_b) / F.sqrt(
        p_pool * (1.0 - p_pool) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    return wide.select(
        "n_a",
        "c_a",
        "n_b",
        "c_b",
        F.floor(z * 1_000_000).cast("bigint").alias("z_q6"),
    )


def _skew_oracle() -> str:
    parts = []
    for tbl, col in (
        ("orders", "o_custkey"),
        ("lineitem", "l_partkey"),
        ("lineitem", "l_suppkey"),
        ("events", "user_id"),
        ("events", "event_type"),
    ):
        parts.append(f"""
            SELECT '{tbl}.{col}' AS join_key,
                   CAST(count(*) AS BIGINT) AS n_keys,
                   CAST(sum(cnt) AS BIGINT) AS n_rows,
                   CAST(max(cnt) AS BIGINT) AS max_per_key,
                   CAST((CAST(max(cnt) AS HUGEINT) * count(*) * 1000000)
                        // sum(cnt) AS BIGINT)
                       AS skew_factor_q6
            FROM (SELECT CAST({col} AS VARCHAR) AS k, count(*) AS cnt
                  FROM {tbl} GROUP BY 1)""")
    return "SELECT * FROM (" + " UNION ALL ".join(parts) + ") ORDER BY join_key"


@query(
    "q_skew_advisor",
    oracle=_skew_oracle(),
    tags=("scale", "profiling", "skew"),
)
def q_skew_advisor(spark, sf_dir):
    """Join-key skew report: for every candidate join/aggregation key,
    the hottest key's row count relative to a perfectly uniform key
    (skew_factor = max·n_keys/n_rows; 1e6 = uniform) — the measurement
    that DECIDES between a plain shuffle, AQE skew splitting, and explicit
    salting (operators/skew.py), instead of guessing.  Under the fixture's
    uniform generators every factor sits near 1×–3×; the event_type row
    (5 keys) shows how low-cardinality keys read as skew-prone by
    construction.  One partial-combined count per key column — the
    per-key frequency tables never leave the executors; only the 5-row
    summary returns."""
    specs = [
        ("orders", "o_custkey"),
        ("lineitem", "l_partkey"),
        ("lineitem", "l_suppkey"),
        ("events", "user_id"),
        ("events", "event_type"),
    ]
    out = None
    for tbl, col in specs:
        freq = (
            t(spark, sf_dir, tbl)
            .groupBy(F.col(col).cast("string").alias("k"))
            .agg(F.count("*").alias("cnt"))
        )
        row = freq.agg(
            F.lit(f"{tbl}.{col}").alias("join_key"),
            F.count("*").alias("n_keys"),
            F.sum("cnt").alias("n_rows"),
            F.max("cnt").alias("max_per_key"),
            # rows×keys×1e6 overflows BIGINT at 100 TB (max_per_key ~1e12
            # × n_keys ~1e10 × 1e6 ~ 1e28) — DECIMAL(38,0) product, HUGEINT
            # in the oracle; the quotient (≤ n_keys·1e6) stays in BIGINT.
            F.expr(
                "(CAST(max(cnt) AS DECIMAL(38,0)) * count(*) * 1000000)"
                " DIV sum(cnt)"
            ).alias("skew_factor_q6"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("join_key")


@query(
    "q_distribution_drift",
    oracle="""
        WITH bucketed AS (
            SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
                   CAST(floor(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                                   AS BIGINT) / 5000000) AS BIGINT) AS bucket
            FROM orders WHERE year(o_orderdate) IN (1997, 1998)),
        p AS (SELECT bucket, CAST(count(*) AS BIGINT) AS np
              FROM bucketed WHERE yr = 1998 GROUP BY 1),
        q AS (SELECT bucket, CAST(count(*) AS BIGINT) AS nq
              FROM bucketed WHERE yr = 1997 GROUP BY 1),
        tot AS (
            SELECT (SELECT CAST(sum(np) AS BIGINT) FROM p) AS tp,
                   (SELECT CAST(sum(nq) AS BIGINT) FROM q) AS tq)
        SELECT p.bucket, np, nq,
               CAST(floor(
                   (CAST(np AS DOUBLE) / tot.tp)
                   * ln((CAST(np AS DOUBLE) * tot.tq)
                        / (CAST(nq AS DOUBLE) * tot.tp)) * 1000000000
               ) AS BIGINT) AS kl_term_q9
        FROM p JOIN q USING (bucket) CROSS JOIN tot
        ORDER BY p.bucket
    """,
    tags=("analytic", "drift", "kl-divergence"),
)
def q_distribution_drift(spark, sf_dir):
    """Distribution-drift terms: KL(P1998 ‖ P1997) per price bucket — the
    monitoring primitive that alarms when this month's data stops looking
    like last month's (feature drift, upstream schema rot, traffic-mix
    shifts).  Bucket counts are exact integers; each p·ln(p/q) term is
    floor-quantized to 1e-9 before any summation (Σ terms = the KL; the
    per-bucket sign also localizes WHERE the mass moved).  Buckets come
    from integer cent floor-division (no float binning); shared buckets
    only — disappearing-mass buckets are a join-miss a production monitor
    would surface separately.  Two partial-combined aggregates over one
    scan + two broadcast scalars."""
    o = t(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").isin(1997, 1998)
    )
    bucketed = o.select(
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.floor((dec("o_totalprice") * 100).cast("bigint") / 5_000_000)
        .cast("bigint")
        .alias("bucket"),
    )
    p = (
        bucketed.filter(F.col("yr") == 1998)
        .groupBy("bucket")
        .agg(F.count("*").alias("np"))
    )
    q = (
        bucketed.filter(F.col("yr") == 1997)
        .groupBy("bucket")
        .agg(F.count("*").alias("nq"))
    )
    tp = p.agg(F.sum("np").alias("tp"))
    tq = q.agg(F.sum("nq").alias("tq"))
    term = F.floor(
        (F.col("np").cast("double") / F.col("tp"))
        * F.log(
            (F.col("np").cast("double") * F.col("tq"))
            / (F.col("nq").cast("double") * F.col("tp"))
        )
        * 1_000_000_000
    ).cast("bigint")
    return (
        p.join(q, "bucket")
        .crossJoin(F.broadcast(tp))
        .crossJoin(F.broadcast(tq))
        .select("bucket", "np", "nq", term.alias("kl_term_q9"))
        .orderBy("bucket")
    )


@query(
    "q_theil_sen",
    oracle="""
        WITH m AS (
            SELECT c.c_nationkey AS nat,
                   CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) - 1
                        AS BIGINT) AS mk,
                   CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS rev_cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2
        ),
        p AS (
            SELECT a.nat,
                   CAST(b.rev_cents - a.rev_cents AS DOUBLE)
                       / CAST(b.mk - a.mk AS DOUBLE) AS slope,
                   a.mk AS mk_a, b.mk AS mk_b
            FROM m a JOIN m b ON a.nat = b.nat AND a.mk < b.mk
        ),
        r AS (
            SELECT nat, slope,
                   row_number() OVER (PARTITION BY nat
                                      ORDER BY slope, mk_a, mk_b) AS rn,
                   count(*) OVER (PARTITION BY nat) AS c
            FROM p
        )
        SELECT nat,
               CAST((c + 1) // 2 AS BIGINT) AS median_rank,
               CAST(c AS BIGINT) AS n_pairs,
               CAST(floor(slope * 1000) AS BIGINT) AS slope_me3
        FROM r
        WHERE rn = (c + 1) // 2
        ORDER BY nat
    """,
    tags=("analytic", "robust", "trend", "theil-sen"),
)
def q_theil_sen(spark, sf_dir):
    """Theil-Sen robust trend per nation: the LOWER MEDIAN of all pairwise
    monthly-revenue slopes — the estimator that shrugs off the outlier
    months that drag q_linreg_by_group's OLS around (up to ~29% gross
    corruption before breakdown).  Completes the robust-statistics family:
    MAD for spread, winsorized moments for location, Theil-Sen for trend.

    Exactness: each slope is ONE double division of two exact BIGINTs
    (cent diff / month diff), so both engines materialize bit-identical
    doubles; ordering by (slope, mk_a, mk_b) is therefore engine-exact,
    the lower median picks the same pair everywhere, and the 1e-3
    floor-quantization is deterministic on an identical input.

    Scale: the O(n²) pair set is over MONTH aggregates, whose cardinality
    is the calendar (~84 per nation, SF-INVARIANT — the q_yoy_growth
    argument), never raw rows: ~3.5k pairs x 25 nations forever, produced
    by an equi-join on nation.  The corpus-sized work is the one
    partial-combined (nation, month) revenue aggregate."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    m = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nat"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
            .cast("bigint")
            .alias("mk"),
        )
        .agg((F.sum(dec("o_totalprice")) * 100).cast("bigint").alias("rev_cents"))
    )
    a = m.select(
        F.col("nat"), F.col("mk").alias("mk_a"), F.col("rev_cents").alias("ra")
    )
    b = m.select(
        F.col("nat"), F.col("mk").alias("mk_b"), F.col("rev_cents").alias("rb")
    )
    p = (
        a.join(b, "nat")
        .filter(F.col("mk_a") < F.col("mk_b"))
        .select(
            "nat",
            (
                (F.col("rb") - F.col("ra")).cast("double")
                / (F.col("mk_b") - F.col("mk_a")).cast("double")
            ).alias("slope"),
            "mk_a",
            "mk_b",
        )
    )
    wo = W.partitionBy("nat").orderBy("slope", "mk_a", "mk_b")
    wc = W.partitionBy("nat")
    r = p.select(
        "nat",
        "slope",
        F.row_number().over(wo).alias("rn"),
        F.count("*").over(wc).alias("c"),
    )
    return (
        r.filter(F.expr("rn = (c + 1) div 2"))
        .select(
            "nat",
            F.expr("(c + 1) div 2").alias("median_rank"),
            F.col("c").cast("bigint").alias("n_pairs"),
            F.floor(F.col("slope") * 1000).cast("bigint").alias("slope_me3"),
        )
        .orderBy("nat")
    )


# ---------------------------------------------------------------------------
# Z-order (Morton) layout clustering — the data-SKIPPING lever at 100 TB:
# sorting on one column bounds that column's min/max per file but leaves
# every other dimension unbounded, while interleaving the bits of two
# predicate columns bounds BOTH, so a 2-D range predicate prunes most
# files (Delta/Iceberg OPTIMIZE ZORDER; Morton 1966).
# ---------------------------------------------------------------------------

_Z_BITS = 16


def _morton_spark(x, y, bits=_Z_BITS):
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), 2 * b)
            + F.shiftleft(F.shiftright(y, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        )
    return z


def _morton_sql(x, y, bits=_Z_BITS):
    terms = []
    for b in range(bits):
        terms.append(f"((({x} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({y} >> {b}) & 1) << {2 * b + 1})")
    return " + ".join(terms)


@query(
    "q_zorder_layout",
    oracle=f"""
        WITH raw AS (
            SELECT user_id,
                   CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
            FROM events
        ),
        keyed AS (
            SELECT user_id,
                   day - (SELECT min(day) FROM raw) AS day
            FROM raw
        ),
        z AS (
            SELECT user_id, day,
                   ({_morton_sql("user_id", "day")}) >> 8 AS zbucket
            FROM keyed
        )
        SELECT CAST(zbucket AS BIGINT) AS zbucket,
               CAST(count(*) AS BIGINT) AS n,
               CAST(min(user_id) AS BIGINT) AS min_user,
               CAST(max(user_id) AS BIGINT) AS max_user,
               CAST(min(day) AS BIGINT) AS min_day,
               CAST(max(day) AS BIGINT) AS max_day,
               CAST((max(user_id) - min(user_id) + 1)
                    * (max(day) - min(day) + 1) AS BIGINT) AS bbox_area
        FROM z
        GROUP BY zbucket
        ORDER BY zbucket
    """,
    tags=("layout", "zorder", "data-skipping", "diagnostics"),
)
def q_zorder_layout(spark, sf_dir):
    """Z-ORDER layout census: interleave the bits of (user_id, epoch-day)
    into a Morton key, cluster rows into zbuckets (key >> 12 — the
    file-grain stand-in), and report each bucket's row count and min/max
    BOUNDING BOX over both dimensions.  The bbox_area column is the
    data-skipping figure of merit a layout optimizer reads: under
    Z-order both dimensions stay tight per bucket, so a
    (user-range x day-range) predicate prunes by min/max stats alone —
    the exact mechanism behind Delta/Iceberg OPTIMIZE ZORDER at 100 TB,
    here oracle-replayed bit-for-bit (the 32-term interleave runs as the
    same integer expression in both engines).

    Scale: one map-side Morton projection + one hash aggregate on the
    bucket key — layout analysis is a metadata-sized job."""
    ev = t(spark, sf_dir, "events")
    day = F.floor(F.unix_timestamp("ts") / 86400).cast("bigint")
    raw = ev.select(F.col("user_id").cast("bigint").alias("user_id"),
                    day.alias("day"))
    # rebase day to the corpus minimum so the interleave spends its bits
    # on the VARYING range (absolute epoch-days share high bits that
    # would otherwise collapse every row into one bucket)
    min_day = raw.agg(F.min("day").alias("d0"))
    keyed = raw.crossJoin(F.broadcast(min_day)).select(
        "user_id", (F.col("day") - F.col("d0")).alias("day")
    )
    z = keyed.withColumn(
        "zbucket",
        F.shiftright(_morton_spark(F.col("user_id"), F.col("day")), 8),
    )
    return (
        z.groupBy("zbucket")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.min("user_id").cast("bigint").alias("min_user"),
            F.max("user_id").cast("bigint").alias("max_user"),
            F.min("day").cast("bigint").alias("min_day"),
            F.max("day").cast("bigint").alias("max_day"),
            ((F.max("user_id") - F.min("user_id") + 1)
             * (F.max("day") - F.min("day") + 1))
            .cast("bigint")
            .alias("bbox_area"),
        )
        .orderBy("zbucket")
    )


@query(
    "q_cuped_lift",
    oracle="""
        WITH u AS (
            SELECT user_id,
                   CAST(sum(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT)
                       AS yc,
                   CAST(count(*) AS BIGINT) AS xc,
                   user_id % 2 AS variant
            FROM events GROUP BY user_id),
        m AS (
            SELECT count(*) AS n,
                   sum(CAST(xc AS DECIMAL(38,0))) AS sx,
                   sum(CAST(yc AS DECIMAL(38,0))) AS sy,
                   sum(CAST(xc AS DECIMAL(38,0)) * CAST(xc AS DECIMAL(38,0)))
                       AS sxx,
                   sum(CAST(yc AS DECIMAL(38,0)) * CAST(yc AS DECIMAL(38,0)))
                       AS syy,
                   sum(CAST(xc AS DECIMAL(38,0)) * CAST(yc AS DECIMAL(38,0)))
                       AS sxy,
                   sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS n_a,
                   sum(CASE WHEN variant = 0 THEN CAST(xc AS DECIMAL(38,0))
                            ELSE 0 END) AS sx_a,
                   sum(CASE WHEN variant = 0 THEN CAST(yc AS DECIMAL(38,0))
                            ELSE 0 END) AS sy_a,
                   sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS n_b,
                   sum(CASE WHEN variant = 1 THEN CAST(xc AS DECIMAL(38,0))
                            ELSE 0 END) AS sx_b,
                   sum(CASE WHEN variant = 1 THEN CAST(yc AS DECIMAL(38,0))
                            ELSE 0 END) AS sy_b
            FROM u),
        d AS (
            SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
                   (CAST(n AS DECIMAL(38,0)) * sxy - sx * sy) AS covq,
                   (CAST(n AS DECIMAL(38,0)) * sxx - sx * sx) AS varxq,
                   (CAST(n AS DECIMAL(38,0)) * syy - sy * sy) AS varyq,
                   CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS my_a,
                   CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS my_b,
                   CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS mx_a,
                   CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mx_b
            FROM m)
        SELECT n_a, n_b,
               CAST(floor(my_a * 1000000) AS BIGINT) AS mean_y_a_q6,
               CAST(floor(my_b * 1000000) AS BIGINT) AS mean_y_b_q6,
               CAST(floor(CAST(covq AS DOUBLE) / CAST(varxq AS DOUBLE)
                          * 1000000) AS BIGINT) AS theta_q6,
               CAST(floor((my_a - my_b) * 1000000) AS BIGINT)
                   AS lift_raw_q6,
               CAST(floor(((my_a - my_b)
                           - CAST(covq AS DOUBLE) / CAST(varxq AS DOUBLE)
                             * (mx_a - mx_b)) * 1000000) AS BIGINT)
                   AS lift_adj_q6,
               CAST(floor((1.0 - (CAST(covq AS DOUBLE) * CAST(covq AS DOUBLE))
                                 / (CAST(varxq AS DOUBLE)
                                    * CAST(varyq AS DOUBLE))) * 1000000)
                    AS BIGINT) AS varred_ppm
        FROM d
    """,
    tags=("analytic", "ab-test", "statistics", "cuped", "variance-reduction"),
)
def q_cuped_lift(spark, sf_dir):
    """CUPED variance-reduced A/B lift (Deng et al. 2013, WSDM — the
    controlled-experiment technique every large experimentation platform
    runs): the experiment metric Y (per-user event value) is adjusted by
    an assignment-independent covariate X (the user's event count — the
    activity/exposure covariate, ρ ≈ 0.5 against value totals in this
    corpus) via Y' = Y − θ(X − E[X]), θ = cov(X,Y)/var(X), shrinking
    metric variance by the squared correlation: varred = 1−ρ² ≈ 0.75
    here, i.e. a quarter of the metric noise removed before the lift
    test.  Output: per-variant means, θ, raw vs adjusted lift, and the
    variance-reduction ratio in ppm.

    Exactness: all seven moments (n, Σx, Σy, Σx², Σy², Σxy + per-variant
    splits) accumulate as DECIMAL(38,0) sums of exact integer cents —
    order-independent — then θ/lifts/ρ² are a FIXED sequence of IEEE
    double ops on those exact values, floor-quantized once at the end
    (the q_ab_test_lift / q_linreg_by_group discipline, SCALE.md §7c).

    Scale: one per-user aggregate (shuffle keyed on user), then a single
    twelve-moment global aggregate whose partials combine map-side — the
    raw event stream moves once, and nothing driver-side exceeds one
    row."""
    d38 = "decimal(38,0)"
    ev = t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(dec("value") * 100).cast("bigint").alias("yc"),
        F.count("*").cast("bigint").alias("xc"),
    ).select("yc", "xc", (F.col("user_id") % 2).alias("variant"))
    xq = F.col("xc").cast(d38)
    yq = F.col("yc").cast(d38)
    zero = F.lit(0).cast(d38)
    m = u.agg(
        F.count("*").alias("n"),
        F.sum(xq).alias("sx"),
        F.sum(yq).alias("sy"),
        F.sum(xq * xq).alias("sxx"),
        F.sum(yq * yq).alias("syy"),
        F.sum(xq * yq).alias("sxy"),
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("variant") == 0, xq).otherwise(zero)).alias("sx_a"),
        F.sum(F.when(F.col("variant") == 0, yq).otherwise(zero)).alias("sy_a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("variant") == 1, xq).otherwise(zero)).alias("sx_b"),
        F.sum(F.when(F.col("variant") == 1, yq).otherwise(zero)).alias("sy_b"),
    )
    n38 = F.col("n").cast(d38)
    covq = (n38 * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    varxq = (n38 * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    varyq = (n38 * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    my_a = F.col("sy_a").cast("double") / F.col("n_a").cast("double")
    my_b = F.col("sy_b").cast("double") / F.col("n_b").cast("double")
    mx_a = F.col("sx_a").cast("double") / F.col("n_a").cast("double")
    mx_b = F.col("sx_b").cast("double") / F.col("n_b").cast("double")
    theta = covq / varxq
    return m.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.floor(my_a * 1_000_000).cast("bigint").alias("mean_y_a_q6"),
        F.floor(my_b * 1_000_000).cast("bigint").alias("mean_y_b_q6"),
        F.floor(theta * 1_000_000).cast("bigint").alias("theta_q6"),
        F.floor((my_a - my_b) * 1_000_000).cast("bigint").alias("lift_raw_q6"),
        F.floor(((my_a - my_b) - theta * (mx_a - mx_b)) * 1_000_000)
        .cast("bigint")
        .alias("lift_adj_q6"),
        F.floor((F.lit(1.0) - (covq * covq) / (varxq * varyq)) * 1_000_000)
        .cast("bigint")
        .alias("varred_ppm"),
    )


@query(
    "q_delta_ratio",
    oracle="""
        WITH u AS (
            SELECT user_id,
                   CAST(sum(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT)
                       AS yc,
                   CAST(count(*) AS BIGINT) AS ec,
                   user_id % 2 AS variant
            FROM events GROUP BY user_id),
        m AS (
            SELECT variant,
                   count(*) AS n,
                   sum(CAST(yc AS DECIMAL(38,0))) AS sy,
                   sum(CAST(ec AS DECIMAL(38,0))) AS se,
                   sum(CAST(yc AS DECIMAL(38,0)) * CAST(yc AS DECIMAL(38,0)))
                       AS syy,
                   sum(CAST(ec AS DECIMAL(38,0)) * CAST(ec AS DECIMAL(38,0)))
                       AS see,
                   sum(CAST(yc AS DECIMAL(38,0)) * CAST(ec AS DECIMAL(38,0)))
                       AS sye
            FROM u GROUP BY variant),
        d AS (
            SELECT variant, CAST(n AS BIGINT) AS n,
                   CAST(sy AS DOUBLE) / CAST(se AS DOUBLE) AS r,
                   CAST(se AS DOUBLE) / CAST(n AS DOUBLE) AS mean_e,
                   (CAST(n AS DECIMAL(38,0)) * syy - sy * sy) AS vyq,
                   (CAST(n AS DECIMAL(38,0)) * see - se * se) AS veq,
                   (CAST(n AS DECIMAL(38,0)) * sye - sy * se) AS cyeq
            FROM m),
        v AS (
            SELECT variant, n, r, mean_e,
                   (CAST(vyq AS DOUBLE)
                    - 2.0 * r * CAST(cyeq AS DOUBLE)
                    + r * r * CAST(veq AS DOUBLE))
                   / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
                   / (CAST(n AS DOUBLE) * mean_e * mean_e) AS var_r
            FROM d),
        wide AS (
            SELECT
                max(CASE WHEN variant = 0 THEN n END) AS n_a,
                max(CASE WHEN variant = 1 THEN n END) AS n_b,
                max(CASE WHEN variant = 0 THEN r END) AS r_a,
                max(CASE WHEN variant = 1 THEN r END) AS r_b,
                max(CASE WHEN variant = 0 THEN var_r END) AS v_a,
                max(CASE WHEN variant = 1 THEN var_r END) AS v_b
            FROM v)
        SELECT n_a, n_b,
               CAST(floor(r_a * 1000000) AS BIGINT) AS ratio_a_q6,
               CAST(floor(r_b * 1000000) AS BIGINT) AS ratio_b_q6,
               CAST(floor(sqrt(v_a) * 1000000000) AS BIGINT) AS se_a_q9,
               CAST(floor(sqrt(v_b) * 1000000000) AS BIGINT) AS se_b_q9,
               CAST(floor((r_a - r_b) / sqrt(v_a + v_b) * 1000000) AS BIGINT)
                   AS z_q6
        FROM wide
    """,
    tags=("analytic", "ab-test", "statistics", "delta-method", "ratio-metric"),
)
def q_delta_ratio(spark, sf_dir):
    """Delta-method inference for a RATIO metric (value per event) under
    user-level randomization — the experimentation primitive q_ab_test_lift
    (proportions) and q_cuped_lift (user-mean metrics) don't cover: when
    the metric's denominator is events but the randomization unit is the
    user, per-event variance is simply wrong (within-user correlation),
    and the standard fix is the delta method on the per-user (Y, N) pair:
    Var(ΣY/ΣN) ≈ (σ²_y − 2R·σ_yn + R²·σ_n) / (n·n̄²·n) per variant
    (Deng, Knoblich & Lu 2018, KDD).  Output: per-variant ratios, delta-
    method standard errors, and the two-sample z for the ratio difference.

    Exactness: six DECIMAL(38,0) moments per variant over exact integer
    (cents, count) pairs; the variance and z are one fixed IEEE double
    sequence floor-quantized at the end (SCALE.md §7c).

    Scale: one user-keyed aggregate + one six-moment aggregate per
    variant with map-side combine — the event stream moves once."""
    d38 = "decimal(38,0)"
    ev = t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(dec("value") * 100).cast("bigint").alias("yc"),
        F.count("*").cast("bigint").alias("ec"),
    ).select("yc", "ec", (F.col("user_id") % 2).alias("variant"))
    yq = F.col("yc").cast(d38)
    eq = F.col("ec").cast(d38)
    m = u.groupBy("variant").agg(
        F.count("*").alias("n"),
        F.sum(yq).alias("sy"),
        F.sum(eq).alias("se"),
        F.sum(yq * yq).alias("syy"),
        F.sum(eq * eq).alias("see"),
        F.sum(yq * eq).alias("sye"),
    )
    n38 = F.col("n").cast(d38)
    nd = F.col("n").cast("double")
    r = F.col("sy").cast("double") / F.col("se").cast("double")
    mean_e = F.col("se").cast("double") / nd
    vyq = (n38 * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    veq = (n38 * F.col("see") - F.col("se") * F.col("se")).cast("double")
    cyeq = (n38 * F.col("sye") - F.col("sy") * F.col("se")).cast("double")
    var_r = (
        (vyq - F.lit(2.0) * r * cyeq + r * r * veq) / (nd * nd) / (nd * mean_e * mean_e)
    )
    v = m.select(
        "variant",
        F.col("n").cast("bigint").alias("n"),
        r.alias("r"),
        var_r.alias("var_r"),
    )
    wide = v.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("variant") == 0, F.col("r"))).alias("r_a"),
        F.max(F.when(F.col("variant") == 1, F.col("r"))).alias("r_b"),
        F.max(F.when(F.col("variant") == 0, F.col("var_r"))).alias("v_a"),
        F.max(F.when(F.col("variant") == 1, F.col("var_r"))).alias("v_b"),
    )
    return wide.select(
        "n_a",
        "n_b",
        F.floor(F.col("r_a") * 1_000_000).cast("bigint").alias("ratio_a_q6"),
        F.floor(F.col("r_b") * 1_000_000).cast("bigint").alias("ratio_b_q6"),
        F.floor(F.sqrt(F.col("v_a")) * 1_000_000_000).cast("bigint").alias("se_a_q9"),
        F.floor(F.sqrt(F.col("v_b")) * 1_000_000_000).cast("bigint").alias("se_b_q9"),
        F.floor(
            (F.col("r_a") - F.col("r_b"))
            / F.sqrt(F.col("v_a") + F.col("v_b"))
            * 1_000_000
        )
        .cast("bigint")
        .alias("z_q6"),
    )


_CONF_ALPHA_NUM, _CONF_ALPHA_DEN = 9, 10  # 1 - alpha = 9/10


@query(
    "q_conformal_interval",
    oracle="""
        WITH ev AS (
            SELECT event_type,
                   CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
                   user_id % 2 AS grp
            FROM events
        ),
        stats AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_cal,
                   CAST(sum(cents) AS BIGINT) AS s
            FROM ev WHERE grp = 0 GROUP BY event_type
        ),
        calr AS (
            SELECT e.event_type, abs(e.cents * st.n_cal - st.s) AS r
            FROM ev e JOIN stats st ON st.event_type = e.event_type
            WHERE e.grp = 0
        ),
        freq AS (
            SELECT event_type, r, count(*) AS c FROM calr GROUP BY 1, 2
        ),
        cum AS (
            SELECT event_type, r,
                   sum(c) OVER (PARTITION BY event_type ORDER BY r) AS cf
            FROM freq
        ),
        qhat AS (
            SELECT c.event_type, min(c.r) AS q_hat
            FROM cum c JOIN stats st ON st.event_type = c.event_type
            WHERE c.cf >= ((st.n_cal + 1) * 9 + 9) // 10
            GROUP BY c.event_type
        ),
        cov AS (
            SELECT e.event_type,
                   CAST(count(*) AS BIGINT) AS n_test,
                   CAST(sum(CASE WHEN abs(e.cents * st.n_cal - st.s)
                                      <= q.q_hat
                                 THEN 1 ELSE 0 END) AS BIGINT) AS covered
            FROM ev e
            JOIN stats st ON st.event_type = e.event_type
            JOIN qhat q ON q.event_type = e.event_type
            WHERE e.grp = 1
            GROUP BY e.event_type
        )
        SELECT c.event_type, st.n_cal, c.n_test,
               CAST(q.q_hat // st.n_cal AS BIGINT) AS halfwidth_cents,
               c.covered,
               CAST(c.covered * 1000000 // c.n_test AS BIGINT)
                   AS coverage_ppm
        FROM cov c
        JOIN stats st ON st.event_type = c.event_type
        JOIN qhat q ON q.event_type = c.event_type
        ORDER BY c.event_type
    """,
    tags=("analytic", "statistics", "conformal", "uncertainty", "calibration"),
)
def q_conformal_interval(spark, sf_dir):
    """Mondrian (group-conditional) SPLIT-CONFORMAL prediction intervals
    (Vovk et al.; Papadopoulos 2002; Lei et al. 2018) — the
    distribution-free uncertainty primitive modern eval stacks attach to
    any point predictor: calibrate on one half (even users), then an
    interval of half-width q̂ = the ⌈(n+1)(1−α)⌉-th smallest calibration
    nonconformity guarantees ≥ 1−α coverage on exchangeable test data,
    NO distributional assumptions.  Here the predictor is the per-type
    calibration mean, nonconformity the cross-multiplied integer
    |v·n_cal − s| (never a float residual), α = 0.1, Mondrian = per
    event_type so the guarantee is group-conditional.  Output per type:
    the conformal half-width in cents and the realized coverage on the
    held-out odd users — the certificate the fixture validates at
    ~90% (tests/test_conformal.py pins the finite-sample bound with
    binomial slack).

    Exactness: the conformal quantile is a ceil-rank selection over the
    per-type nonconformity FREQUENCY table (the q_winsorized_stats
    protocol — deterministic under ties, no row_number over equal
    values); every comparison is exact BIGINT.

    Scale: two joins against a broadcastable per-type stats row, one
    cumulative window over distinct nonconformity VALUES per type
    (value-distribution-bounded, the q_ks_statistic class), one
    metadata-sized census.  At extreme per-type cardinality the
    ceil-rank selection swaps in the KLL sketch (q_kll_rollup) at a
    quantified rank error — the exact protocol stays the certificate
    path."""
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        (dec("value") * 100).cast("bigint").alias("cents"),
        (F.col("user_id") % 2).alias("grp"),
    )
    cal = ev.filter(F.col("grp") == 0)
    tst = ev.filter(F.col("grp") == 1)
    stats = cal.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_cal"),
        F.sum("cents").cast("bigint").alias("s"),
    )
    calr = cal.join(F.broadcast(stats), "event_type").select(
        "event_type",
        F.abs(F.col("cents") * F.col("n_cal") - F.col("s")).alias("r"),
    )
    freq = calr.groupBy("event_type", "r").agg(F.count("*").alias("c"))
    wc = W.partitionBy("event_type").orderBy("r")
    cum = freq.select(
        "event_type",
        "r",
        F.sum("c").over(wc.rowsBetween(W.unboundedPreceding, 0)).alias("cf"),
    )
    qhat = (
        cum.join(F.broadcast(stats), "event_type")
        .filter(F.col("cf") >= F.expr(f"CAST(((n_cal + 1) * {_CONF_ALPHA_NUM} + {_CONF_ALPHA_DEN - 1}) DIV {_CONF_ALPHA_DEN} AS BIGINT)"))
        .groupBy("event_type")
        .agg(F.min("r").alias("q_hat"))
    )
    cov = (
        tst.join(F.broadcast(stats), "event_type")
        .join(F.broadcast(qhat), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_test"),
            F.sum(
                F.when(
                    F.abs(F.col("cents") * F.col("n_cal") - F.col("s"))
                    <= F.col("q_hat"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("covered"),
        )
    )
    return (
        cov.join(F.broadcast(stats), "event_type")
        .join(F.broadcast(qhat), "event_type")
        .select(
            "event_type",
            "n_cal",
            "n_test",
            F.expr("CAST(q_hat DIV n_cal AS BIGINT)").alias("halfwidth_cents"),
            "covered",
            F.expr("CAST(covered * 1000000 DIV n_test AS BIGINT)").alias(
                "coverage_ppm"
            ),
        )
        .orderBy("event_type")
    )


@query(
    "q_power_mde",
    oracle="""
        WITH u AS (
            SELECT user_id,
                   CAST(sum(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT)
                       AS yc
            FROM events GROUP BY user_id
        ),
        m AS (
            SELECT count(*) AS n,
                   sum(CAST(yc AS DECIMAL(38,0))) AS sy,
                   sum(CAST(yc AS DECIMAL(38,0)) * CAST(yc AS DECIMAL(38,0)))
                       AS syy
            FROM u
        ),
        s AS (
            SELECT CAST(n AS BIGINT) AS n_users,
                   sqrt(CAST(CAST(n AS DECIMAL(38,0)) * syy - sy * sy
                             AS DOUBLE))
                   / CAST(n AS DOUBLE) AS sigma,
                   CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS mu
            FROM m
        ),
        grid AS (SELECT unnest([2, 4, 10, 20]) AS mult)
        SELECT CAST(s.n_users * g.mult AS BIGINT) AS n_per_arm,
               CAST(floor(s.sigma * 100) AS BIGINT) AS sigma_q2,
               CAST(floor((2.8016214492 * s.sigma
                           * sqrt(2.0 / (s.n_users * g.mult))) * 100)
                    AS BIGINT) AS mde_cents_q2,
               CAST(floor((2.8016214492 * s.sigma
                           * sqrt(2.0 / (s.n_users * g.mult)))
                          * 1000000 / s.mu) AS BIGINT) AS mde_rel_ppm
        FROM s CROSS JOIN grid g
        ORDER BY n_per_arm
    """,
    tags=("analytic", "ab-test", "statistics", "power", "mde"),
)
def q_power_mde(spark, sf_dir):
    """Minimum detectable effect curve — the PLANNING side of the
    experimentation suite (z-test q_ab_test_lift, CUPED q_cuped_lift,
    delta-method q_delta_ratio, conformal q_conformal_interval answer
    'what happened'; MDE answers 'how long must we run'): for a
    two-sample test at α=0.05 / power=0.8, the smallest true lift
    detectable with n users per arm is (z_{0.975}+z_{0.8})·σ·√(2/n),
    with the z-sum as the standard literal 1.9600 + 0.8416 = 2.8016.
    Output: the MDE in cents and relative ppm at 2×/4×/10×/20× the
    current user count — the 'traffic needed' curve every experiment
    review reads.

    Exactness: σ from two DECIMAL(38,0) moments (population form,
    √(n·Σy²−(Σy)²)/n); the curve is fixed IEEE double arithmetic on
    those exact values with literal z constants, floor-quantized.

    Scale: one user-keyed aggregate + one three-moment global aggregate;
    the grid is four literals."""
    d38 = "decimal(38,0)"
    ev = t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(dec("value") * 100).cast("bigint").alias("yc")
    )
    yq = F.col("yc").cast(d38)
    m = u.agg(
        F.count("*").alias("n"),
        F.sum(yq).alias("sy"),
        F.sum(yq * yq).alias("syy"),
    )
    n38 = F.col("n").cast(d38)
    sigma = (
        F.sqrt((n38 * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
        / F.col("n").cast("double")
    )
    mu = F.col("sy").cast("double") / F.col("n").cast("double")
    s = m.select(
        F.col("n").cast("bigint").alias("n_users"),
        sigma.alias("sigma"),
        mu.alias("mu"),
    )
    grid = F.explode(F.array(*[F.lit(x) for x in (2, 4, 10, 20)])).alias("mult")
    z = F.lit(2.8016214492)
    mde = z * F.col("sigma") * F.sqrt(F.lit(2.0) / (F.col("n_users") * F.col("mult")))
    return (
        s.select("n_users", "sigma", "mu", grid)
        .select(
            (F.col("n_users") * F.col("mult")).cast("bigint").alias("n_per_arm"),
            F.floor(F.col("sigma") * 100).cast("bigint").alias("sigma_q2"),
            F.floor(mde * 100).cast("bigint").alias("mde_cents_q2"),
            F.floor(mde * 1_000_000 / F.col("mu")).cast("bigint").alias("mde_rel_ppm"),
        )
        .orderBy("n_per_arm")
    )
