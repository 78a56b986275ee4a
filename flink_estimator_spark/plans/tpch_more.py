"""Further TPC-H-style queries adapted to the fixture schema (the driver's
tables carry no partsupp/shipmode/commitdate columns; these adaptations keep
each query's operator shape — the thing being tested — intact).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ._helpers import REVENUE_SQL, dec, revenue_expr, t
from .registry import query


@query(
    "q6_forecast_revenue",
    oracle="""
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue_delta,
               count(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.02 AND 0.06
          AND l_quantity < 24
    """,
    tags=("medium", "aggregate", "tpch"),
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6: pure filtered aggregation (fully pushed-down scan)."""
    return (
        t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.02, 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice") * dec("l_discount")).cast("double").alias("revenue_delta"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q4_late_orders",
    oracle="""
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders o
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
        )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    tags=("medium", "join", "semi", "tpch"),
)
def q4_late_orders(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS semi join with a correlated date condition
    (orders having a line shipped >90 days after ordering)."""
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    cond = (l.l_orderkey == o.o_orderkey) & (
        l.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
    )
    return (
        o.join(l, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@query(
    "q7_nation_trade",
    oracle=f"""
        SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
               CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
               CAST(sum({REVENUE_SQL}) AS DOUBLE) AS revenue
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
        JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
        WHERE cn.n_name < sn.n_name
        GROUP BY 1, 2, 3
        ORDER BY cust_nation, supp_nation, l_year
    """,
    tags=("complex", "join", "tpch"),
)
def q7_nation_trade(spark, sf_dir):
    """TPC-H Q7 shape: cross-nation trade volume (two aliases of the same
    dimension, ordered nation pairs, per-year rollup)."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    cn = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation")
    )
    sn = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cnk"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("snk"))
        .filter(F.col("cust_nation") < F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(F.sum(revenue_expr()).cast("double").alias("revenue"))
        .orderBy("cust_nation", "supp_nation", "l_year")
    )


@query(
    "q13_order_histogram",
    oracle="""
        SELECT n_orders, count(*) AS n_customers
        FROM (
            SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
            FROM customer c
            LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                              AND o.o_orderpriority <> '1-URGENT'
            GROUP BY c.c_custkey
        )
        GROUP BY n_orders
        ORDER BY n_customers DESC, n_orders DESC
    """,
    tags=("medium", "join", "aggregate", "tpch"),
)
def q13_order_histogram(spark, sf_dir):
    """TPC-H Q13: customer order-count distribution (left join with an extra
    join-side predicate, double aggregation)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count("*").alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.desc("n_orders"))
    )


@query(
    "q14_promo_share",
    oracle=f"""
        SELECT CAST(100.0 AS DOUBLE)
               * CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN {REVENUE_SQL}
                               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
               / CAST(sum({REVENUE_SQL}) AS DOUBLE) AS promo_share
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate <  TIMESTAMP '1997-04-01'
    """,
    tags=("medium", "join", "aggregate", "tpch"),
)
def q14_promo_share(spark, sf_dir):
    """TPC-H Q14: promo revenue share (conditional aggregate over a broadcast
    dimension join)."""
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", revenue_expr()).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(revenue_expr()).cast("double")
            ).alias("promo_share")
        )
    )


@query(
    "q18_large_orders",
    oracle="""
        SELECT c.c_custkey, o.o_orderkey,
               CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
               CAST(t.sum_qty AS DOUBLE) AS sum_qty
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN (
            SELECT l_orderkey, sum(l_quantity) AS sum_qty
            FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
        ) t ON o.o_orderkey = t.l_orderkey
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 50
    """,
    tags=("complex", "join", "having", "tpch"),
)
def q18_large_orders(spark, sf_dir):
    """TPC-H Q18: large-volume orders (aggregate-filter subquery join)."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    big = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            F.col("o_totalprice").cast("double"),
            F.col("sum_qty").cast("double"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(50)
    )


@query(
    "q22_idle_balances",
    oracle="""
        SELECT c_mktsegment, count(*) AS n_cust,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        FROM customer c
        WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                                  / count(*)
                           FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    tags=("complex", "subquery", "anti", "tpch"),
)
def q22_idle_balances(spark, sf_dir):
    """TPC-H Q22 shape: above-average balances with no orders (scalar
    subquery + anti join)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    avg_pos = (
        c.filter(F.col("c_acctbal") > 0)
        .agg((F.sum(dec("c_acctbal")).cast("double") / F.count("*")).alias("avg_bal"))
    )
    return (
        c.crossJoin(F.broadcast(avg_pos))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_cust"),
            F.sum(dec("c_acctbal")).cast("double").alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q8_market_share",
    oracle=f"""
        SELECT l_year,
               CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN volume
                             ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
               / CAST(sum(volume) AS DOUBLE) AS mkt_share
        FROM (
            SELECT CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
                   {REVENUE_SQL} AS volume, sn.n_name AS supp_nation
            FROM lineitem l
            JOIN orders o   ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
            JOIN region r   ON cn.n_regionkey = r.r_regionkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
            WHERE r.r_name = 'ASIA'
        )
        GROUP BY l_year
        ORDER BY l_year
    """,
    tags=("complex", "join", "tpch"),
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one supplier nation's share of a region's market by
    year (six-way join, conditional share aggregate)."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    cn = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cnk"), F.col("n_regionkey").alias("crk")
    )
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    sn = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    vol = revenue_expr()
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cnk"))
        .join(F.broadcast(r), F.col("crk") == F.col("r_regionkey"))
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("snk"))
        .groupBy(F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_7", vol).otherwise(zero))
                .cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("l_year")
    )


@query(
    "q15_top_supplier",
    oracle=f"""
        WITH rev AS (
            SELECT l_suppkey AS supplier_no, sum({REVENUE_SQL}) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, CAST(r.total_revenue AS DOUBLE) AS total_revenue
        FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
        ORDER BY s.s_suppkey
    """,
    tags=("complex", "subquery", "tpch"),
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue (aggregate
    view + scalar-subquery max; ties all surface)."""
    rev = (
        t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(revenue_expr()).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("max_rev"))
    s = t(spark, sf_dir, "supplier")
    return (
        s.join(rev, s.s_suppkey == rev.supplier_no)
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .select(
            "s_suppkey", "s_name", F.col("total_revenue").cast("double").alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


@query(
    "q17_small_quantity",
    oracle="""
        SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
                   AS avg_yearly,
               count(*) AS n_lines
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN (
            SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_thr
            FROM lineitem GROUP BY l_partkey
        ) a ON a.l_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#3' AND p.p_type = 'PROMO'
          AND l.l_quantity < a.qty_thr
    """,
    tags=("complex", "correlated-subquery", "tpch"),
)
def q17_small_quantity(spark, sf_dir):
    """TPC-H Q17 shape: revenue impact of small-quantity orders — the
    correlated per-part average decorrelates into an aggregate + join."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "PROMO")
    )
    thr = (
        t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").alias("tp"))
        .agg((F.lit(0.2) * F.avg("l_quantity")).alias("qty_thr"))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(thr, l.l_partkey == F.col("tp"))
        .filter(F.col("l_quantity") < F.col("qty_thr"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q19_disjunctive_predicates",
    oracle=f"""
        SELECT CAST(sum({REVENUE_SQL}) AS DOUBLE) AS revenue, count(*) AS n
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
               AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
               AND l.l_quantity BETWEEN 20 AND 30)
    """,
    tags=("medium", "join", "disjunction", "tpch"),
)
def q19_disjunctive_predicates(spark, sf_dir):
    """TPC-H Q19: OR-of-ANDs predicate brackets spanning both join sides
    (exercises predicate normalization + broadcast join with residual)."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    bracket = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(bracket)
        .agg(
            F.sum(revenue_expr()).cast("double").alias("revenue"),
            F.count("*").alias("n"),
        )
    )


@query(
    "q21_sole_late_shipper",
    oracle="""
        SELECT s.s_name, count(*) AS numwait
        FROM supplier s
        JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        JOIN orders o ON o.o_orderkey = l1.l_orderkey
        WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM lineitem l3
              JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 20
    """,
    tags=("complex", "semi", "anti", "tpch"),
)
def q21_sole_late_shipper(spark, sf_dir):
    """TPC-H Q21 shape (no receipt/commit dates in the fixture, so "late" is
    shipped >60 days after ordering): suppliers who were the only late
    shipper on a multi-supplier order.

    The EXISTS / NOT EXISTS pair is evaluated as per-order aggregates
    instead of two lineitem self-joins: a supplier qualifies on an order
    iff the order has >1 distinct supplier and exactly 1 late supplier.
    After the lineitem⋈orders join partitions on the order key, every
    later group-by and join reuses that partitioning — the whole decision
    tree costs one extra exchange (the distinct-supplier count), not four
    self-join shuffles, and nothing is computed twice."""
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    l = t(spark, sf_dir, "lineitem")
    late = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
        .select("l_orderkey", "l_suppkey")
    )
    late_per_os = late.groupBy("l_orderkey", "l_suppkey").agg(
        F.count("*").alias("n_late_lines")
    )
    late_per_o = late_per_os.groupBy("l_orderkey").agg(
        F.count("*").alias("n_late_supp")
    )
    supp_per_o = l.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp")
    )
    sole = (
        late_per_os.join(late_per_o.filter(F.col("n_late_supp") == 1), "l_orderkey")
        .join(supp_per_o.filter(F.col("n_supp") > 1), "l_orderkey")
    )
    return (
        sole.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@query(
    "q9_nation_profit",
    oracle=f"""
        SELECT supp_nation, o_year,
               CAST(sum(amount) AS DOUBLE) AS sum_profit
        FROM (
            SELECT n_name AS supp_nation,
                   CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   {REVENUE_SQL} AS amount
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN part     ON l_partkey = p_partkey
            WHERE p_name LIKE '%bolt%'
        )
        GROUP BY supp_nation, o_year
        ORDER BY supp_nation, o_year DESC
    """,
    tags=("complex", "join", "tpch"),
)
def q9_nation_profit(spark, sf_dir):
    """TPC-H Q9 shape (no partsupp in the fixture, so profit = revenue):
    five-way join with a LIKE filter on part name, grouped by supplier
    nation and order year.  part/supplier/nation broadcast; the only
    shuffle is the lineitem⋈orders join + the final aggregate."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(revenue_expr()).cast("double").alias("sum_profit"))
        .orderBy("supp_nation", F.desc("o_year"))
    )


@query(
    "q12_priority_shipping",
    oracle="""
        SELECT l_returnflag AS ship_class,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_shipdate > o_orderdate + INTERVAL 45 DAY
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    tags=("medium", "join", "conditional-agg", "tpch"),
)
def q12_priority_shipping(spark, sf_dir):
    """TPC-H Q12 shape (returnflag stands in for the fixture's missing
    shipmode): join + lateness predicate + two-way conditional counts.
    The shipdate range is pushed to the parquet scan; the lateness
    predicate evaluates post-join."""
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 45 DAY"))
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


@query(
    "q16_supplier_variety",
    oracle="""
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
          AND l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("medium", "join", "distinct-agg", "anti", "tpch"),
)
def q16_supplier_variety(spark, sf_dir):
    """TPC-H Q16 shape: how many distinct suppliers ship each surviving
    part class, excluding a complaint set (NOT IN → broadcast anti-join;
    negative account balance stands in for the fixture's missing
    complaint comment)."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(5, 10, 15, 20, 25, 30, 35, 40)
    )
    bad = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
        WITH cost AS (
            SELECT l_partkey, l_suppkey, min(l_extendedprice) AS unit_cost
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ON n_nationkey = s_nationkey
            JOIN region ON r_regionkey = n_regionkey
            WHERE r_name = 'EUROPE'
            GROUP BY l_partkey, l_suppkey
        )
        SELECT s.s_acctbal, s.s_name, n.n_name AS supp_nation,
               p.p_partkey, p.p_name
        FROM part p
        JOIN cost c ON c.l_partkey = p.p_partkey
        JOIN supplier s ON s.s_suppkey = c.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE p.p_size BETWEEN 10 AND 20 AND p.p_type = 'STANDARD'
          AND c.unit_cost = (
              SELECT min(c2.unit_cost) FROM cost c2
              WHERE c2.l_partkey = p.p_partkey
          )
        ORDER BY s.s_acctbal DESC, p.p_partkey, s.s_suppkey
        LIMIT 25
    """,
    tags=("complex", "correlated-subquery", "tpch"),
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (no partsupp in the fixture, so lineitem stands in as
    the part-supplier catalog and min line price as the supply cost): for
    each qualifying part, the European supplier(s) quoting the minimum cost.

    The correlated min decorrelates into a per-part aggregate joined back
    on (partkey, cost); supplier/nation/region dimensions broadcast, so the
    only exchanges are the two lineitem-sized aggregations — both keyed on
    l_partkey, reusing one partitioning at scale."""
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = t(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "STANDARD")
    )
    eu_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", F.col("n_name").alias("supp_nation"))
    )
    cost = (
        l.join(F.broadcast(eu_supp.select("s_suppkey")), l.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("unit_cost"))
    )
    best = cost.groupBy(F.col("l_partkey").alias("bp")).agg(
        F.min("unit_cost").alias("best_cost")
    )
    return (
        cost.join(best, (cost.l_partkey == F.col("bp"))
                  & (cost.unit_cost == F.col("best_cost")))
        .join(F.broadcast(p), cost.l_partkey == p.p_partkey)
        .join(F.broadcast(eu_supp), cost.l_suppkey == F.col("s_suppkey"))
        .select("s_acctbal", "s_name", "supp_nation", "p_partkey", "p_name",
                "s_suppkey")
        .orderBy(F.desc("s_acctbal"), "p_partkey", "s_suppkey")
        .limit(25)
        .drop("s_suppkey")
    )


@query(
    "q11_important_parts",
    oracle="""
        WITH val AS (
            SELECT l_partkey,
                   sum(CAST(l_extendedprice AS DECIMAL(18,2))
                       * CAST(l_quantity AS DECIMAL(18,2))) AS part_value
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ON n_nationkey = s_nationkey
            WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
            GROUP BY l_partkey
        )
        SELECT l_partkey, CAST(part_value AS DOUBLE) AS part_value
        FROM val
        WHERE CAST(part_value AS DOUBLE) >
              (SELECT CAST(sum(part_value) AS DOUBLE) * 0.001 FROM val)
        ORDER BY part_value DESC, l_partkey
    """,
    tags=("complex", "scalar-subquery", "having", "tpch"),
)
def q11_important_parts(spark, sf_dir):
    """TPC-H Q11 shape (lineitem value standing in for partsupp stock):
    parts whose shipped value from a 3-nation supplier group exceeds a
    fraction of that group's total — HAVING against a global scalar.

    The per-part value aggregate is computed once and reused for both the
    threshold (1-row re-aggregate, broadcast) and the filtered output, so
    the corpus is scanned and shuffled exactly once."""
    l = t(spark, sf_dir, "lineitem")
    grp = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(t(spark, sf_dir, "nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3"))
        .select("s_suppkey")
    )
    val = (
        l.join(F.broadcast(grp), l.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(dec("l_extendedprice") * dec("l_quantity")).alias("part_value_dec"))
    )
    total = val.agg(
        (F.sum("part_value_dec").cast("double") * F.lit(0.001)).alias("threshold")
    )
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("part_value_dec").cast("double") > F.col("threshold"))
        .select("l_partkey", F.col("part_value_dec").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), "l_partkey")
    )


@query(
    "q20_majority_shippers",
    oracle="""
        WITH shipped AS (
            SELECT l_partkey, l_suppkey,
                   sum(CAST(l_quantity AS DECIMAL(18,2))) AS supp_qty
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
            GROUP BY l_partkey, l_suppkey
        ),
        tot AS (
            SELECT l_partkey, sum(supp_qty) AS part_qty
            FROM shipped GROUP BY l_partkey
        )
        SELECT s.s_name, n.n_name AS supp_nation,
               CAST(count(*) AS BIGINT) AS n_parts
        FROM shipped sh
        JOIN tot ON tot.l_partkey = sh.l_partkey
        JOIN part p ON p.p_partkey = sh.l_partkey AND p.p_name LIKE 'small%'
        JOIN supplier s ON s.s_suppkey = sh.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE CAST(sh.supp_qty AS DOUBLE) > 0.5 * CAST(tot.part_qty AS DOUBLE)
        GROUP BY s.s_name, n.n_name
        ORDER BY s.s_name
    """,
    tags=("complex", "nested-subquery", "semi", "tpch"),
)
def q20_majority_shippers(spark, sf_dir):
    """TPC-H Q20 shape (shipped share standing in for availqty vs demand):
    suppliers who shipped the majority of some 'small%' part's 1996 volume,
    with how many such parts each dominates.

    shipped→tot is a re-aggregation of the same keyed data (no second
    lineitem scan); part/supplier/nation broadcast; both aggregates hash on
    l_partkey so the heavy side shuffles once."""
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    shipped = l.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(dec("l_quantity")).alias("supp_qty")
    )
    tot = shipped.groupBy(F.col("l_partkey").alias("tp")).agg(
        F.sum("supp_qty").alias("part_qty")
    )
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    return (
        shipped.join(tot, F.col("l_partkey") == F.col("tp"))
        .filter(F.col("supp_qty").cast("double") > F.lit(0.5) * F.col("part_qty").cast("double"))
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("s_name", F.col("n_name").alias("supp_nation"))
        .agg(F.count("*").alias("n_parts"))
        .orderBy("s_name")
    )
