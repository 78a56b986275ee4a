"""Simple-tier operators (reference taxonomy: "SELECT, basic WHERE clauses,
simple projections, basic field filtering and data transformation" —
estimation.html:200-213).  All plain scans/projections/filters/scalar
expressions: Catalyst pushes the predicates and pruned columns into the
parquet scan, so these stay I/O-bound at any scale factor.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ._helpers import dec, t
from .registry import query


@query(
    "q_scan_filter_project",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem
        WHERE l_returnflag = 'R' AND l_quantity >= 30
        ORDER BY l_orderkey, l_linenumber
        LIMIT 100
    """,
    tags=("simple", "scan", "filter", "project", "limit"),
)
def q_scan_filter_project(spark, sf_dir):
    """Scan -> filter -> project -> sort/limit; predicate and column pruning
    reach the parquet reader (PushedFilters in .explain)."""
    return (
        t(spark, sf_dir, "lineitem")
        .filter((F.col("l_returnflag") == "R") & (F.col("l_quantity") >= 30))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(100)
    )


@query(
    "q_filter_compound",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_orderstatus = 'F'
          AND o_totalprice BETWEEN 1000 AND 50000
          AND o_orderdate < TIMESTAMP '1998-01-01'
        ORDER BY o_orderkey
    """,
    tags=("simple", "filter"),
)
def q_filter_compound(spark, sf_dir):
    """Conjunctive predicates over mixed types, all pushed down."""
    return (
        t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderstatus") == "F")
            & F.col("o_totalprice").between(1000, 50000)
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


@query(
    "q_scalar_math",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                    * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS charge,
               CAST(l_quantity * 0.453592 AS DOUBLE) AS qty_kg
        FROM lineitem
        WHERE l_linestatus = 'O'
        ORDER BY l_orderkey, l_linenumber
        LIMIT 500
    """,
    tags=("simple", "scalar", "math"),
)
def q_scalar_math(spark, sf_dir):
    """Scalar arithmetic column transforms (exact decimal for money math)."""
    one = F.lit(1).cast("decimal(18,2)")
    return (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_linestatus") == "O")
        .select(
            "l_orderkey",
            "l_linenumber",
            (dec("l_extendedprice") * (one - dec("l_discount")) * (one + dec("l_tax")))
            .cast("double")
            .alias("charge"),
            (F.col("l_quantity") * F.lit(0.453592)).cast("double").alias("qty_kg"),
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(500)
    )


@query(
    "q_string_funcs",
    oracle="""
        SELECT c_custkey,
               upper(substr(c_name, 1, 8)) AS name_prefix,
               length(c_name) AS name_len,
               concat(c_mktsegment, ':', c_name) AS tagged,
               replace(lower(c_name), '#', '-') AS slug
        FROM customer
        WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        ORDER BY c_custkey
        LIMIT 300
    """,
    tags=("simple", "string"),
)
def q_string_funcs(spark, sf_dir):
    """String scalar functions: upper/substr/length/concat/replace/lower."""
    return (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(
            "c_custkey",
            F.upper(F.substring("c_name", 1, 8)).alias("name_prefix"),
            F.length("c_name").cast("long").alias("name_len"),
            F.concat_ws(":", "c_mktsegment", "c_name").alias("tagged"),
            F.replace(F.lower(F.col("c_name")), F.lit("#"), F.lit("-")).alias("slug"),
        )
        .orderBy("c_custkey")
        .limit(300)
    )


@query(
    "q_date_parts",
    oracle="""
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(month(o_orderdate) AS BIGINT) AS o_month,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM orders
        GROUP BY 1, 2
        ORDER BY o_year, o_month
    """,
    tags=("simple", "date", "aggregate"),
)
def q_date_parts(spark, sf_dir):
    """Date-part extraction feeding a group-by."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy(
            F.year("o_orderdate").cast("long").alias("o_year"),
            F.month("o_orderdate").cast("long").alias("o_month"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(dec("o_totalprice")).cast("double").alias("total_price"),
        )
        .orderBy("o_year", "o_month")
    )


@query(
    "q_case_when",
    oracle="""
        SELECT CASE WHEN l_quantity < 10 THEN 'low'
                    WHEN l_quantity < 30 THEN 'mid'
                    ELSE 'high' END AS qty_bucket,
               count(*) AS n,
               CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY 1
        ORDER BY qty_bucket
    """,
    tags=("simple", "case"),
)
def q_case_when(spark, sf_dir):
    """CASE WHEN bucketing + aggregation (quantities are integral doubles,
    so a plain double sum is exact)."""
    bucket = (
        F.when(F.col("l_quantity") < 10, "low")
        .when(F.col("l_quantity") < 30, "mid")
        .otherwise("high")
    )
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy(bucket.alias("qty_bucket"))
        .agg(F.count("*").alias("n"), F.sum("l_quantity").cast("double").alias("sum_qty"))
        .orderBy("qty_bucket")
    )
