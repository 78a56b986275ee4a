"""Physical-plan audits — the properties that make a query survive a 100x
scale-up, asserted against Catalyst's actual output rather than hoped for:

* filters reach the parquet scan (``PushedFilters``);
* projections prune the scan schema (``ReadSchema``);
* dimension joins broadcast instead of shuffling the fact side;
* no query plans an unintended cartesian product;
* hot aggregation paths stay inside whole-stage codegen.
"""

from __future__ import annotations

import contextlib
import io
import os
import re

import pytest

from flink_estimator_spark.plans import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def plan_of(spark, name: str, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        QUERIES[name].builder(spark, SF_DIR).explain(mode)
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark):
    p = plan_of(spark, "q6_forecast_revenue")
    assert "GreaterThanOrEqual(l_shipdate" in p, p
    assert "LessThan(l_quantity,24.0)" in p, p


def test_column_pruning(spark):
    p = plan_of(spark, "q_scan_filter_project")
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert m, p
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    # lineitem is a 16-column table; the scan must read only what the
    # projection + predicates need
    assert cols == {
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_returnflag",
    }, cols


@pytest.mark.parametrize(
    "name", ["q5_region_revenue", "q7_nation_trade", "q14_promo_share", "q10_returned_items"]
)
def test_dimension_joins_broadcast(spark, name):
    assert "BroadcastHashJoin" in plan_of(spark, name), name


# Cross products are legitimate only where the operator is *defined* as an
# all-pairs comparison over a bounded side (brute-force similarity, scalar
# subqueries, tiny literal band tables).
ALLOWED_CROSS = {
    "q_emb_cosine_topk",
    "q_emb_label_knn",
    # q_emb_lsh_ann / q_emb_ivf_ann left this list in round 4: their
    # oracle'd forms are pure bucket/list equi-joins with no cartesian
    "q_emb_lsh_recall",  # embeds the exact brute-force side as its baseline
    "q_emb_ivf_recall",
    # guarded all-pairs since r6: embedding_near_dups_auto routes corpora
    # above EMBEDDING_BRUTE_CAP to the blocked equi-join plan (cutover
    # tested in test_blocked_near_dups.py); at fixture scale the measured-
    # faster brute BNLJ plan runs, which is what this exemption covers
    "q_dedup_embedding",
    "q_emb_quantized_topk",  # bounded broadcast query side x linear scan
    "q_triplet_mining",  # bounded broadcast anchor side x linear scan
    "q_range_join_bands",
    "q22_idle_balances",
    "q_scalar_subquery",
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_unintended_cartesian(spark, name):
    if name in ALLOWED_CROSS:
        pytest.skip("declared all-pairs operator")
    p = plan_of(spark, name)
    assert "CartesianProduct" not in p, f"{name} plans a cartesian product"


# A window with no PARTITION BY routes its whole input through one task.
# Legitimate only where the input is explicitly bounded (q_ntile_rank caps
# the key range to 2000 rows on purpose — global NTILE/RANK is the operator).
ALLOWED_GLOBAL_WINDOW = {
    "q_ntile_rank",
    # one row per calendar day reaches the window (~2.4k rows forever,
    # SF-invariant): the daily aggregate upstream already distributed
    "q_rolling_median",
    # one row per calendar month (~84 rows forever, SF-invariant): the
    # monthly aggregate upstream already distributed
    "q_yoy_growth",
    # one row per calendar day (~2.4k forever) — same class as
    # q_rolling_median; the daily aggregate upstream already distributed
    "q_ts_pattern_match",
    # one row per market segment (5 forever): the remainder rank is a
    # five-row sort by design
    "q_budget_allocation",
    # one row per corpus source (20 forever): q_budget_allocation's
    # remainder-rank class over the per-source token aggregate
    "q_temperature_mix",
    # one row per duration DAY (bounded by the study calendar, not the
    # subject count): both cumulative windows run over the day table
    "q_survival_steps",
    # one row per calendar day (~2.4k forever) — q_rolling_median's class
    "q_change_point",
    "q_autocorrelation",
    # two rank windows, each over a TakeOrdered top-60 list (K rows forever,
    # SF-invariant by construction): the corpus-size work is the distributed
    # partial top-K upstream, not the window
    "q_hybrid_rrf",
    # one rank window over a TakeOrdered top-100 list (q_hybrid_rrf's class):
    # the corpus-size work is the distributed scoring + partial top-K
    "q_dsir_select",
    # one rank window over a TakeOrdered top-20 list (same class): the
    # corpus-size work is the lag window + broadcast-scored aggregate
    "q_markov_anomaly",
    # one cumulative window over DISTINCT CENT VALUES — bounded by the
    # value range (~56k forever, SF-invariant once saturated), the
    # q_rolling_median boundedness class; per-cent counts pre-aggregate
    # distributed before the window
    "q_ks_statistic",
    # one cumulative window over DISTINCT COARSE SCORE BUCKETS (1e-2
    # log-odds resolution — q_ks_statistic's class): per-bucket counts
    # pre-aggregate distributed before the window
    "q_classifier_auc",
    # two rank windows, each over a TakeOrdered top-10 list
    # (q_hybrid_rrf's class): relevance and BM25 scoring upstream are the
    # distributed work
    "q_retrieval_ndcg",
    # one rank window over a TakeOrdered top-1000 term list (same class):
    # the corpus-size work is the distributed term-frequency aggregate
    "q_zipf_slope",
    # one rank window over the replicate table — LITERAL-bounded at R=200
    # rows forever (q_ntile_rank's class); the corpus-size work is the
    # combiner-reduced R-way weighted aggregate upstream
    "q_bootstrap_ci",
    # one cumulative window over DISTINCT COARSE SCORE BUCKETS — exactly
    # q_classifier_auc's bounded input (same sb aggregate upstream)
    "q_threshold_sweep",
    # one cumulative window over DISTINCT UNIT-VALUE BUCKETS — exactly
    # q_ks_statistic's boundedness class (bounded by the value range,
    # SF-invariant once saturated); per-bucket counts pre-aggregate
    # distributed before the window
    "q_wasserstein_drift",
    # one rank window over a TakeOrdered top-20 list (q_dsir_select's
    # class): the corpus-size work is the distributed training aggregate
    "q_chi2_terms",
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_partitionless_sort_window(spark, name):
    if name in ALLOWED_GLOBAL_WINDOW:
        pytest.skip("declared bounded-input global window")
    plan = (
        QUERIES[name]
        .builder(spark, SF_DIR)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # logical Window prints `Window [exprs], [partitionSpec], [orderSpec]`;
    # a partition-less *sort* window (the single-task killer) drops the middle
    # group, leaving exactly two groups with sort directions in the last one.
    # Partition-only windows (no orderSpec) also print two groups but carry no
    # ASC/DESC — those parallelize fine.
    for line in plan.splitlines():
        if "Window [" not in line:
            continue
        tail = line[line.index("Window [") :]
        if tail.count("], [") < 2 and re.search(r"\b(ASC|DESC)\b", tail.rsplit("], [", 1)[-1]):
            raise AssertionError(
                f"{name} plans a partition-less sort window:\n{line.strip()}"
            )


@pytest.mark.parametrize("name", ["q1_pricing_summary", "q6_forecast_revenue"])
def test_hot_aggregates_use_codegen(spark, name):
    # simple-mode explain marks whole-stage-codegen spans with "*(n)"; AQE
    # wraps the plan and defers those markers to the final plan, so switch it
    # off for the static check only
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        p = plan_of(spark, name, mode="simple")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert re.search(r"\*\(\d+\)", p), p


def test_ivf_salted_shuffle_path_matches_broadcast(spark):
    """The beyond-broadcast IVF mode (salted cid shuffle join) must produce
    exactly the broadcast path's results, and must actually plan a shuffle
    join on the salted key (no broadcast of the inverted lists)."""
    import os

    from flink_estimator_spark.operators.similarity import ivf_ann
    from flink_estimator_spark.sources.tables import read_table
    from tests.conftest import SF_SMALL

    emb = read_table(spark, os.path.join(SF_SMALL, "embeddings.parquet"))
    bc = ivf_ann(emb, k=5, n_centroids=8, nprobe=2)
    salted = ivf_ann(emb, k=5, n_centroids=8, nprobe=2, broadcast_lists=False)
    assert sorted(map(tuple, bc.collect())) == sorted(map(tuple, salted.collect()))

    # at fixture scale AQE rewrites any small build side to broadcast, which
    # would make the no-broadcast assertion vacuous — pin the thresholds off
    # (exactly the beyond-broadcast regime this mode exists for)
    prev = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        for k in prev:
            spark.conf.set(k, "-1")
        salted = ivf_ann(
            emb, k=5, n_centroids=8, nprobe=2, broadcast_lists=False
        )
        salted.collect()
        plan = salted._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in prev.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)
    # the probe->lists join must not broadcast: its join keys are (cid, _salt)
    joins = [seg for seg in plan.split("\n") if "_salt" in seg and "Join" in seg]
    assert joins, plan
    assert all("Broadcast" not in seg for seg in joins), plan


def test_runtime_bloom_filter_injects_on_selective_join(spark):
    """Spark's runtime bloom filter (the dynamic-filtering analogue for
    shuffle joins): a selective dimension filter is turned into a bloom
    predicate on the fact side's scan, cutting shuffled bytes before the
    join.  Size thresholds are lowered to fire at fixture scale — at 100 TB
    the defaults fire on their own; the assertion is that the optimizer
    actually injects might_contain over the fact scan."""
    import os

    from flink_estimator_spark.sources.tables import read_table
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMALL

    prev = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "512MB"
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        # broadcast would bypass the shuffle join the bloom filter protects
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

        li = read_table(spark, os.path.join(SF_SMALL, "lineitem.parquet"))
        orders = read_table(spark, os.path.join(SF_SMALL, "orders.parquet")).filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        joined = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
            "l_orderkey", "l_extendedprice", "o_orderpriority"
        )
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, plan
        # and the result is still correct
        n = joined.count()
        exp = (
            li.join(
                read_table(spark, os.path.join(SF_SMALL, "orders.parquet"))
                .filter(F.col("o_orderpriority") == "1-URGENT")
                .select(F.col("o_orderkey").alias("k")),
                F.col("l_orderkey") == F.col("k"),
            ).count()
        )
        assert n == exp
    finally:
        for k, v in prev.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)


def test_salted_join_shuffles_and_matches_plain(spark):
    """salted_shuffle_join beyond broadcast: with auto-broadcast pinned off,
    the (key, salt) join must plan as a shuffle join (no Broadcast on the
    salted keys) and produce exactly the plain equi-join's rows."""
    import os

    from flink_estimator_spark.operators.skew import salted_shuffle_join
    from flink_estimator_spark.sources.tables import read_table
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMALL

    li = read_table(spark, os.path.join(SF_SMALL, "lineitem.parquet")).select(
        "l_suppkey", "l_quantity"
    )
    sup = read_table(spark, os.path.join(SF_SMALL, "supplier.parquet")).select(
        "s_suppkey", "s_nationkey"
    )
    plain = li.join(sup, li.l_suppkey == sup.s_suppkey).select(
        "l_suppkey", "l_quantity", "s_nationkey"
    )
    prev = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        for k in prev:
            spark.conf.set(k, "-1")
        salted = salted_shuffle_join(li, sup, "l_suppkey", "s_suppkey").select(
            "l_suppkey", "l_quantity", "s_nationkey"
        )
        got = sorted(map(tuple, salted.collect()))
        plan = salted._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in prev.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)
    assert got == sorted(map(tuple, plain.collect()))
    joins = [seg for seg in plan.split("\n") if "_salt" in seg and "Join" in seg]
    assert joins, plan
    assert all("Broadcast" not in seg for seg in joins), plan
