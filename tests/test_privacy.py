"""Privacy censuses (operators/cleaning.py): coarsening monotonicity for
l-diversity — merging QI classes can only ADD sensitive values, so the
achieved min-l at any coarsening of a level dominates that level's."""

from __future__ import annotations

from flink_estimator_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def test_ldiversity_coarsening_monotonicity(spark):
    rows = {
        r["level"]: r
        for r in QUERIES["q_ldiversity"].builder(spark, SF).collect()
    }
    fine = rows[0]  # (lang, len_b)
    assert rows[1]["min_l"] >= fine["min_l"]  # (len_b) coarsens level 0
    assert rows[2]["min_l"] >= fine["min_l"]  # (lang) coarsens level 0
    for r in rows.values():
        assert r["rows_suppressed"] + r["rows_released"] == 500
        assert r["n_low_diversity"] <= r["n_groups"]


def test_ldiversity_census_is_nontrivial(spark):
    # the finest level must exhibit REAL low-diversity classes at fixture
    # scale, or the trade-off curve degenerates to all-pass
    r0 = QUERIES["q_ldiversity"].builder(spark, SF).collect()[0]
    assert r0["n_low_diversity"] > 0
    assert r0["rows_suppressed"] > 0
