"""Generate PLANS.md: physical-plan shape metrics for every registered query.

Counts, per query at sf0.001 (plan shape is scale-invariant; AQE may merge
stages at runtime but the static plan shows the declared strategy):

* scans + whether any scan carries PushedFilters (predicate pushdown);
* Exchange nodes (shuffles) and BroadcastExchange nodes;
* WholeStageCodegen spans (JVM-compiled stretches);
* Python boundaries (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas).

Run: `python tools/gen_plans_md.py` (needs the JVM; ~2 min).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_estimator_spark.plans.planmeta import metrics  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    from flink_estimator_spark.plans import QUERIES
    from flink_estimator_spark.session import get_spark

    spark = get_spark(app_name="gen_plans")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    rows = []
    for name in sorted(QUERIES):
        try:
            m = metrics(QUERIES[name].builder(spark, SF_DIR))
        except Exception as exc:  # a query that cannot plan is a bug
            m = {"scans": f"ERROR {exc}", "pushed": "-", "exchanges": "-",
                 "broadcasts": "-", "codegen": "-", "python": "-"}
        rows.append((name, m))
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "PLANS.md")
    with open(out, "w") as f:
        f.write("# Physical-plan shapes (generated — do not edit)\n\n")
        f.write(
            "Static `explain('formatted')` metrics per registered query at "
            f"`{SF_DIR}`; regenerate with `python tools/gen_plans_md.py`.\n"
            "`exchanges` counts shuffle Exchanges only (broadcasts listed "
            "separately); `python` counts Arrow-batched Python boundaries — "
            "the deliberate ones (pandas UDF surface, multimodal decode, "
            "Plane-A kernel, LSH bucketing) and nothing else.\n\n"
        )
        f.write("| query | scans | pushdown | shuffles | broadcasts | "
                "codegen spans | python stages |\n|---|---|---|---|---|---|---|\n")
        for name, m in rows:
            f.write(
                f"| `{name}` | {m['scans']} | {m['pushed']} | {m['exchanges']} "
                f"| {m['broadcasts']} | {m['codegen']} | {m['python']} |\n"
            )
    n_err = sum(1 for _, m in rows if isinstance(m["scans"], str))
    print(f"wrote {out}: {len(rows)} queries, {n_err} errors")


if __name__ == "__main__":
    main()
