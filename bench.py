"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "estimator_eps": ...}

Also measures Plane-A estimator throughput (estimations/sec over a 20k-row
scenario batch) against the reference's measured ~815/s single-core calculus
(BASELINE.md §B).
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# every registered query runs; these are just reported first
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q10_returned_items",
    "q_supplier_stats",
    "q_tumble_window",
    "q_topk_per_group",
    "q_sessionization",
    "q_dedup_jaccard_pairs",
    "q_emb_cosine_topk",
    "q_text_token_stats",
]


def main() -> int:
    from flink_estimator_spark.plans import QUERIES
    from flink_estimator_spark.session import get_spark

    spark = get_spark(app_name="bench")
    sf = None
    base = os.path.basename(SF_DIR.rstrip("/"))
    if base.startswith("sf"):
        try:
            sf = float(base[2:])
        except ValueError:
            sf = None

    # warm the JVM + parquet footers with a trivial action
    from flink_estimator_spark.sources import load_tables

    for df in load_tables(spark, SF_DIR).values():
        df.take(1)

    # min of two runs per query: first-run cost on this box is dominated by
    # plan analysis + janino codegen + scheduler warm-up with 2-4x variance
    # (SCALE.md §7b), which says nothing about how the plan behaves on a
    # cluster; the warm run is the steady-state signal.  Labeled in the
    # output ("timing": "min_of_2") so rounds are compared like-for-like.
    # Variance control (VERDICT r5 item 5): entries whose best exceeds 2 s
    # get a THIRD run, and BENCH_DETAIL records every run plus the
    # max/min spread per query — a >1.5x cross-round mover with a large
    # same-process spread is noise, not a plan regression.
    timings: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    spreads: dict[str, float] = {}
    # Wall-clock offset (sec since bench start) per query: cross-round
    # movers that are CONTIGUOUS in t_off point to an external contention
    # window on the bench box (the r6 driver ledger's q_rfm/q_rolling/
    # q_running movers were adjacent ledger slots), not a plan regression.
    t_offs: dict[str, float] = {}
    bench_t0 = time.perf_counter()

    # Canary TIMELINE (VERDICT r8 item 4): the 20k-scenario estimator
    # batch is a fixed CPU-bound workload, so its throughput labels the
    # box's hotness AT A MOMENT.  Run it at bench start, every
    # CANARY_EVERY entries, and at the end; BENCH_DETAIL records the
    # timeline plus each query's nearest canary eps, so a contention
    # window is adjudicable from one ledger (eps-normalized ratios by
    # tool, not by cross-round judge forensics).  Timeline canaries are
    # NOT added to timings/total — the final run stays the headline
    # estimator_eps, like-for-like with prior rounds.
    from flink_estimator_spark.estimator import Scenario, estimate_df, scenario_schema
    from tests.scenarios import random_scenarios

    rows = []
    base_cases = random_scenarios(200, seed=11)
    for i in range(20_000):
        kw = dict(base_cases[i % len(base_cases)])
        kw["project_name"] = f"s{i}"
        s = Scenario(**kw)
        rows.append(tuple(getattr(s, f.name) for f in scenario_schema.fields))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_part = int(cpus) if cpus.isdigit() else 32
    sdf = spark.createDataFrame(rows, scenario_schema).repartition(n_part)
    sdf.count()  # materialize the repartition outside every timed window
    estimate_df(sdf).count()  # warm the canary path itself (codegen +
    # Arrow worker spin-up) so the START timeline point measures the box,
    # not cold-start — an unwarmed first point read 9.2k on an idle box
    # and made box_hot_any unconditionally true

    canary_timeline: list[dict] = []

    def run_canary() -> float:
        t0 = time.perf_counter()
        n = estimate_df(sdf).count()
        sec = time.perf_counter() - t0
        eps = round(n / sec, 1)
        canary_timeline.append(
            {"t_off": round(time.perf_counter() - bench_t0, 1), "eps": eps}
        )
        return eps

    CANARY_EVERY = 40
    run_canary()  # start-of-bench point

    order = HEADLINE + sorted(n for n in QUERIES if n not in HEADLINE)
    for qi, name in enumerate(order):
        spec = QUERIES.get(name)
        if spec is None:
            continue
        if qi and qi % CANARY_EVERY == 0:
            run_canary()
        runs: list[float] = []
        t_offs[name] = round(time.perf_counter() - bench_t0, 1)
        try:
            for _ in range(2):
                t0 = time.perf_counter()
                spec.builder(spark, SF_DIR).count()
                runs.append(time.perf_counter() - t0)
            if min(runs) > 2.0:  # slow entry: one more sample for spread
                t0 = time.perf_counter()
                spec.builder(spark, SF_DIR).count()
                runs.append(time.perf_counter() - t0)
            timings[name] = round(min(runs), 3)
            all_runs[name] = [round(r, 3) for r in runs]
            spreads[name] = round(max(runs) / min(runs), 2)
        except Exception as exc:  # a failing query is a benchmark failure
            print(f"FAIL {name}: {exc}", file=sys.stderr)
            timings[name] = -1.0
        # belt-and-braces since round 4: operators no longer pin RDDs
        # (plans._helpers.eager_checkpoint + finally-released loop caches,
        # enforced by tests/test_cache_hygiene.py), but clearing BETWEEN
        # queries keeps the bench isolated from any future regression —
        # the r3 drift investigation measured late-position queries 3-5x
        # their fresh-JVM cost when storage accumulated.
        spark.catalog.clearCache()

    # Plane-A estimator throughput: the END-of-bench canary is the
    # headline estimator_eps (same workload + position as prior rounds)
    t0 = time.perf_counter()
    estimator_eps = run_canary()
    timings["plane_a_estimator_20k"] = round(
        time.perf_counter() - t0, 3
    )

    # nearest canary point per query (by wall-clock offset): the
    # eps-normalization input for cross-round mover adjudication
    canary_eps: dict[str, float] = {}
    for name, toff in t_offs.items():
        nearest = min(canary_timeline, key=lambda c: abs(c["t_off"] - toff))
        canary_eps[name] = nearest["eps"]

    total = round(sum(v for v in timings.values() if v > 0), 3)
    failed = sorted(k for k, v in timings.items() if v < 0)
    # Full per-query map goes to a repo file; the stdout line carries only
    # the slowest 10 so it fits the driver's stdout-tail capture window
    # (r1/r2 both ended with `parsed: null` because the 117-entry map pushed
    # the line past the window — R2_NOTES.md).
    # Hotness canary (VERDICT r6 item 6): the estimator batch is a fixed
    # CPU-bound workload, so its throughput labels the box — clean builder
    # ledgers measure 21.8-23.3k est/s; under ~20k the box was loaded and
    # per-query movers should be read against the t_off adjacency map
    # before any plan hunt.
    box_hot = estimator_eps < 20_000
    # any-window hotness: true if ANY timeline point dipped below the
    # clean-box floor (box_hot keeps its r6 semantics — final point only)
    box_hot_any = any(c["eps"] < 20_000 for c in canary_timeline)
    detail = {
        "sf": sf,
        "timing": "min_of_2_plus_third_if_over_2s",
        "queries": timings,
        "runs": all_runs,
        "spread": spreads,
        "t_off": t_offs,
        "estimator_eps": estimator_eps,
        "canary_timeline": canary_timeline,
        "canary_eps": canary_eps,
        "box_hot": box_hot,
        "box_hot_any": box_hot_any,
        "total_sec": total,
        "failed": failed,
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_DETAIL.json"), "w") as fh:
        json.dump(detail, fh, indent=1, sort_keys=True)
    slowest = dict(sorted(((k, v) for k, v in timings.items() if v > 0),
                          key=lambda kv: -kv[1])[:10])
    out = {
        "metric": "total_runtime_all_declared_queries",
        "value": total,
        "unit": "sec",
        "timing": "min_of_2_plus_third_if_over_2s",
        "queries": slowest,
        "sf": sf,
        "estimator_eps": estimator_eps,
        "box_hot": box_hot,
        "n_queries": len(timings),
        "n_failed": len(failed),
        "detail": "BENCH_DETAIL.json",
    }
    # the JSON line is the contract: flush stderr first and lead with a
    # newline so the line stays intact even if some library left an
    # unterminated line on a merged stream
    sys.stderr.flush()
    sys.stdout.flush()
    sys.stdout.write("\n" + json.dumps(out) + "\n")
    sys.stdout.flush()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
