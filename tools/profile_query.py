"""Profile declared queries: warm per-query timings + formatted plans.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/profile_query.py \
        q_theta_setops q_pagerank_parts [--noop] [--runs 3] [--plans-dir plans/r09]

Times each named query with ``.count()`` (the bench's action) and, with
``--noop``, also with the noop sink (guide §1.4: computes every column).
Writes ``<plans-dir>/<query>_<tag>.txt`` with ``explain('formatted')``
when ``--plans-dir`` is given — captured AFTER an action has run, so AQE
shows the FINAL plan (isFinalPlan=true: AQEShuffleRead coalescing, runtime
join rewrites, ReusedExchange) rather than the static initial plan (r9
VERDICT item 9).  Refuses to overwrite an existing capture unless --force
is given (ADVICE r9: a forgotten --tag silently destroyed before-plans).
Prints one line per (query, action, run).
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--force", action="store_true",
                    help="overwrite an existing <query>_<tag>.txt capture")
    args = ap.parse_args()

    from flink_estimator_spark.plans import QUERIES
    from flink_estimator_spark.session import get_spark
    from flink_estimator_spark.sources import load_tables

    spark = get_spark(app_name="profile")
    for df in load_tables(spark, SF_DIR).values():
        df.take(1)

    for name in args.queries:
        spec = QUERIES.get(name)
        if spec is None:
            print(f"SKIP {name}: not registered")
            continue
        spark.sparkContext.setJobDescription(name)
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            out_path = os.path.join(args.plans_dir, f"{name}_{args.tag}.txt")
            if os.path.exists(out_path) and not args.force:
                print(f"REFUSE {name}: {out_path} exists (pass --force)")
                continue
            df = spec.builder(spark, SF_DIR)
            # run an action on THIS DataFrame's own queryExecution first so
            # explain() shows the AQE FINAL plan (isFinalPlan=true with
            # AQEShuffleRead / runtime join rewrites / ReusedExchange) —
            # .count() would execute a separate aggregate plan and leave
            # df's own AdaptiveSparkPlan unexecuted
            df.collect()
            spark.catalog.clearCache()
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(out_path, "w") as fh:
                fh.write(buf.getvalue())
        for _ in range(args.runs):
            t0 = time.perf_counter()
            spec.builder(spark, SF_DIR).count()
            print(f"{name} count {time.perf_counter() - t0:.3f}s", flush=True)
            spark.catalog.clearCache()
        if args.noop:
            for _ in range(args.runs):
                t0 = time.perf_counter()
                (
                    spec.builder(spark, SF_DIR)
                    .write.format("noop")
                    .mode("overwrite")
                    .save()
                )
                print(
                    f"{name} noop  {time.perf_counter() - t0:.3f}s", flush=True
                )
                spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
