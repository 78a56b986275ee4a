"""Command-line entry point: ``python -m flink_estimator_spark``.

The reference ships a FastAPI app a user drives over HTTP
(`/root/reference/src/main.py`); the Spark-first equivalent of "just run
it" is a CLI over the same two planes:

    python -m flink_estimator_spark list [--tag llm]
    python -m flink_estimator_spark run q1_pricing_summary \
        [--sf /root/testdata/sf0.001] [--limit 20] [--explain]
    python -m flink_estimator_spark oracle q1_pricing_summary
    python -m flink_estimator_spark estimate '{"project_name": "demo", \
        "worker_node_type": "VM", "worker_node_t_size": "S"}'

``list``, ``oracle``, and ``estimate`` never start a JVM; ``run`` builds
one local session via the shared factory.
"""

from __future__ import annotations

import argparse
import json
import sys

DEFAULT_SF = "/root/testdata/sf0.001"


def _cmd_list(args) -> int:
    from .plans import QUERIES

    for name in sorted(QUERIES):
        spec = QUERIES[name]
        if args.tag and args.tag not in spec.tags:
            continue
        mark = "oracle" if spec.oracle else "rows-only"
        head = (spec.description or "").strip().splitlines()
        print(f"{name:32s} [{mark}] {head[0] if head else ''}")
    return 0


def _cmd_oracle(args) -> int:
    from .plans import QUERIES

    spec = QUERIES.get(args.query)
    if spec is None:
        print(f"unknown query: {args.query}", file=sys.stderr)
        return 2
    if not spec.oracle:
        print(f"{args.query} is rows-only (no SQL oracle)", file=sys.stderr)
        return 1
    print(spec.oracle.strip())
    return 0


def _cmd_run(args) -> int:
    from .plans import QUERIES

    spec = QUERIES.get(args.query)
    if spec is None:
        print(f"unknown query: {args.query}", file=sys.stderr)
        return 2
    from .session import get_spark

    spark = get_spark(app_name=f"cli:{args.query}")
    df = spec.builder(spark, args.sf)
    if args.explain:
        df.explain("formatted")
        return 0
    df.show(args.limit, truncate=False)
    return 0


def _cmd_estimate(args) -> int:
    from .estimator import Scenario, estimate_scenario

    payload = json.loads(args.scenario)
    result = estimate_scenario(Scenario(**payload))
    print(json.dumps(result, indent=2, default=str))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="python -m flink_estimator_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    lp = sub.add_parser("list", help="list registered queries")
    lp.add_argument("--tag", help="filter by tag")
    lp.set_defaults(fn=_cmd_list)

    op = sub.add_parser("oracle", help="print a query's DuckDB oracle SQL")
    op.add_argument("query")
    op.set_defaults(fn=_cmd_oracle)

    rp = sub.add_parser("run", help="run a query on a fixture directory")
    rp.add_argument("query")
    rp.add_argument("--sf", default=DEFAULT_SF, help="fixture dir")
    rp.add_argument("--limit", type=int, default=20)
    rp.add_argument("--explain", action="store_true",
                    help="print the physical plan instead of rows")
    rp.set_defaults(fn=_cmd_run)

    ep = sub.add_parser("estimate", help="one-shot Plane-A sizing estimate")
    ep.add_argument("scenario", help="Scenario fields as a JSON object")
    ep.set_defaults(fn=_cmd_estimate)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
