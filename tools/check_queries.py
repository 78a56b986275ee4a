"""Ad-hoc single-query parity checker (developer loop; the real gate replica
is tests/test_oracle_parity.py).  Usage:

    python tools/check_queries.py q_quality_classifier q_dsir_select [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_estimator_spark.plans import QUERIES  # noqa: E402
from flink_estimator_spark.session import get_spark  # noqa: E402
from flink_estimator_spark.sources import TABLES  # noqa: E402


def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])

    def key(row):
        out = []
        for i in idx:
            v = row[i]
            if isinstance(v, float):
                out.append(("f", repr(v)))
            elif v is None:
                out.append(("n", ""))
            else:
                out.append(("x", str(v)))
        return tuple(out)

    return sorted(key(r) for r in rows)


def main() -> int:
    names = [a for a in sys.argv[1:] if a.startswith("q")]
    sf_dir = next((a for a in sys.argv[1:] if a.startswith("/")),
                  "/root/testdata/sf0.001")
    spark = get_spark()
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    bad = 0
    for name in names:
        spec = QUERIES[name]
        t0 = time.time()
        sdf = spec.builder(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        t1 = time.time()
        if not spec.oracle:
            print(f"{name}: rows-only, {len(srows)} rows, {t1-t0:.2f}s")
            continue
        ores = con.execute(spec.oracle)
        orows = ores.fetchall()
        ocols = [d[0] for d in ores.description]
        ok_cols = sorted(scols) == sorted(ocols)
        ok_rows = len(srows) == len(orows)
        ok_vals = canon(srows, scols) == canon(orows, ocols)
        status = "OK" if (ok_cols and ok_rows and ok_vals) else "MISMATCH"
        if status != "OK":
            bad += 1
        print(
            f"{name}: {status} spark={len(srows)} oracle={len(orows)} "
            f"cols={'ok' if ok_cols else f'{sorted(scols)} vs {sorted(ocols)}'} "
            f"{t1-t0:.2f}s"
        )
        if not ok_vals and ok_cols and ok_rows:
            a, b = canon(srows, scols), canon(orows, ocols)
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            for x, y in diffs:
                print("  spark :", x)
                print("  oracle:", y)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
