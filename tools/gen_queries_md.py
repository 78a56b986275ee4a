"""Regenerate QUERIES.md from the live registry: `python tools/gen_queries_md.py`."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_estimator_spark.plans import QUERIES  # noqa: E402


def main() -> None:
    rows = []
    for name, spec in QUERIES.items():
        tags = ",".join(spec.tags or ())
        oracle = "DuckDB oracle" if spec.oracle else "rows-only"
        desc = (spec.description or "").split("\n")[0].strip()
        if len(desc) > 110:
            desc = desc[:107] + "..."
        rows.append((name, oracle, tags, desc))
    n_oracle = sum(1 for r in rows if r[1] == "DuckDB oracle")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "QUERIES.md")
    with open(out, "w") as f:
        f.write("# Query inventory (generated — do not edit)\n\n")
        f.write(
            f"{len(rows)} registered queries ({n_oracle} with DuckDB oracles, "
            f"{len(rows) - n_oracle} rows-only); regenerate with "
            "`python tools/gen_queries_md.py`.\n\n"
        )
        f.write("| query | gate check | tags | summary |\n|---|---|---|---|\n")
        for r in sorted(rows):
            f.write("| `%s` | %s | %s | %s |\n" % r)
    print(f"wrote {out}: {len(rows)} queries")


if __name__ == "__main__":
    main()
