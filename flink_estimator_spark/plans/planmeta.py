"""Physical-plan shape metrics — shared by tools/gen_plans_md.py (which
writes PLANS.md) and tests/test_plan_metrics.py (the regression tripwire
that fails when a code change alters a query's exchange/broadcast/python
profile without a regenerated PLANS.md).
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame

METRIC_COLS = ("scans", "pushed", "exchanges", "broadcasts", "codegen", "python")


def plan_text(df: DataFrame, mode: str) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def metrics(df: DataFrame) -> dict[str, object]:
    """Static plan-shape counters.  Callers must run with AQE disabled:
    AQE defers codegen planning to runtime ("Found 0 subtrees" before
    execution), and the static plan is the declared strategy this artifact
    documents."""
    fmt = plan_text(df, "formatted")
    # formatted output prints every node twice (tree + details): count
    # unique node ids per node type instead of raw matches
    nodes: dict[str, set[str]] = {}
    for nid, typ in re.findall(r"\((\d+)\)\s+(\w[\w ]*?)(?:\s*$|\s{2})", fmt, re.M):
        nodes.setdefault(typ.strip(), set()).add(nid)

    def n(typ: str) -> int:
        return len(nodes.get(typ, set()))

    cg = plan_text(df, "codegen")
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", cg)
    codegen = int(m.group(1)) if m else 0
    python = sum(
        n(t)
        for t in nodes
        if re.search(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas"
                     r"|BatchEvalPython|PythonUDTF|MapGroupsInPandas", t)
    )
    return {
        "scans": sum(n(t) for t in nodes if t.startswith("Scan parquet")),
        "pushed": "yes" if re.search(r"PushedFilters: \[[^\]]", fmt) else "-",
        "exchanges": n("Exchange"),
        "broadcasts": n("BroadcastExchange"),
        "codegen": codegen,
        "python": python,
    }


def parse_plans_md(path: str) -> dict[str, dict[str, object]]:
    """Read the committed PLANS.md table back into {query: metrics}."""
    out: dict[str, dict[str, object]] = {}
    with open(path) as f:
        for line in f:
            m = re.match(r"\| `(\w+)` \| (.+) \|$", line.strip())
            if not m:
                continue
            cells = [c.strip() for c in m.group(2).split("|")]
            if len(cells) != 6:
                continue
            row: dict[str, object] = {}
            for k, v in zip(METRIC_COLS, cells):
                row[k] = v if k == "pushed" or not v.isdigit() else int(v)
            out[m.group(1)] = row
    return out
