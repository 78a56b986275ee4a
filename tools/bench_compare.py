"""Compare two BENCH_DETAIL.json ledgers with canary-eps normalization.

The r6-r8 verdicts each spent a forensic pass separating real plan
regressions from bench-box contention windows (t_off adjacency, second-box
replays, manual eps normalization).  With the canary TIMELINE in
BENCH_DETAIL (bench.py, round 9) that adjudication is mechanical: every
query has a nearest-in-time canary throughput, so a mover's ratio can be
re-stated at equal box speed.

    python tools/bench_compare.py OLD.json NEW.json [--threshold 1.5]

For each query present in both ledgers it reports

    raw_ratio   = t_new / t_old
    norm_ratio  = (t_new * eps_new) / (t_old * eps_old)

where eps_* is the query's nearest canary eps (falling back to the
ledger's headline estimator_eps for pre-timeline ledgers).  A fixed
CPU-bound workload's wall time scales ~inversely with effective box
throughput, so norm_ratio approximates the ratio ON A CLEAN BOX; movers
whose raw_ratio is large but norm_ratio ~1 are contention, not plans.
Queries whose min-of-N spread exceeds 1.5x in either ledger are tagged
noisy (same-process variance already explains them).

Output: one JSON object on stdout — {"movers": [...], "summary": {...}} —
movers sorted by norm_ratio descending, each entry carrying both ratios,
both eps values, t_offs, and the noise tag, so a verdict can cite rows
verbatim.
"""

from __future__ import annotations

import argparse
import json
import sys


def _eps_for(detail: dict, name: str, per_query: bool) -> float:
    """Canary eps for a query: nearest-in-time when ``per_query``, else
    the ledger's headline.  Granularity must match ACROSS ledgers — mixing
    one ledger's per-query eps with the other's single global value
    manufactures movers wherever the fine timeline diverges from the
    coarse average (measured: raw 0.9 ratios reported as norm 1.6 when an
    r8 global-eps ledger met an r9 timeline ledger), so the caller passes
    per_query=True only when BOTH ledgers carry canary_eps."""
    if per_query:
        eps = detail.get("canary_eps", {}).get(name)
        if eps:
            return float(eps)
    return float(detail.get("estimator_eps") or 0.0)


def _hot_window_flags(detail: dict) -> dict:
    """Per-query bool: did the query's nearest canary point read >15%
    below the ledger's own median timeline eps?  None per query when the
    ledger has no timeline (pre-r9)."""
    canary = detail.get("canary_eps") or {}
    timeline = detail.get("canary_timeline") or []
    if not canary or not timeline:
        return {}
    eps_values = sorted(c["eps"] for c in timeline)
    median = eps_values[len(eps_values) // 2]
    return {name: eps < 0.85 * median for name, eps in canary.items()}


def compare(old: dict, new: dict, threshold: float = 1.5) -> dict:
    rows = []
    shared = 0
    per_query = bool(old.get("canary_eps")) and bool(new.get("canary_eps"))
    hot_old = _hot_window_flags(old)
    hot_new = _hot_window_flags(new)
    for name, t_old in old.get("queries", {}).items():
        t_new = new.get("queries", {}).get(name)
        if t_new is None or t_old <= 0 or t_new <= 0:
            continue
        shared += 1
        eps_old = _eps_for(old, name, per_query)
        eps_new = _eps_for(new, name, per_query)
        raw = t_new / t_old
        norm = raw * (eps_new / eps_old) if eps_old and eps_new else None
        noisy = (
            old.get("spread", {}).get(name, 1.0) > 1.5
            or new.get("spread", {}).get(name, 1.0) > 1.5
        )
        rows.append(
            {
                "query": name,
                "t_old": t_old,
                "t_new": t_new,
                "raw_ratio": round(raw, 2),
                "norm_ratio": round(norm, 2) if norm is not None else None,
                "eps_old": eps_old or None,
                "eps_new": eps_new or None,
                "t_off_old": old.get("t_off", {}).get(name),
                "t_off_new": new.get("t_off", {}).get(name),
                "noisy_spread": noisy,
                # nearest timeline point sat >15% below the ledger's own
                # median throughput: the entry ran inside a contention
                # window and its raw ratio indicts the box, not the plan
                "hot_window_old": hot_old.get(name),
                "hot_window_new": hot_new.get(name),
            }
        )
    key = lambda r: r["norm_ratio"] if r["norm_ratio"] is not None else r["raw_ratio"]  # noqa: E731
    movers = sorted(
        (r for r in rows if key(r) >= threshold or key(r) <= 1 / threshold),
        key=key,
        reverse=True,
    )
    ratios = sorted(key(r) for r in rows)
    median = ratios[len(ratios) // 2] if ratios else None
    return {
        "summary": {
            "sf_old": old.get("sf"),
            "sf_new": new.get("sf"),
            "sf_mismatch": old.get("sf") != new.get("sf"),
            "eps_granularity": "per_query" if per_query else "global",
            "shared_queries": shared,
            "median_norm_ratio": median,
            "movers_over_threshold": sum(1 for r in movers if key(r) > 1),
            "movers_under_threshold": sum(1 for r in movers if key(r) < 1),
            "threshold": threshold,
            "old_box": {
                "estimator_eps": old.get("estimator_eps"),
                "box_hot": old.get("box_hot"),
                "box_hot_any": old.get("box_hot_any"),
            },
            "new_box": {
                "estimator_eps": new.get("estimator_eps"),
                "box_hot": new.get("box_hot"),
                "box_hot_any": new.get("box_hot_any"),
            },
        },
        "movers": movers,
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    args = ap.parse_args()
    with open(args.old) as f:
        old = json.load(f)
    with open(args.new) as f:
        new = json.load(f)
    if old.get("sf") != new.get("sf"):
        print(
            f"WARNING: ledgers are at different scale factors "
            f"({old.get('sf')} vs {new.get('sf')}) — ratios compare "
            f"workloads, not plans",
            file=sys.stderr,
        )
    json.dump(compare(old, new, args.threshold), sys.stdout, indent=1)
    sys.stdout.write("\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
