"""Audit every registered query's physical plan for corpus-scale
broadcast hazards (the round-11 excise-OOM class of bug).

Rubric (SCALE.md round-11): a BroadcastExchange is safe exactly when
the build side's size ESTIMATE tracks the data — scan-derived frames
and constant-fan-out explodes qualify; frames derived from aggregates
(distinct grams, dfs, collect_list postings) or data-dependent
explodes (sequence over interval lengths, shingle fan-out) do not,
because Catalyst's estimate is unrelated to their true size and the
broadcast never auto-disables as the corpus grows.

This script flags the textual SIGNATURE (a BroadcastExchange whose
subtree contains Generate or an ObjectHashAggregate/collect_list) and
prints the first operator under each flagged exchange so a human can
classify it bounded vs corpus-scale. It is a triage tool, not a gate:
constant-fan-out explodes and query-side frames flag as false
positives by design — the point is that every flag gets LOOKED AT.

Usage: python scripts/audit_broadcasts.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arrow_spark import get_spark
from arrow_spark.queries import load_all


def subtree_flags(lines: list[str], i: int) -> list[str]:
    ln = lines[i]
    ind = len(ln) - len(ln.lstrip(" +-:"))
    hits = []
    for nxt in lines[i + 1:]:
        nind = len(nxt) - len(nxt.lstrip(" +-:"))
        if nxt.strip() and nind <= ind:
            break
        if "Generate" in nxt:
            hits.append("explode")
        if "collect_list" in nxt or "ObjectHashAggregate" in nxt:
            hits.append("collect_list")
    return sorted(set(hits))


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = get_spark("broadcast-audit")
    qs = load_all()
    n_flag = n_err = 0
    for name, qd in sorted(qs.items()):
        if only and name not in only:
            continue
        try:
            plan = qd.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:60]}")
            n_err += 1
            continue
        lines = plan.splitlines()
        for i, ln in enumerate(lines):
            if "BroadcastExchange" not in ln:
                continue
            hits = subtree_flags(lines, i)
            if hits:
                below = next(
                    (x.strip()[:100] for x in lines[i + 1: i + 3] if x.strip()), ""
                )
                print(f"FLAG {name} [{','.join(hits)}] -> {below}")
                n_flag += 1
    print(f"\nflags: {n_flag}, errors: {n_err} (each flag needs a bounded/corpus-scale classification)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
