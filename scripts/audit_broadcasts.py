"""Audit every registered query's physical plan for corpus-scale
broadcast hazards (the round-11 excise-OOM class of bug).

Rubric (SCALE.md round-11): a BroadcastExchange is safe exactly when
the build side's size ESTIMATE tracks the data — scan-derived frames
and constant-fan-out explodes qualify; frames derived from aggregates
(distinct grams, dfs, collect_list postings) or data-dependent
explodes (sequence over interval lengths, shingle fan-out) do not,
because Catalyst's estimate is unrelated to their true size and the
broadcast never auto-disables as the corpus grows.

This script prints each flagged exchange's signature (shared with the
committed regression gate — see arrow_spark/testing/broadcast_audit.py
and tests/test_broadcast_gate.py) plus its allowlist status, so a
human can classify new flags bounded vs corpus-scale. Constant-fan-out
explodes and query-side frames flag as false positives by design — the
point is that every flag gets LOOKED AT (then recorded in
tests/data/broadcast_allowlist.json via gen_broadcast_allowlist.py).

Usage: python scripts/audit_broadcasts.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arrow_spark import get_spark
from arrow_spark.queries import load_all
from arrow_spark.testing.broadcast_audit import (
    audit_plan_text,
    flag_signature,
    load_allowlist,
)
from arrow_spark.testing.planfp import plan_text


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = get_spark("broadcast-audit")
    qs = load_all()
    try:
        allow = load_allowlist()
    except FileNotFoundError:
        allow = {}
    n_flag = n_err = 0
    for name, qd in sorted(qs.items()):
        if only and name not in only:
            continue
        try:
            plan = plan_text(qd.fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:60]}")
            n_err += 1
            continue
        known = {e["sig"]: e["why"] for e in allow.get(name, [])}
        for f in audit_plan_text(plan):
            sig = flag_signature(f)
            status = known.get(sig, "*** NOT IN ALLOWLIST ***")
            print(f"FLAG {name} [{sig}] — {status}")
            n_flag += 1
    print(f"\nflags: {n_flag}, errors: {n_err} "
          "(every flag needs a bounded/corpus-scale classification)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
