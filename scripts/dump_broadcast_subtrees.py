"""One-off triage helper: print 4 subtree lines under every flagged
BroadcastExchange of every allowlisted query, for classification.

Usage: python scripts/dump_broadcast_subtrees.py [sf_dir] > /tmp/dump.txt
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arrow_spark import get_spark
from arrow_spark.queries import load_all
from arrow_spark.testing.broadcast_audit import _indent, audit_plan_text, load_allowlist
from arrow_spark.testing.planfp import plan_text


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("broadcast-dump")
    qs = load_all()
    allow = load_allowlist()
    for name in sorted(allow):
        plan = plan_text(qs[name].fn(spark, sf_dir))
        lines = plan.splitlines()
        k = 0
        for i, ln in enumerate(lines):
            if "BroadcastExchange" not in ln:
                continue
            ind = _indent(ln)
            sub = []
            for nxt in lines[i + 1:]:
                if nxt.strip() and _indent(nxt) <= ind:
                    break
                if nxt.strip():
                    sub.append(nxt)
            if not any("Generate" in s or "HashAggregate" in s or "SortAggregate" in s for s in sub):
                continue
            k += 1
            print(f"\n== {name} #{k}")
            for s in sub[:5]:
                print("   " + re.sub(r"#\d+L?", "#", s.strip())[:170])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
