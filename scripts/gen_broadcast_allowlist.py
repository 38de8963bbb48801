"""(Re)generate tests/data/broadcast_allowlist.json — the committed,
human-classified allowlist behind tests/test_broadcast_gate.py.

Runs the round-11 broadcast-hazard audit (arrow_spark.testing.
broadcast_audit) over every registered query at the test fixture scale
and writes one entry per (query, flag signature) with its multiplicity.
NEW entries get ``"why": "UNCLASSIFIED"`` — the gate test REJECTS
unclassified entries, so after regenerating you must replace each new
placeholder with a bounded-side justification (or fix the plan).
Existing classifications are preserved by (query, sig) key.

Usage: python scripts/gen_broadcast_allowlist.py [sf_dir] [name ...]
"""

from __future__ import annotations

import json
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arrow_spark import get_spark
from arrow_spark.queries import load_all
from arrow_spark.testing.broadcast_audit import allowlist_path, signatures
from arrow_spark.testing.planfp import plan_text


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    only = set(args[1:])
    spark = get_spark("broadcast-allowlist")
    qs = load_all()
    old: dict = {}
    if os.path.exists(allowlist_path()):
        with open(allowlist_path()) as f:
            old = json.load(f)
    out: dict = {} if not only else dict(old)
    n_new = 0
    for name, qd in sorted(qs.items()):
        if only and name not in only:
            continue
        sigs = Counter(signatures(plan_text(qd.fn(spark, sf_dir))))
        if not sigs:
            out.pop(name, None)
            continue
        prior = {e["sig"]: e for e in old.get(name, [])}
        entries = []
        for sig, n in sorted(sigs.items()):
            why = prior.get(sig, {}).get("why", "UNCLASSIFIED")
            if why == "UNCLASSIFIED":
                n_new += 1
            entries.append({"sig": sig, "count": n, "why": why})
        out[name] = entries
    with open(allowlist_path(), "w") as f:
        json.dump(dict(sorted(out.items())), f, indent=1)
        f.write("\n")
    total = sum(e["count"] for v in out.values() for e in v)
    print(f"wrote {allowlist_path()}: {len(out)} queries, {total} flags, "
          f"{n_new} UNCLASSIFIED (classify before committing)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
