"""(Re)generate rotation_candidates.json — the committed record of the
registry's verification-priority order (VERDICT r11 #6).

The driver samples a prefix of load_all's ordering each round; this
artifact makes that ordering inspectable bookkeeping: which queries are
stalest-green (the expected next rotation sample), which are new, which
are rows-only. ``rounds_seen`` records exactly which CORRECTNESS files
informed the ordering, so tests/test_registry_order.py can recompute
and verify the artifact from those same rounds even after the driver
writes a newer one (regenerate here each round alongside COVERAGE.md).

Usage: python scripts/gen_rotation_candidates.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arrow_spark.queries import _driver_verified, _rank_registry, load_all

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    load_all()  # fill REGISTRY
    rounds = sorted(
        int(m.group(1))
        for p in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)", os.path.basename(p)))
    )
    verified = _driver_verified()
    order = [
        {"name": name, "block": block, "last_green_round": last}
        for name, block, last in _rank_registry(verified)
    ]
    out = {"rounds_seen": rounds, "order": order}
    path = os.path.join(ROOT, "rotation_candidates.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    n50 = [e["name"] for e in order[:50]]
    print(f"wrote {path}: {len(order)} queries, rounds {rounds[0]}..{rounds[-1]}")
    print(f"expected next 50-slot sample head: {n50[:8]} ...")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
