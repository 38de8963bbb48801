"""Regenerate tests/data/plan_fingerprints.json — run after an
INTENTIONAL plan change and review the JSON diff in the commit.

Usage: python scripts/gen_plan_fp.py [names...]
(no names = every registered query; named mode patches only those keys)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arrow_spark import get_spark
from arrow_spark.queries import load_all
from arrow_spark.testing.planfp import baseline_path, fingerprint

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark("gen-plan-fp")
    queries = load_all()
    path = baseline_path()
    if names and os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
    else:
        out = {}
    targets = names or sorted(queries)
    for name in targets:
        try:
            out[name] = fingerprint(queries[name].fn(spark, SF_DIR))
            print(f"ok   {name}")
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"SKIP {name}: {type(e).__name__}: {e}")
            out.pop(name, None)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(dict(sorted(out.items())), f, indent=1, sort_keys=True)
    print(f"wrote {len(out)} fingerprints -> {path}")


if __name__ == "__main__":
    main()
