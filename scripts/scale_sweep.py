"""Scaling-exponent sweep: time the bench HEADLINE queries at several
generated scale factors and report per-query exponents.

Usage: python scripts/scale_sweep.py [out_json] [only,names]

Runs every bench.HEADLINE query through the noop sink (full plan, no
driver collect — bench.py convention, min of 2 runs) at each
.scale/gen-sf{0.1,1} directory, then fits the observed exponent
e = log10(t_sf1 / t_sf0.1): e ≈ 1 is linear scaling, e ≈ 2 quadratic
(output-bound all-pairs emission), e < 1 sublinear (fixed overheads
still dominate at these sizes). Writes {query: {t_sf0.1, t_sf1, exp}}
plus the host calibration to ``out_json`` (default scale_sweep.json —
committed as the round's scale artifact).

The two dirs come from the SAME generator (scripts/gen_scale_data.py),
so the ratio measures data growth, not distribution drift vs the driver
fixtures.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from arrow_spark import get_spark
from arrow_spark.queries import load_all

SF_DIRS = [(0.1, ".scale/gen-sf0.1"), (1.0, ".scale/gen-sf1")]


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        root, "scale_sweep.json"
    )
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    # default sweep = the bench headliners; an explicit only-list may
    # name ANY registered query (e.g. the emission-guarded production
    # variants that aren't headliners)
    if only is None:
        names = list(bench.HEADLINE)
    else:
        names = [n for n in bench.HEADLINE if n in only] + sorted(
            only - set(bench.HEADLINE)
        )
    spark = get_spark("scale-sweep")
    qs = load_all()
    results: dict[str, dict] = {n: {} for n in names}
    for sf, rel in SF_DIRS:
        sf_dir = os.path.join(root, rel)
        if not os.path.isdir(sf_dir):
            print(f"missing {sf_dir} — run scripts/gen_scale_data.py first")
            return 1
        # warm JVM + footer caches per scale
        qs["q1_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        for name in names:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                qs[name].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            results[name][f"t_sf{sf:g}"] = round(best, 3)
            print(f"sf{sf:g} {name:36s} {best:8.3f}s", flush=True)
    for name, row in results.items():
        t0, t1 = row.get("t_sf0.1"), row.get("t_sf1")
        if t0 and t1 and t0 > 0:
            row["exp"] = round(math.log10(t1 / t0), 3)
    calib = bench._host_calibration(spark)
    # Partial sweeps MERGE into an existing artifact instead of
    # clobbering it: the re-swept rows replace their old values (tagged
    # with this run's calibration so cross-row comparisons stay honest),
    # every other row is preserved.
    out = {"queries": results, "calibration": calib}
    if only is not None and os.path.exists(out_path):
        with open(out_path) as f:
            prior = json.load(f)
        for name, row in results.items():
            row["calibration_matmul"] = calib.get("matmul_sec")
        merged = dict(prior.get("queries", {}))
        merged.update(results)
        out = {**prior, "queries": merged, "calibration_last_partial": calib}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
