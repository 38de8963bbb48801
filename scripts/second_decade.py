"""Second-decade scale sweep (gen-sf1 → sf3 → sf10) for named queries.

Usage: python scripts/second_decade.py name[,name...] [--no-sf10]

For each query and scale dir: min-of-2 noop-sink walls (full plan, no
driver collect — bench.py convention) plus ONE untimed count() for the
output cardinality, so the artifact separates plan-bound growth from
output-bound growth (a wall exponent alone cannot). Merges rows into
scale_second_decade.json, preserving existing rows and notes; records
the host calibration of this window per merged row.

sf10 is attempted only when the sf3 wall is under 100 s (or forced off
with --no-sf10) — on output-bound emitters the sf10 run is hours of
wall that only re-measures emission (see the r11 embedding-cosine
omission note).
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

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "scale_second_decade.json")
SF_DIRS = [(1, ".scale/gen-sf1"), (3, ".scale/gen-sf3"), (10, ".scale/gen-sf10")]


def main() -> int:
    names = sys.argv[1].split(",")
    no_sf10 = "--no-sf10" in sys.argv[2:]
    spark = get_spark("second-decade")
    qs = load_all()
    prior = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            prior = json.load(f)
    calib = bench._host_calibration(spark)
    print(f"calibration: {calib}", flush=True)
    for name in names:
        row: dict = {}
        skip_rest = False
        for sf, rel in SF_DIRS:
            if skip_rest:
                break
            if sf == 10 and (no_sf10 or row.get("t_sf3", 1e9) > 100):
                row[f"sf10_omitted"] = (
                    f"sf3 wall {row.get('t_sf3')}s > 100s budget — "
                    "output-bound regime already established"
                )
                break
            sf_dir = os.path.join(ROOT, rel)
            # footer/JVM warm per scale
            qs["q1_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                qs[name].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            rows = qs[name].fn(spark, sf_dir).count()
            row[f"t_sf{sf}"] = round(best, 3)
            row[f"rows_sf{sf}"] = rows
            print(f"sf{sf} {name:32s} {best:9.3f}s rows={rows}", flush=True)
        for a, b in ((1, 3), (3, 10), (1, 10)):
            ta, tb = row.get(f"t_sf{a}"), row.get(f"t_sf{b}")
            ra, rb = row.get(f"rows_sf{a}"), row.get(f"rows_sf{b}")
            span = math.log10(b / a)
            if ta and tb:
                row[f"exp_{a}_{b}"] = round(math.log10(tb / ta) / span, 3)
            if ra and rb:
                row[f"rows_exp_{a}_{b}"] = round(math.log10(rb / ra) / span, 3)
        row["calibration_matmul"] = calib.get("matmul_sec")
        prior[name] = row
        # persist after EVERY query: a crash in query k must not lose
        # the walls already paid for queries 1..k-1
        with open(OUT, "w") as f:
            json.dump(prior, f, indent=1)
            f.write("\n")
        print(f"wrote {OUT} (+{name})", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
