"""Isolated steady-state series for one registered query — the q1
treatment from round 12, as a reusable instrument (VERDICT r12 ask #4:
dedup_minhash_lsh reads 1.87-1.89× vs r01 and needs a warm steady-state
adjudication, not another full-bench window).

Runs the query N times back-to-back in ONE session at the bench scale
(default /root/testdata/sf0.1, noop sink — bench.py's convention), with
the host calibration triple recorded before and after, and prints the
whole series: the first runs carry session warm-up (codegen/JIT tiers
decay over ~5 runs — measured in r12's q1 series), the tail IS the
steady state a long-running cluster session would see.

Usage: python scripts/steady_state_series.py <query> [n_runs] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from arrow_spark import get_spark
from arrow_spark.queries import load_all


def main() -> int:
    name = sys.argv[1]
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("steady-state")
    qs = load_all()
    calib_before = bench._host_calibration(spark)
    series = []
    for i in range(n_runs):
        t0 = time.perf_counter()
        qs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        series.append(round(time.perf_counter() - t0, 3))
        print(f"run {i + 1:2d}: {series[-1]:7.3f}s", flush=True)
    calib_after = bench._host_calibration(spark)
    tail = sorted(series[max(2, n_runs // 2):])
    out = {
        "query": name,
        "sf_dir": sf_dir,
        "series": series,
        "steady_state_min": min(series),
        "steady_state_median_tail": tail[len(tail) // 2],
        "calibration_before": calib_before,
        "calibration_after": calib_after,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
