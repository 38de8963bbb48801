"""Generate deterministic fixture-compatible scale directories.

Usage: python scripts/gen_scale_data.py [sf ...]   (default: 0.01 0.1 1.0)

Writes /root/repo/.scale/gen-sf{sf}/{table}.parquet (directories of part
files — the layout a real cluster writes; both the Spark engine and the
DuckDB oracle harness read them). The 8 TPC-H tables come from
arrow_spark.sources.tpchgen (tpch_node.cc parity); events/documents/
embeddings from arrow_spark.sources.scalegen (fixture-shape parity).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arrow_spark import get_spark
from arrow_spark.sources.scalegen import write_scale_dir


def main() -> int:
    sfs = [float(a) for a in sys.argv[1:]] or [0.01, 0.1, 1.0]
    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale"
    )
    spark = get_spark("scale-gen")
    for sf in sfs:
        tag = ("%g" % sf)
        out = os.path.join(root, f"gen-sf{tag}")
        t0 = time.time()
        write_scale_dir(spark, sf, out)
        print(f"gen-sf{tag}: wrote {out} in {time.time() - t0:.1f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
