"""Operator-level scale rows for the iterative graph family.

Usage: python scripts/graph_operator_scale.py [E,E,...] [only,names]

The registered graph queries are fixture-shaped (node domain =
``props.k`` ∈ [0,100)), so their loops join against at most 4,950
undirected pairs at ANY corpus size — fine for correctness, useless as
evidence that the stats-reset checkpoint loops survive real edge
cardinalities. This sweep runs each operator directly on
``sources/graphgen.uniform_edges`` graphs whose edge count is the scale
knob (default 1M and 10M simple edges), materialized to parquet first
so the measured wall is the operator, not the generator.

One timed run per (operator, E) — these are minutes-long iterative
jobs; the artifact records the host calibration instead of a min-of-2.
``pagerank_iter25`` re-runs pagerank at 25 iterations — ~10 past the
round count where the pre-r13 bare-localCheckpoint shape overflowed
BigInteger during planning (SCALE.md round-12) — so the row is the
direct "the fixed loop survives deep iteration at scale" witness.

Writes graph_operator_scale.json: {op: {E: {wall_sec, rows}},
calibration}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from arrow_spark import get_spark
from arrow_spark.sources.graphgen import uniform_edges

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "graph_operator_scale.json")


def _ops():
    from pyspark.sql import functions as F

    from arrow_spark.llm.dedup import connected_components
    from arrow_spark.operators.kcore import k_core, undirected_edges
    from arrow_spark.operators.ktruss import k_truss
    from arrow_spark.operators.labelprop import label_propagation
    from arrow_spark.operators.pagerank import pagerank
    from arrow_spark.operators.shortest_paths import shortest_paths
    from arrow_spark.operators.triangles import count_triangles

    def _sources(spark):
        return spark.range(10).select(F.col("id").alias("node"))

    return {
        "pagerank": lambda s, e: pagerank(e, n_iters=5),
        "pagerank_iter25": lambda s, e: pagerank(e, n_iters=25),
        "label_propagation": lambda s, e: label_propagation(e, n_iters=4),
        "k_core": lambda s, e: k_core(
            undirected_edges(e, "src", "dst"), k=15, rounds=5
        ),
        "k_truss": lambda s, e: k_truss(
            undirected_edges(e, "src", "dst"), k=3, rounds=2
        ),
        "shortest_paths": lambda s, e: shortest_paths(
            e, _sources(s), n_iters=4
        ),
        "count_triangles": lambda s, e: count_triangles(
            e, src="src", dst="dst", per_vertex=True
        ),
        "connected_components": lambda s, e: connected_components(
            e.select(F.col("src").alias("id_a"), F.col("dst").alias("id_b")),
            "id_a",
            "id_b",
        ),
    }


def main() -> int:
    scales = (
        [int(float(x)) for x in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else [1_000_000, 10_000_000]
    )
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    spark = get_spark("graph-operator-scale")
    ops = _ops()
    if only:
        ops = {k: v for k, v in ops.items() if k in only}
    prior = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            prior = json.load(f)
    calib = bench._host_calibration(spark)
    print(f"calibration: {calib}", flush=True)
    results = prior
    results["calibration"] = calib
    for n_edges in scales:
        path = os.path.join(ROOT, ".scale", f"graph-E{n_edges}", "edges.parquet")
        if not os.path.exists(path):
            uniform_edges(spark, n_edges).write.mode("overwrite").parquet(path)
        edges = spark.read.parquet(path)
        n_simple = edges.count()
        print(f"E={n_edges}: {n_simple} simple edges", flush=True)
        for name, fn in ops.items():
            t0 = time.perf_counter()
            out = fn(spark, edges)
            out.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            rows = fn(spark, edges).count()
            results.setdefault(name, {})[str(n_edges)] = {
                "wall_sec": round(wall, 2),
                "rows": rows,
            }
            print(f"E={n_edges} {name:22s} {wall:9.2f}s rows={rows}", flush=True)
            with open(OUT, "w") as f:
                json.dump(results, f, indent=1, sort_keys=True)
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
