"""Deterministic scale-parameterized graph generator for operator-level
scale evidence.

The REGISTERED graph queries are fixture-shaped: their node domain is
the events fixture's ``props.k`` ∈ [0, 100), so however many events are
scanned, the transition graph tops out at 100 nodes / 4,950 undirected
pairs — they verify operator CORRECTNESS against the DuckDB oracle, but
their joins never grow. Operator-level scale rows need a graph whose
EDGE set grows with the scale knob; this module generates one.

G(N, E) uniform multigraph, one shuffle total: edge i draws (src, dst)
from two seeded xxhash64 streams over ``spark.range(n_edges)``
(linear, partition-parallel, deterministic per Spark version — these
frames feed perf measurements, not oracles, so cross-engine hash
portability is not required; use functions/portable_hash.py when it
is). Self-loops are dropped; parallel draws collapse into an integer
weight ``w`` — the (src, dst[, w]) contract every operator in
``operators/{pagerank,labelprop,kcore,ktruss,shortest_paths,
triangles}.py`` consumes. With ``n_nodes = n_edges // avg_degree`` the
expected simple-edge count stays ≈ ``n_edges`` (collision loss < 1%
at the default degree), so the scale knob is honest.

Reference anchor: the reference ships no graph generator either — its
benchmarks generate inputs adjacent to the kernel under test
(cpp/src/arrow/acero/benchmark_util.cc posture); same idea here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def uniform_edges(
    spark: SparkSession,
    n_edges: int,
    n_nodes: int | None = None,
    seed: int = 7,
    avg_degree: int = 20,
) -> DataFrame:
    """(src, dst, w) uniform random directed multigraph, collapsed to
    weighted simple edges. ``n_nodes`` defaults to
    ``2 * n_edges // avg_degree`` (undirected average degree ≈
    ``avg_degree``)."""
    if n_nodes is None:
        n_nodes = max(2 * n_edges // avg_degree, 2)
    i = F.col("id")
    src = F.pmod(F.xxhash64(i, F.lit(seed)), F.lit(n_nodes))
    dst = F.pmod(F.xxhash64(i, F.lit(seed + 1)), F.lit(n_nodes))
    return (
        spark.range(n_edges)
        .select(src.alias("src"), dst.alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
