"""shortest_paths unit tests: hop distances, weights, direction, bounds."""

from __future__ import annotations

from arrow_spark.operators.shortest_paths import shortest_paths


def _run(spark, edge_rows, source_nodes, **kw):
    edges = spark.createDataFrame(edge_rows, "src long, dst long, w long")
    sources = spark.createDataFrame([(n,) for n in source_nodes], "node long")
    return {
        r["node"]: r["dist"]
        for r in shortest_paths(edges, sources, **kw).collect()
    }


def test_bfs_hops_path_graph(spark):
    # 1-2-3-4-5 chain from source 1: hop distance = position
    out = _run(spark, [(i, i + 1, 1) for i in range(1, 5)], [1], n_iters=4)
    assert out == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}


def test_bfs_bounded_rounds_leave_far_nodes_absent(spark):
    out = _run(spark, [(i, i + 1, 1) for i in range(1, 6)], [1], n_iters=2)
    assert out == {1: 0, 2: 1, 3: 2}  # 4,5,6 unreached in 2 rounds


def test_multi_source_takes_nearest(spark):
    # sources at both ends of a 6-chain: middle nodes take the closer one
    out = _run(spark, [(i, i + 1, 1) for i in range(1, 6)], [1, 6], n_iters=5)
    assert out == {1: 0, 2: 1, 3: 2, 4: 2, 5: 1, 6: 0}


def test_weighted_min_plus_prefers_cheap_detour(spark):
    # direct edge 1->4 costs 10; the 3-hop detour costs 3
    rows = [(1, 4, 10), (1, 2, 1), (2, 3, 1), (3, 4, 1)]
    out = _run(spark, rows, [1], n_iters=4, weight="w")
    assert out[4] == 3


def test_directed_respects_edge_direction(spark):
    out = _run(spark, [(1, 2, 1), (3, 2, 1)], [1], n_iters=3, directed=True)
    assert out == {1: 0, 2: 1}  # 3 only reaches 2, never reachable FROM 1


def test_undirected_symmetrizes(spark):
    out = _run(spark, [(2, 1, 1)], [1], n_iters=1)
    assert out == {1: 0, 2: 1}


def test_plan_no_cartesian(spark):
    edges = spark.createDataFrame(
        [(i, (i * 3) % 11, 1) for i in range(30)], "src long, dst long, w long"
    )
    sources = spark.createDataFrame([(0,), (1,)], "node long")
    plan = (
        shortest_paths(edges, sources, n_iters=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
