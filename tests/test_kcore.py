"""k_core unit tests: textbook cores, cascade peeling, bounded rounds."""

from __future__ import annotations

from arrow_spark.operators.kcore import k_core, undirected_edges


def _core(spark, edges, k, rounds=5):
    df = spark.createDataFrame(edges, "a long, b long")
    und = undirected_edges(df, "a", "b")
    return {
        r["node"]: r["degree"] for r in k_core(und, k, rounds=rounds).collect()
    }


def test_triangle_is_its_own_2core(spark):
    got = _core(spark, [(1, 2), (2, 3), (1, 3)], k=2)
    assert got == {1: 2, 2: 2, 3: 2}


def test_star_has_empty_2core(spark):
    # hub with 4 leaves: every leaf has degree 1; peeling leaves kills
    # the hub too
    got = _core(spark, [(0, i) for i in range(1, 5)], k=2)
    assert got == {}


def test_pendant_chain_cascades(spark):
    # triangle + chain 3-4-5: 4 and 5 peel over TWO rounds (5 first,
    # then 4) — the cascade the iteration exists for
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    got = _core(spark, edges, k=2)
    assert got == {1: 2, 2: 2, 3: 2}


def test_bounded_rounds_stop_mid_cascade(spark):
    # same graph, rounds=1: node 5 is gone (degree 1), node 4 SURVIVES
    # the single round (it had degree 2 before 5 was removed) — bounded
    # rounds are the contract, not convergence
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    got = _core(spark, edges, k=2, rounds=1)
    assert set(got) == {1, 2, 3, 4}
    assert got[4] == 1  # its remaining degree inside the peeled subgraph


def test_k4_minus_edge_is_2core_not_3core(spark):
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)]  # K4 minus (3,4)
    assert _core(spark, edges, k=3) == {}
    got = _core(spark, edges, k=2)
    assert set(got) == {1, 2, 3, 4}


def test_self_loops_and_duplicates_ignored(spark):
    edges = [(1, 1), (1, 2), (2, 1), (2, 3), (1, 3)]
    got = _core(spark, edges, k=2)
    assert got == {1: 2, 2: 2, 3: 2}


def test_disconnected_components_independent(spark):
    # triangle plus a separate edge: edge pair peels, triangle stays
    edges = [(1, 2), (2, 3), (1, 3), (10, 11)]
    assert set(_core(spark, edges, k=2)) == {1, 2, 3}


def test_plan_no_cartesian_broadcast_semijoins(spark):
    df = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    und = undirected_edges(df, "a", "b")
    plan = (
        k_core(und, 2, rounds=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    # the final degree agg — per-round joins live behind checkpoints
    assert "BroadcastHashJoin" in plan or "Exchange" in plan
