"""k_truss tests: textbook trusses, support counting, bounded rounds."""

from __future__ import annotations

from arrow_spark.operators.kcore import undirected_edges
from arrow_spark.operators.ktruss import edge_support, k_truss


def _truss(spark, edges, k, rounds=3):
    df = spark.createDataFrame(edges, "a long, b long")
    und = undirected_edges(df, "a", "b")
    return {
        (r["lo"], r["hi"]): r["support"]
        for r in k_truss(und, k, rounds=rounds).collect()
    }


def test_triangle_is_a_3truss(spark):
    got = _truss(spark, [(1, 2), (2, 3), (1, 3)], k=3)
    assert got == {(1, 2): 1, (1, 3): 1, (2, 3): 1}


def test_triangle_with_pendant_edge_peels_pendant(spark):
    got = _truss(spark, [(1, 2), (2, 3), (1, 3), (3, 4)], k=3)
    assert set(got) == {(1, 2), (1, 3), (2, 3)}


def test_k4_is_a_4truss(spark):
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    got = _truss(spark, k4, k=4)
    assert len(got) == 6 and all(s == 2 for s in got.values())


def test_two_triangles_sharing_edge_not_4truss(spark):
    # bowtie edges: shared edge (2,3) has support 2, others 1 → k=4
    # (support ≥ 2) peels the outer edges, then the shared edge dies
    edges = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
    assert _truss(spark, edges, k=4) == {}
    got3 = _truss(spark, edges, k=3)
    assert len(got3) == 5  # every edge is in ≥1 triangle: 3-truss keeps all


def test_bounded_rounds_stop_mid_peel(spark):
    # pendant triangle chain: k=3, 1 round removes the bridge only; the
    # full fixpoint would also remove nothing else here, so use a
    # 2-stage cascade: triangle + triangle connected by an edge whose
    # removal leaves both triangles intact (no cascade) — instead pin
    # the 1-round result of the bowtie under k=4: outer edges die in
    # round 1, shared edge survives it (its pre-peel support was 2)
    edges = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
    got = _truss(spark, edges, k=4, rounds=1)
    assert set(got) == {(2, 3)}
    assert got[(2, 3)] == 0  # no triangle remains around it


def test_edge_support_counts(spark):
    df = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)], "a long, b long"
    )
    und = undirected_edges(df, "a", "b")
    sup = {(r["lo"], r["hi"]): r["support"] for r in edge_support(und).collect()}
    assert sup[(2, 3)] == 2 and sup[(1, 2)] == 1 and sup[(2, 4)] == 1
