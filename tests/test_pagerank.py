"""pagerank operator: analytic ground truths (cycle, star, dangling),
mass conservation, and the transition-edge builder."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from arrow_spark.operators.pagerank import pagerank, transition_edges


def _ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src int, dst int, w long")
    return {r["node"]: r["rank"] for r in pagerank(df, **kw).collect()}


def test_two_node_cycle_is_uniform(spark):
    r = _ranks(spark, [(0, 1, 1), (1, 0, 1)], n_iters=5)
    assert r[0] == pytest.approx(0.5, abs=1e-9)
    assert r[1] == pytest.approx(0.5, abs=1e-9)


def test_mass_conserved_with_dangling(spark):
    # node 2 has no out-edges: its mass redistributes, total stays 1
    r = _ranks(spark, [(0, 1, 1), (1, 2, 1)], n_iters=5)
    assert sum(r.values()) == pytest.approx(1.0, abs=1e-6)
    # sink of the chain accumulates the most rank
    assert r[2] > r[1] > 0


def test_star_center_dominates(spark):
    edges = [(i, 0, 1) for i in range(1, 5)] + [(0, i, 1) for i in range(1, 5)]
    r = _ranks(spark, edges, n_iters=8)
    assert all(r[0] > r[i] for i in range(1, 5))
    assert sum(r.values()) == pytest.approx(1.0, abs=1e-6)


def test_weights_shift_rank(spark):
    # 0 links to 1 (weight 9) and 2 (weight 1): 1 must outrank 2
    edges = [(0, 1, 9), (0, 2, 1), (1, 0, 1), (2, 0, 1)]
    r = _ranks(spark, edges, n_iters=6)
    assert r[1] > r[2]


def test_deterministic_across_runs(spark):
    edges = [(0, 1, 2), (1, 2, 1), (2, 0, 3), (1, 0, 1)]
    a = _ranks(spark, edges, n_iters=5)
    b = _ranks(spark, edges, n_iters=5)
    assert a == b


def test_transition_edges_builder(spark):
    ev = spark.createDataFrame(
        [(1, 10, "a"), (1, 11, "b"), (1, 12, "a"), (2, 20, "b"), (2, 21, "a")],
        "u long, eid long, page string",
    )
    e = {
        (r["src"], r["dst"]): r["w"]
        for r in transition_edges(ev, "page", "u", "eid").collect()
    }
    # user 1: a→b, b→a; user 2: b→a  ⇒ (b,a) weight 2
    assert e == {("a", "b"): 1, ("b", "a"): 2}


def test_count_triangles_known_graph(spark):
    from arrow_spark.operators.triangles import count_triangles, orient_edges

    # K4 on {1,2,3,4} (4 triangles) + pendant 5, duplicate + reversed +
    # self-loop edges thrown in to exercise normalization
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 5)],
        "a long, b long",
    )
    total = count_triangles(edges).collect()[0]["n_triangles"]
    assert total == 4
    per_v = {r.v: r.n_triangles for r in count_triangles(edges, per_vertex=True).collect()}
    # each K4 vertex sits in C(3,2)=3 triangles; 5 in none
    assert per_v == {1: 3, 2: 3, 3: 3, 4: 3}
    # orientation emits each undirected edge exactly once
    o = orient_edges(edges).collect()
    assert len(o) == 7 and len({(r.lo, r.hi) for r in o}) == 7


def test_ppr_mass_concentrates_on_seeds(spark):
    from arrow_spark.operators.pagerank import personalized_pagerank

    # path graph 1-2-3-4-5, seed at 1: rank must decay with distance
    edges = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(1, 5)]
        + [(i + 1, i, 1.0) for i in range(1, 5)],
        "src long, dst long, w double",
    )
    seeds = spark.createDataFrame([(1,)], "n long")
    got = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(edges, seeds, n_iters=6).collect()
    }
    # synchronous walks on paths oscillate by parity (mass ping-pongs),
    # so decay is monotone only WITHIN a parity class: compare odd
    # distances with odd, even with even
    assert got[1] > got[3] > got[5]
    assert got[2] > got[4]
    assert got[1] == max(got.values())


def test_ppr_disconnected_component_gets_zero(spark):
    from arrow_spark.operators.pagerank import personalized_pagerank

    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 1, 1.0), (10, 11, 1.0), (11, 10, 1.0)],
        "src long, dst long, w double",
    )
    seeds = spark.createDataFrame([(1,)], "n long")
    got = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(edges, seeds, n_iters=4).collect()
    }
    assert got[10] == 0.0 and got[11] == 0.0
    assert got[1] > 0 and got[2] > 0


def test_ppr_mass_sums_to_one(spark):
    from arrow_spark.operators.pagerank import personalized_pagerank

    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 2.0), (3, 1, 1.0)], "src long, dst long, w double"
    )
    seeds = spark.createDataFrame([(1,), (2,)], "n long")
    ranks = [
        r["rank"] for r in personalized_pagerank(edges, seeds, n_iters=5).collect()
    ]
    assert abs(sum(ranks) - 1.0) < 1e-6  # dangling-to-seed conservation


def test_hits_star_graph_truths(spark):
    from arrow_spark.operators.pagerank import hits

    # star: hub 0 points at 1,2,3 — node 0 is the only hub, leaves are
    # the only authorities
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "src long, dst long"
    )
    got = {r["node"]: r for r in hits(edges, n_iters=4).collect()}
    assert got[0]["hub"] == 1.0 and got[0]["authority"] == 0.0
    for leaf in (1, 2, 3):
        assert got[leaf]["hub"] == 0.0
        assert abs(got[leaf]["authority"] - 1 / 3) < 1e-9


def test_hits_l1_normalized(spark):
    from arrow_spark.operators.pagerank import hits

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 3)], "src long, dst long"
    )
    rows = hits(edges, n_iters=3).collect()
    assert abs(sum(r["authority"] for r in rows) - 1.0) < 1e-6
    assert abs(sum(r["hub"] for r in rows) - 1.0) < 1e-6


def test_hits_authority_prefers_indegree(spark):
    from arrow_spark.operators.pagerank import hits

    # 3 is pointed at by everyone; 4 by one node
    edges = spark.createDataFrame(
        [(1, 3), (2, 3), (5, 3), (1, 4)], "src long, dst long"
    )
    got = {r["node"]: r for r in hits(edges, n_iters=3).collect()}
    assert got[3]["authority"] > got[4]["authority"]
