"""radius_join: brute-force equality, cell-boundary pairs, plan pin."""

from __future__ import annotations

import random

from arrow_spark.operators.spatial import radius_join


def _run(spark, lpts, rpts, r):
    l = spark.createDataFrame(lpts, "id long, x long, y long")
    rt = spark.createDataFrame(rpts, "id long, x long, y long")
    out = radius_join(l, rt, "id", "id", radius=r)
    return {(p["lid"], p["rid"]): p["dist2"] for p in out.collect()}


def _brute(lpts, rpts, r):
    return {
        (li, ri): (lx - rx) ** 2 + (ly - ry) ** 2
        for li, lx, ly in lpts
        for ri, rx, ry in rpts
        if (lx - rx) ** 2 + (ly - ry) ** 2 <= r * r
    }


def test_radius_join_matches_brute_force(spark):
    rng = random.Random(3)
    lpts = [(i, rng.randint(0, 10_000), rng.randint(0, 10_000)) for i in range(40)]
    rpts = [(i, rng.randint(0, 10_000), rng.randint(0, 10_000)) for i in range(60)]
    for r in (500, 2000):
        assert _run(spark, lpts, rpts, r) == _brute(lpts, rpts, r)


def test_radius_join_boundary_inclusive(spark):
    got = _run(spark, [(1, 0, 0)], [(2, 300, 400)], r=500)  # dist exactly 500
    assert got == {(1, 2): 250_000}


def test_radius_join_adjacent_cell_pair_found(spark):
    # points in different grid cells but within r: the 9-cell probe
    # must find them (r=100: cells are 100 wide; 95 and 105 differ)
    got = _run(spark, [(1, 95, 50)], [(2, 105, 50)], r=100)
    assert got == {(1, 2): 100}


def test_radius_join_negative_coordinates(spark):
    got = _run(spark, [(1, -5, -5)], [(2, 5, 5)], r=100)
    assert got == {(1, 2): 200}


def test_radius_join_no_cartesian_plan(spark):
    l = spark.createDataFrame([(1, 0, 0)], "id long, x long, y long")
    rt = spark.createDataFrame([(2, 1, 1)], "id long, x long, y long")
    plan = (
        radius_join(l, rt, "id", "id", radius=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
