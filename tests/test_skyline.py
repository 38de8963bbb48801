"""skyline_2d unit tests: textbook fronts, ties, duplicates."""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_spark.operators.skyline import skyline_2d


def _front(spark, rows):
    df = spark.createDataFrame(rows, "g string, id long, x long, y long")
    out = skyline_2d(df, ["g"], F.col("x"), F.col("y")).collect()
    return sorted(r["id"] for r in out)


def test_skyline_known_front(spark):
    # (1,10) and (3,20) are the front; (2,5) dominated by (1,10),
    # (4,20) dominated by (3,20) on x
    rows = [("a", 1, 1, 10), ("a", 2, 2, 5), ("a", 3, 3, 20), ("a", 4, 4, 20)]
    assert _front(spark, rows) == [1, 3]


def test_skyline_equal_x_keeps_only_best_y(spark):
    rows = [("a", 1, 1, 10), ("a", 2, 1, 7)]
    assert _front(spark, rows) == [1]


def test_skyline_duplicate_points_both_kept(spark):
    # identical points dominate nothing (no strict dimension)
    rows = [("a", 1, 1, 10), ("a", 2, 1, 10)]
    assert _front(spark, rows) == [1, 2]


def test_skyline_single_dominator(spark):
    # (1, 100) dominates everything else
    rows = [("a", 1, 1, 100)] + [("a", i, i, 100 - i) for i in range(2, 10)]
    assert _front(spark, rows) == [1]


def test_skyline_groups_independent(spark):
    rows = [("a", 1, 1, 10), ("a", 2, 2, 5), ("b", 3, 2, 5)]
    assert _front(spark, rows) == [1, 3]


def test_skyline_plan_single_exchange(spark):
    df = spark.createDataFrame(
        [("a", 1, 1, 10), ("a", 2, 2, 5)], "g string, id long, x long, y long"
    )
    plan = (
        skyline_2d(df, ["g"], F.col("x"), F.col("y"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan
