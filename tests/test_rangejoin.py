"""Binned interval join: exactly-once pairs, multi-bin spans, no
cartesian plan."""

from __future__ import annotations

import pandas as pd
import pytest

from arrow_spark.operators.rangejoin import interval_join


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "l_id": [1, 2, 3],
                "k": ["a", "a", "b"],
                # interval 1 spans many bins (0..10000); 2 is narrow; 3 is
                # on another key
                "ls": [0, 5000, 0],
                "le": [10000, 5100, 100],
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "r_id": [10, 20, 30, 40],
                "k": ["a", "a", "a", "b"],
                "rs": [4000, 20000, 9990, 50],
                "re": [4500, 20100, 12000, 60],
            }
        )
    )
    return left, right


def test_pairs_exactly_once_across_bins(sides):
    left, right = sides
    out = interval_join(
        left, right, "ls", "le", "rs", "re", by=["k"], bin_width=1000
    ).collect()
    pairs = sorted((r["l_id"], r["r_id"]) for r in out)
    # (1,10): contained; (1,30): overlap straddles the le bin boundary;
    # (3,40): other key; (2,*) and (1,20): no overlap. No duplicates.
    assert pairs == [(1, 10), (1, 30), (3, 40)]


def test_no_cartesian_in_plan(sides):
    left, right = sides
    p = interval_join(
        left, right, "ls", "le", "rs", "re", by=["k"], bin_width=1000
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_touching_endpoints_are_closed(spark):
    left = spark.createDataFrame(pd.DataFrame({"l_id": [1], "ls": [0], "le": [100]}))
    right = spark.createDataFrame(pd.DataFrame({"r_id": [2], "rs": [100], "re": [200]}))
    out = interval_join(left, right, "ls", "le", "rs", "re", bin_width=64).collect()
    assert [(r["l_id"], r["r_id"]) for r in out] == [(1, 2)]
