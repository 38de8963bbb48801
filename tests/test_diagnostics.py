"""key_skew / partition_stats diagnostics."""

from __future__ import annotations

import pandas as pd
import pytest

from arrow_spark.operators.diagnostics import key_skew, partition_stats


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        pd.DataFrame({"k": ["hot"] * 80 + ["a"] * 10 + ["b"] * 10, "v": range(100)})
    )


def test_key_skew_finds_hot_key(df):
    rows = key_skew(df, ["k"], top=2).collect()
    assert rows[0]["k"] == "hot" and rows[0]["n"] == 80
    assert rows[0]["share"] == pytest.approx(0.8)
    assert rows[1]["n"] == 10


def test_partition_stats_sums_to_total(df):
    rows = partition_stats(df.repartition(8, "k")).collect()
    assert sum(r["rows"] for r in rows) == 100
    assert all(r["n_partitions"] == len(rows) for r in rows)
    assert rows[0]["skew_factor"] >= 1.0


def test_quarantine_split_routes_and_attributes(spark):
    from pyspark.sql import functions as F

    from arrow_spark.operators.quality import (
        quarantine_split,
        rule_summary,
    )

    df = spark.createDataFrame(
        [(1, 10, "a"), (2, 99, "a"), (3, 5, None), (4, 120, None)],
        "id long, qty long, tag string",
    )
    rules = {
        "qty_cap": F.col("qty") <= 50,
        "tag_present": F.col("tag").isNotNull(),  # NULL = violation
    }
    clean, bad = quarantine_split(df, rules)
    assert [r.id for r in clean.orderBy("id").collect()] == [1]
    got = {r.id: r.violations for r in bad.collect()}
    assert got == {
        2: ["qty_cap"],
        3: ["tag_present"],
        4: ["qty_cap", "tag_present"],  # alphabetical rule order
    }
    s = rule_summary(df, rules).collect()[0]
    assert (s.total_rows, s.qty_cap, s.tag_present) == (4, 2, 2)


def test_groupwise_ols_known_lines(spark):
    from arrow_spark.operators.regression import groupwise_ols

    rows = (
        [("a", float(x), 3.0 * x + 7.0) for x in range(5)]  # perfect line
        + [("b", float(x), 2.0) for x in range(4)]          # flat: slope 0, tot 0
        + [("c", 1.0, 5.0), ("c", 1.0, 9.0)]              # zero x-variance
        + [("d", 2.0, 11.0)]                              # below min_points
    )
    df = spark.createDataFrame(rows, "k string, x double, y double")
    got = {
        r.k: (r.n_points, r.slope, r.intercept, r.r2)
        for r in groupwise_ols(df, "x", "y", keys=["k"]).collect()
    }
    assert got["a"][0] == 5
    assert abs(got["a"][1] - 3.0) < 1e-12 and abs(got["a"][2] - 7.0) < 1e-12
    assert abs(got["a"][3] - 1.0) < 1e-12
    assert got["b"][1] == 0.0 and got["b"][3] is None       # ss_tot = 0
    assert got["c"][1] is None and got["d"][1] is None


def test_table_diff_statuses_and_changed_cols(spark):
    from arrow_spark.operators.diffing import diff_summary, table_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 99.0), (3, "c", None), (5, "e", 50.0)],
        "k long, s string, v double",
    )
    d = {r.k: (r.row_status, r.changed_cols) for r in table_diff(old, new, ["k"]).collect()}
    assert d == {
        1: ("unchanged", []),
        2: ("changed", ["s", "v"]),
        3: ("unchanged", []),   # NULL == NULL null-safely
        4: ("removed", []),
        5: ("added", []),
    }
    s = {r.row_status: r.n for r in diff_summary(table_diff(old, new, ["k"])).collect()}
    assert s == {"unchanged": 2, "changed": 1, "removed": 1, "added": 1}
