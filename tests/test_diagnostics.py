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
