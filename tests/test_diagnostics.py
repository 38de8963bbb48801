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
