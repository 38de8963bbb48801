"""gap_fill: densification, LOCF, linear interpolation edge cases."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from pyspark.sql import functions as F

from arrow_spark.operators.gapfill import gap_fill, time_bucket


def _ts(hour: int, minute: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, hour, minute)


@pytest.fixture(scope="module")
def df(spark):
    # user 1: observations at hours 0, 3 (gap at 1, 2); user 2: single hour
    rows = pd.DataFrame(
        {
            "user": [1, 1, 1, 2],
            "ts": [_ts(0), _ts(0, 30), _ts(3), _ts(5)],
            "value": [10.0, 20.0, 40.0, 7.0],
        }
    )
    return spark.createDataFrame(rows)


@pytest.fixture(scope="module")
def filled(df):
    out = gap_fill(df, "ts", 3600, ["user"], F.avg("value").alias("v"), fill="both")
    return {(r["user"], r["bucket"]): r for r in out.collect()}


def test_grid_is_dense_per_group(filled):
    u1 = sorted(b for (u, b) in filled if u == 1)
    assert u1 == [u1[0] + i * 3600 for i in range(4)]
    assert len([1 for (u, _) in filled if u == 2]) == 1


def test_gap_rows_marked_empty(filled):
    gap = filled[(1, filled_keys_min(filled) + 3600)]
    assert gap["n_rows"] == 0 and gap["v"] is None


def filled_keys_min(filled):
    return min(b for (u, b) in filled if u == 1)


def test_locf_carries_forward(filled):
    base = filled_keys_min(filled)
    assert filled[(1, base)]["v_locf"] == 15.0  # avg(10, 20)
    assert filled[(1, base + 3600)]["v_locf"] == 15.0
    assert filled[(1, base + 2 * 3600)]["v_locf"] == 15.0
    assert filled[(1, base + 3 * 3600)]["v_locf"] == 40.0


def test_linear_interpolates_interior(filled):
    base = filled_keys_min(filled)
    # 15 → 40 over 3 steps: 15, 23.333333, 31.666666, 40 (floor-6 rounding)
    assert filled[(1, base + 3600)]["v_interp"] == pytest.approx(23.333333, abs=1e-6)
    assert filled[(1, base + 2 * 3600)]["v_interp"] == pytest.approx(
        31.666667, abs=2e-6
    )
    assert filled[(1, base + 3 * 3600)]["v_interp"] == 40.0


def test_single_observation_group(filled):
    (key,) = [(u, b) for (u, b) in filled if u == 2]
    row = filled[key]
    assert row["v_locf"] == 7.0 and row["v_interp"] == 7.0


def test_leading_edge_null_locf(spark):
    # observation only in the LAST bucket of a 3-bucket span: force a
    # leading gap by anchoring the span with an earlier different value
    rows = pd.DataFrame(
        {"user": [1, 1], "ts": [_ts(0), _ts(2)], "value": [None, 5.0]}
    )
    out = gap_fill(
        spark.createDataFrame(rows),
        "ts",
        3600,
        ["user"],
        F.avg("value").alias("v"),
        fill="both",
    )
    got = {r["bucket"] - time_bucket_epoch(): r for r in out.collect()}
    assert got[0]["v_locf"] is None  # nothing to carry yet
    assert got[0]["v_interp"] == 5.0  # leading edge falls back to next obs
    assert got[3600]["v_locf"] is None
    assert got[7200]["v_locf"] == 5.0


def time_bucket_epoch() -> int:
    return int(dt.datetime(2024, 1, 1).timestamp()) // 3600 * 3600


def test_time_bucket_is_epoch_floor(spark):
    out = (
        spark.createDataFrame(pd.DataFrame({"ts": [_ts(1, 59)]}))
        .select(time_bucket(F.col("ts"), 3600).alias("b"))
        .collect()
    )
    assert out[0]["b"] % 3600 == 0


def test_invalid_fill_rejected(df):
    with pytest.raises(ValueError, match="locf|linear|both"):
        gap_fill(df, "ts", 3600, ["user"], F.avg("value").alias("v"), fill="nearest")
