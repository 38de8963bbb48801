"""All 10 Arrow RoundModes vs Python-decimal ground truth on tie and
non-tie values (reference: compute/api_scalar.h RoundMode,
scalar_round.cc)."""

from __future__ import annotations

import decimal

import pandas as pd
import pytest

from arrow_spark.functions import call

VALUES = [2.5, 1.5, -2.5, -1.5, 0.5, -0.5, 2.3, -2.3, 2.7, -2.7, 0.0]

_DEC = {
    "down": decimal.ROUND_FLOOR,
    "up": decimal.ROUND_CEILING,
    "towards_zero": decimal.ROUND_DOWN,
    "towards_infinity": decimal.ROUND_UP,
    "half_towards_zero": decimal.ROUND_HALF_DOWN,
    "half_towards_infinity": decimal.ROUND_HALF_UP,
    "half_to_even": decimal.ROUND_HALF_EVEN,
}


def expected(v: float, mode: str) -> float:
    d = decimal.Decimal(str(v))
    if mode in _DEC:
        return float(d.quantize(decimal.Decimal("1"), rounding=_DEC[mode]))
    if mode == "half_up":  # ties toward +inf
        return float(
            (d + decimal.Decimal("0.5")).quantize(decimal.Decimal("1"), decimal.ROUND_FLOOR)
        )
    if mode == "half_down":  # ties toward -inf
        return float(
            (d - decimal.Decimal("0.5")).quantize(decimal.Decimal("1"), decimal.ROUND_CEILING)
        )
    if mode == "half_to_odd":
        even = float(d.quantize(decimal.Decimal("1"), decimal.ROUND_HALF_EVEN))
        if abs(d - d.to_integral_value(decimal.ROUND_FLOOR)) == decimal.Decimal("0.5"):
            lo = float(d.to_integral_value(decimal.ROUND_FLOOR))
            hi = float(d.to_integral_value(decimal.ROUND_CEILING))
            return lo if int(lo) % 2 != 0 else hi
        return even
    raise ValueError(mode)


@pytest.mark.parametrize("mode", list(_DEC) + ["half_up", "half_down", "half_to_odd"])
def test_round_mode_matches_decimal(spark, mode):
    df = spark.createDataFrame(pd.DataFrame({"x": VALUES}))
    out = df.select("x", call("round", "x", 0, mode).alias("r")).collect()
    for row in out:
        assert row.r == expected(row.x, mode), (mode, row.x, row.r)


def test_round_with_digits(spark):
    import math

    xs = [2.345, -2.345, 2.355]
    df = spark.createDataFrame(pd.DataFrame({"x": xs}))
    out = df.select(call("round", "x", 2, "half_up").alias("r")).collect()
    # float semantics: same IEEE ops as the engine applies
    want = [math.floor(x * 100 + 0.5) / 100 for x in xs]
    assert [r.r for r in out] == want


def test_round_binary_per_row_digits(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame(pd.DataFrame({"x": [2.345, 2.345], "d": [1, 2]}))
    out = df.select(call("round_binary", "x", F.col("d"), round_mode="half_up").alias("r")).collect()
    assert [r.r for r in out] == [2.3, 2.35]


def test_round_to_multiple(spark):
    df = spark.createDataFrame(pd.DataFrame({"x": [12.0, 17.5, -12.5]}))
    out = df.select(call("round_to_multiple", "x", multiple=5.0).alias("r")).collect()
    # 12→10; 17.5/5=3.5 ties-to-even→4→20; -12.5/5=-2.5 ties-to-even→-2→-10
    assert [r.r for r in out] == [10.0, 20.0, -10.0]
