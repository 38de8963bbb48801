"""EWMA: bit-exactness vs the DuckDB self-join replay, semantic
equivalence to pandas ewm (adjust=True) on short series, and the
one-shuffle plan pin."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from arrow_spark.catalog import table
from arrow_spark.operators.smoothing import ewma
from arrow_spark.queries.timeseries import EWMA_ORACLE


def test_matches_pandas_ewm_exactly(spark):
    vals = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 97, 93, 238, 462, 64, 33, 83, 27]
    df = spark.createDataFrame(
        [(1, i, v) for i, v in enumerate(vals)], "k long, i long, x long"
    )
    got = [
        r["ewma"]
        for r in ewma(df, ["k"], "i", "x").orderBy("i").collect()
    ]
    want = pd.Series(vals, dtype="float64").ewm(alpha=0.5, adjust=True).mean()
    # series shorter than the window: identical recursion, must be EXACT
    assert got == list(want)


def test_bit_exact_vs_duckdb_replay(spark, sf_dir):
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    got = (
        ewma(ev, ["user_id"], ["ts", "event_id"], "cents", out_col="ewma_cents")
        .select("user_id", "event_id", "ewma_cents")
        .toPandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    want = (
        con.sql(EWMA_ORACLE)
        .df()[["user_id", "event_id", "ewma_cents"]]
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    # no tolerance: the dyadic-weight contract promises identical bits
    assert list(got["ewma_cents"]) == list(want["ewma_cents"])


def test_single_exchange_plan(spark, sf_dir):
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    plan = (
        ewma(ev, ["user_id"], ["ts", "event_id"], "cents")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    assert "Join" not in plan  # the trailing window is a frame, not a self-join


def test_ewma_requires_dense_values_documented_behavior(spark):
    # collect_list DROPS nulls: a null row still gets an ewma (of its
    # neighbors) rather than propagating null — pin the behavior the
    # docstring documents (pre-filter or impute upstream if undesired)
    df = spark.createDataFrame(
        [(1, 0, 4), (1, 1, None), (1, 2, 8)], "k long, i long, x long"
    )
    got = [r["ewma"] for r in ewma(df, ["k"], "i", "x").orderBy("i").collect()]
    assert got[0] == 4.0
    assert got[1] == 4.0          # window saw only [4]
    assert got[2] == (8 + 4 * 0.5) / 1.5


def test_holt_equals_sequential_recursion(spark):
    from arrow_spark.operators.smoothing import holt_smooth

    vals = [10, 12, 15, 13, 18, 22, 21, 25, 30, 28, 33, 35, 40, 38, 45, 50, 52, 49]
    df = spark.createDataFrame(
        [(1, i, v) for i, v in enumerate(vals)], "k long, i long, x long"
    )
    got = [
        (r["level"], r["trend"], r["forecast"])
        for r in holt_smooth(df, ["k"], "i", "x").orderBy("i").collect()
    ]
    for t in range(len(vals)):
        window = vals[max(0, t - 15): t + 1]
        l, b = float(window[0]), 0.0
        for x in window[1:]:
            l2 = 0.5 * x + 0.5 * (l + b)
            b = 0.5 * (l2 - l) + 0.5 * b
            l = l2
        assert got[t] == (l, b, l + b)  # EXACT


def test_holt_constant_series_zero_trend(spark):
    from arrow_spark.operators.smoothing import holt_smooth

    df = spark.createDataFrame(
        [(1, i, 7) for i in range(20)], "k long, i long, x long"
    )
    rows = holt_smooth(df, ["k"], "i", "x").collect()
    assert all(r["level"] == 7.0 and r["trend"] == 0.0 and r["forecast"] == 7.0
               for r in rows)


def _decomp(spark, rows, period, schema="k string, t long, v long, ph long"):
    from arrow_spark.operators.smoothing import seasonal_decompose

    df = spark.createDataFrame(rows, schema)
    out = seasonal_decompose(df, ["k"], "t", "v", "ph", period=period)
    return {r["t"]: r for r in out.collect()}


def test_seasonal_constant_series_decomposes_to_constant(spark):
    rows = [("a", t, 10, t % 4) for t in range(12)]
    got = _decomp(spark, rows, period=4)
    # interior rows (full 2x4 MA window: t in 2..9) get exact results
    for t in range(2, 10):
        assert got[t]["trend"] == 10.0
        assert got[t]["seasonal"] == 0.0
        assert got[t]["residual"] == 0.0
    # edges: no full window, NULL trend and residual
    assert got[0]["trend"] is None and got[0]["residual"] is None


def test_seasonal_square_wave_recovered_odd_period(spark):
    # period-3 pattern [0, 30, 0] around zero-trend base 10:
    # values 10,40,10 repeating; MA(3) = 20 everywhere interior
    vals = [10, 40, 10] * 4
    rows = [("a", t, vals[t], t % 3) for t in range(12)]
    got = _decomp(spark, rows, period=3)
    for t in range(1, 11):
        assert got[t]["trend"] == 20.0
    # seasonal: phase of the 40s is +20, the others -10
    assert got[4]["seasonal"] == 20.0 and got[4]["residual"] == 0.0
    assert got[3]["seasonal"] == -10.0 and got[3]["residual"] == 0.0


def test_seasonal_trend_plus_season_additive_recovery(spark):
    # linear trend t*2 plus period-2 alternation +-5 (even period):
    # 2x2 MA of a linear series is exact, so residuals vanish
    vals = [2 * t + (5 if t % 2 == 0 else -5) for t in range(10)]
    rows = [("a", t, vals[t], t % 2) for t in range(10)]
    got = _decomp(spark, rows, period=2)
    for t in range(1, 9):
        assert got[t]["trend"] == 2.0 * t
        assert abs(got[t]["residual"]) < 1e-9


def test_seasonal_groups_independent(spark):
    rows = [("a", t, 10, t % 2) for t in range(6)] + [
        ("b", t, 50, t % 2) for t in range(6)
    ]
    from arrow_spark.operators.smoothing import seasonal_decompose

    df = spark.createDataFrame(rows, "k string, t long, v long, ph long")
    out = seasonal_decompose(df, ["k"], "t", "v", "ph", period=2).collect()
    a = [r for r in out if r["k"] == "a" and r["trend"] is not None]
    b = [r for r in out if r["k"] == "b" and r["trend"] is not None]
    assert all(r["trend"] == 10.0 for r in a)
    assert all(r["trend"] == 50.0 for r in b)


def test_rolling_corr_perfect_linear(spark):
    from arrow_spark.operators.regression import rolling_corr

    rows = [("p", t, t, 2 * t + 7) for t in range(10)]
    df = spark.createDataFrame(rows, "k string, t long, x long, y long")
    out = {r["t"]: r["corr"] for r in rolling_corr(df, ["k"], "t", "x", "y", 4).collect()}
    assert out[0] is None and out[2] is None  # partial windows
    # mathematically 1.0; the fixed float expression lands within an
    # ulp or two (sqrt(dx)*sqrt(dy) is not exactly sqrt(dx*dy))
    for t in range(3, 10):
        assert abs(out[t] - 1.0) < 1e-12


def test_rolling_corr_anticorrelated(spark):
    from arrow_spark.operators.regression import rolling_corr

    rows = [("p", t, t, -3 * t) for t in range(6)]
    df = spark.createDataFrame(rows, "k string, t long, x long, y long")
    out = {r["t"]: r["corr"] for r in rolling_corr(df, ["k"], "t", "x", "y", 3).collect()}
    assert out[4] == -1.0


def test_rolling_corr_zero_variance_null_not_nan(spark):
    from arrow_spark.operators.regression import rolling_corr

    rows = [("p", t, 5, t) for t in range(5)]  # x constant
    df = spark.createDataFrame(rows, "k string, t long, x long, y long")
    out = rolling_corr(df, ["k"], "t", "x", "y", 3).collect()
    assert all(r["corr"] is None for r in out)


def test_rolling_corr_known_value(spark):
    from arrow_spark.operators.regression import rolling_corr
    import math

    xs, ys = [1, 2, 4, 3], [2, 1, 5, 6]
    n = 4
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx, syy = sum(a * a for a in xs), sum(b * b for b in ys)
    expect = (n * sxy - sx * sy) / (
        math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
    )
    rows = [("p", t, xs[t], ys[t]) for t in range(4)]
    df = spark.createDataFrame(rows, "k string, t long, x long, y long")
    got = rolling_corr(df, ["k"], "t", "x", "y", 4).collect()[-1]["corr"]
    assert got == expect  # bit-exact: same IEEE expression
