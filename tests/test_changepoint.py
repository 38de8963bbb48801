"""CUSUM and quantile-transform: recursion equivalence, plan pins, and
hypothesis properties for the exactness-contract operators (CUSUM/EWMA
vs their sequential reference recursions on random integer series)."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from arrow_spark.catalog import table
from arrow_spark.operators.changepoint import cusum_changepoints
from arrow_spark.operators.quantile_transform import quantile_transform
from arrow_spark.operators.smoothing import ewma

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

int_series = st.lists(
    st.integers(min_value=-(2**18), max_value=2**18), min_size=1, max_size=60
)


def _py_cusum(xs, target, slack=0.0):
    hi = lo = 0.0
    out = []
    for x in xs:
        hi = max(0.0, hi + (x - target - slack))
        lo = max(0.0, lo - (x - target + slack))
        out.append((hi, lo))
    return out


@given(xs=int_series)
@SETTINGS
def test_cusum_equals_sequential_recursion(spark, xs):
    df = spark.createDataFrame(
        [(1, i, v) for i, v in enumerate(xs)], "k long, i long, x long"
    )
    got = [
        (r["cusum_hi"], r["cusum_lo"])
        for r in cusum_changepoints(df, ["k"], "i", "x", threshold=10.0)
        .orderBy("i")
        .collect()
    ]
    med = float(pd.Series(xs).median())
    want = _py_cusum(xs, med)
    assert got == want  # EXACT: 0.5-grid arithmetic, no tolerance


@given(xs=int_series)
@SETTINGS
def test_ewma_equals_sequential_recursion(spark, xs):
    # adjust=True normalized EWMA over the trailing-32 window, α=1/2:
    # the fold must equal the direct weighted sum computed in Python
    df = spark.createDataFrame(
        [(1, i, v) for i, v in enumerate(xs)], "k long, i long, x long"
    )
    got = [r["ewma"] for r in ewma(df, ["k"], "i", "x").orderBy("i").collect()]
    want = []
    for t in range(len(xs)):
        window = xs[max(0, t - 31): t + 1][::-1]  # newest first
        num = den = 0.0
        w = 1.0
        for x in window:
            num += x * w
            den += w
            w *= 0.5
        want.append(num / den)
    assert got == want


def test_cusum_plan_single_exchange(spark, sf_dir):
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    plan = (
        cusum_changepoints(ev, ["user_id"], ["ts", "event_id"], "cents", 100.0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_quantile_transform_ground_truth(spark):
    df = spark.createDataFrame(
        [(1, 10.0, 5.0), (2, 20.0, 5.0), (3, 30.0, 7.0)], "id long, a double, b double"
    )
    out = {(r["feature"], r["id"]): r["q"]
           for r in quantile_transform(df, ["id"], ["a", "b"]).collect()}
    assert out[("a", 1)] == 0.0 and out[("a", 2)] == 0.5 and out[("a", 3)] == 1.0
    assert out[("b", 1)] == 0.0 and out[("b", 2)] == 0.0  # tie shares rank
    assert out[("b", 3)] == 1.0
