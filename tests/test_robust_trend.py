"""mann_kendall / theil_sen: analytic truths, robustness, degenerates."""

from __future__ import annotations

from arrow_spark.operators.robust_trend import mann_kendall, theil_sen


def _mk(spark, pts):
    df = spark.createDataFrame(
        [("g", t, v) for t, v in pts], "k string, t long, v long"
    )
    return mann_kendall(df, ["k"], "t", "v").collect()[0]


def _ts(spark, pts):
    df = spark.createDataFrame(
        [("g", t, v) for t, v in pts], "k string, t long, v long"
    )
    return theil_sen(df, ["k"], "t", "v").collect()[0]


def test_mk_strictly_increasing_tau_one(spark):
    r = _mk(spark, [(t, 10 * t) for t in range(6)])
    assert r["tau"] == 1.0 and r["s_stat"] == 15 and r["discordant"] == 0


def test_mk_strictly_decreasing_tau_minus_one(spark):
    r = _mk(spark, [(t, -3 * t) for t in range(5)])
    assert r["tau"] == -1.0 and r["concordant"] == 0


def test_mk_value_ties_contribute_zero(spark):
    r = _mk(spark, [(0, 5), (1, 5), (2, 5)])
    assert (r["concordant"], r["discordant"], r["tau"]) == (0, 0, 0.0)


def test_mk_single_point_null_tau(spark):
    r = _mk(spark, [(0, 5)])
    assert r["tau"] is None and r["n"] == 1 and r["s_stat"] == 0


def test_theil_sen_exact_line(spark):
    r = _ts(spark, [(t, 7 * t + 3) for t in range(5)])
    assert r["slope"] == 7.0 and r["n_slopes"] == 10


def test_theil_sen_outlier_resistant(spark):
    # 9 points on slope 2, one wild outlier: median slope stays 2
    pts = [(t, 2 * t) for t in range(9)] + [(9, 1_000_000)]
    r = _ts(spark, pts)
    assert r["slope"] == 2.0


def test_theil_sen_even_count_median_average(spark):
    # 3 points -> 3 slopes? no: choose 2 points -> 1 slope; use 4 points
    # with distinct pairwise slopes and check the middle average
    pts = [(0, 0), (1, 1), (2, 4), (3, 9)]
    r = _ts(spark, pts)
    # slopes: (1-0)/1=1, (4-0)/2=2, (9-0)/3=3, (4-1)/1=3, (9-1)/2=4,
    #         (9-4)/1=5 -> sorted [1,2,3,3,4,5], median = 3
    assert r["n_slopes"] == 6 and r["slope"] == 3.0


def test_theil_sen_equal_times_skipped(spark):
    # two points at the same t: no defined slope
    r = _ts(spark, [(0, 1), (0, 5)])
    assert r["n_slopes"] == 0 and r["slope"] is None
