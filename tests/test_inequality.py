"""gini / benford_deviation: analytic truths and edge contracts."""

from __future__ import annotations

from arrow_spark.operators.inequality import (
    BENFORD_MICROS,
    benford_deviation,
    gini,
)


def _gini(spark, vals):
    df = spark.createDataFrame([("g", v) for v in vals], "k string, x long")
    return gini(df, ["k"], "x").collect()[0]


def test_benford_masses_sum_to_one():
    assert sum(BENFORD_MICROS) == 1_000_000


def test_gini_perfect_equality_zero(spark):
    r = _gini(spark, [10] * 8)
    assert r["gini"] == 0.0 and r["n"] == 8 and r["total"] == 80


def test_gini_total_concentration(spark):
    # one holder has everything: G = (n-1)/n
    r = _gini(spark, [0, 0, 0, 100])
    assert r["gini"] == 3 / 4


def test_gini_known_value(spark):
    # vals 1,2,3,4: G = (2*(1+4+9+16) - 5*10) / (4*10) = 10/40 = 0.25
    assert _gini(spark, [1, 2, 3, 4])["gini"] == 0.25


def test_gini_tie_invariance(spark):
    # ranks within a tie block are arbitrary; the sum must not care —
    # compare against the analytic value for [5,5,10]:
    # sorted ranks (1,2,3): 2(5+10+30) - 4*20 = 90-80=10; /(3*20)=1/6
    assert abs(_gini(spark, [5, 5, 10])["gini"] - 1 / 6) < 1e-15


def test_gini_degenerates_null(spark):
    assert _gini(spark, [7])["gini"] is None          # n < 2
    assert _gini(spark, [0, 0])["gini"] is None       # zero total


def test_benford_matches_integer_formula(spark):
    # near-Benford counts: check against the exact integer formula
    counts = {d: p // 1000 for d, p in enumerate(BENFORD_MICROS, start=1)}
    n = sum(counts.values())
    expect_num = sum(
        abs(c * 1_000_000 - BENFORD_MICROS[d - 1] * n)
        for d, c in counts.items()
    )
    expect = expect_num / (2 * n * 1_000_000)
    rows = [("g", d * 1000) for d, c in counts.items() for _ in range(c)]
    df = spark.createDataFrame(rows, "k string, x long")
    r = benford_deviation(df, ["k"], "x").collect()[0]
    assert r["n"] == n
    assert r["benford_tv"] == expect
    assert r["benford_tv"] < 0.01  # near-Benford by construction


def test_benford_single_digit_worst_case(spark):
    # all values start with 9: TV = 1 - p9 = 0.954243
    df = spark.createDataFrame([("g", 9000)] * 10, "k string, x long")
    r = benford_deviation(df, ["k"], "x").collect()[0]
    assert r["benford_tv"] == (1_000_000 - 45757) / 1_000_000


def test_benford_nonpositive_excluded(spark):
    df = spark.createDataFrame(
        [("g", 100), ("g", 0), ("g", -5)], "k string, x long"
    )
    assert benford_deviation(df, ["k"], "x").collect()[0]["n"] == 1


def test_hhi_monopoly_and_equal_split(spark):
    from arrow_spark.operators.inequality import hhi

    rows = [
        ("mono", "s1", 1000),
        ("duo", "s1", 500), ("duo", "s2", 500),
        ("quad", "s1", 250), ("quad", "s2", 250),
        ("quad", "s3", 250), ("quad", "s4", 250),
        ("skew", "s1", 900), ("skew", "s2", 100),
    ]
    df = spark.createDataFrame(rows, "mkt string, holder string, w long")
    out = {r["mkt"]: r for r in hhi(df, ["mkt"], "w").collect()}
    assert out["mono"]["hhi"] == 1.0 and out["mono"]["n_holders"] == 1
    assert out["duo"]["hhi"] == 0.5
    assert out["quad"]["hhi"] == 0.25
    # 0.9^2 + 0.1^2 = 0.82
    assert abs(out["skew"]["hhi"] - 0.82) < 1e-12
    assert out["skew"]["total_weight"] == 1000
