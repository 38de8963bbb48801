"""Registry coverage vs the reference's authoritative function list
(SURVEY §2.2.11 ← docs/source/cpp/compute.rst), plus behavioral spot
checks of representative kernels per family."""

from __future__ import annotations

import os
import re

import pandas as pd
import pytest

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from arrow_spark.functions import ARROW_FUNCTIONS, call, coverage

SURVEY = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SURVEY.md")


def survey_function_names() -> list[str]:
    text = open(SURVEY).read()
    sect = text.split("#### 2.2.11")[1]
    sect = sect.split("### 2.3")[0]
    body = "\n".join(
        line
        for line in sect.splitlines()
        if line and not line.startswith("#") and "function list" not in line
    )
    return sorted(set(re.findall(r"[a-z][a-z0-9_]+", body)))


def test_all_301_functions_registered():
    names = survey_function_names()
    missing = [n for n in names if n not in ARROW_FUNCTIONS]
    assert not missing, f"{len(missing)} unregistered Arrow functions: {missing}"


def test_coverage_mostly_mapped():
    cov = coverage()
    implemented = sum(v for k, v in cov.items() if k in ("mapped", "aggregate", "window", "physical"))
    total = sum(cov.values())
    assert implemented / total > 0.85, cov


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "x": [1.0, -2.5, 3.75, None],
                "y": [2.0, 2.0, -1.0, 5.0],
                "s": ["Hello World", "abc", "  pad  ", None],
                "arr": [[1.0, 2.0], [3.0], [], [4.0, 5.0]],
            }
        )
    )


def _one(df, col, **kw):
    return df.select(col.alias("v")).collect()


def test_arithmetic_kernels(df):
    rows = _one(df, call("add", "x", "y"))
    assert rows[0].v == 3.0 and rows[3].v is None
    assert _one(df, call("abs", "x"))[1].v == 2.5
    assert _one(df, call("max_element_wise", "x", "y"))[1].v == 2.0
    assert _one(df, call("round", "x", 1))[2].v == 3.8


def test_checked_aliases_resolve(df):
    assert _one(df, call("add_checked", "x", "y"))[0].v == 3.0


def test_string_kernels(df):
    assert _one(df, call("utf8_upper", "s"))[1].v == "ABC"
    assert _one(df, call("utf8_capitalize", "s"))[0].v == "Hello world"
    assert _one(df, call("ascii_swapcase", "s"))[0].v == "hELLO wORLD"
    assert _one(df, call("utf8_center", "s", 7, "*"))[1].v == "**abc**"
    assert _one(df, call("binary_length", "s"))[1].v == 3
    assert _one(df, call("starts_with", "s", pattern="He"))[0].v is True
    assert _one(df, call("count_substring", "s", pattern="l"))[0].v == 3
    assert _one(df, call("find_substring_regex", "s", pattern="W.rld"))[0].v == 6
    assert _one(df, call("utf8_slice_codeunits", "s", 1, 4))[1].v == "bc"


def test_validity_and_ifelse(df):
    assert _one(df, call("is_null", "x"))[3].v is True
    assert _one(df, call("if_else", call("greater", "y", 0), "y", "x"))[2].v == 3.75
    assert _one(df, call("coalesce", "x", "y"))[3].v == 5.0
    assert _one(df, call("is_in", "y", value_set=[2.0]))[0].v is True
    assert _one(df, call("index_in", "y", value_set=[5.0, 2.0]))[0].v == 1
    assert _one(df, call("choose", call("index_in", "y", value_set=[2.0]), "x", "y"))[0].v == 1.0


def test_nested_kernels(df):
    assert _one(df, call("list_value_length", "arr"))[0].v == 2
    two = df.filter(F.size("arr") >= 2)
    # list_element raises on out-of-bounds (Arrow parity) — valid rows only
    assert _one(two, call("list_element", "arr", 1))[1].v == 5.0
    assert _one(two, call("array_take", "arr", idx=F.array(F.lit(1), F.lit(0))))[0].v == [2.0, 1.0]


def test_aggregate_kernels(spark, df):
    out = df.agg(
        call("sum", "y").alias("s"),
        call("count_all").alias("n"),
        call("any", call("greater", "y", 4)).alias("a"),
    ).collect()[0]
    assert out.s == 8.0 and out.n == 4 and out.a is True


def test_window_kernels(spark):
    pdf = pd.DataFrame({"g": ["a"] * 4, "t": [1, 2, 3, 4], "v": [1.0, None, 3.0, 2.0]})
    df = spark.createDataFrame(pdf)
    w = W.partitionBy("g").orderBy("t").rowsBetween(W.unboundedPreceding, W.currentRow)
    wb = W.partitionBy("g").orderBy("t").rowsBetween(W.currentRow, W.unboundedFollowing)
    wo = W.partitionBy("g").orderBy("t")
    out = df.select(
        "t",
        call("cumulative_sum", "v")(w).alias("cs"),
        call("fill_null_forward", "v")(w).alias("ff"),
        call("fill_null_backward", "v")(wb).alias("fb"),
        call("pairwise_diff", "v")(wo).alias("pd"),
    ).orderBy("t").collect()
    assert [r.cs for r in out] == [1.0, 1.0, 4.0, 6.0]
    assert [r.ff for r in out] == [1.0, 1.0, 3.0, 2.0]
    assert [r.fb for r in out] == [1.0, 3.0, 3.0, 2.0]
    assert out[2].pd is None  # 3.0 - None


def test_rank_normal_probit(spark):
    df = spark.createDataFrame(pd.DataFrame({"g": ["a"] * 99, "v": list(range(99))}))
    wo = W.partitionBy("g").orderBy("v")
    out = df.select("v", call("rank_normal", "v")(wo).alias("z")).collect()
    zs = {r.v: r.z for r in out}
    assert abs(zs[49]) < 1e-6  # median → z ≈ 0
    assert zs[98] > 2.3  # p≈0.995 → z≈2.57
    assert zs[0] < -2.3


def test_temporal_kernels(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"d": pd.to_datetime(["2024-03-15 13:45:00", "2024-01-01 00:00:00"])})
    )
    rows = df.select(
        call("year", "d").alias("y"),
        call("quarter", "d").alias("q"),
        call("day_of_week", "d").alias("dow"),  # Monday=0
        call("floor_temporal", "d", unit="month").alias("fm"),
        call("ceil_temporal", "d", unit="month").alias("cm"),
        call("days_between", "d", F.lit("2024-03-20").cast("timestamp")).alias("db"),
    ).collect()
    assert rows[0].y == 2024 and rows[0].q == 1
    assert rows[0].dow == 4  # 2024-03-15 is a Friday
    assert str(rows[0].fm).startswith("2024-03-01")
    assert str(rows[0].cm).startswith("2024-04-01")
    assert str(rows[1].cm).startswith("2024-01-01")  # already on boundary
    assert rows[0].db == 5


def test_physical_ops_are_identity(df):
    assert _one(df, call("dictionary_encode", "y"))[0].v == 2.0


def test_utf8_normalize(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"s": ["Café", "café", "ﬁne", None]})
    )
    rows = df.select(
        call("utf8_normalize", "s", form="NFC").alias("nfc"),
        call("utf8_normalize", "s", form="NFKC").alias("nfkc"),
    ).collect()
    assert rows[0].nfc == "café".replace("c", "C", 1)  # composed
    assert rows[1].nfc == "café"
    assert rows[2].nfkc == "fine"  # ligature folded by compatibility form
    assert rows[3].nfc is None
    with pytest.raises(ValueError):
        call("utf8_normalize", "s", form="XXX")


def test_is_dst(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"t": pd.to_datetime(["2024-07-01 12:00:00", "2024-01-15 12:00:00"])})
    )
    rows = df.select(
        call("is_dst", "t", timezone="America/New_York").alias("ny"),
        call("is_dst", "t", timezone="Australia/Sydney").alias("syd"),
        call("is_dst", "t", timezone="UTC").alias("utc"),
        call("is_dst", "t", timezone="Asia/Tokyo").alias("tokyo"),
    ).collect()
    assert rows[0].ny is True and rows[1].ny is False  # northern summer
    assert rows[0].syd is False and rows[1].syd is True  # southern summer
    assert rows[0].utc is False and rows[1].utc is False
    assert rows[0].tokyo is False and rows[1].tokyo is False  # no DST zone


def test_month_day_nano_interval_between(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "a": pd.to_datetime(["2024-01-15 10:30:00"]),
                "b": pd.to_datetime(["2024-03-10 09:15:30"]),
            }
        )
    )
    (r,) = df.select(call("month_day_nano_interval_between", "a", "b").alias("v")).collect()
    assert r.v.months == 2
    assert r.v.days == -5
    assert r.v.nanoseconds == int(-4470 * 1e9)
