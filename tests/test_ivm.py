"""Join IVM: refresh ≡ recompute on constructed deltas, and the plan
keeps the deltas broadcast (no extra full-side shuffle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_spark.operators.ivm import incremental_join_refresh


def _ab(spark):
    a = spark.createDataFrame(
        [(1, "a1"), (2, "a2"), (3, "a3"), (1, "a4")], "k long, av string"
    )
    b = spark.createDataFrame(
        [(1, "b1"), (2, "b2"), (4, "b4"), (1, "b5")], "k long, bv string"
    )
    return a, b


def test_refresh_equals_recompute_with_multiplicities(spark):
    a, b = _ab(spark)
    da = spark.createDataFrame([(1, "a5"), (4, "a6")], "k long, av string")
    db = spark.createDataFrame([(2, "b6"), (5, "b7")], "k long, bv string")
    base = a.join(b, "k")
    got = incremental_join_refresh(base, a, b, da, db, on=["k"])
    want = a.unionByName(da).join(b.unionByName(db), "k")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_refresh_with_empty_deltas_is_identity(spark):
    a, b = _ab(spark)
    base = a.join(b, "k")
    got = incremental_join_refresh(
        base, a, b, a.limit(0), b.limit(0), on=["k"]
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, base.collect()))


def test_deltas_are_broadcast(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_custkey").alias("k"), "o_orderkey"
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("k"), "c_name"
    )
    do, dc = o.limit(10), c.limit(10)
    base = o.join(c, "k")
    plan = (
        incremental_join_refresh(base, o, c, do, dc, on=["k"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_welch_ttest_known_values(spark):
    from arrow_spark.operators.abtest import welch_ttest

    # group A: 1..5 (mean 3, var 2.5); B: 11..15 (mean 13, var 2.5)
    rows = [("a", v) for v in range(1, 6)] + [("b", v) for v in range(11, 16)]
    df = spark.createDataFrame(rows, "g string, x long")
    out = {r["g"]: r for r in welch_ttest(df, "g", "x", baseline="a").collect()}
    r = out["b"]
    assert r["n"] == 5 and r["mean"] == 13.0 and r["var"] == 2.5
    assert r["t_stat"] == (13.0 - 3.0) / (2.5 / 5 + 2.5 / 5) ** 0.5
    assert r["significant"] is True
    assert "a" not in out  # baseline row excluded


def test_welch_ttest_identical_groups_insignificant(spark):
    from arrow_spark.operators.abtest import welch_ttest

    rows = [("a", v) for v in (1, 2, 3)] + [("b", v) for v in (1, 2, 3)]
    df = spark.createDataFrame(rows, "g string, x long")
    r = welch_ttest(df, "g", "x", baseline="a").collect()[0]
    assert r["t_stat"] == 0.0 and r["significant"] is False


def test_welch_ttest_singleton_group_not_significant(spark):
    from arrow_spark.operators.abtest import welch_ttest

    # n=1 treatment: var is 0/0 — must surface as NULL var/t/significant,
    # never NaN (Spark orders NaN above every number, so a NaN t_stat
    # would read |t| > critical = True)
    rows = [("a", v) for v in (1, 2, 3)] + [("b", 100)]
    df = spark.createDataFrame(rows, "g string, x long")
    r = welch_ttest(df, "g", "x", baseline="a").collect()[0]
    assert r["var"] is None and r["t_stat"] is None and r["significant"] is None


def test_welch_ttest_singleton_baseline_nulls_all_groups(spark):
    from arrow_spark.operators.abtest import welch_ttest

    rows = [("a", 5)] + [("b", v) for v in (1, 2, 3)]
    df = spark.createDataFrame(rows, "g string, x long")
    r = welch_ttest(df, "g", "x", baseline="a").collect()[0]
    assert r["t_stat"] is None and r["significant"] is None


def test_welch_ttest_missing_baseline_raises(spark):
    import pytest

    from arrow_spark.operators.abtest import welch_ttest

    df = spark.createDataFrame([("b", 1), ("b", 2)], "g string, x long")
    with pytest.raises(ValueError, match="baseline"):
        welch_ttest(df, "g", "x", baseline="zzz")


def test_agg_ivm_refresh_equals_recompute(spark):
    from arrow_spark.operators.ivm import incremental_agg_refresh
    from pyspark.sql import functions as F

    rows = [("a", 10), ("a", 20), ("b", 5), ("b", 7), ("c", 99)]
    base = spark.createDataFrame(rows, "k string, v long")
    old = base.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("v"),
    )
    # retract ("a", 20); insert ("b", 100) and a brand-new group ("d", 1)
    delta = spark.createDataFrame(
        [("a", 20, -1), ("b", 100, 1), ("d", 1, 1)], "k string, v long, m long"
    )
    got = {
        r["k"]: (r["n"], r["v"])
        for r in incremental_agg_refresh(old, delta, ["k"], ["v"]).collect()
    }
    assert got == {"a": (1, 10), "b": (3, 112), "c": (1, 99), "d": (1, 1)}


def test_agg_ivm_fully_retracted_group_vanishes(spark):
    from arrow_spark.operators.ivm import incremental_agg_refresh
    from pyspark.sql import functions as F

    base = spark.createDataFrame([("a", 10)], "k string, v long")
    old = base.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("v"),
    )
    delta = spark.createDataFrame([("a", 10, -1)], "k string, v long, m long")
    assert incremental_agg_refresh(old, delta, ["k"], ["v"]).count() == 0


def test_agg_ivm_empty_delta_identity(spark):
    from arrow_spark.operators.ivm import incremental_agg_refresh
    from pyspark.sql import functions as F

    base = spark.createDataFrame([("a", 10), ("b", 3)], "k string, v long")
    old = base.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("v"),
    )
    delta = spark.createDataFrame([], "k string, v long, m long")
    got = {
        r["k"]: (r["n"], r["v"])
        for r in incremental_agg_refresh(old, delta, ["k"], ["v"]).collect()
    }
    assert got == {"a": (1, 10), "b": (1, 3)}
