"""bootstrap_mean_ci tests: determinism, coverage sanity, weight law."""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_spark.operators.abtest import POISSON1_Q60, bootstrap_mean_ci


def _rows(spark, vals, grp="g"):
    return spark.createDataFrame(
        [(grp, i, v) for i, v in enumerate(vals)], "g string, id long, v long"
    )


def test_bootstrap_deterministic(spark):
    df = _rows(spark, [10, 20, 30, 40, 50] * 20)
    a = bootstrap_mean_ci(df, ["g"], "id", "v").collect()[0]
    b = bootstrap_mean_ci(df, ["g"], "id", "v").collect()[0]
    assert (a["ci_lo"], a["ci_hi"]) == (b["ci_lo"], b["ci_hi"])


def test_bootstrap_ci_brackets_mean(spark):
    vals = [100 + (i % 7) for i in range(200)]
    df = _rows(spark, vals)
    r = bootstrap_mean_ci(df, ["g"], "id", "v").collect()[0]
    assert r["n"] == 200
    assert r["mean"] == sum(vals) / len(vals)
    assert r["ci_lo"] <= r["mean"] <= r["ci_hi"]
    assert r["ci_lo"] < r["ci_hi"]
    # a 7-point spread around 103: the CI of the mean must be tight
    assert r["ci_hi"] - r["ci_lo"] < 2.0


def test_bootstrap_interval_scales_with_spread(spark):
    tight = bootstrap_mean_ci(
        _rows(spark, [100 + (i % 3) for i in range(100)]), ["g"], "id", "v"
    ).collect()[0]
    wide = bootstrap_mean_ci(
        _rows(spark, [100 + 50 * (i % 3) for i in range(100)]), ["g"], "id", "v"
    ).collect()[0]
    assert (wide["ci_hi"] - wide["ci_lo"]) > (tight["ci_hi"] - tight["ci_lo"])


def test_bootstrap_groups_independent(spark):
    df = spark.createDataFrame(
        [("a", i, 10) for i in range(50)] + [("b", i, 99) for i in range(50)],
        "g string, id long, v long",
    )
    rows = {r["g"]: r for r in bootstrap_mean_ci(df, ["g"], "id", "v").collect()}
    assert rows["a"]["mean"] == 10.0 and rows["a"]["ci_lo"] == 10.0
    assert rows["b"]["ci_hi"] == 99.0  # constant series: degenerate CI


def test_poisson_weight_law(spark):
    # the hash-drawn weights must average ~1 (Poisson(1)): the bootstrap
    # is unbiased only if the weight law is right
    from arrow_spark.functions.portable_hash import portable_hash64

    df = spark.range(20000).select(F.col("id").cast("string").alias("s"))
    h = portable_hash64(F.col("s"), 0)
    w = sum((h >= F.lit(t)).cast("int") for t in POISSON1_Q60)
    stats = df.select(w.alias("w")).agg(
        F.avg("w").alias("mu"), F.avg((F.col("w") == 0).cast("int")).alias("p0")
    ).collect()[0]
    assert abs(stats["mu"] - 1.0) < 0.02
    assert abs(stats["p0"] - 0.3679) < 0.01
