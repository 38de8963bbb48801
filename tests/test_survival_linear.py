"""The KM linear_fold path must be bit-identical to the window fold.

The window fold multiplies each row's factor prefix left-to-right in
double precision; ``np.multiply.accumulate`` performs the identical
rounding sequence (1.0 * f1 == f1 exactly, then one IEEE-754 double
multiply per step), so the two paths must agree to the last bit — no
tolerance anywhere in this file.
"""

from __future__ import annotations

import random
import struct

from arrow_spark.operators.survival import kaplan_meier


def _bits(x: float) -> int:
    return struct.unpack("<Q", struct.pack("<d", x))[0]


def _by_key(rows):
    return {
        tuple(r[k] for k in ("g", "t")): r for r in rows
    }


def _assert_bit_identical(spark, df):
    fold = kaplan_meier(df, ["g"], "t", "e").collect()
    linear = kaplan_meier(df, ["g"], "t", "e", linear_fold=True).collect()
    assert len(fold) == len(linear) > 0
    fk, lk = _by_key(fold), _by_key(linear)
    assert fk.keys() == lk.keys()
    for key, fr in fk.items():
        lr = lk[key]
        for col in ("n_at_risk", "d_events", "n_censored"):
            assert fr[col] == lr[col], (key, col)
        assert _bits(fr["survival"]) == _bits(lr["survival"]), (
            key,
            fr["survival"].hex(),
            lr["survival"].hex(),
        )


def test_linear_fold_bit_identical_random(spark):
    rng = random.Random(1337)
    rows = [
        (f"g{rng.randrange(3)}", rng.randrange(1, 400), rng.randrange(2))
        for _ in range(3000)
    ]
    df = spark.createDataFrame(rows, "g string, t long, e long")
    _assert_bit_identical(spark, df)


def test_linear_fold_bit_identical_fine_grained_durations(spark):
    # Near-unique durations: the regime where the window fold's O(T²)
    # per-group CPU bites and linear_fold is the intended path.
    rng = random.Random(7)
    rows = [
        ("g0", rng.randrange(1, 10**9), rng.randrange(2)) for _ in range(4000)
    ]
    df = spark.createDataFrame(rows, "g string, t long, e long")
    _assert_bit_identical(spark, df)


def test_linear_fold_zero_factor_terminates_curve(spark):
    # All remaining subjects have events at the last time: factor 0,
    # survival exactly 0.0 from that step on — both paths.
    rows = [("g0", 1, 0), ("g0", 1, 1), ("g0", 5, 1), ("g0", 5, 1)]
    df = spark.createDataFrame(rows, "g string, t long, e long")
    _assert_bit_identical(spark, df)
    out = {
        r["t"]: r["survival"]
        for r in kaplan_meier(df, ["g"], "t", "e", linear_fold=True).collect()
    }
    assert out[5] == 0.0


def test_linear_fold_registered_query_shape(spark, sf_dir):
    # The survival_kaplan_meier registration's exact input shape.
    from pyspark.sql import functions as F

    from arrow_spark.catalog import table

    subj = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.datediff(F.max("ts"), F.min("ts")).cast("long").alias("t"),
            F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("e"),
        )
        .withColumn("g", (F.col("user_id") % 3).cast("string"))
        .select("g", "t", "e")
    )
    _assert_bit_identical(spark, subj)
