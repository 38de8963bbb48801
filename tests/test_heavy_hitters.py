"""heavy_hitters: exactness vs brute force, partition invariance."""

from __future__ import annotations

import random
from collections import Counter

from arrow_spark.operators.sketches import heavy_hitters


def _brute(vals, k):
    n = len(vals)
    return {x: c for x, c in Counter(vals).items() if c * k > n}


def _run(spark, vals, k, parts=None):
    df = spark.createDataFrame([(v,) for v in vals], "x string")
    if parts:
        df = df.repartition(parts)
    return {
        r["item"]: r["cnt"] for r in heavy_hitters(df, "x", k).collect()
    }


def test_skewed_known(spark):
    vals = ["a"] * 50 + ["b"] * 30 + list("cdefghijklmnopqrst")  # n=98
    got = _run(spark, vals, k=4)  # threshold 24.5
    assert got == {"a": 50, "b": 30}


def test_matches_brute_force_random(spark):
    rng = random.Random(11)
    vals = [rng.choice("abcdefghij" * 1 + "ab" * 8) for _ in range(500)]
    for k in (3, 5, 10):
        assert _run(spark, vals, k) == _brute(vals, k)


def test_partitioning_invariant(spark):
    # the candidate set depends on physical partitioning; the RESULT
    # must not
    vals = ["x"] * 40 + ["y"] * 25 + ["z"] * 10 + list("abcdefghij")
    base = _run(spark, vals, k=4)
    for parts in (1, 3, 13):
        assert _run(spark, vals, k=4, parts=parts) == base


def test_strict_threshold_boundary(spark):
    # 25 of 100 at k=4: 25*4 = 100 is NOT > 100 — excluded (strict)
    vals = ["a"] * 25 + [f"w{i}" for i in range(75)]
    got = _run(spark, vals, k=4)
    assert got == {}
