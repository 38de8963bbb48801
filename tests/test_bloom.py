"""Bloom sketch: no false negatives, bounded false positives, OR-merge
law."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from arrow_spark.operators.sketches import (
    bloom_build,
    bloom_merge,
    bloom_might_contain,
)

M, K = 2048, 4


@pytest.fixture(scope="module")
def vals(spark):
    return spark.createDataFrame(
        pd.DataFrame({"g": ["a"] * 100 + ["b"] * 100, "v": [f"tok{i}" for i in range(200)]})
    )


def test_no_false_negatives(spark, vals):
    blooms = bloom_build(vals, "v", keys=["g"], m_bits=M, k=K)
    probe = vals.join(blooms, "g").select(
        "g", "v", bloom_might_contain(F.col("words"), F.col("v"), M, K).alias("hit")
    )
    assert all(r["hit"] for r in probe.collect())


def test_false_positive_rate_bounded(spark, vals):
    blooms = bloom_build(vals, "v", keys=["g"], m_bits=M, k=K)
    absent = spark.createDataFrame(
        pd.DataFrame({"v": [f"absent{i}" for i in range(500)]})
    )
    probe = absent.crossJoin(blooms.where(F.col("g") == "a")).select(
        bloom_might_contain(F.col("words"), F.col("v"), M, K).alias("hit")
    )
    fp = sum(1 for r in probe.collect() if r["hit"]) / 500
    # 100 keys in 2048 bits, k=4 → theoretical fp ≈ (1-e^(-400/2048))^4 ≈ 0.1%
    assert fp < 0.05


def test_merge_equals_union_build(spark, vals):
    halves = vals.withColumn("half", (F.length("v") % 2).cast("int"))
    per_half = bloom_build(halves, "v", keys=["g", "half"], m_bits=M, k=K)
    merged = bloom_merge(per_half.drop("half"), keys=["g"])
    whole = bloom_build(vals, "v", keys=["g"], m_bits=M, k=K)
    got = {r["g"]: r["words"] for r in merged.collect()}
    want = {r["g"]: r["words"] for r in whole.collect()}
    assert got == want


def test_words_are_dense_and_sized(vals):
    (row,) = bloom_build(vals.where(F.col("g") == "a"), "v", m_bits=M, k=K).collect()
    assert len(row["words"]) == M // 64
