"""stratified_split: exact per-stratum proportions, determinism,
decomposition-vs-naive equality."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from arrow_spark.llm.corpus import stratified_split


def _docs(spark, sizes: dict[str, int]):
    rows = []
    i = 0
    for lang, n in sizes.items():
        for _ in range(n):
            rows.append((i, lang))
            i += 1
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "lang"]))


def test_exact_proportions_per_stratum(spark):
    out = stratified_split(_docs(spark, {"en": 100, "de": 40, "fr": 7}))
    counts = {
        (r["lang"], r["split"]): r["n"]
        for r in out.groupBy("lang", "split").agg(F.count("*").alias("n")).collect()
    }
    # n=100: 80/10/10.  n=40: 32/4/4.  n=7: floor(5.6)=5 train,
    # floor(6.3)-5=1 val, 1 test — the rare stratum is NOT starved.
    assert counts[("en", "train")] == 80 and counts[("en", "val")] == 10
    assert counts[("de", "train")] == 32 and counts[("de", "val")] == 4
    assert counts[("fr", "train")] == 5 and counts[("fr", "val")] == 1
    assert counts[("fr", "test")] == 1


def test_two_level_rank_equals_naive_window(spark):
    docs = _docs(spark, {"en": 83, "xx": 3})
    fast = {r["doc_id"]: r["split"] for r in stratified_split(docs, n_buckets=8).collect()}
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    w = W.partitionBy("lang").orderBy("h", "doc_id")
    naive = (
        docs.withColumn("h", h)
        .withColumn("rk", F.row_number().over(w))
        .withColumn("n", F.count("*").over(W.partitionBy("lang")))
        .select(
            "doc_id",
            F.when(F.expr("rk <= n * 8 div 10"), "train")
            .when(F.expr("rk <= n * 9 div 10"), "val")
            .otherwise("test")
            .alias("split"),
        )
    )
    assert fast == {r["doc_id"]: r["split"] for r in naive.collect()}


def test_deterministic_and_growth_stable_ranks(spark):
    docs = _docs(spark, {"en": 50})
    a = sorted(map(tuple, stratified_split(docs).collect()))
    b = sorted(map(tuple, stratified_split(docs).collect()))
    assert a == b


def test_every_row_assigned_exactly_once(spark):
    docs = _docs(spark, {"en": 31, "de": 2})
    out = stratified_split(docs)
    assert out.count() == 33
    assert out.select("doc_id").distinct().count() == 33
