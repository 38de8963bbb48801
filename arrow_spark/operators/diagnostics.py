"""Skew and layout diagnostics: the measurements that decide WHICH
scale strategy (salting, broadcast, AQE skew-join, repartition) a 100 TB
job needs before it runs.

`key_skew` is a plain relational profile (works on any engine — oracle
checked); `partition_stats` inspects the PHYSICAL layout of this plan's
partitions, which only the engine itself can see (rows-only by nature).
Both are single-shuffle and driver-safe: the driver receives top-N rows
or one row per partition id, never data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_skew(
    df: DataFrame, keys: Sequence[str], top: int = 10
) -> DataFrame:
    """Top-N heaviest key groups with their share of all rows — the
    number that says whether the shuffle on ``keys`` needs salting
    (share ≫ 1/shuffle-partitions ⇒ one reducer owns that key). One
    count shuffle + a 1-row broadcast total + TakeOrdered."""
    counts = df.groupBy(*[F.col(k) for k in keys]).agg(
        F.count(F.lit(1)).alias("n")
    )
    total = counts.agg(F.sum("n").alias("__tot__"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            *keys,
            "n",
            (F.floor(F.col("n") / F.col("__tot__") * 1e6 + F.lit(0.5)) / 1e6).alias(
                "share"
            ),
        )
        .orderBy(F.col("n").desc(), *[F.col(k).asc() for k in keys])
        .limit(top)
    )


def partition_stats(df: DataFrame) -> DataFrame:
    """Physical rows-per-partition profile of THIS plan's current
    partitioning (spark_partition_id is plan-dependent by design —
    that's the point: run it before and after a repartition/bucketing
    change to see the balance). Returns one row per non-empty partition
    plus max/mean ratio columns on each row for quick reading."""
    per = (
        df.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .agg(F.count(F.lit(1)).alias("rows"))
    )
    stats = per.agg(
        F.max("rows").alias("__mx__"),
        F.avg("rows").alias("__mean__"),
        F.count(F.lit(1)).alias("__np__"),
    )
    return per.crossJoin(F.broadcast(stats)).select(
        "pid",
        "rows",
        F.col("__np__").alias("n_partitions"),
        (F.floor(F.col("__mx__") / F.col("__mean__") * 1e6 + F.lit(0.5)) / 1e6).alias(
            "skew_factor"
        ),
    )
