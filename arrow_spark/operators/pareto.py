"""Pareto / cumulative-share cut: the smallest ranked prefix of
entities covering a target share of a total (the 80/20 revenue cut),
WITHOUT a global window.

The naive form — rank all entities by value desc, cumulative-sum, cut
at the threshold — puts the whole entity frame through one window
partition. Here the cumulative comes from the same bucket-offset prefix
pattern exact_quantiles uses: entities bucket by value range (ONE
map-side-combined shuffle of ≤n_buckets cells for the totals), the
ordered window runs only INSIDE a bucket, and cross-bucket offsets come
from the tiny per-bucket totals frame, broadcast. At 1000 executors the
per-bucket windows are independent tasks; nothing global ever sorts.

Values must be BIGINT (cents/micros-snapped by the caller) so all
cumulative arithmetic is integer and order-free — the share threshold
compares cum·denominator < total·numerator on the integer lattice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["cumulative_share_cut", "abc_classify"]


def cumulative_share_cut(
    df: DataFrame,
    key_col: str,
    value_col: str,
    share_num: int = 4,
    share_den: int = 5,
    n_buckets: int = 256,
) -> DataFrame:
    """Rows of the value-desc ranked prefix up to (and including) the
    entity that crosses share_num/share_den of the total →
    (rnk, key, value, cum_value, cum_share). Ties order by key asc —
    fully deterministic. value_col must already be integer."""
    base = df.select(
        F.col(key_col).alias("k"), F.col(value_col).cast("long").alias("val")
    )
    stats = base.agg(
        F.sum("val").alias("total"),
        F.min("val").alias("lo"),
        F.max("val").alias("hi"),
    )
    width = (F.col("hi") - F.col("lo")).cast("double") / F.lit(float(n_buckets))
    bucket = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.least(
            F.floor((F.col("val") - F.col("lo")).cast("double") / width).cast("int"),
            F.lit(n_buckets - 1),
        )
    )
    bucketed = base.crossJoin(F.broadcast(stats)).withColumn("b", bucket)
    totals = bucketed.groupBy("b").agg(
        F.sum("val").alias("bval"), F.count(F.lit(1)).cast("long").alias("bcnt")
    )
    # offsets = everything in buckets of HIGHER value range (desc order)
    higher = W.orderBy(F.col("b").desc()).rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.select(
        "b",
        F.coalesce(F.sum("bval").over(higher), F.lit(0).cast("long")).alias("off_val"),
        F.coalesce(F.sum("bcnt").over(higher), F.lit(0).cast("long")).alias("off_cnt"),
    )
    local = (
        W.partitionBy("b")
        .orderBy(F.col("val").desc(), F.col("k").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = bucketed.join(F.broadcast(offsets), "b").select(
        "k",
        "val",
        "total",
        (F.col("off_val") + F.sum("val").over(local)).alias("cum_value"),
        (F.col("off_cnt") + F.row_number().over(local)).alias("rnk"),
    )
    # keep rows whose PREVIOUS cumulative is still below the target
    # share: (cum - val)·den < total·num, pure integer compare
    kept = cum.where(
        (F.col("cum_value") - F.col("val")) * F.lit(share_den)
        < F.col("total") * F.lit(share_num)
    )
    return kept.select(
        F.col("rnk").cast("long").alias("rnk"),
        F.col("k"),
        F.col("val"),
        "cum_value",
        (F.col("cum_value").cast("double") / F.col("total").cast("double")).alias(
            "cum_share"
        ),
    )


def abc_classify(
    df: DataFrame,
    key_col: str,
    value_col: str,
    a_mille: int = 700,
    b_mille: int = 900,
    n_buckets: int = 256,
) -> DataFrame:
    """ABC inventory/revenue classification: entities ranked value-desc
    carry class 'A' while cumulative share ≤ a_mille/1000, 'B' while
    ≤ b_mille/1000, else 'C' → per-entity (k, val, cum_value, abc).
    Ties order by key asc — fully deterministic; value_col must already
    be integer. The cumulative uses the SAME bucket-offset prefix plan
    as cumulative_share_cut above (no global window); the class compare
    is integer cross-multiplication on the decimal lattice
    (cum·1000 ≤ total·mille), never a float share."""
    d38 = "decimal(38,0)"
    base = df.select(
        F.col(key_col).alias("k"), F.col(value_col).cast("long").alias("val")
    )
    stats = base.agg(
        F.sum("val").alias("total"),
        F.min("val").alias("lo"),
        F.max("val").alias("hi"),
    )
    width = (F.col("hi") - F.col("lo")).cast("double") / F.lit(float(n_buckets))
    bucket = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.least(
            F.floor((F.col("val") - F.col("lo")).cast("double") / width).cast("int"),
            F.lit(n_buckets - 1),
        )
    )
    bucketed = base.crossJoin(F.broadcast(stats)).withColumn("b", bucket)
    totals = bucketed.groupBy("b").agg(F.sum("val").alias("bval"))
    higher = W.orderBy(F.col("b").desc()).rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.select(
        "b",
        F.coalesce(F.sum("bval").over(higher), F.lit(0).cast("long")).alias("off_val"),
    )
    local = (
        W.partitionBy("b")
        .orderBy(F.col("val").desc(), F.col("k").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = bucketed.join(F.broadcast(offsets), "b").select(
        "k",
        "val",
        "total",
        (F.col("off_val") + F.sum("val").over(local)).alias("cum_value"),
    )
    cumd = F.col("cum_value").cast(d38) * F.lit(1000)
    totd = F.col("total").cast(d38)
    abc = (
        F.when(cumd <= totd * F.lit(int(a_mille)), F.lit("A"))
        .when(cumd <= totd * F.lit(int(b_mille)), F.lit("B"))
        .otherwise(F.lit("C"))
    )
    return cum.select("k", "val", "cum_value", abc.alias("abc"))
