"""Visual time-series downsampling: largest-triangle-three-buckets.

LTTB (Steinarsson, "Downsampling Time Series for Visual Representation",
2013) keeps, per bucket, the point forming the largest triangle with its
neighbors — the standard lossy downsampler for dashboards over raw
series. The sequential algorithm anchors each triangle on the PREVIOUS
SELECTED point, which serializes the scan; this is the fixed-anchor
parallel variant (anchor = neighbor-bucket centroid, the same
approximation the original thesis evaluates as "LTTB with dynamic
buckets" baselines): every bucket decides independently, so the whole
pass is two shuffles (bucket centroids, then per-bucket argmax) with no
sequential dependency — the variant that actually scales to 100 TB of
series data.

Exactness contract: timestamps snap to epoch seconds, values to cents;
bucket assignment is pure integer arithmetic on row_number; centroid
means are single IEEE divisions of exact integer sums; the triangle
area is one fixed-shape double expression — so the winning point per
bucket (area desc, then t asc, then tiebreak) is value-hash exact
against a DuckDB replay.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def lttb_downsample(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_cents: Column,
    n_buckets: int,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Keep ~``n_buckets`` points per key: per equal-count bucket, the
    point with the largest triangle area against the previous and next
    bucket centroids. Buckets missing a neighbor (the first and last)
    keep their earliest point, so each key's global first point always
    survives. Returns (keys…, bucket, t, v_cents, area2) where area2 is
    twice the winning triangle's area (NULL for edge buckets).
    """
    keys = list(key_cols)
    t = F.floor(F.unix_timestamp(F.col(ts_col))).cast("long")
    pts = df.select(
        *keys,
        t.alias("t"),
        value_cents.cast("long").alias("v_cents"),
        *[F.col(c) for c in tiebreak],
    )
    w = W.partitionBy(*keys)
    order = w.orderBy("t", *tiebreak)
    pts = pts.withColumn("__rn__", F.row_number().over(order)).withColumn(
        "__n__", F.count(F.lit(1)).over(w)
    )
    # equal-count buckets: floor((rn-1)·k / n) — pure integer arithmetic
    pts = pts.withColumn(
        "bucket",
        F.floor((F.col("__rn__") - 1) * n_buckets / F.col("__n__")).cast("long"),
    ).drop("__rn__", "__n__")

    cent = pts.groupBy(*keys, "bucket").agg(
        F.sum("t").cast("double").alias("__st__"),
        F.sum("v_cents").cast("double").alias("__sv__"),
        F.count(F.lit(1)).cast("double").alias("__c__"),
    )
    prev = cent.select(
        *keys,
        (F.col("bucket") + 1).alias("bucket"),
        (F.col("__st__") / F.col("__c__")).alias("__tp__"),
        (F.col("__sv__") / F.col("__c__")).alias("__vp__"),
    )
    nxt = cent.select(
        *keys,
        (F.col("bucket") - 1).alias("bucket"),
        (F.col("__st__") / F.col("__c__")).alias("__tn__"),
        (F.col("__sv__") / F.col("__c__")).alias("__vn__"),
    )
    j = pts.join(prev, [*keys, "bucket"], "left").join(nxt, [*keys, "bucket"], "left")
    # twice the triangle area, one fixed-shape expression (identical
    # operand order in the DuckDB replay)
    area2 = F.abs(
        (F.col("__tp__") - F.col("__tn__"))
        * (F.col("v_cents").cast("double") - F.col("__vn__"))
        - (F.col("__tp__") - F.col("t").cast("double"))
        * (F.col("__vp__") - F.col("__vn__"))
    )
    j = j.withColumn("area2", area2)
    # winner per bucket: largest area first; edge buckets (NULL area —
    # no neighbor centroid) keep their earliest point via NULLS LAST +
    # the t ascending tiebreak
    pick = W.partitionBy(*keys, "bucket").orderBy(
        F.col("area2").desc_nulls_last(), F.col("t").asc(), *tiebreak
    )
    return (
        j.withColumn("__pick__", F.row_number().over(pick))
        .where(F.col("__pick__") == 1)
        .select(*keys, "bucket", "t", "v_cents", "area2")
    )
