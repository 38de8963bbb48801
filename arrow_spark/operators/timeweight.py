"""Time-weighted aggregation over irregular time series.

The mean of irregularly-sampled points is biased toward bursts; the
time-weighted average (the TimescaleDB ``time_weight('LOCF', …)`` /
``average()`` pair, also kdb+'s ``wavg`` over durations) weights each
observation by how long it remained the latest value. Relational form:
ONE key-partitioned window pass (``lead`` over event time) to get each
point's holding duration, then ONE group-by over (key, bucket) with
exact decimal moment sums — two shuffles total, both on the natural
keys, map-side combined.

Exactness contract: timestamps snap to whole epoch seconds and values
to integer cents BEFORE any arithmetic, the weighted sum runs in
decimal(38,0) (exact, order-independent), and the average is a single
IEEE division of identical operands on every engine — so the result is
value-hash exact against a DuckDB replay (HUGEINT sum → one DOUBLE
division), not tolerance-checked.

Scale: at 100 TB the window partitions by series key (no global sort);
skewed keys fall back to AQE. The group-by reuses the same key prefix,
so with bucketed storage the second shuffle disappears entirely.

Reference anchor: the reference's temporal kernels stop at
extract/round (cpp/src/arrow/compute/kernels/scalar_temporal_unary.cc);
duration-weighted folds are left to query engines — this is the
composition its users build downstream.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def time_weighted_avg(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_cents: Column,
    bucket_seconds: int,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """LOCF time-weighted average per (keys…, bucket_start).

    Each point's value holds from its (whole-second) timestamp until the
    NEXT point of the same key; that whole segment is credited to the
    bucket containing the segment start (no segment splitting — keeps
    the op a pure per-row window + group-by). A key's final point has no
    following observation and contributes 0 duration; a bucket whose
    only points are final ones yields NULL twa_cents, never 0/0 = NaN.

    Returns (keys…, bucket_start, n_points, total_dt, twa_cents) where
    twa_cents = Σ value·dt / Σ dt, micro-snapped (floor(x·1e6 + ½)/1e6)
    so the hash is stable on every engine.
    """
    keys = list(key_cols)
    t = F.floor(F.unix_timestamp(F.col(ts_col))).cast("long")
    pts = df.select(
        *keys,
        t.alias("__t__"),
        value_cents.cast("long").alias("__cents__"),
        *[F.col(c) for c in tiebreak],
    )
    w = W.partitionBy(*keys).orderBy("__t__", *tiebreak)
    seg = pts.withColumn("__dt__", F.lead("__t__").over(w) - F.col("__t__"))
    bucket = (F.floor(F.col("__t__") / bucket_seconds) * bucket_seconds).cast("long")
    dec = F.col("__cents__").cast("decimal(38,0)") * F.col("__dt__").cast(
        "decimal(38,0)"
    )
    agg = (
        seg.withColumn("__bucket__", bucket)
        .groupBy(*keys, F.col("__bucket__").alias("bucket_start"))
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.coalesce(F.sum("__dt__"), F.lit(0)).cast("long").alias("total_dt"),
            F.sum(dec).alias("__wsum__"),
        )
    )
    twa = F.when(
        F.col("total_dt") > 0,
        F.floor(
            F.col("__wsum__").cast("double") / F.col("total_dt") * 1e6 + F.lit(0.5)
        )
        / 1e6,
    )
    return agg.select(
        *keys, "bucket_start", "n_points", "total_dt", twa.alias("twa_cents")
    )
