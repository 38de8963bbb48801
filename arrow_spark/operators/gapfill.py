"""Time-series gap filling: densify bucketed series and fill missing
buckets by LOCF or linear interpolation (the time_bucket_gapfill /
locf / interpolate pattern of hypertable systems; Arrow itself stops at
`fill_null_forward/backward` over an already-dense column — SURVEY
§2.2 vector family, reference kernel vector_replace.cc).

Shape: bucket → aggregate → per-group densify (sequence/explode of the
missing buckets) → windowed fill. Everything is built-in Catalyst
expressions; no UDFs, no driver-side time loops.

Scale: the dense grid is generated per group from that group's own
[min, max] bucket range — `sequence()` explodes inside the task that
owns the group, so grid size is (span / step) rows per key and never a
driver loop or a cross join against a global calendar frame. The fill
windows partition on the group keys (one pass, no global window). At
100 TB the only shuffle is the bucket aggregation itself plus the one
hash exchange the windows reuse.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def time_bucket(ts: Column, step_seconds: int) -> Column:
    """Epoch-second bucket start (long). Kept as a long, not a
    timestamp, so cross-engine comparisons never touch timezones."""
    return (F.floor(F.unix_timestamp(ts) / step_seconds) * step_seconds).cast("long")


def gap_fill(
    df: DataFrame,
    ts_col: str,
    step_seconds: int,
    by: Sequence[str],
    value_agg: Column,
    fill: str = "both",
) -> DataFrame:
    """Bucket ``ts_col`` into ``step_seconds`` windows per ``by`` group,
    aggregate ``value_agg`` per bucket, then densify each group's
    [min, max] bucket range and fill the empty buckets.

    Returns (by..., bucket, n_rows, v, v_locf, v_interp):
      - ``v`` — the per-bucket aggregate, null in gap buckets;
      - ``v_locf`` — last observation carried forward (leading-edge
        buckets before the first observation stay null);
      - ``v_interp`` — linear interpolation between the neighbouring
        observations; edges fall back to the nearest observation.

    ``fill`` selects which fill columns to compute ("locf", "linear",
    "both").
    """
    if fill not in ("locf", "linear", "both"):
        raise ValueError(f"fill must be locf|linear|both, got {fill!r}")
    keys = [F.col(k) for k in by]
    bucketed = (
        df.groupBy(*keys, time_bucket(F.col(ts_col), step_seconds).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_rows"), value_agg.alias("v"))
    )
    # densify: per group, the full bucket grid between its min and max —
    # sequence() materializes inside the owning task, then a left join
    # back on (keys, bucket) marks the gaps. Both sides share the
    # (keys)-hash exchange, so AQE plans this as one shuffle stage.
    spans = bucketed.groupBy(*[F.col(k) for k in by]).agg(
        F.min("bucket").alias("__mn__"), F.max("bucket").alias("__mx__")
    )
    grid = spans.select(
        *[F.col(k) for k in by],
        F.explode(
            F.sequence(
                F.col("__mn__"), F.col("__mx__"), F.lit(step_seconds).cast("long")
            )
        ).alias("bucket"),
    )
    dense = grid.join(bucketed, [*by, "bucket"], "left").withColumn(
        "n_rows", F.coalesce(F.col("n_rows"), F.lit(0))
    )
    w = W.partitionBy(*[F.col(k) for k in by]).orderBy("bucket")
    past = w.rowsBetween(W.unboundedPreceding, 0)
    future = w.rowsBetween(0, W.unboundedFollowing)
    v = F.col("v")
    out = dense
    prev_v = F.last("v", ignorenulls=True).over(past)
    if fill in ("locf", "both"):
        out = out.withColumn("v_locf", prev_v)
    if fill in ("linear", "both"):
        next_v = F.first("v", ignorenulls=True).over(future)
        prev_t = F.last(F.when(v.isNotNull(), F.col("bucket")), ignorenulls=True).over(
            past
        )
        next_t = F.first(F.when(v.isNotNull(), F.col("bucket")), ignorenulls=True).over(
            future
        )
        frac = (F.col("bucket") - prev_t) / (next_t - prev_t)
        interp = (
            F.when(v.isNotNull(), v)
            .when(prev_t.isNull(), next_v)  # leading edge
            .when(next_t.isNull(), prev_v)  # trailing edge
            .otherwise(prev_v + (next_v - prev_v) * frac)
        )
        out = out.withColumn(
            "v_interp", F.floor(interp * 1e6 + F.lit(0.5)) / 1e6
        )
    return out
