"""Hypertable-style cascading time rollups (continuous-aggregate
pattern).

The reference's ecosystem answers coarse time-bucket queries from
pre-aggregated finer buckets rather than raw rows; Arrow itself has only
the one-shot aggregate node (SURVEY §2.1). Spark-side the cascade is a
chain of groupBy levels where level N+1 aggregates level N's PARTIALS
(sum of sums, sum of counts) — algebraically exact for the decomposable
aggregates exposed here.

Scale: the raw table is touched exactly once (the finest level); every
coarser level aggregates bucket_count × keys rows — orders of magnitude
smaller. Each level is one hash shuffle on (bucket, keys); at 100 TB the
hourly level is the only full-data pass, and persisted hourly output can
serve every coarser query thereafter (the tee/write node composes here).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# each level must be an integer multiple of the previous one
_LEVEL_ORDER = ("minute", "hour", "day", "week", "month", "year")


def cascade_rollup(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    keys: Sequence[str] = (),
    levels: Sequence[str] = ("hour", "day"),
) -> dict[str, DataFrame]:
    """Build per-level rollups where each level re-aggregates the
    previous level's partial sums/counts/mins/maxes.

    Returns {level: DataFrame(bucket, *keys, sum_v, n_v, min_v, max_v)}.
    sum/count/min/max are decomposable, so every level is exact — the
    oracle check aggregates raw rows directly at the coarsest level and
    must hash-match.
    """
    order = [lv for lv in _LEVEL_ORDER if lv in levels]
    return _cascade(df, ts_col, value_col, keys, levels, order)


def refresh_rollup(
    prev: DataFrame,
    delta: DataFrame,
    ts_col: str,
    value_col: str,
    keys: Sequence[str] = (),
    level: str = "day",
) -> DataFrame:
    """Continuous-aggregate refresh: fold a raw ``delta`` into an
    existing ``prev`` rollup at ``level`` WITHOUT rescanning history.
    The delta is rolled up to the same level, then partials merge
    (sum+sum, count+count, min∧min, max∨max) — algebraically exact for
    the decomposable aggregates this frame carries, which is the whole
    hypertable continuous-aggregate contract: the refresh touches only
    the delta's buckets' worth of new data.

    Scale: prev is bucket_count × keys rows (already tiny vs raw); the
    delta pass is one groupBy over new rows only. An out-of-order
    straggler lands correctly because merging partials is commutative —
    no watermark needed at the rollup layer.
    """
    d = cascade_rollup(delta, ts_col, value_col, keys, levels=(level,))[level]
    return (
        prev.unionByName(d)
        .groupBy("bucket", *[F.col(k) for k in keys])
        .agg(
            F.sum("sum_v").alias("sum_v"),
            F.sum("n_v").alias("n_v"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
    )


def _cascade(df, ts_col, value_col, keys, levels, order):
    if list(levels) != order:
        raise ValueError(f"levels must be increasing granularities, got {levels}")
    out: dict[str, DataFrame] = {}
    finest = levels[0]
    cur = (
        df.groupBy(
            F.date_trunc(finest, F.col(ts_col)).alias("bucket"), *[F.col(k) for k in keys]
        )
        .agg(
            F.sum(value_col).alias("sum_v"),
            F.count(value_col).alias("n_v"),
            F.min(value_col).alias("min_v"),
            F.max(value_col).alias("max_v"),
        )
    )
    out[finest] = cur
    # week buckets straddle month/year boundaries, so month+ levels must NOT
    # cascade from the week rollup — date_trunc('month', week_bucket) would
    # assign a straddling week entirely to the earlier month. Track the last
    # level whose buckets nest cleanly into month/year and cascade from it.
    nestable = cur if finest != "week" else None
    for lv in levels[1:]:
        src = cur
        if lv in ("month", "year") and src is out.get("week"):
            if nestable is None:
                raise ValueError(
                    "cannot cascade week → month/year (weeks straddle month "
                    "boundaries); include a sub-week level, e.g. ('day','week','month')"
                )
            src = nestable
        cur = (
            src.groupBy(
                F.date_trunc(lv, F.col("bucket")).alias("bucket"), *[F.col(k) for k in keys]
            )
            .agg(
                F.sum("sum_v").alias("sum_v"),
                F.sum("n_v").alias("n_v"),
                F.min("min_v").alias("min_v"),
                F.max("max_v").alias("max_v"),
            )
        )
        out[lv] = cur
        if lv != "week":
            nestable = cur
    return out
