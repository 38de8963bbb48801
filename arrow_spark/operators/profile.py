"""One-pass table profiling: per-column null / distinct / range / mean
statistics in a single aggregate job.

The "analyze my 100 TB table before training on it" primitive: schema
drift, null explosions, constant columns, and out-of-range values all
surface here. Reference analog: Arrow's compute aggregates (count /
count_distinct / min_max / mean — cpp/src/arrow/compute/kernels/
aggregate_basic.cc) which users compose per column; this operator runs
the whole matrix in ONE scan.

Scale: every statistic is expressed in a single ``df.agg(...)`` — one
pass, map-side partials, one shuffle of a handful of rows per column.
Exact distinct counts use Spark's count(DISTINCT) expansion (one extra
Expand stage, still a single scan of the source); pass
``approx_distinct=True`` to swap in HLL sketches (approx_count_distinct,
rsd 1.5%) and drop the Expand — the right default at 100 TB, kept off
here so the output is DuckDB-oracle-exact.

Float determinism: means are computed as floor-reconstructed decimal
sums (floor(sum·10^d + 0.5) / 10^d, then divided by the row count and
floored to 6 decimals), so cross-engine/partition-order float
accumulation cannot move the value — same recipe as the TPC-H suite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["profile_table"]

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def _floor_dec(col: Column, d: int) -> Column:
    return F.floor(col * (10 ** d) + F.lit(0.5)) / (10 ** d)


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    mean_decimals: int = 2,
    approx_distinct: bool = False,
    ts_format: str = "yyyy-MM-dd HH:mm:ss",
) -> DataFrame:
    """Profile ``columns`` (default: all) of ``df`` in one aggregate.

    Returns one row per column:
    (column, dtype, n_rows, n_nulls, n_distinct, min_num, max_num,
    min_str, max_str, mean) — numeric ranges/means in the ``_num``/
    ``mean`` slots, string and timestamp ranges (timestamps formatted
    with ``ts_format``) in the ``_str`` slots; the unused slots are
    NULL.
    """
    cols = columns or [f.name for f in df.schema.fields]
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n__")]
    for c in cols:
        dt = df.schema[c].dataType
        col = F.col(c)
        aggs.append(F.count(col).alias(f"__nn_{c}"))
        if approx_distinct:
            aggs.append(F.approx_count_distinct(col).alias(f"__nd_{c}"))
        else:
            aggs.append(F.count_distinct(col).alias(f"__nd_{c}"))
        if isinstance(dt, _NUMERIC):
            aggs.append(F.min(col).cast("double").alias(f"__mn_{c}"))
            aggs.append(F.max(col).cast("double").alias(f"__mx_{c}"))
            aggs.append(
                _floor_dec(F.sum(col.cast("double")), mean_decimals).alias(f"__sm_{c}")
            )
        elif isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            aggs.append(F.date_format(F.min(col), ts_format).alias(f"__mns_{c}"))
            aggs.append(F.date_format(F.max(col), ts_format).alias(f"__mxs_{c}"))
        elif isinstance(dt, T.StringType):
            aggs.append(F.min(col).alias(f"__mns_{c}"))
            aggs.append(F.max(col).alias(f"__mxs_{c}"))
    one = df.agg(*aggs)

    rows = []
    for c in cols:
        dt = df.schema[c].dataType
        is_num = isinstance(dt, _NUMERIC)
        has_str = isinstance(dt, (T.StringType, T.TimestampType, T.TimestampNTZType))
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.lit(dt.simpleString()).alias("dtype"),
                F.col("__n__").alias("n_rows"),
                (F.col("__n__") - F.col(f"__nn_{c}")).alias("n_nulls"),
                F.col(f"__nd_{c}").cast("long").alias("n_distinct"),
                (F.col(f"__mn_{c}") if is_num else F.lit(None).cast("double")).alias("min_num"),
                (F.col(f"__mx_{c}") if is_num else F.lit(None).cast("double")).alias("max_num"),
                (F.col(f"__mns_{c}") if has_str else F.lit(None).cast("string")).alias("min_str"),
                (F.col(f"__mxs_{c}") if has_str else F.lit(None).cast("string")).alias("max_str"),
                (
                    _floor_dec(
                        F.col(f"__sm_{c}") / F.col(f"__nn_{c}"), 6
                    )
                    if is_num
                    else F.lit(None).cast("double")
                ).alias("mean"),
            )
        )
    return one.select(F.explode(F.array(*rows)).alias("p")).select("p.*")
