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


def corr_matrix(df, cols, round_to: int | None = None):
    """Pairwise Pearson correlations of ``cols`` in ONE aggregation
    pass, long-form output (col_x, col_y, n_pairs, corr).

    Each pair uses its own pairwise-complete moment sums (rows where
    both sides are non-null), so per-column null patterns don't poison
    other pairs; all C(k,2) pairs' sums live in one map-side-combined
    aggregate and reshape via a single in-row explode — no per-pair
    scans, no driver loop. Zero-variance pairs yield null corr.
    Integer-typed inputs make the sums exact (order-independent), which
    the oracle-checked registry query exploits.
    """
    from pyspark.sql import functions as F

    cols = list(cols)
    if len(cols) < 2:
        raise ValueError("need at least two columns")
    aggs = []
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    for a, b in pairs:
        both = F.col(a).isNotNull() & F.col(b).isNotNull()
        # aggregate in decimal(38,0): exact integer sums with ~1e38
        # headroom — long sums of squared cent-columns overflow int64
        # around 1e8 rows, decimal does not (and stays deterministic,
        # unlike double partial sums whose order varies by partitioning)
        dec = "decimal(38,0)"
        xa = F.when(both, F.col(a)).cast(dec)
        xb = F.when(both, F.col(b)).cast(dec)
        p = f"{a}__{b}"
        aggs += [
            F.count(xa).alias(f"n_{p}"),
            F.sum(xa).alias(f"sx_{p}"),
            F.sum(xb).alias(f"sy_{p}"),
            F.sum(xa * xb).alias(f"sxy_{p}"),
            F.sum(xa * xa).alias(f"sxx_{p}"),
            F.sum(xb * xb).alias(f"syy_{p}"),
        ]
    m = df.agg(*aggs)

    def pair_struct(a, b):
        p = f"{a}__{b}"
        # sums aggregate as exact integers, then convert ONCE to double:
        # products of long sums would overflow int64 (sx² ≈ 5e22 on cent
        # columns), and the double arithmetic is identical IEEE ops in
        # any engine given the same exact inputs
        n = F.col(f"n_{p}").cast("double")
        sx, sy = F.col(f"sx_{p}").cast("double"), F.col(f"sy_{p}").cast("double")
        sxy = F.col(f"sxy_{p}").cast("double")
        sxx, syy = F.col(f"sxx_{p}").cast("double"), F.col(f"syy_{p}").cast("double")
        cov = n * sxy - sx * sy
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        corr = F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx * vy))
        if round_to is not None:
            corr = F.round(corr, round_to)
        return F.struct(
            F.lit(a).alias("col_x"),
            F.lit(b).alias("col_y"),
            F.col(f"n_{p}").alias("n_pairs"),
            corr.alias("corr"),
        )

    exploded = m.select(
        F.explode(F.array(*[pair_struct(a, b) for a, b in pairs])).alias("p")
    )
    return exploded.select("p.col_x", "p.col_y", "p.n_pairs", "p.corr")
