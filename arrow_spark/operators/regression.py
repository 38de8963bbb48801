"""Group-wise ordinary least squares: per-key trend lines in ONE
aggregation pass.

The closed-form bivariate OLS (slope, intercept, r²) from the five
moment sums — n, Σx, Σy, Σxy, Σx², Σy² — so a trend per key costs one
map-side-combined groupBy, never an iterative fit or a per-group
collect. The per-key trend/seasonality shape every metrics pipeline
needs (Arrow ships no regression kernel; Spark's ML fit would be a
driver-side loop per group).

Determinism note: the moment sums are float additions whose order
varies with partitioning, so results are stable only to float
associativity — the query layer rounds outputs; exact cross-engine
equality additionally micro-snaps inputs (see the registry query).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def groupwise_ols(
    df: DataFrame,
    x: str | Column,
    y: str | Column,
    keys: Sequence[str] = (),
    min_points: int = 2,
) -> DataFrame:
    """Per-``keys`` OLS of y on x → (keys…, n_points, slope, intercept,
    r2). Groups with fewer than ``min_points`` valid (x, y) pairs, or
    zero x-variance, yield null slope/intercept/r2 instead of dividing
    by zero. r² is clamped to [0, 1] against float jitter."""
    keys = list(keys)
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    both = xc.isNotNull() & yc.isNotNull()
    xv = F.when(both, xc)
    yv = F.when(both, yc)
    gb = df.groupBy(*keys) if keys else df.groupBy()
    m = gb.agg(
        F.count(xv).alias("n"),
        F.sum(xv).alias("sx"),
        F.sum(yv).alias("sy"),
        F.sum(xv * yv).alias("sxy"),
        F.sum(xv * xv).alias("sxx"),
        F.sum(yv * yv).alias("syy"),
    )
    n = F.col("n").cast("double")
    det = n * F.col("sxx") - F.col("sx") * F.col("sx")
    ok = (F.col("n") >= min_points) & (det != 0)
    slope = F.when(ok, (n * F.col("sxy") - F.col("sx") * F.col("sy")) / det)
    intercept = F.when(ok, (F.col("sy") - slope * F.col("sx")) / n)
    ss_tot = n * F.col("syy") - F.col("sy") * F.col("sy")
    ss_cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    r2 = F.when(
        ok & (ss_tot != 0),
        F.least(F.greatest(ss_cov * ss_cov / (det * ss_tot), F.lit(0.0)), F.lit(1.0)),
    )
    return m.select(
        *keys,
        F.col("n").alias("n_points"),
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )


def rolling_corr(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    x_col: str,
    y_col: str,
    window_rows: int,
) -> DataFrame:
    """Trailing-window Pearson correlation of two integer-snapped
    series: adds a `corr` column over the last ``window_rows`` rows per
    key (the co-movement monitor: metric-vs-metric drift, leading-
    indicator checks).

    Exactness: the five moment sums (Σx, Σy, Σxy, Σx², Σy²) run in
    decimal(38,0) over integer inputs — exact at any width — and the
    correlation is the fixed expression

        (n·Σxy − Σx·Σy) / (√(n·Σx² − Σx²ᵗᵒᵗ) · √(n·Σy² − Σy²ᵗᵒᵗ))

    evaluated in doubles. IEEE-754 sqrt is CORRECTLY ROUNDED (unlike
    ln/exp), so the whole chain is bit-identical cross-engine: rolling
    correlation is hash-exact, not tolerance-tested. The decimal→double
    casts are exact below 2^53 — snap upstream units (cents, not
    micros, for wide windows) to stay under it.

    Partial windows (fewer than ``window_rows`` rows) and zero-variance
    windows yield NULL — never NaN (Spark orders NaN above 1.0, so a
    NaN corr would read as perfectly correlated downstream).

    Scale: ONE key-partitioned Exchange; all five sums share the same
    window frame so Tungsten computes them in a single pass. The window
    is POSITIONAL (ROWS) — gapfill upstream for strict calendar spans.
    """
    from pyspark.sql import Window as W

    w = (
        W.partitionBy(*key_cols)
        .orderBy(order_col)
        .rowsBetween(-(window_rows - 1), 0)
    )
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    x, y = d(F.col(x_col)), d(F.col(y_col))
    n = F.count(F.lit(1)).over(w)
    sx = F.sum(x).over(w)
    sy = F.sum(y).over(w)
    sxy = F.sum(x * y).over(w)
    sxx = F.sum(x * x).over(w)
    syy = F.sum(y * y).over(w)
    nn = d(n)
    num = (nn * sxy - sx * sy).cast("double")
    dx = (nn * sxx - sx * sx).cast("double")
    dy = (nn * syy - sy * sy).cast("double")
    corr = F.when(
        (n == window_rows) & (dx > 0) & (dy > 0),
        num / (F.sqrt(dx) * F.sqrt(dy)),
    )
    return df.withColumn("corr", corr)
