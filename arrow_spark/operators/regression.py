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
