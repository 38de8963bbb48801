"""Robust per-group outlier detection: median/MAD flagging.

The production screen for telemetry and quality pipelines: mean/stddev
flagging breaks down exactly when outliers are present (the outliers
inflate the threshold); median ± k·1.4826·MAD is the standard robust
replacement (Hampel identifier; 1.4826 ≈ 1/Φ⁻¹(3/4) rescales MAD to σ
under normality).

Plan shape: both robust statistics are aggregate-as-window computations
over the SAME partitioning, so Catalyst plans ONE Exchange on the group
keys followed by two Window operators and a codegen projection — no
join-back of a stats table, no second shuffle (plan-pinned in
tests/test_outliers.py).

Exactness: for integer-snapped inputs, ``percentile`` interpolation
midpoints are exact dyadics (x.0 / x.5, then x.25 for the MAD of
half-integer deviations), and the threshold compare multiplies exactly
representable doubles — deterministic and replayable bit-for-bit by a
DuckDB ``median``-window oracle, same posture as operators/smoothing.py.

Reference anchor: approximate/exact quantiles live in the reference's
aggregate kernels (cpp/src/arrow/compute/kernels/aggregate_quantile.cc);
the robust-flagging composition is left to callers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

#: Consistency constant: MAD·MAD_SIGMA estimates σ for normal data.
MAD_SIGMA = 1.4826


def mad_outliers(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    k: float = 3.0,
    out_prefix: str = "",
) -> DataFrame:
    """Flag rows where |x - median| > k·1.4826·MAD within their group.

    Adds ``{p}median``, ``{p}mad``, ``{p}deviation``, ``{p}is_outlier``.
    Degenerate groups (MAD = 0, i.e. >half the group at the median) flag
    every row off the median — the conventional Hampel behavior.
    """
    p = out_prefix
    win = W.partitionBy(*keys)
    med = F.expr(f"percentile({value_col}, 0.5)").over(win)
    df = df.withColumn(f"{p}median", med)
    dev = F.abs(F.col(value_col) - F.col(f"{p}median"))
    df = df.withColumn(f"{p}deviation", dev)
    mad = F.expr(f"percentile({p}deviation, 0.5)").over(win)
    df = df.withColumn(f"{p}mad", mad)
    return df.withColumn(
        f"{p}is_outlier",
        F.col(f"{p}deviation") > F.lit(k * MAD_SIGMA) * F.col(f"{p}mad"),
    )


def seasonal_residuals(
    df: DataFrame,
    keys: Sequence[str],
    season_col: str,
    value_col: str,
    k: float = 3.0,
    out_prefix: str = "",
) -> DataFrame:
    """Seasonal-baseline anomaly flags: remove the per-(keys, season)
    median baseline (e.g. hour-of-day), then Hampel-flag the residuals
    per key group — the ops-monitoring detector that doesn't page on
    the nightly batch being nightly.

    Adds ``{p}baseline``, ``{p}residual``, ``{p}res_mad``,
    ``{p}season_flag``. Two window partitionings (keys+season for the
    baseline, keys for the residual MAD) ⇒ two Exchanges — the minimum
    for the two grouping granularities. Exactness: on integer-snapped
    inputs every median lands on a dyadic grid (0.5 → 0.25 → 0.125), so
    flags replay bit-exact (operators/smoothing.py contract).
    """
    p = out_prefix
    season_win = W.partitionBy(*keys, season_col)
    key_win = W.partitionBy(*keys)
    df = df.withColumn(
        f"{p}baseline", F.expr(f"percentile({value_col}, 0.5)").over(season_win)
    )
    df = df.withColumn(f"{p}residual", F.col(value_col) - F.col(f"{p}baseline"))
    med_r = F.expr(f"percentile({p}residual, 0.5)").over(key_win)
    df = df.withColumn(f"{p}__dev__", F.abs(F.col(f"{p}residual") - med_r))
    df = df.withColumn(
        f"{p}res_mad", F.expr(f"percentile({p}__dev__, 0.5)").over(key_win)
    )
    return df.withColumn(
        f"{p}season_flag",
        F.col(f"{p}__dev__") > F.lit(k * MAD_SIGMA) * F.col(f"{p}res_mad"),
    ).drop(f"{p}__dev__")
