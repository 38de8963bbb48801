"""CUSUM changepoint / drift detection over keyed, ordered series.

The Page (1954) cumulative-sum detector is a per-row recursion
(s_t = max(0, s_{t-1} + dev_t)) — apparently sequential, but it has an
exact relational closed form via running extrema:

    cum_t = Σ_{i≤t} dev_i
    s_t   = cum_t − min(0, min_{j≤t} cum_j)

(the max(0,·) clamp is absorbed by including the virtual prefix 0 in the
running minimum). The low-side detector is the same identity on the
negated deviation series. Both running aggregates share ONE window
partitioning, so the whole detector is a single keyed Exchange followed
by codegen window frames — no UDF, no iteration, no state store.

Exactness contract (same posture as operators/smoothing.py): with
integer-snapped inputs and a median target, every deviation lies on the
0.5 grid, so cumulative sums, running extrema, and threshold compares
are exact doubles — bit-identical in any IEEE engine, value-hash
verifiable.

At 100 TB: the detector is embarrassingly key-parallel; the only skew
concern is a single entity with a pathologically long series, which AQE
splits since every per-row computation after the Exchange is frame-local.

Reference anchor: composes the reference's cumulative kernels
(cpp/src/arrow/compute/kernels/vector_cumulative_ops.cc — cumulative_sum
/ cumulative_min / cumulative_max); the clamp-free CUSUM identity is the
composition it leaves to callers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def cusum_changepoints(
    df: DataFrame,
    keys: Sequence[str],
    order_by: str | Sequence[str],
    value_col: str,
    threshold: float,
    slack: float = 0.0,
    target_col: str | None = None,
) -> DataFrame:
    """Two-sided CUSUM: adds ``cusum_hi``, ``cusum_lo``, ``drift_flag``.

    ``target_col`` is the in-control level; by default the per-key
    median (computed as an aggregate-window over the same partitioning —
    still one Exchange). ``slack`` is Page's k (dead-band half-width):
    deviations smaller than it never accumulate. A row flags when either
    side's statistic exceeds ``threshold``.
    """
    order_cols = [order_by] if isinstance(order_by, str) else list(order_by)
    part = W.partitionBy(*keys)
    run = part.orderBy(*order_cols).rowsBetween(W.unboundedPreceding, W.currentRow)
    if target_col is None:
        df = df.withColumn("__target__", F.expr(f"percentile({value_col}, 0.5)").over(part))
        target_col = "__target__"
    dev_hi = F.col(value_col) - F.col(target_col) - F.lit(slack)
    dev_lo = -(F.col(value_col) - F.col(target_col) + F.lit(slack))
    df = (
        df.withColumn("__cum_hi__", F.sum(dev_hi).over(run))
        .withColumn("__cum_lo__", F.sum(dev_lo).over(run))
    )
    s_hi = F.col("__cum_hi__") - F.least(
        F.lit(0.0), F.min("__cum_hi__").over(run)
    )
    s_lo = F.col("__cum_lo__") - F.least(
        F.lit(0.0), F.min("__cum_lo__").over(run)
    )
    out = (
        df.withColumn("cusum_hi", s_hi)
        .withColumn("cusum_lo", s_lo)
        .withColumn(
            "drift_flag",
            (F.col("cusum_hi") > F.lit(threshold))
            | (F.col("cusum_lo") > F.lit(threshold)),
        )
    )
    return out.drop("__cum_hi__", "__cum_lo__", "__target__")
