"""winsorize (reference: compute/kernels/vector_statistics.cc,
aggregate_quantile.cc WinsorizeOptions): clip values at group
quantiles.

Spark-first: compute per-group interpolated quantile bounds (one
hash-agg), broadcast-join them back, clip with least/greatest — two
narrow stages, no window over the whole partition, scales with groups.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    lower: float = 0.05,
    upper: float = 0.95,
    out_col: str | None = None,
) -> DataFrame:
    """Clip ``value_col`` to its [lower, upper] group quantiles."""
    out_col = out_col or f"{value_col}_winsorized"
    gb = df.groupBy(*group_cols) if group_cols else df.groupBy()
    bounds = gb.agg(
        F.percentile(value_col, F.lit(lower)).alias("__lo"),
        F.percentile(value_col, F.lit(upper)).alias("__hi"),
    )
    joined = (
        df.join(F.broadcast(bounds), list(group_cols))
        if group_cols
        else df.crossJoin(F.broadcast(bounds))
    )
    clipped = F.least(F.greatest(F.col(value_col), F.col("__lo")), F.col("__hi"))
    return joined.withColumn(out_col, clipped).drop("__lo", "__hi")
