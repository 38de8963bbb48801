"""2-D skyline (Pareto front) as two window functions.

The skyline operator (Börzsönyi, Kossmann, Stocker, ICDE 2001): rows
not dominated by any other row — a dominates b when a is no worse on
every dimension and strictly better on at least one. The general
operator needs a dominance join; the 2-D case (minimize x, maximize y)
collapses to pure window algebra:

    dominated(r) ⟺ max{y : x < r.x} ≥ r.y   (strictly better x)
                 ∨ max{y : x = r.x} > r.y    (equal x, strictly better y)

so ONE group-partitioned RANGE window (running y-max over strictly
smaller x) plus ONE (group, x) partition max decide every row — no
self-join, no quadratic step, exact for integer/decimal dimensions.
Duplicate points dominate nothing (no strict dimension), so both stay —
matching the textbook definition.

Scale: both windows share the (group) partitioning; one Exchange total.
Skew in a single group falls to AQE; the d>2 general case would need
the dominance theta-join this operator deliberately avoids.

Reference anchor: the reference's compute layer has select_k/rank
(vector_select_k.cc) but no multi-criteria front; skyline is the
canonical OLAP operator its users compose downstream.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    group_cols: Sequence[str],
    minimize: Column,
    maximize: Column,
) -> DataFrame:
    """Rows on the (minimize, maximize) Pareto front per group.

    ``minimize``/``maximize`` must be numeric (RANGE frames require it);
    returns the input rows plus __min__/__max__ projections removed —
    i.e. the original columns, filtered to the skyline.
    """
    keys = list(group_cols)
    tagged = df.withColumn("__x__", minimize.cast("long")).withColumn(
        "__y__", maximize.cast("long")
    )
    # running best y over STRICTLY smaller x (RANGE ... 1 PRECEDING
    # excludes x-ties from the prefix max)
    w_prefix = (
        W.partitionBy(*keys)
        .orderBy(F.col("__x__").asc())
        .rangeBetween(W.unboundedPreceding, -1)
    )
    w_tie = W.partitionBy(*keys, "__x__")
    best_prev = F.max("__y__").over(w_prefix)
    best_tie = F.max("__y__").over(w_tie)
    keep = (best_prev.isNull() | (best_prev < F.col("__y__"))) & (
        best_tie == F.col("__y__")
    )
    return (
        tagged.withColumn("__keep__", keep)
        .where(F.col("__keep__"))
        .drop("__x__", "__y__", "__keep__")
    )
