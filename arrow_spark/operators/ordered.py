"""Positional/index operators over explicitly-ordered frames.

Arrow arrays are implicitly ordered, so `take`, `scatter`,
`inverse_permutation` (vector_selection.cc, vector_swizzle.cc) are index
math. A distributed DataFrame has no implicit order — every operator
here takes an explicit sort spec, materializes a row index with a
window (partition-parallel range index via zipWithIndex-free SQL), and
does the index juggling as joins Catalyst can shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def with_row_index(
    df: DataFrame, order_by: Sequence, index_col: str = "__row_index__"
) -> DataFrame:
    """0-based dense row index under an explicit total order.

    Implemented as a global row_number window. Note for 100 TB: a global
    window serializes into one partition — use it on pre-aggregated or
    bounded frames; for huge frames prefer zipWithIndex-style
    per-partition offsets (partition id + local index join), which
    `with_partitioned_row_index` provides.
    """
    w = W.orderBy(*order_by)
    return df.withColumn(index_col, F.row_number().over(w) - 1)


def with_partitioned_row_index(df: DataFrame, index_col: str = "__row_index__") -> DataFrame:
    """Scalable row index: per-partition local index + partition offset
    (two narrow passes, no global window). Order = current partition
    layout; pair with repartitionByRange for a meaningful total order."""
    spark = df.sparkSession
    counts = (
        df.withColumn("__pid__", F.spark_partition_id())
        .groupBy("__pid__")
        .count()
        .orderBy("__pid__")
        .collect()
    )
    offsets = {}
    acc = 0
    for r in counts:
        offsets[r["__pid__"]] = acc
        acc += r["count"]
    offmap = F.create_map(
        *[x for pid, off in offsets.items() for x in (F.lit(pid), F.lit(off))]
    )
    w = W.partitionBy("__pid__").orderBy(F.monotonically_increasing_id())
    return (
        df.withColumn("__pid__", F.spark_partition_id())
        .withColumn("__local__", F.row_number().over(w) - 1)
        .withColumn(index_col, F.element_at(offmap, F.col("__pid__")) + F.col("__local__"))
        .drop("__pid__", "__local__")
    )


def take(df: DataFrame, indices: Sequence[int], order_by: Sequence) -> DataFrame:
    """`take` kernel: gather rows by position under the given order.

    Index frame join (no driver-side gather); preserves requested
    multiplicity and ordering via the output `take_order` column.
    """
    spark = df.sparkSession
    idx_df = spark.createDataFrame(
        [(int(i), pos) for pos, i in enumerate(indices)], "`__row_index__` long, take_order long"
    )
    indexed = with_row_index(df, order_by)
    return (
        indexed.join(F.broadcast(idx_df), "__row_index__")
        .drop("__row_index__")
        .orderBy("take_order")
    )


def inverse_permutation(df_perm: DataFrame, value_col: str, index_col: str) -> DataFrame:
    """inverse_permutation (vector_swizzle.cc): given rows (i, p[i]),
    emit (p[i], i) — a projection, the join happens at use site."""
    return df_perm.select(
        F.col(value_col).alias(index_col), F.col(index_col).alias(value_col)
    )


def scatter(
    df: DataFrame,
    target_positions: str,
    order_by: Sequence,
    out_size: int | None = None,
) -> DataFrame:
    """scatter: place row r at position df[target_positions][r].

    Returns a frame ordered by the scattered position; unfilled slots
    are absent (join semantics), matching a sparse scatter.
    """
    return df.withColumn("__scatter_pos__", F.col(target_positions)).orderBy(
        "__scatter_pos__"
    )
