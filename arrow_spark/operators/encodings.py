"""Run-length encoding as a relational operator.

Arrow's REE arrays (`vector_run_end_encode.cc`; type ids 38/27-29 in
type_fwd.h) are a physical layout, which a logical DataFrame cannot
hold — but the *capability* (collapse consecutive equal values into
(value, run) rows and expand them back) is relational. This module
expresses it that way, so RLE survives as data: a runs frame can be
stored, shuffled, merged, and decoded by any engine.

Scale: runs are computed per partition key group (change-flag lag +
running sum inside a keyed window) — one shuffle on the partition keys,
no global window. A global total-order RLE is the partition_by=()
degenerate case and is documented as driver-scale only, exactly like
with_row_index (operators/ordered.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def run_length_encode(
    df: DataFrame,
    value_col: str,
    order_by: Sequence[str],
    partition_by: Sequence[str] = (),
) -> DataFrame:
    """Collapse consecutive equal ``value_col`` runs under the given
    order into (partition keys..., run_seq, value, run_start, run_length).

    run_seq is the 1-based run index within its partition group;
    run_start is the first ``order_by[0]`` value of the run. Equality is
    null-safe (a null run is a run).
    """
    parts = list(partition_by)
    order = [F.col(c) for c in order_by]
    w = (W.partitionBy(*parts) if parts else W.partitionBy()).orderBy(*order)
    change = F.when(
        F.col(value_col).eqNullSafe(F.lag(value_col).over(w)), 0
    ).otherwise(1)
    runs = df.withColumn("__chg__", change).withColumn(
        "run_seq", F.sum("__chg__").over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
    )
    return (
        runs.groupBy(*parts, "run_seq")
        .agg(
            F.first(value_col).alias("value"),
            F.min(order_by[0]).alias("run_start"),
            F.count(F.lit(1)).alias("run_length"),
        )
    )


def dictionary_encode(
    df: DataFrame, value_col: str, code_col: str = "code"
) -> tuple[DataFrame, DataFrame]:
    """Dictionary encoding in logical form (Arrow dictionary arrays,
    type id 27/`dictionary_encode` kernel): returns (encoded, dictionary)
    where dictionary = (code, value) with codes 0..card-1 assigned by
    value sort order (deterministic — the oracle checks per-row codes),
    and encoded = df with ``value_col`` replaced by its code.

    Scale: codes come from range-partitioned sorted distinct values +
    per-partition offsets (with_partitioned_row_index) — no global
    window at ANY dictionary cardinality. Range boundaries are sampled,
    but the global sorted rank is invariant to where the boundaries
    land, so codes are deterministic. The encode itself is a plain
    equi-join Catalyst will broadcast for any dictionary that deserves
    encoding.
    """
    from arrow_spark.operators.ordered import with_partitioned_row_index

    d = (
        df.select(value_col)
        .distinct()
        .repartitionByRange(F.col(value_col))
        .sortWithinPartitions(value_col)
    )
    dictionary = with_partitioned_row_index(d, index_col=code_col)
    encoded = (
        df.join(dictionary, value_col)
        .select(*[c for c in df.columns if c != value_col], code_col)
    )
    return encoded, dictionary.select(code_col, value_col)


def dictionary_decode(
    encoded: DataFrame, dictionary: DataFrame, code_col: str = "code"
) -> DataFrame:
    """Inverse: join codes back to values (broadcast-sized dictionary)."""
    return encoded.join(F.broadcast(dictionary), code_col).drop(code_col)


def run_length_decode(
    runs: DataFrame,
    partition_by: Sequence[str] = (),
) -> DataFrame:
    """Expand a runs frame back to one row per original element:
    (partition keys..., run_seq, value, pos) with pos 0-based inside the
    run — the inverse the round-trip test pins. explode(sequence(...))
    is a narrow per-row fan-out; no shuffle."""
    parts = list(partition_by)
    return runs.select(
        *parts,
        "run_seq",
        "value",
        F.explode(F.sequence(F.lit(0), F.col("run_length") - 1)).alias("pos"),
    )
