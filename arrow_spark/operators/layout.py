"""Z-order (Morton curve) data layout for multi-dimensional pruning.

At 100 TB the scan you avoid is worth more than the join you optimize:
parquet row-group min/max stats prune a filter on the SORT column well,
but a second filter column is shuffled randomly through the files.
Interleaving the bits of both columns (the Morton curve) makes file and
row-group bounding boxes small in EVERY interleaved dimension, so
filters on any of them skip data — the standard lakehouse OPTIMIZE
ZORDER layout, expressed as plain Spark: compute z-values (pure integer
arithmetic, no UDF), repartitionByRange + sortWithinPartitions on them,
write.

The z-value itself is engine-agnostic arithmetic (sum of shifted bits),
so the oracle gate hash-checks it per row against DuckDB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(cols: Sequence[Column], bits: int = 16) -> Column:
    """Morton interleave of N non-negative integer columns, ``bits``
    low bits each → one long. Column i's bit b lands at position
    b*N + i. Pure shifts/adds — codegen'd, shuffle-free."""
    n = len(cols)
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        cl = c.cast("long")
        for b in range(bits):
            z = z + F.shiftleft(F.shiftright(cl, b).bitwiseAND(F.lit(1)), b * n + i)
    return z


def zorder_by(
    df: DataFrame, cols: Sequence[str], bits: int = 16, num_partitions: int | None = None
) -> DataFrame:
    """Lay the frame out along the Morton curve of ``cols`` (columns
    must already be non-negative ints below 2^bits — rank/bucket encode
    first otherwise): range-partition + sort within partitions by the
    z-value, so every written file covers a compact hyper-rectangle and
    min/max stats prune on any of the interleaved columns."""
    z = zorder_value([F.col(c) for c in cols], bits)
    out = df.withColumn("__z__", z)
    parts = [num_partitions] if num_partitions else []
    return (
        out.repartitionByRange(*parts, F.col("__z__"))
        .sortWithinPartitions("__z__")
        .drop("__z__")
    )
