"""CDC merge-upsert compaction: fold a change stream into a base
snapshot, keeping the latest version per key and dropping tombstones.

The lakehouse MERGE primitive re-expressed relationally: union the base
with the updates, rank versions per key by the sequence column, keep
rank 1, filter deletes. One (keys)-hash shuffle total — the window and
the implicit distinct share the same exchange.

Scale: at 100 TB the base should be bucketed on the merge keys
(operators/partitioning.bucketed_write) so the nightly compaction
reshuffles only the delta; the window never sees more than the versions
of one key in one partition. Skewed hot keys are bounded by the version
count, not row width — AQE skew-split applies if a key's history is
pathological.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    seq_col: str,
    delete_col: str | None = None,
) -> DataFrame:
    """Latest-version-wins merge of ``updates`` into ``base``.

    Both sides must share a schema. ``seq_col`` orders versions (commit
    timestamp / LSN); ties break toward the updates side, then are
    rejected as ambiguous only by convention — supply a strictly
    monotonic sequence for exact CDC semantics. Rows whose latest
    version has ``delete_col`` true disappear from the snapshot.
    """
    tagged = base.withColumn("__src__", F.lit(0)).unionByName(
        updates.withColumn("__src__", F.lit(1))
    )
    w = W.partitionBy(*[F.col(k) for k in keys]).orderBy(
        F.col(seq_col).desc(), F.col("__src__").desc()
    )
    latest = (
        tagged.withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") == 1)
        .drop("__rn__", "__src__")
    )
    if delete_col is not None:
        latest = latest.where(~F.coalesce(F.col(delete_col), F.lit(False)))
    return latest
