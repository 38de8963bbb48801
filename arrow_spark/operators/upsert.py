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


def scd2_intervals(
    changes: DataFrame,
    entity_col: str,
    ts_col: str,
    attr_cols: Sequence[str],
    dedup_consecutive: bool = True,
) -> DataFrame:
    """Slowly-Changing-Dimension type 2 materialization: fold a change
    stream into validity intervals — one row per state an entity held,
    with (valid_from, valid_to, is_current). The warehouse-history
    counterpart of merge_upsert's latest-wins compaction.

    ``dedup_consecutive`` collapses consecutive changes that repeat the
    same attribute values (a no-op update must extend the current
    interval, not open a new one) — detected with lag() over the entity
    timeline, then runs are folded with one groupBy over run ids (the
    same change-flag + running-sum scheme as the RLE encoder).

    Distributed shape: every step is a window or aggregate partitioned
    by the entity key — one hash shuffle on ``entity_col``, map-side
    combinable, no driver-side state. Ties on ``ts_col`` are broken by
    the attribute tuple so the result is deterministic.
    """
    attrs = [F.col(c) for c in attr_cols]
    w = W.partitionBy(entity_col).orderBy(F.col(ts_col).asc(), *attrs)
    d = changes.select(entity_col, ts_col, *attr_cols)
    if dedup_consecutive:
        same = F.lit(True)
        for c in attr_cols:
            same = same & F.col(c).eqNullSafe(F.lag(c).over(w))
        flagged = d.select(
            entity_col, ts_col, *attr_cols,
            F.when(same, 0).otherwise(1).alias("__chg__"),
        )
        runs = flagged.select(
            entity_col, ts_col, *attr_cols,
            F.sum("__chg__").over(
                W.partitionBy(entity_col)
                .orderBy(F.col(ts_col).asc(), *attrs)
                .rowsBetween(W.unboundedPreceding, W.currentRow)
            ).alias("__run__"),
        )
        d = runs.groupBy(entity_col, "__run__").agg(
            F.min(ts_col).alias(ts_col),
            *[F.first(c).alias(c) for c in attr_cols],
        )
    w2 = W.partitionBy(entity_col).orderBy(F.col(ts_col).asc(), *attrs)
    nxt = F.lead(ts_col).over(w2)
    return d.select(
        entity_col,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )
