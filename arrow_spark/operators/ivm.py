"""Incremental view maintenance for joins (delta rules).

The classic IVM identity: for inserts ΔR, ΔS into R ⋈ S,

    (R ∪ ΔR) ⋈ (S ∪ ΔS) = (R ⋈ S) ∪ (ΔR ⋈ S) ∪ (R ⋈ ΔS) ∪ (ΔR ⋈ ΔS)

so a materialized join refreshes at cost ∝ |Δ|·matches instead of
re-joining two 100 TB inputs. The complement of
operators/rollup.py::rollup_incremental (aggregate IVM) and
streaming/upsert.py (keyed upserts): this is the JOIN delta rule.

Plan shape at scale: the old result is touched only by the final union
(no shuffle, no re-scan of its lineage if it is a materialized table);
the delta sides are broadcast into the two big-side probes whenever they
fit (the normal case — deltas are batch-sized), so the only exchanges
are the big sides' existing layout. The delta-delta term is
delta-sized on both sides.

Reference anchor: composes the reference's hash join
(cpp/src/arrow/acero/hash_join_node.cc); the delta algebra is the
pipeline idiom (Griffin-Libkin 1995) the reference leaves to callers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def incremental_join_refresh(
    old_result: DataFrame,
    a_old: DataFrame,
    b_old: DataFrame,
    a_delta: DataFrame,
    b_delta: DataFrame,
    on: Sequence[str],
    broadcast_deltas: bool = True,
) -> DataFrame:
    """Refresh the materialized inner join ``old_result`` = a_old ⋈ b_old
    after inserting ``a_delta`` / ``b_delta``.

    Inputs must share the equi-key columns ``on``; the result schema is
    the join schema (key columns once, then both sides' payloads —
    the same columns ``old_result`` has). Deletions/updates are the
    upsert operators' job; this is the insert delta rule.
    """
    on = list(on)
    da = F.broadcast(a_delta) if broadcast_deltas else a_delta
    db = F.broadcast(b_delta) if broadcast_deltas else b_delta
    part_new_a = da.join(b_old, on)          # ΔA ⋈ B
    part_new_b = a_old.join(db, on)          # A ⋈ ΔB
    part_new_ab = a_delta.join(db, on)       # ΔA ⋈ ΔB
    cols = old_result.columns
    return (
        old_result
        .unionByName(part_new_a.select(*cols))
        .unionByName(part_new_b.select(*cols))
        .unionByName(part_new_ab.select(*cols))
    )
