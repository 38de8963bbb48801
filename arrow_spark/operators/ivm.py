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


def incremental_agg_refresh(
    old: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    mult_col: str = "m",
    count_col: str = "n",
) -> DataFrame:
    """Incrementally maintain a grouped count/sum aggregate under
    INSERTIONS AND RETRACTIONS — the aggregate half of the IVM pair
    (incremental_join_refresh is the join half).

    ``old`` is the materialized state (keys…, n, <sum_cols>…); ``delta``
    is raw rows carrying a multiplicity column (+1 insert, −1 retract).
    New state:

        n'   = n + Σ m           (per group)
        sum' = sum + Σ m·v

    and groups whose count reaches 0 DROP OUT (a fully-retracted group
    must vanish, not linger as a zero row). Cost ∝ |delta| + |touched
    groups|: the delta aggregates map-side to touched-group cells, the
    merge is a full-outer join on the group key against state that is
    itself group-sized. The old state is never rescanned at row grain.

    Scope (the classic IVM result): count/sum/avg are self-maintainable
    under retractions; MIN/MAX ARE NOT (a retracted maximum needs the
    base table) — maintain those with the rollup operators or recompute.

    Exactness: integer counts and integer (snap-first) sums — the merge
    is pure integer addition, so refresh ≡ recompute is hash-provable.
    """
    ks = list(keys)
    m = F.col(mult_col).cast("long")
    dagg = delta.groupBy(*ks).agg(
        F.sum(m).alias("__dn__"),
        *[
            F.sum(m * F.col(c).cast("long")).alias(f"__d_{c}__")
            for c in sum_cols
        ],
    )
    merged = old.join(dagg, ks, "full_outer")
    new_n = F.coalesce(F.col(count_col), F.lit(0).cast("long")) + F.coalesce(
        F.col("__dn__"), F.lit(0).cast("long")
    )
    out_cols = [
        *[F.col(k) for k in ks],
        new_n.alias(count_col),
        *[
            (
                F.coalesce(F.col(c), F.lit(0).cast("long"))
                + F.coalesce(F.col(f"__d_{c}__"), F.lit(0).cast("long"))
            ).alias(c)
            for c in sum_cols
        ],
    ]
    return merged.select(*out_cols).where(F.col(count_col) > 0)
