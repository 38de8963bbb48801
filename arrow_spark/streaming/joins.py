"""Stream-stream interval joins (Spark-native engine extension).

Arrow has no streaming join at all — its closest ops are asofjoin /
sorted_merge over already-sorted bounded streams (SURVEY §2.4). Spark's
unified model lets the same builder serve batch DataFrames (verified
against the DuckDB oracle) and unbounded streams (verified
stream-vs-batch in tests/test_streaming.py).

Scale: both sides shuffle on the equi keys; with watermarks on BOTH
sides plus a bounded time condition, Structured Streaming provably
expires buffered state — unbounded-state joins are refused by Spark, so
misuse fails loudly rather than OOMing an executor fleet.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    on: Sequence[str],
    lower: str = "0 seconds",
    upper: str = "1 hour",
    left_watermark: str | None = None,
    right_watermark: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join rows whose event times satisfy
    ``left_ts + lower <= right_ts <= left_ts + upper`` within equi keys.

    ``on`` columns must exist on both sides; all other column names must
    be disjoint (rename before joining). Output carries left columns ++
    right non-key columns. Watermarks are only attached when provided so
    the same call works for batch frames.
    """
    overlap = (set(left.columns) & set(right.columns)) - set(on)
    if overlap:
        raise ValueError(f"non-key columns appear on both sides: {sorted(overlap)}")
    if left_watermark is not None:
        left = left.withWatermark(left_ts, left_watermark)
    if right_watermark is not None:
        right = right.withWatermark(right_ts, right_watermark)
    outer = how in ("full", "outer", "full_outer", "fullouter")
    if outer:
        # distinct key names sidestep self-join attribute ambiguity AND
        # let right-only rows surface the key from their own side
        for k in on:
            right = right.withColumnRenamed(k, f"__rk_{k}__")
    cond: Column = F.lit(True)
    for k in on:
        rk = right[f"__rk_{k}__"] if outer else right[k]
        cond = cond & (left[k] == rk)
    lo = left[left_ts] + F.expr(f"INTERVAL {lower}")
    hi = left[left_ts] + F.expr(f"INTERVAL {upper}")
    cond = cond & (right[right_ts] >= lo) & (right[right_ts] <= hi)
    joined = left.join(right, cond, how)
    if outer:
        keep = (
            [
                F.coalesce(left[k], right[f"__rk_{k}__"]).alias(k)
                for k in on
            ]
            + [left[c] for c in left.columns if c not in on]
            + [
                right[c]
                for c in right.columns
                if not c.startswith("__rk_")
            ]
        )
    else:
        keep = [left[c] for c in left.columns] + [
            right[c] for c in right.columns if c not in on
        ]
    return joined.select(*keep)


def enrich_with_static(
    stream: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment join — the dimension-lookup pattern
    (every micro-batch joins the unbounded stream against a bounded
    dimension frame; no watermark needed because the static side holds
    no streaming state).

    ``broadcast_dim`` pins the plan every real deployment wants: the
    dimension ships to executors once per batch instead of shuffling
    the stream (stream-side Exchange-free — asserted in
    tests/test_streaming.py). Spark re-reads the static source each
    micro-batch, so a dimension file overwritten mid-stream is picked
    up on the next trigger — the zero-ceremony slowly-changing-dim
    refresh.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, list(on), how)
