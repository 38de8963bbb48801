"""Exponentially-weighted smoothing over keyed, ordered series.

EWMA is the classic sequential recursion s_t = α·x_t + (1-α)·s_{t-1} —
per-row state that relational engines can't express directly. Two
standard reformulations make it a window computation:

- span-limited normalized EWMA (pandas ``ewm(..., adjust=True)`` over a
  trailing window): s_t = Σ_{j<W} w_j·x_{t-j} / Σ_{j<W} w_j with
  w_j = (1-α)^j. The truncation error vs. the infinite sum is bounded by
  (1-α)^W — with α=1/2 and W=32 that is 2^-32, far below any telemetry
  signal's noise floor, and crucially the computation becomes ONE window
  aggregate: a per-key shuffle, then codegen'd in-row arithmetic.
- Numerical contract: with α = 1/2 the weights are exact dyadics 2^-j,
  and for integer-snapped inputs |x| < 2^20 every product x·2^-j and
  every partial sum stays inside the 53-bit double mantissa (20+31 < 53)
  — the weighted sum is EXACT, independent of summation order, so the
  same computation replayed in any IEEE-754 engine is bit-identical
  (this is what lets the gate query hash-match a DuckDB self-join
  replay; same posture as operators/regression.py's integer-snapped
  moment sums).

Scale: one Exchange on the key columns, then WholeStageCodegen — the
trailing window is collected per row via a ROWS-frame ``collect_list``
(W values, in frame order) and folded in-row. State per row is W
doubles; no iterative jobs, no UDFs, no driver involvement.

Reference anchor: the reference's cumulative family
(cpp/src/arrow/compute/kernels/vector_cumulative_ops.cc) provides
cumulative_sum/prod/max; EWMA is the weighted member of that family it
leaves to composition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def ewma(
    df: DataFrame,
    keys: Sequence[str],
    order_by: str | Sequence[str],
    value_col: str,
    halflives: int = 1,
    window: int = 32,
    out_col: str = "ewma",
) -> DataFrame:
    """Span-limited normalized EWMA with α = 1 - 2^-halflives.

    ``halflives=1`` is α=1/2 (weight halves every row). Exactness holds
    for integer-valued ``value_col`` with |x| < 2^(53 - halflives·(window-1))
    — snap upstream (e.g. cents as integers) to get bit-stable output.

    One shuffle (hash-partition by ``keys``), then a single projection:
    the trailing-W frame is materialized in-row by ``collect_list`` over
    a ROWS window (frame order = window order), reversed, and folded
    newest→oldest accumulating (numerator, normalizer, weight).

    Nulls: ``collect_list`` drops null values, so a null row receives
    the EWMA of its non-null window neighbors rather than null
    (behavior pinned in tests) — pre-filter or impute upstream when
    null propagation is wanted.
    """
    order_cols = [order_by] if isinstance(order_by, str) else list(order_by)
    win = (
        W.partitionBy(*keys)
        .orderBy(*order_cols)
        .rowsBetween(-(window - 1), W.currentRow)
    )
    vals = F.collect_list(F.col(value_col).cast("double")).over(win)
    # Fold newest→oldest, halving the weight each step: the weight is
    # always an exact power of two (never a libm pow call, which has no
    # cross-engine exactness contract), so every product and partial sum
    # is exact under the mantissa-budget contract above.
    factor = F.lit(0.5**halflives)
    init = F.struct(
        F.lit(0.0).alias("num"), F.lit(0.0).alias("den"), F.lit(1.0).alias("w")
    )

    def step(acc: Column, x: Column) -> Column:
        return F.struct(
            (acc["num"] + x * acc["w"]).alias("num"),
            (acc["den"] + acc["w"]).alias("den"),
            (acc["w"] * factor).alias("w"),
        )

    smoothed = F.aggregate(
        F.reverse(vals), init, step, lambda acc: acc["num"] / acc["den"]
    )
    return df.withColumn(out_col, smoothed)


def holt_smooth(
    df: DataFrame,
    keys: Sequence[str],
    order_by: str | Sequence[str],
    value_col: str,
    window: int = 16,
    out_prefix: str = "",
) -> DataFrame:
    """Span-limited Holt double exponential smoothing (level + trend),
    α = β = 1/2 — the trend-aware sibling of ``ewma``:

        l_t = ½·x_t + ½·(l_{t-1} + b_{t-1})
        b_t = ½·(l_t − l_{t-1}) + ½·b_{t-1}

    initialized (l, b) = (x_first, 0) at the trailing-window head. Adds
    ``{p}level``, ``{p}trend``, ``{p}forecast`` (= level + trend, the
    one-step-ahead prediction).

    Exactness: halving is exact; with integer inputs below 2^16 and
    W = 16, every level/trend stays a dyadic with ≤ 2^30 denominator —
    inside the 53-bit mantissa, so all three outputs are bit-identical
    in any IEEE engine (the DuckDB oracle replays the recursion as
    chained per-step projections). Same single-Exchange window plan as
    ``ewma``.
    """
    p = out_prefix
    order_cols = [order_by] if isinstance(order_by, str) else list(order_by)
    win = (
        W.partitionBy(*keys)
        .orderBy(*order_cols)
        .rowsBetween(-(window - 1), W.currentRow)
    )
    vals = F.collect_list(F.col(value_col).cast("double")).over(win)
    init = F.struct(
        F.element_at(vals, 1).alias("l"), F.lit(0.0).alias("b")
    )

    def step(acc: Column, x: Column) -> Column:
        l2 = F.lit(0.5) * x + F.lit(0.5) * (acc["l"] + acc["b"])
        b2 = F.lit(0.5) * (l2 - acc["l"]) + F.lit(0.5) * acc["b"]
        return F.struct(l2.alias("l"), b2.alias("b"))

    state = F.aggregate(
        F.slice(vals, 2, window), init, step, lambda acc: acc
    )
    return (
        df.withColumn(f"{p}level", state["l"])
        .withColumn(f"{p}trend", state["b"])
        .withColumn(f"{p}forecast", state["l"] + state["b"])
    )


def seasonal_decompose(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    phase_col: str,
    period: int,
) -> DataFrame:
    """Classical additive seasonal decomposition (the moving-average
    core of STL, Cleveland et al. 1990, without the robustness loops):
    value = trend + seasonal + residual.

    - trend: centered moving average over ``period`` rows. For even
      periods the standard 2×p MA (half-weight endpoints) keeps the
      average centered; its numerator stays an exact INTEGER for
      integer inputs (the ×2 trick: 2·Σ_mid + first + last), so trend
      is one IEEE division per row. Rows without a full window get
      NULL trend (no padding inventions).
    - seasonal: per (keys…, phase) mean of the DETRENDED series,
      micro-snapped before averaging so the mean is an integer sum +
      one division, never an order-dependent float sum.
    - residual = value − trend − seasonal, a fixed-order double chain.

    Every step is integer sums → one division → snap, so the whole
    decomposition is hash-exact cross-engine for integer inputs (snap
    to cents/micros first, as every caller here does).

    The MA window is POSITIONAL (ROWS, ordered by ``order_col``): gaps
    in the grid shorten calendar spans, not row spans — run gapfill
    upstream when strict time semantics matter. ``phase_col`` names a
    precomputed integer phase (e.g. hour-of-day) so decompositions stay
    joinable on it downstream.

    Scale: ONE key-partitioned window Exchange (trend), one
    (keys, phase) aggregation over micro-snapped detrended values
    (map-side combined, p·|keys| output rows — metadata-sized), joined
    back by broadcast. No self-joins, no UDFs.
    """
    half = period // 2
    w = W.partitionBy(*key_cols).orderBy(order_col)
    v = F.col(value_col).cast("long")
    if period % 2 == 0:
        mid = F.sum(v).over(w.rowsBetween(-(half - 1), half - 1))
        first = F.lag(v, half).over(w)
        last = F.lead(v, half).over(w)
        trend = (2 * mid + first + last).cast("double") / F.lit(
            float(2 * period)
        )
    else:
        full = F.sum(v).over(w.rowsBetween(-half, half))
        cnt = F.count(v).over(w.rowsBetween(-half, half))
        trend = F.when(
            cnt == period, full.cast("double") / F.lit(float(period))
        )
    t = df.withColumn("trend", trend)
    ds = F.when(
        F.col("trend").isNotNull(),
        F.floor((v.cast("double") - F.col("trend")) * 1e6 + F.lit(0.5)).cast(
            "long"
        ),
    )
    t = t.withColumn("__ds__", ds)
    seas = (
        t.where(F.col("__ds__").isNotNull())
        .groupBy(*key_cols, phase_col)
        .agg(
            (
                F.sum("__ds__").cast("double")
                / (F.count("__ds__") * F.lit(1_000_000)).cast("double")
            ).alias("seasonal")
        )
    )
    out = t.join(F.broadcast(seas), [*key_cols, phase_col], "left")
    return out.select(
        *key_cols,
        order_col,
        phase_col,
        F.col(value_col),
        "trend",
        "seasonal",
        (v.cast("double") - F.col("trend") - F.col("seasonal")).alias(
            "residual"
        ),
    )
