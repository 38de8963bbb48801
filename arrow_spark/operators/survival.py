"""Kaplan-Meier survival estimation over grouped duration data.

The churn/retention-curve estimator (Kaplan & Meier 1958): given per-
subject durations with an event flag (1 = event observed, 0 = censored),

    S(t) = Π_{tᵢ ≤ t} (1 − dᵢ / nᵢ)

with dᵢ events and nᵢ subjects still at risk at time tᵢ. Handles
censoring correctly — the property that separates it from a naive
retention ratio.

Relational shape: one (group, t) aggregation, then ONE group-keyed
window pass — at-risk counts are group totals minus a running sum, and
the cumulative product is an ordered in-row fold over the collected
factor prefix (Spark has no cumprod; exp-of-sum-of-logs would break the
exactness contract). Everything before the fold is integer-exact; each
factor is a single deterministic division and the fold multiplies in
ascending-t order — the DuckDB oracle replays the identical left fold
via list_reduce over an ORDER BY list, so survival values are
bit-identical (operators/smoothing.py posture).

Scale: per-group state is the distinct event times (bounded by time
resolution, not subjects); the only shuffle is the group key. The
in-row prefix fold is O(T²) CPU in distinct times per group (row i
copies and re-folds an i-element prefix) — negligible at day
granularity (T ≤ a few 10³), quadratic-dominant when callers pass
second- or millisecond-granular durations. ``linear_fold=True``
switches to a per-group Arrow-batched cumulative product
(``np.multiply.accumulate`` — the identical left-to-right IEEE-754
double rounding sequence, so results stay bit-exact with the fold;
pinned by tests/test_survival_linear.py) at O(T) CPU per group.

Reference anchor: composes the reference's group-by aggregates and
cumulative kernels (vector_cumulative_ops.cc has sum/prod — but only
ungrouped arrays); the estimator composition is left to callers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def kaplan_meier(
    df: DataFrame,
    keys: Sequence[str],
    duration_col: str,
    event_col: str,
    linear_fold: bool = False,
) -> DataFrame:
    """Survival curve per key group: one row per (keys…, t) event time
    with (n_at_risk, d_events, n_censored, survival). Censored-only
    times appear with survival unchanged (the standard KM step
    function); ``event_col`` is 0/1.

    ``linear_fold=True`` computes the cumulative product with one
    Arrow-batched pass per group instead of the per-row window fold —
    bit-identical output (same left-to-right double multiplies), O(T)
    instead of O(T²) CPU in distinct durations per group. Use it when
    durations are finer-grained than the group's row budget suggests;
    the default stays JVM-side (no Python in the hot path)."""
    keys = list(keys)
    per_t = df.groupBy(*keys, F.col(duration_col).alias("t")).agg(
        F.sum(F.col(event_col).cast("long")).alias("d_events"),
        F.count(F.lit(1)).cast("long").alias("n_subjects"),
    ).withColumn("n_censored", F.col("n_subjects") - F.col("d_events"))
    grp = W.partitionBy(*keys)
    ordered = grp.orderBy("t")
    total = F.sum("n_subjects").over(grp)
    left_before = F.coalesce(
        F.sum("n_subjects").over(ordered.rowsBetween(W.unboundedPreceding, -1)),
        F.lit(0),
    )
    per_t = per_t.withColumn("n_at_risk", (total - left_before).cast("long"))
    factor = F.lit(1.0) - F.col("d_events").cast("double") / F.col("n_at_risk").cast(
        "double"
    )
    per_t = per_t.withColumn("__f__", factor)
    out_cols = [*keys, "t", "n_at_risk", "d_events", "n_censored", "survival"]
    if linear_fold:
        import numpy as np

        base = per_t.select(*keys, "t", "n_at_risk", "d_events", "n_censored", "__f__")
        schema = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}"
            for f in base.schema.fields
            if f.name != "__f__"
        ) + ", survival double"

        def _cumprod(pdf):
            # t is unique within the group (per_t groups on it), so the
            # sort fixes the fold order unambiguously.
            pdf = pdf.sort_values("t", kind="mergesort")
            pdf["survival"] = np.multiply.accumulate(pdf["__f__"].to_numpy())
            return pdf.drop(columns="__f__")

        return base.groupBy(*keys).applyInPandas(_cumprod, schema).select(*out_cols)
    prefix = F.collect_list("__f__").over(
        ordered.rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    survival = F.aggregate(prefix, F.lit(1.0), lambda acc, x: acc * x)
    return per_t.withColumn("survival", survival).select(*out_cols)
