"""Robust trend detection: Mann-Kendall test + Theil-Sen slope.

The outlier-resistant companions to groupwise_ols: Mann-Kendall counts
concordant/discordant time-value pairs (no distributional assumption —
THE standard monotone-trend test in environmental/ops monitoring), and
Theil-Sen estimates the trend as the MEDIAN of all pairwise slopes
(breakdown point 29%, vs 0% for OLS — one bad day cannot flip the
line).

Both are pairwise statistics. The relational form here keeps each
group's series IN-ROW (collect_list ordered by time → nested transform
over index pairs), so the O(n²) pair work is a per-group codegen
expression, not a self-join: the shuffle is ONE key Exchange of the
raw points, and groups parallelize across executors. The contract is
the same as holt/lttb: per-group series must be BOUNDED (thousands of
points — bucket or downsample unbounded series first; n² pairs at
n = 2000 is 2M doubles per group, still in-row territory).

Exactness: Mann-Kendall is ALL integer (sign counts) until the single
tau division. Theil-Sen slopes are one IEEE division each; the median
picks sorted elements (even count → (a+b)/2, a fixed-order float op) —
hash-exact cross-engine, no tolerance.

Reference anchor: the reference ships rank/sort kernels
(cpp/src/arrow/compute) but no trend statistics; users compose them
downstream — here they are first-class and oracle-gated.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["mann_kendall", "theil_sen"]


def _series(
    df: DataFrame, keys: Sequence[str], t_col: str, v_col: str
) -> DataFrame:
    """(keys…, ts, vs): time-ordered parallel arrays per group. Ties in
    t order by value so the array is deterministic."""
    pair = F.struct(
        F.col(t_col).cast("long").alias("t"), F.col(v_col).cast("long").alias("v")
    )
    return df.groupBy(*keys).agg(
        F.array_sort(F.collect_list(pair)).alias("pts")
    )


def mann_kendall(
    df: DataFrame, keys: Sequence[str], t_col: str, v_col: str
) -> DataFrame:
    """Mann-Kendall S statistic and Kendall tau per group:
    (keys…, n, concordant, discordant, s_stat, tau).

    S = Σ_{i<j} sign(v_j − v_i) over time-ordered points; tau =
    S / (n(n−1)/2). Value ties contribute 0 (the classic MK treatment);
    time ties are ordered deterministically by value. Integer counts,
    one division; groups with n < 2 yield NULL tau."""
    sized = _series(df, keys, t_col, v_col).withColumn(
        "n", F.size("pts").cast("long")
    )
    diffs = F.expr(
        """
        flatten(transform(sequence(1, size(pts) - 1), i ->
          transform(sequence(i + 1, size(pts)), j ->
            pts[j - 1].v - pts[i - 1].v)))
        """
    )
    out = sized.withColumn("dd", F.when(F.col("n") >= 2, diffs))
    c = F.size(F.filter("dd", lambda x: x > 0)).cast("long")
    d = F.size(F.filter("dd", lambda x: x < 0)).cast("long")
    out = out.withColumn("c", F.when(F.col("n") >= 2, c)).withColumn(
        "d", F.when(F.col("n") >= 2, d)
    )
    tau = F.when(
        F.col("n") >= 2,
        (F.col("c") - F.col("d")).cast("double")
        / (F.col("n") * (F.col("n") - 1) / 2).cast("double"),
    )
    return out.select(
        *keys,
        "n",
        F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("concordant"),
        F.coalesce(F.col("d"), F.lit(0)).cast("long").alias("discordant"),
        F.coalesce(F.col("c") - F.col("d"), F.lit(0)).cast("long").alias("s_stat"),
        tau.alias("tau"),
    )


def theil_sen(
    df: DataFrame, keys: Sequence[str], t_col: str, v_col: str
) -> DataFrame:
    """Theil-Sen slope per group: (keys…, n, n_slopes, slope) where
    slope = median over all pairs i<j with t_i ≠ t_j of
    (v_j − v_i)/(t_j − t_i).

    Each slope is one IEEE division of exact integers; the median picks
    sorted array elements (even count → the fixed-order (a+b)/2) —
    hash-exact. Groups with no valid pair yield NULL slope."""
    sized = _series(df, keys, t_col, v_col).withColumn(
        "n", F.size("pts").cast("long")
    )
    slopes = F.expr(
        """
        array_sort(filter(
          flatten(transform(sequence(1, size(pts) - 1), i ->
            transform(sequence(i + 1, size(pts)), j ->
              if(pts[j - 1].t = pts[i - 1].t, cast(null as double),
                 cast(pts[j - 1].v - pts[i - 1].v as double)
                   / cast(pts[j - 1].t - pts[i - 1].t as double))))),
          x -> x is not null))
        """
    )
    out = sized.withColumn(
        "sl", F.when(F.col("n") >= 2, slopes)
    ).withColumn("m", F.size("sl").cast("long"))
    med = F.when(
        F.col("m") > 0,
        F.when(
            F.col("m") % 2 == 1,
            F.element_at("sl", ((F.col("m") + 1) / 2).cast("int")),
        ).otherwise(
            (
                F.element_at("sl", (F.col("m") / 2).cast("int"))
                + F.element_at("sl", (F.col("m") / 2 + 1).cast("int"))
            )
            / 2
        ),
    )
    return out.select(
        *keys,
        "n",
        F.coalesce(F.col("m"), F.lit(0)).cast("long").alias("n_slopes"),
        med.alias("slope"),
    )
