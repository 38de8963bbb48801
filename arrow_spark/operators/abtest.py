"""Two-sample hypothesis testing over grouped metrics (Welch's t-test).

The experimentation-pipeline primitive: compare every treatment group's
metric against a baseline group without pooling variances (Welch 1947 —
the robust default when group variances differ, which at 100 TB they
always do). Everything reduces to per-group moment sums:

    n, Σx, Σx²  →  mean = Σx/n,  var = (Σx² − (Σx)²/n)/(n−1)
    t = (m_t − m_b) / sqrt(v_t/n_t + v_b/n_b)

Scale: ONE aggregation shuffle on the group key produces the moment
table (map-side combined, k rows); the baseline row broadcasts back as
a 1-row cross join. No per-pair scans, no windowing.

Determinism contract (same posture as operators/profile.py::corr_matrix):
snap the metric to integers upstream so the moment sums are EXACT; the
sums convert to double once (round-to-nearest — identical to any
engine's big-integer→double conversion) and the remaining algebra is a
fixed sequence of IEEE ops, so t-statistics and significance flags are
bit-identical cross-engine. sqrt is IEEE-correctly-rounded everywhere.

Reference anchor: composes the reference's aggregate kernels
(cpp/src/arrow/compute/kernels/aggregate_basic.cc sum/count and
aggregate_var_std.cc); the testing composition is left to callers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: two-sided 5% critical value of the normal approximation.
Z_95 = 1.96


def welch_ttest(
    df: DataFrame,
    group_col: str,
    value_col: str,
    baseline: str,
    critical: float = Z_95,
    validate: bool = True,
) -> DataFrame:
    """Per-group Welch t vs the ``baseline`` group: returns
    (group, n, mean, var, t_stat, significant). The baseline's own row
    is excluded from the output (t against itself is 0/0).

    Input contract: ``value_col`` must be integral (the exact-moment
    path snaps through decimal(38,0), which rounds half-up — snap your
    metric to cents/micros FIRST, as ``experiment_welch_ttest`` does,
    or the rounding silently changes the statistic). Degenerate groups
    (n <= 1, no sample variance) get NULL var / t_stat and NULL
    significant — never a NaN, which Spark would order ABOVE the
    critical value and flag as significant. With ``validate=True``
    (default) raises ``ValueError`` if the baseline group has no rows
    (a silent empty result otherwise) — that pre-flight costs one extra
    aggregation pass over ``df``; pass ``validate=False`` on very large
    inputs where the caller guarantees the baseline exists.
    """
    moments = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(value_col).cast("long").alias("n"),
        F.sum(F.col(value_col).cast("decimal(38,0)")).alias("sx"),
        F.sum(
            (F.col(value_col).cast("decimal(38,0)") * F.col(value_col).cast("decimal(38,0)"))
        ).alias("sxx"),
    )

    def derive(prefix: str, src: DataFrame) -> DataFrame:
        n = F.col("n").cast("double")
        sx = F.col("sx").cast("double")
        sxx = F.col("sxx").cast("double")
        # n <= 1: no sample variance — NULL, not 0/0 = NaN (Spark sorts
        # NaN above every number, so a NaN t would read as significant)
        var = F.when(
            F.col("n") > 1, (sxx - sx * sx / n) / (n - F.lit(1.0))
        )
        return src.select(
            F.col("grp").alias(f"{prefix}grp"),
            F.col("n").alias(f"{prefix}n"),
            (sx / n).alias(f"{prefix}mean"),
            var.alias(f"{prefix}var"),
        )

    treat = derive("", moments.where(F.col("grp") != baseline))
    base = derive("b_", moments.where(F.col("grp") == baseline))
    if validate and base.limit(1).count() == 0:
        raise ValueError(
            f"welch_ttest: baseline group {baseline!r} has no rows in {group_col!r}"
        )
    t = F.when(
        (F.col("n") > 1) & (F.col("b_n") > 1),
        (F.col("mean") - F.col("b_mean"))
        / F.sqrt(F.col("var") / F.col("n") + F.col("b_var") / F.col("b_n")),
    )
    return (
        treat.crossJoin(F.broadcast(base))
        .withColumn("t_stat", t)
        .withColumn(
            "significant",
            F.when(
                F.col("t_stat").isNotNull(), F.abs(F.col("t_stat")) > F.lit(critical)
            ),
        )
        .select(
            F.col("grp").alias(group_col),
            "n", "mean", "var", "t_stat", "significant",
        )
    )
