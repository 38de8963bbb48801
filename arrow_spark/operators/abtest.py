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
    # both-variances-zero leaves t undefined: NULL, never an ANSI /0
    # error (Spark 4 defaults to ANSI and would throw on sqrt(0))
    t = F.when(
        (F.col("n") > 1)
        & (F.col("b_n") > 1)
        & ((F.col("var") > 0) | (F.col("b_var") > 0)),
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


#: Cumulative Poisson(1) CDF breakpoints mapped into the 60-bit
#: portable-hash domain, precomputed as INTEGER literals (floor(cdf_k ·
#: 2^60)) — the runtime never touches exp/factorial, so both engines
#: compare the same integers against the same hash. A hash below the
#: first breakpoint draws weight 0 (p = e^-1), between k and k+1 draws
#: k+1; at or above the last draws 5 (the merged ≥5 tail, p ≈ 0.0037).
POISSON1_Q60 = (
    424136118829305344,
    848272237658610688,
    1060340297073263360,
    1131029650211480960,
    1148701988496035328,
)


def bootstrap_mean_ci(
    df: DataFrame,
    group_cols,
    id_col: str,
    value_col: str,
    n_reps: int = 40,
    tail_millis: int = 25,
    seed: int = 0,
) -> DataFrame:
    """Per-group bootstrap confidence interval for the mean, via the
    DETERMINISTIC Poisson bootstrap (the resampling scheme that works
    on distributed data: per-row replicate weights instead of a global
    resample — Chamandy et al., "Estimating uncertainty for massive
    data streams", Google 2012).

    Each (row, replicate) draws a Poisson(1)-distributed weight from
    the PORTABLE 60-bit hash of (id, replicate): no RNG state, no
    driver coordination, bit-identical replay on any engine — the CI is
    hash-exact, which no sampled-with-RNG bootstrap can be. Replicate
    means are exact integer-weighted sums with ONE division; the
    interval is nearest-rank (ceil via integer arithmetic — no float
    quantile interpolation to diverge cross-engine).

    Returns (groups…, n, mean, ci_lo, ci_hi) with a two-sided
    ``tail_millis``/1000 tail each side (default 25 → 95 % CI).

    Scale: the replicate explode multiplies ROWS FED TO THE AGGREGATION
    by n_reps, but map-side combine collapses them to |groups|·n_reps
    cells before the shuffle — the network cost is the cell table, not
    the exploded data. The per-group sorted-means array is n_reps
    doubles: driver-free, metadata-sized. Degenerate replicates (total
    weight 0 — vanishing probability beyond toy groups) are excluded
    and the nearest-rank indices follow the surviving count.
    """
    from arrow_spark.functions.portable_hash import portable_hash64

    groups = list(group_cols)
    v = F.col(value_col).cast("long")
    reps = df.withColumn(
        "__b__", F.explode(F.sequence(F.lit(0), F.lit(n_reps - 1)))
    )
    h = portable_hash64(
        F.concat(
            F.col(id_col).cast("string"), F.lit(":"), F.col("__b__").cast("string")
        ),
        seed,
    )
    w = sum(
        (h >= F.lit(t)).cast("int") for t in POISSON1_Q60
    ).cast("long")
    cells = reps.groupBy(*groups, "__b__").agg(
        F.sum(w * v).alias("wv"), F.sum(w).alias("wt")
    )
    means = cells.where(F.col("wt") > 0).select(
        *groups,
        (F.col("wv").cast("double") / F.col("wt").cast("double")).alias("m"),
    )
    sorted_means = means.groupBy(*groups).agg(
        F.array_sort(F.collect_list("m")).alias("ms")
    )
    lo_i = F.expr(f"CAST((size(ms) * {tail_millis} + 999) DIV 1000 AS INT)")
    hi_i = F.expr(f"CAST((size(ms) * {1000 - tail_millis} + 999) DIV 1000 AS INT)")
    ci = sorted_means.select(
        *groups,
        F.element_at("ms", F.greatest(lo_i, F.lit(1))).alias("ci_lo"),
        F.element_at("ms", F.greatest(hi_i, F.lit(1))).alias("ci_hi"),
    )
    point = df.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(v).cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "mean"
        ),
    )
    return point.join(F.broadcast(ci), groups).select(
        *groups, "n", "mean", "ci_lo", "ci_hi"
    )
