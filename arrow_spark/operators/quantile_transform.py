"""Empirical-CDF feature normalization (quantile transform).

ML feature prep: map each numeric column to its empirical percentile in
[0, 1] — the rank-based normalization that is immune to outliers and
monotone transforms. Relational form: unpivot the feature columns into a
long (id, feature, value) table, then ONE window pass partitioned by
feature with SQL-standard ``percent_rank`` = (rank − 1)/(n − 1) — ties
share a rank on every engine, and the single integer-ratio division is
deterministic, so the transform is value-hash exact.

Scale note: partitioning by feature name means one shuffle partition per
feature — the right plan when features ≪ cores carry millions of rows
each is to let AQE split the per-feature sort (it is frame-free rank
work), or to pre-bucket values with approx quantiles and rank buckets —
``quantile_transform_binned`` below IS that scale path (map-only at row
scale, error ≤ 1/n_bins + GK ε, asserted vs this exact primitive; the
same exact/scale split as dedup_jaccard vs MinHash-LSH).

Reference anchor: rank/quantile kernels live in the reference's vector
sorts (cpp/src/arrow/compute/kernels/vector_rank.cc, rank_quantile);
the multi-column unpivot composition is left to callers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def quantile_transform(
    df: DataFrame,
    id_cols: Sequence[str],
    feature_cols: Sequence[str],
) -> DataFrame:
    """Long-form empirical percentiles: (ids…, feature, value, q) with
    q = percent_rank of value within its feature column. Single-row
    features yield q = 0.0 (SQL percent_rank convention). NULL feature
    values are dropped in the unpivot: Spark sorts NULLs first while
    DuckDB sorts them last, so a NULL that reached the window would both
    get a meaningless percentile and inflate (n − 1) for every real row
    — filtering pins one cross-engine contract for null inputs."""
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("feature"),
                F.col(c).cast("double").alias("value"),
            )
            for c in feature_cols
        ]
    )
    long = (
        df.select(*[F.col(c) for c in id_cols], F.explode(structs).alias("fv"))
        .select(*id_cols, F.col("fv.feature").alias("feature"), F.col("fv.value").alias("value"))
        .where(F.col("value").isNotNull())
    )
    w = W.partitionBy("feature").orderBy("value")
    return long.withColumn("q", F.percent_rank().over(w))


def quantile_transform_binned(
    df: DataFrame,
    id_cols: Sequence[str],
    feature_cols: Sequence[str],
    n_bins: int = 100,
    accuracy: int = 10000,
) -> DataFrame:
    """The SCALE path the exact operator's docstring promises: map each
    value to an approximate percentile via ``approx_percentile`` bin
    edges instead of a per-feature global sort.

    Plan shape: ONE aggregation computes all features' edge arrays
    (Greenwald-Khanna partial-merge, map-side combined — state is
    O(features · accuracy), never row-scale), the driver broadcasts the
    tiny edge table back, and q̂ = (#edges below value)/n_bins is a pure
    projection — so the row-scale stage is map-only, where the exact
    percent_rank must SORT every feature partition. Error contract:
    |q̂ − q| ≤ 1/n_bins + GK ε (ε = 1/accuracy), asserted against the
    exact operator in tests.

    Returns the same (ids…, feature, value, q) long shape as
    ``quantile_transform`` so the two are drop-in twins.
    """
    keys = list(id_cols)
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("feature"),
                F.col(c).cast("double").alias("value"),
            )
            for c in feature_cols
        ]
    )
    long = (
        df.select(*[F.col(c) for c in keys], F.explode(structs).alias("fv"))
        .select(*keys, F.col("fv.feature").alias("feature"), F.col("fv.value").alias("value"))
        .where(F.col("value").isNotNull())
    )
    probs = [i / n_bins for i in range(1, n_bins)]
    edges = long.groupBy("feature").agg(
        F.percentile_approx("value", probs, accuracy).alias("edges")
    )
    # q̂ = share of interior edges strictly below the value (+ half of
    # the ties' mass for midpoint behavior at repeated values)
    below = F.size(F.filter("edges", lambda e: e < F.col("value")))
    ties = F.size(F.filter("edges", lambda e: e == F.col("value")))
    qhat = (below.cast("double") + ties.cast("double") / 2.0) / n_bins
    return long.join(F.broadcast(edges), "feature").select(
        *keys, "feature", "value", qhat.alias("q")
    )
