"""Empirical-CDF feature normalization (quantile transform).

ML feature prep: map each numeric column to its empirical percentile in
[0, 1] — the rank-based normalization that is immune to outliers and
monotone transforms. Relational form: unpivot the feature columns into a
long (id, feature, value) table, then ONE window pass partitioned by
feature with SQL-standard ``percent_rank`` = (rank − 1)/(n − 1) — ties
share a rank on every engine, and the single integer-ratio division is
deterministic, so the transform is value-hash exact.

Scale note: partitioning by feature name means one shuffle partition
per feature, so the window path super-linears once a feature's rows
outgrow one executor's sort memory (measured +1.13 exponent at sf1,
scale_sweep.json). ``quantile_transform`` therefore AUTO-SWITCHES above
``exact_partition_rows`` per feature to a decomposed exact plan that
never sorts rows per feature: percent_rank depends only on
(feature, value) — q = (#rows with smaller value)/(n−1) — so the rank
algebra runs on the DISTINCT-value frame (one map-side-combined
group-by), split into equi-depth buckets by Greenwald-Khanna edges so
every window partition is ~distinct/n_buckets values, and rows get
their q back through one hash-distributed join. Same integers, same
double division ⇒ value-hash identical to the window path at any
scale. ``quantile_transform_binned`` below remains the APPROXIMATE
map-only path (error ≤ 1/n_bins + GK ε) for when even the join-back
shuffle is too much.

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
    exact_partition_rows: int = 2_000_000,
    n_buckets: int = 256,
) -> DataFrame:
    """Long-form empirical percentiles: (ids…, feature, value, q) with
    q = percent_rank of value within its feature column. Single-row
    features yield q = 0.0 (SQL percent_rank convention). NULL feature
    values are dropped in the unpivot: Spark sorts NULLs first while
    DuckDB sorts them last, so a NULL that reached the window would both
    get a meaningless percentile and inflate (n − 1) for every real row
    — filtering pins one cross-engine contract for null inputs.

    Above ``exact_partition_rows`` rows per feature the one-partition-
    per-feature window sort would spill (measured super-linear at sf1);
    the plan auto-switches to ``_quantile_transform_decomposed`` —
    identical values (exact, same integer rank algebra), scale-safe
    shape. Set ``exact_partition_rows=0`` to force the decomposed path
    (no count job runs), or a huge value to pin the window path.

    COST NOTE: when ``exact_partition_rows`` > 0 the switch runs one
    eager ``df.count()`` action (a column-pruned scan) before building
    the plan — each feature contributes all df rows to its own window
    partition, so the df count IS the per-feature partition size (an
    upper bound; nulls drop in the unpivot)."""
    long = _unpivot(df, id_cols, feature_cols)
    if not exact_partition_rows:
        # forced decomposed path: structural early return, no count job
        return _quantile_transform_decomposed(long, id_cols, n_buckets)
    if df.count() <= exact_partition_rows:
        w = W.partitionBy("feature").orderBy("value")
        return long.withColumn("q", F.percent_rank().over(w))
    return _quantile_transform_decomposed(long, id_cols, n_buckets)


def _unpivot(
    df: DataFrame, id_cols: Sequence[str], feature_cols: Sequence[str]
) -> DataFrame:
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("feature"),
                F.col(c).cast("double").alias("value"),
            )
            for c in feature_cols
        ]
    )
    return (
        df.select(*[F.col(c) for c in id_cols], F.explode(structs).alias("fv"))
        .select(*id_cols, F.col("fv.feature").alias("feature"), F.col("fv.value").alias("value"))
        .where(F.col("value").isNotNull())
    )


def _quantile_transform_decomposed(
    long: DataFrame, id_cols: Sequence[str], n_buckets: int
) -> DataFrame:
    """Exact percent_rank with ONE row-scale shuffle and no per-feature
    sort (the same bucket-offset rank decomposition proven for
    ``exact_quantiles``, applied to every row at once):

    1. per feature: n + equi-depth edges from one Greenwald-Khanna
       aggregation (map-side combined, state O(features · accuracy));
    2. bucket = #edges strictly below the value — a pure function of
       the value, so tie groups never straddle buckets and rank()
       within a bucket is the global tie-group min-rank shifted by the
       bucket offset;
    3. bucket offsets (#rows in earlier buckets) from a map-combined
       count over the features×n_buckets frame + a window over that
       bounded-metadata frame, broadcast back;
    4. within (feature, bucket): below = offset + rank() − 1 — the one
       row-scale exchange, hash-partitioned on (feature, bucket) into
       ~n/n_buckets-row sorts (equi-depth edges bound them regardless
       of value-distribution skew);
    5. q = below/(n−1) — the same integers and the same one double
       division the window path and any SQL engine compute, so the
       result is value-hash identical.

    Bucket function: LINEAR range split on per-feature (min, max) —
    pure codegen arithmetic. Equi-depth GK edges were measured 3×
    slower end-to-end at sf1 (a 3.8 s sketch aggregation plus a
    9 s interpreted ArrayFilter probe per pass) for skew insurance the
    rank math doesn't need: a skewed bucket is only a fatter sort, not
    a wrong answer, and the two real hot cases degrade gracefully — a
    heavy TIE mass sorts all-equal (cheap) and a heavy RANGE
    concentration is bounded by raising n_buckets. NaN/±inf get
    dedicated buckets beyond/below the linear range, matching both
    engines' sort order (−inf < finite < +inf < NaN).

    Residual skew note: a single VALUE carrying ≫ n/n_buckets rows
    lands in one bucket (no bucket function can split a tie group).
    Its sort is all-ties (cheap) but the partition is fat; at cluster
    scale the fix is raising n_buckets, which this plan takes as a
    parameter."""
    inf = float("inf")
    finite = (~F.isnan("value")) & (F.col("value") > -inf) & (F.col("value") < inf)
    stats = long.groupBy("feature").agg(
        F.min(F.when(finite, F.col("value"))).alias("lo"),
        F.max(F.when(finite, F.col("value"))).alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    b = n_buckets
    span = F.col("hi") - F.col("lo")
    linear = F.least(
        F.lit(b - 1),
        F.greatest(
            F.lit(0),
            F.floor((F.col("value") - F.col("lo")) / span * b).cast("long"),
        ),
    )
    bucket = (
        F.when(F.isnan("value"), F.lit(b + 1))
        .when(F.col("value") == inf, F.lit(b))
        .when(F.col("value") == -inf, F.lit(-1))
        .when(span > 0, linear)
        .otherwise(F.lit(0))
    )
    bucketed = (
        long.join(F.broadcast(stats), "feature")
        .withColumn("bucket", bucket)
        .drop("lo", "hi")
    )
    btot = bucketed.groupBy("feature", "bucket").agg(F.count(F.lit(1)).alias("bcnt"))
    wb = (
        W.partitionBy("feature")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    boff = btot.withColumn("off", F.coalesce(F.sum("bcnt").over(wb), F.lit(0))).drop(
        "bcnt"
    )
    wv = W.partitionBy("feature", "bucket").orderBy("value")
    return (
        bucketed.join(F.broadcast(boff), ["feature", "bucket"])
        .withColumn("below", F.col("off") + F.rank().over(wv) - 1)
        .withColumn(
            "q",
            F.when(
                F.col("n") > 1,
                F.col("below").cast("double") / (F.col("n") - 1).cast("double"),
            ).otherwise(F.lit(0.0)),
        )
        .select(*id_cols, "feature", "value", "q")
    )


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
