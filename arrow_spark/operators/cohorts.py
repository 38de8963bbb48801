"""Cohort retention analysis over event streams.

The standard growth-analytics matrix: users grouped by first-seen period
(their cohort), and for each later period the fraction of the cohort
still active. At 100 TB of events this is the canonical "big but
shapely" aggregation — everything is keyed by user or by the (tiny)
(cohort, offset) pair:

    events ──map──> (user, period)        integer period index, no UDF
           ──agg──> distinct activity     shuffle 1: by user
           ──agg──> first period/user     (same shuffle, reused frame)
           ──join─> offset = p - cohort   user-keyed equi-join
           ──agg──> matrix counts         shuffle 2: by (cohort, offset)

Period indexing is pure integer arithmetic on epoch seconds
(floor(epoch / period_seconds)) rather than calendar truncation, so the
bucketing replays identically in any engine and is immune to
week-start/locale conventions; retention is an exact integer ratio with
a single deterministic double division (cross-engine bit-equal).

Reference anchor: composes the reference's group-by aggregate
(hash_aggregate.cc) and min/count kernels; the cohort shape itself is a
pipeline idiom the reference leaves to callers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Seven days; cohorts and activity are weekly by default.
WEEK_SECONDS = 7 * 86400


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_seconds: int = WEEK_SECONDS,
) -> DataFrame:
    """Retention matrix: (cohort_period, offset, n_active, cohort_size,
    retention) with offset counted in periods since the cohort's first
    period. offset 0 rows are the cohort sizes themselves
    (retention 1.0 by construction — kept, as the conventional anchor
    column of a retention table).
    """
    pa = events.select(
        F.col(user_col).alias("user"),
        F.floor(F.unix_timestamp(F.col(ts_col)) / period_seconds)
        .cast("long")
        .alias("p"),
    ).distinct()
    cohort = pa.groupBy("user").agg(F.min("p").alias("cohort_p"))
    act = pa.join(cohort, "user").select(
        "user", "cohort_p", (F.col("p") - F.col("cohort_p")).alias("offset")
    )
    mat = act.groupBy("cohort_p", "offset").agg(
        F.countDistinct("user").alias("n_active")
    )
    size = cohort.groupBy("cohort_p").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    return (
        mat.join(size, "cohort_p")
        .withColumn(
            "retention",
            F.col("n_active").cast("double") / F.col("cohort_size").cast("double"),
        )
        .select(
            "cohort_p",
            "offset",
            F.col("n_active").cast("long").alias("n_active"),
            "cohort_size",
            "retention",
        )
    )


def rfm_scores(
    df: DataFrame,
    id_col: str,
    r_col: str,
    f_col: str,
    m_col: str,
    n_tiles: int = 5,
) -> DataFrame:
    """RFM customer segmentation: quintile scores for Recency (smaller
    = better), Frequency and Monetary (larger = better), plus the
    concatenated segment label — the classic lifecycle segmentation.

    Scoring is ntile over three windows PARTITIONED BY METRIC (the
    quantile_transform unpivot trick: R/F/M parallelize as separate
    window partitions, not one global sort). Ties break by id, so
    tiles are deterministic and the whole segmentation is hash-exact
    (ntile's remainder-to-first-tiles rule is SQL-standard on both
    engines). Each partition still holds all ids — at corpus scale
    swap the exact rank for the binned GK path
    (operators/quantile_transform.py::quantile_transform_binned), the
    same exact/approx contract that operator ships with.

    Returns (id, r, f, m, r_score, f_score, m_score, segment) with
    scores in 1..n_tiles, n_tiles = best.
    """
    from pyspark.sql import Window as W

    metrics = [
        ("r", F.col(r_col).cast("long")),
        ("f", F.col(f_col).cast("long")),
        ("m", F.col(m_col).cast("long")),
    ]
    long = None
    for name, val in metrics:
        part = df.select(
            F.col(id_col).alias("id"),
            F.lit(name).alias("metric"),
            val.alias("value"),
        )
        long = part if long is None else long.unionAll(part)
    # one window per metric partition; direction differs per metric, so
    # order by a sign-adjusted key: recency wants small values scored
    # high -> negate it (last tile = smallest days-since)
    signed = F.when(
        F.col("metric") == "r", -F.col("value")
    ).otherwise(F.col("value"))
    w = W.partitionBy("metric").orderBy(signed.asc(), F.col("id").asc())
    scored = long.withColumn("score", F.ntile(n_tiles).over(w))
    pivoted = (
        scored.groupBy("id")
        .pivot("metric", ["r", "f", "m"])
        .agg(
            F.first("value").alias("v"), F.first("score").alias("s")
        )
    )
    return pivoted.select(
        F.col("id").alias(id_col),
        F.col("r_v").alias("r"),
        F.col("f_v").alias("f"),
        F.col("m_v").alias("m"),
        F.col("r_s").alias("r_score"),
        F.col("f_s").alias("f_score"),
        F.col("m_s").alias("m_score"),
        F.concat(
            F.lit("R"), F.col("r_s"), F.lit("F"), F.col("f_s"),
            F.lit("M"), F.col("m_s"),
        ).alias("segment"),
    )
