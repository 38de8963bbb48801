"""Event-time windowed aggregation: tumbling / sliding / session windows
with watermarks.

Arrow has no watermark or event-time window semantics (SURVEY §2.4) —
these are Spark-native engine extensions. Each helper works identically
on a batch DataFrame and a streaming DataFrame (Structured Streaming's
unified model), so batch oracles verify the same plan the stream runs.

Scale: windowed aggs shuffle on (window, keys); watermarks bound state
so a 100 TB/day stream holds only in-flight windows in the state store.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: Sequence[str] = (),
    aggs: Sequence = (),
    watermark: str | None = None,
) -> DataFrame:
    """Non-overlapping fixed windows; one row per (window, keys)."""
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), duration), *keys)
        .agg(*aggs)
        .withColumn("window_start", F.col("window.start"))
        .withColumn("window_end", F.col("window.end"))
        .drop("window")
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: Sequence[str] = (),
    aggs: Sequence = (),
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows of ``duration`` every ``slide``."""
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), duration, slide), *keys)
        .agg(*aggs)
        .withColumn("window_start", F.col("window.start"))
        .withColumn("window_end", F.col("window.end"))
        .drop("window")
    )


def session_window_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: Sequence[str] = (),
    aggs: Sequence = (),
    watermark: str | None = None,
) -> DataFrame:
    """Session windows: rows within ``gap`` of each other fuse."""
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap), *keys)
        .agg(*aggs)
        .withColumn("window_start", F.col("session_window.start"))
        .withColumn("window_end", F.col("session_window.end"))
        .drop("session_window")
    )


def stream_from_directory(
    spark: SparkSession, path: str, schema, fmt: str = "parquet"
) -> DataFrame:
    """File-source stream (the streaming analog of the dataset scanner:
    new files are discovered and read incrementally)."""
    return spark.readStream.format(fmt).schema(schema).load(path)


def rank_topk(
    counts: DataFrame,
    k: int,
    key_col: str,
    metric_col: str = "n",
    window_col: str = "window_start",
) -> DataFrame:
    """Top-k keys per window from a windowed-counts frame, ties to the
    smaller key — the deterministic ranking step. Batch-only by Spark's
    rules (rank is not stream-appendable): in a stream, apply it inside
    foreachBatch on each micro-batch's aggregate state."""
    from pyspark.sql import Window as W

    w = W.partitionBy(window_col).orderBy(
        F.col(metric_col).desc(), F.col(key_col).asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def windowed_topk(
    df: DataFrame,
    ts_col: str,
    duration: str,
    key_col: str,
    k: int = 5,
    watermark: str | None = None,
) -> DataFrame:
    """Trending keys: top-k by count per tumbling window.

    Batch input → the full counts + per-window rank plan (what the
    oracle checks). Streaming input → the windowed-counts aggregation
    only (state bounded by the watermark); the caller ranks each
    micro-batch's state with ``rank_topk`` inside foreachBatch — rank is
    not an appendable streaming operator, and pushing it to the sink
    side is the standard Structured Streaming idiom (the ranking input
    is already aggregate-sized: windows × keys, not events).
    """
    counts = tumbling_window_agg(
        df,
        ts_col,
        duration,
        keys=[key_col],
        aggs=[F.count(F.lit(1)).alias("n")],
        watermark=watermark,
    )
    if df.isStreaming:
        return counts
    return rank_topk(counts, k, key_col)
