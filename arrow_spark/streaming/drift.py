"""Streaming distribution-drift monitor: windowed categorical mix vs a
static reference, as total-variation distance.

The production shape for "is today's traffic mix normal?": a streaming
windowed count per key (watermark-bounded state) joined against a
BROADCAST reference distribution, reduced to one TV number per window.
TV (not KL/JS) for the same reason as llm/corpus.py::tv_drift — the
numerator is all-integer under a common denominator, so the monitor is
hash-exact and needs no transcendental whose last ulp differs between
engines.

Streaming split follows the windowed_topk idiom: the stream side runs
ONLY the appendable windowed-count aggregation; the per-window TV
reduction (a second grouping — not stream-appendable after an agg) runs
inside foreachBatch via ``mix_tv_from_counts`` on each micro-batch's
aggregate-sized state. Batch input runs the whole plan (what the
DuckDB oracle checks).

Scale: stream state = in-flight windows × keys; the reference is
key-cardinality-sized and broadcast; the TV reduction input is windows
× keys, never events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from arrow_spark.streaming.windows import tumbling_window_agg

__all__ = ["mix_tv_from_counts", "windowed_drift"]


def mix_tv_from_counts(
    counts: DataFrame,
    ref: DataFrame,
    key_col: str = "key",
    window_col: str = "window_start",
) -> DataFrame:
    """(window_start, n_events, tv) from windowed cells (window, key, c)
    and a reference (key, r).

    TV numerator under the common denominator ng·nr:

        Σ_{k in window} |c_k·nr − r_k·ng|  +  (nr − Σ_{k in window} r_k)·ng

    — the second term is the reference mass of keys ABSENT from the
    window, recovered algebraically (never materialized). Keys in the
    window but absent from the reference enter the first term with
    r = 0 (left join). Integer arithmetic throughout, ONE division."""
    tot = ref.agg(F.sum("r").cast("long").alias("nr"))
    wtot = counts.groupBy(window_col).agg(F.sum("c").cast("long").alias("ng"))
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    joined = (
        counts.join(F.broadcast(ref), key_col, "left")
        .withColumn("r", F.coalesce(F.col("r"), F.lit(0).cast("long")))
        .join(F.broadcast(wtot), window_col)
        .crossJoin(F.broadcast(tot))
    )
    terms = joined.groupBy(window_col, "ng", "nr").agg(
        F.sum(
            F.abs(d(F.col("c")) * d(F.col("nr")) - d(F.col("r")) * d(F.col("ng")))
        ).alias("present_num"),
        F.sum("r").cast("long").alias("r_present"),
    )
    tv_num = F.col("present_num") + d(F.col("nr") - F.col("r_present")) * d(
        F.col("ng")
    )
    return terms.select(
        window_col,
        F.col("ng").alias("n_events"),
        (
            tv_num.cast("double")
            / (d(F.lit(2)) * d(F.col("ng")) * d(F.col("nr"))).cast("double")
        ).alias("tv"),
    )


def windowed_drift(
    df: DataFrame,
    ts_col: str,
    duration: str,
    key_col: str,
    ref: DataFrame,
    watermark: str | None = None,
) -> DataFrame:
    """Per-window TV drift of the ``key_col`` mix vs ``ref`` (key, r).

    Batch input → full plan (oracle-checkable). Streaming input → the
    windowed counts only; reduce each micro-batch with
    ``mix_tv_from_counts`` inside foreachBatch (the rank_topk idiom —
    a second grouping is not stream-appendable)."""
    counts = tumbling_window_agg(
        df,
        ts_col,
        duration,
        keys=[key_col],
        aggs=[F.count(F.lit(1)).alias("c")],
        watermark=watermark,
    )
    if df.isStreaming:
        return counts
    return mix_tv_from_counts(counts, ref, key_col)
