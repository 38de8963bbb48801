"""Streaming deduplication — the ingest-side half of the dedup story:
exact duplicates are dropped *as events arrive*, bounded by a watermark,
so the batch dedup operators (llm/dedup.py) only ever see
already-unique rows.

Arrow has no streaming semantics (SURVEY §2.4); this is a Spark-native
engine extension over dropDuplicates / dropDuplicatesWithinWatermark.

Scale: state holds one entry per key seen within the watermark horizon
— the horizon, not the stream length, bounds the state store. Exact
content identity via md5(normalized text) keeps the state entry small
regardless of document size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_dedup(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Drop duplicate rows by key. With a watermark, duplicates arriving
    within the horizon are dropped and state is evicted past it
    (dropDuplicatesWithinWatermark); unbounded otherwise. Works
    identically on batch frames (unified model), which the tests use as
    the oracle."""
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
        if df.isStreaming:
            return df.dropDuplicatesWithinWatermark(list(keys))
    return df.dropDuplicates(list(keys))


def stream_dedup_content(
    df: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str | None = None,
    fp_col: str = "fp",
) -> DataFrame:
    """Content-identity streaming dedup: fingerprint = md5(normalized
    text) — one tiny state entry per distinct document body."""
    from arrow_spark.llm.dedup import normalize_text

    with_fp = df.withColumn(fp_col, F.md5(normalize_text(F.col(text_col))))
    return stream_dedup(with_fp, [fp_col], ts_col=ts_col, watermark=watermark)
