"""Batch sessionization: assign gap-based session ids to event streams.

The batch twin of the streaming session window (streaming/windows.py —
Spark's session_window aggregates per session; this operator LABELS
every event row instead, which is what downstream per-event feature
pipelines join against).

Scale: one shuffle on the user key; the gap detection is a lag window
inside each user partition — no global window, state bounded by
partition. Deterministic under the (ts, tiebreak) total order per user.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak: Sequence[str] = (),
    session_col: str = "session_seq",
) -> DataFrame:
    """Label each event with its 1-based session sequence number per
    user: a new session starts when the gap to the previous event
    exceeds ``gap_seconds`` (or at the user's first event)."""
    w = W.partitionBy(user_col).orderBy(ts_col, *tiebreak)
    prev = F.lag(ts_col).over(w)
    new_session = F.when(
        prev.isNull()
        | ((F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev)) > gap_seconds),
        1,
    ).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(new_session).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
