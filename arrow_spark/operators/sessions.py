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
    numeric = dict(df.dtypes).get(ts_col) in (
        "tinyint", "smallint", "int", "bigint", "float", "double",
    )
    if numeric:
        cur_s, prev_s = F.col(ts_col), prev
    else:
        cur_s, prev_s = F.unix_timestamp(F.col(ts_col)), F.unix_timestamp(prev)
    new_session = F.when(
        prev.isNull() | ((cur_s - prev_s) > gap_seconds),
        1,
    ).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(new_session).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )


def top_paths(
    events: DataFrame,
    session_col: str,
    order_col: str,
    node_col: str,
    path_len: int = 3,
    k: int = 20,
) -> DataFrame:
    """Top-k navigation paths: the most frequent length-``path_len``
    node sequences across sessions — the product-analytics "top click
    paths" report, and on a token stream the same algebra is n-gram
    sequence mining.

    Shape: ONE session-keyed collect (ordered in-row by the order
    column — no window), sliding windows of ``path_len`` assembled
    IN-ROW (transform over start indices: a length-L session emits
    L−n+1 paths without a join or self-lag chain), one count shuffle
    over path strings, and a TakeOrderedAndProject k-row cut over the
    DISTINCT-PATH table — every map task keeps its local top-k and
    only k rows per task reach the driver-side merge, so no stage ever
    materializes the full path vocabulary in one partition (at 100 TB
    the path vocabulary is itself huge; a global row_number window
    would serialize it into one task). The rank column is derived on
    the k-row result. Ties break to the smaller path string —
    deterministic. Per-session work is bounded by session length; the
    count shuffle carries distinct paths, never events.

    Returns (rank, path, n_sessions_weighted) where the count weighs
    every occurrence (a session repeating a loop counts each pass —
    the loop IS the signal)."""
    from pyspark.sql import Window as W

    n = path_len
    pair = F.struct(F.col(order_col).alias("o"), F.col(node_col).alias("v"))
    per_session = events.groupBy(session_col).agg(
        F.array_sort(F.collect_list(pair)).alias("seq")
    )
    # sequence(1, 0) DESCENDS in Spark — guard short sessions with an
    # explicit empty array instead
    starts = F.when(
        F.size("seq") >= n, F.sequence(F.lit(1), F.size("seq") - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    paths = per_session.select(
        F.explode(
            F.transform(
                starts,
                lambda i: F.concat_ws(
                    ">",
                    *[
                        F.element_at("seq", (i + j).cast("int"))["v"].cast(
                            "string"
                        )
                        for j in range(n)
                    ],
                ),
            )
        ).alias("path")
    )
    counts = paths.groupBy("path").agg(
        F.count(F.lit(1)).cast("long").alias("n_paths")
    )
    # orderBy().limit(k) -> TakeOrderedAndProject: per-partition top-k,
    # k-row merge. rank is a window over the ALREADY k-row frame.
    top = counts.orderBy(F.col("n_paths").desc(), F.col("path").asc()).limit(k)
    w = W.orderBy(F.col("n_paths").desc(), F.col("path").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "path", "n_paths"
    )
