"""Multi-touch attribution: credit conversions to preceding touches.

The event-analytics staple beside funnels/sessions/cohorts: every
conversion (purchase) distributes its value across the touch events
(clicks, views) that preceded it within an attribution window —
per-channel credited revenue is the output marketing actually reads.

Relational shape: ONE user-keyed equi-join between conversions and
touches with a residual time-window predicate (the batch twin of the
stream-stream interval join), a per-conversion count window to split
the credit, and a channel aggregation. At 100 TB both sides are
bucketed on the user key, so the join is co-located; the pair volume is
bounded by touches-per-user × conversions-per-user inside the window,
never a cross of the tables.

Exactness: credit = value / k is ONE IEEE division per conversion,
snapped to integer micro-units BEFORE the channel sum — so the
aggregate is an exact integer sum, not an order-dependent float sum
(the house snap discipline), and the whole report is hash-exact.

Reference anchor: no attribution node exists in the reference's exec
engine; its users compose the same join + window algebra downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["linear_attribution"]


def linear_attribution(
    conversions: DataFrame,
    touches: DataFrame,
    user_col: str,
    conv_id: str,
    conv_time: str,
    value_col: str,
    touch_time: str,
    channel_col: str,
    window_seconds: int,
) -> DataFrame:
    """Split each conversion's integer ``value_col`` equally across its
    touches in (conv_time − window, conv_time), and report per-channel
    totals: (channel, n_touches, credited_micros, credited_value).

    Time columns are integer epoch seconds (cast upstream — identical
    cross-engine, no timezone algebra here). Conversions with no touch
    in the window are unattributed and absent from the report (emit
    them under a synthetic channel upstream if completeness matters).
    ``credited_micros`` = Σ floor(value·1e6/k + ½) per touch — exact
    integers; ``credited_value`` is the single closing division."""
    c = conversions.select(
        F.col(user_col).alias("__u__"),
        F.col(conv_id).alias("__cid__"),
        F.col(conv_time).alias("__ct__"),
        F.col(value_col).alias("__v__"),
    )
    t = touches.select(
        F.col(user_col).alias("__u__"),
        F.col(touch_time).alias("__tt__"),
        F.col(channel_col).alias("channel"),
    )
    pairs = c.join(t, "__u__").where(
        (F.col("__tt__") < F.col("__ct__"))
        & (F.col("__tt__") >= F.col("__ct__") - F.lit(window_seconds))
    )
    k = F.count(F.lit(1)).over(W.partitionBy("__cid__"))
    credit = F.floor(
        F.col("__v__").cast("double") * 1e6 / k.cast("double") + F.lit(0.5)
    ).cast("long")
    credited = pairs.withColumn("__credit__", credit)
    return credited.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_touches"),
        F.sum("__credit__").cast("long").alias("credited_micros"),
        (F.sum("__credit__").cast("double") / F.lit(1e6)).alias(
            "credited_value"
        ),
    )
