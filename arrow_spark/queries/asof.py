"""As-of join and sorted-merge oracle queries (Arrow asof_join_node.cc,
sorted_merge_node.cc — the two ordered-stream operators Spark lacks).

The oracle expresses the same semantics as a range join + pick-nearest
window, which is also exactly what a naive reference implementation
looks like — the engine path uses the cogrouped merge_asof operator.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arrow_spark.catalog import table
from arrow_spark.operators.asof import asof_join, sorted_merge
from arrow_spark.queries.base import query

ASOF_BACKWARD_ORACLE = """
WITH l AS (SELECT * FROM events WHERE event_type = 'click'),
     r AS (SELECT * FROM events WHERE event_type = 'purchase')
SELECT event_id, user_id, r_event_id, r_value
FROM (
  SELECT l.event_id, l.user_id, r.event_id AS r_event_id, r.value AS r_value,
         row_number() OVER (PARTITION BY l.event_id
                            ORDER BY r.ts DESC, r.event_id DESC) AS rn
  FROM l LEFT JOIN r
    ON l.user_id = r.user_id
   AND r.ts <= l.ts
   AND r.ts >= l.ts - INTERVAL 1 DAY
)
WHERE rn = 1
"""


@query("asof_join_backward", oracle=ASOF_BACKWARD_ORACLE)
def asof_join_backward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """backward as-of with 1-day tolerance and by=user_id: for each click,
    the latest purchase by the same user within the last day."""
    e = table(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(
        clicks,
        purchases,
        on="ts",
        by=["user_id"],
        tolerance=pd.Timedelta(days=1),
        direction="backward",
        suffix="_r",
        right_tiebreak=["event_id"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("event_id_r").alias("r_event_id"),
        F.col("value_r").alias("r_value"),
    )


ASOF_FORWARD_ORACLE = """
WITH l AS (SELECT * FROM events WHERE event_type = 'signup'),
     r AS (SELECT * FROM events WHERE event_type = 'error')
SELECT event_id, user_id, r_event_id
FROM (
  SELECT l.event_id, l.user_id, r.event_id AS r_event_id,
         row_number() OVER (PARTITION BY l.event_id
                            ORDER BY r.ts ASC, r.event_id ASC) AS rn
  FROM l LEFT JOIN r
    ON l.user_id = r.user_id
   AND r.ts >= l.ts
   AND r.ts <= l.ts + INTERVAL 1 HOUR
)
WHERE rn = 1
"""


@query("asof_join_forward", oracle=ASOF_FORWARD_ORACLE)
def asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """forward as-of (Arrow positive tolerance): first error within 1h
    after each signup, per user."""
    e = table(spark, sf_dir, "events")
    signups = e.where(F.col("event_type") == "signup")
    errors = e.where(F.col("event_type") == "error").select("user_id", "ts", "event_id")
    out = asof_join(
        signups,
        errors,
        on="ts",
        by=["user_id"],
        tolerance=pd.Timedelta(hours=1),
        direction="forward",
        suffix="_r",
        right_tiebreak=["event_id"],
    )
    return out.select(
        "event_id", "user_id", F.col("event_id_r").alias("r_event_id")
    )


ASOF_NOBY_ORACLE = """
WITH l AS (SELECT * FROM events WHERE event_type = 'view' AND event_id % 10 = 0),
     r AS (SELECT * FROM events WHERE event_type = 'purchase')
SELECT event_id, r_event_id
FROM (
  SELECT l.event_id, r.event_id AS r_event_id,
         row_number() OVER (PARTITION BY l.event_id
                            ORDER BY r.ts DESC, r.event_id DESC) AS rn
  FROM l LEFT JOIN r ON r.ts <= l.ts
)
WHERE rn = 1
"""


@query("asof_join_global", oracle=ASOF_NOBY_ORACLE)
def asof_join_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """as-of without by-keys → declarative range-join + window plan."""
    e = table(spark, sf_dir, "events")
    views = e.where((F.col("event_type") == "view") & (F.col("event_id") % 10 == 0)).select(
        "event_id", "ts"
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.col("ts").alias("rts"), F.col("event_id").alias("r_event_id0")
    )
    # tie-break deterministically: among equal rts pick max r_event_id
    from pyspark.sql import Window as W

    lid = views
    joined = lid.join(purchases, F.col("rts") <= F.col("ts"), "left")
    w = W.partitionBy("event_id").orderBy(F.col("rts").desc(), F.col("r_event_id0").desc())
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("event_id", F.col("r_event_id0").alias("r_event_id"))
    )


SORTED_MERGE_ORACLE = """
SELECT event_id, ts, event_type FROM events
WHERE event_type IN ('click', 'purchase')
"""


@query("sorted_merge_streams", oracle=SORTED_MERGE_ORACLE)
def sorted_merge_streams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sorted_merge of two pre-sorted streams → one ordered stream
    (order-insensitive hash makes this a set-equality check; ordering is
    asserted separately in unit tests)."""
    e = table(spark, sf_dir, "events").select("event_id", "ts", "event_type")
    a = e.where(F.col("event_type") == "click")
    b = e.where(F.col("event_type") == "purchase")
    return sorted_merge([a, b], on="ts")


ASOF_MULTI_ORACLE = """
WITH l AS (SELECT * FROM events WHERE event_type = 'click'),
     p AS (SELECT * FROM events WHERE event_type = 'purchase'),
     er AS (SELECT * FROM events WHERE event_type = 'error'),
best_p AS (
  SELECT * FROM (
    SELECT l.event_id AS lid, p.event_id AS purchase_id, p.value AS purchase_value,
           row_number() OVER (PARTITION BY l.event_id
                              ORDER BY p.ts DESC, p.event_id DESC) AS rn
    FROM l JOIN p ON l.user_id = p.user_id
      AND p.ts <= l.ts AND p.ts >= l.ts - INTERVAL 1 DAY)
  WHERE rn = 1
),
best_e AS (
  SELECT * FROM (
    SELECT l.event_id AS lid, er.event_id AS error_id,
           row_number() OVER (PARTITION BY l.event_id
                              ORDER BY er.ts DESC, er.event_id DESC) AS rn
    FROM l JOIN er ON l.user_id = er.user_id
      AND er.ts <= l.ts AND er.ts >= l.ts - INTERVAL 1 DAY)
  WHERE rn = 1
)
SELECT l.event_id, l.user_id, best_p.purchase_id, best_p.purchase_value, best_e.error_id
FROM l
LEFT JOIN best_p ON l.event_id = best_p.lid
LEFT JOIN best_e ON l.event_id = best_e.lid
"""


@query("asof_join_multi", oracle=ASOF_MULTI_ORACLE)
def asof_join_multi_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """one left + TWO right tables, one shared 1-day backward tolerance
    (Arrow's asofjoin arity — options.h:700): each click picks its
    nearest purchase AND nearest error independently."""
    from arrow_spark.operators.asof import asof_join_multi

    e = table(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    errors = e.where(F.col("event_type") == "error").select("user_id", "ts", "event_id")
    out = asof_join_multi(
        clicks,
        [purchases, errors],
        on="ts",
        by=["user_id"],
        tolerance=pd.Timedelta(days=1),
        direction="backward",
        suffixes=["_p", "_e"],
        right_tiebreaks=[["event_id"], ["event_id"]],
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("event_id_p").alias("purchase_id"),
        F.col("value_p").alias("purchase_value"),
        F.col("event_id_e").alias("error_id"),
    )
