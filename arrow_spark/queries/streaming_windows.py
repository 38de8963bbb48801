"""Event-time window aggregations (tumbling / sliding / session) as
batch-checkable queries.

Arrow has no watermark/event-time window semantics (SURVEY §2.4) —
these are Spark-native engine extensions. Structured Streaming's unified
model means the exact same helper produces the streaming plan; the batch
run here is what the DuckDB oracle verifies (and tests/test_streaming.py
re-runs the same helper as an actual stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arrow_spark.catalog import table
from arrow_spark.queries.base import query
from arrow_spark.streaming import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)

TUMBLING_ORACLE = """
SELECT event_type,
       date_trunc('hour', ts)                   AS window_start,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
       round(sum(value), 2)                     AS sum_value,
       count(*)                                 AS n
FROM events
GROUP BY 1, 2, 3
"""


@query("stream_tumbling_window", oracle=TUMBLING_ORACLE)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1h tumbling windows per event_type."""
    e = table(spark, sf_dir, "events")
    out = tumbling_window_agg(
        e,
        "ts",
        "1 hour",
        keys=["event_type"],
        aggs=[
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.count(F.lit(1)).alias("n"),
        ],
    )
    return out.select("event_type", "window_start", "window_end", "sum_value", "n")


SLIDING_ORACLE = """
WITH starts AS (
  SELECT event_type, value, date_trunc('hour', ts) AS w FROM events
  UNION ALL
  SELECT event_type, value, date_trunc('hour', ts) - INTERVAL 1 HOUR AS w FROM events
)
SELECT event_type,
       w                     AS window_start,
       w + INTERVAL 2 HOUR   AS window_end,
       round(sum(value), 2)  AS sum_value,
       count(*)              AS n
FROM starts
GROUP BY 1, 2, 3
"""


@query("stream_sliding_window", oracle=SLIDING_ORACLE)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2h windows sliding every 1h (each event lands in two windows)."""
    e = table(spark, sf_dir, "events")
    out = sliding_window_agg(
        e,
        "ts",
        "2 hours",
        "1 hour",
        keys=["event_type"],
        aggs=[
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.count(F.lit(1)).alias("n"),
        ],
    )
    return out.select("event_type", "window_start", "window_end", "sum_value", "n")


SESSION_ORACLE = """
WITH o AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, ts, value,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT user_id,
       min(ts)                        AS window_start,
       max(ts) + INTERVAL 30 MINUTE   AS window_end,
       round(sum(value), 2)           AS sum_value,
       count(*)                       AS n
FROM s
GROUP BY user_id, sid
"""


@query("stream_session_window", oracle=SESSION_ORACLE)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session windows per user with a 30-minute gap."""
    e = table(spark, sf_dir, "events")
    out = session_window_agg(
        e,
        "ts",
        "30 minutes",
        keys=["user_id"],
        aggs=[
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.count(F.lit(1)).alias("n"),
        ],
    )
    return out.select("user_id", "window_start", "window_end", "sum_value", "n")


INTERVAL_JOIN_ORACLE = """
SELECT c.event_id  AS click_id,
       c.user_id   AS user_id,
       c.ts        AS click_ts,
       p.event_id  AS purchase_id,
       p.ts        AS purchase_ts,
       round(p.value, 2) AS purchase_value
FROM events c JOIN events p ON c.user_id = p.user_id
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
  AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 4 HOUR
"""


@query("stream_interval_join", oracle=INTERVAL_JOIN_ORACLE)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """clicks joined to same-user purchases within the following 4 hours
    (stream-stream interval join; the identical builder runs unbounded
    with watermarks — verified in tests/test_streaming.py)."""
    from arrow_spark.streaming import interval_join

    e = table(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.round("value", 2).alias("purchase_value"),
    )
    return interval_join(
        clicks, purchases, "click_ts", "purchase_ts",
        on=["user_id"], lower="0 seconds", upper="4 hours",
    )


ROLLUP_CASCADE_ORACLE = """
SELECT event_type,
       date_trunc('day', ts)  AS bucket,
       round(sum(value), 2)   AS sum_v,
       count(value)           AS n_v,
       round(min(value), 2)   AS min_v,
       round(max(value), 2)   AS max_v
FROM events
GROUP BY 1, 2
"""


@query("rollup_cascade_daily", oracle=ROLLUP_CASCADE_ORACLE)
def rollup_cascade_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hypertable-style cascade: daily rollup computed FROM the hourly
    rollup's partials (sum of sums, sum of counts), never re-reading raw
    rows — the oracle aggregates raw directly, so the hash match proves
    the cascade exact. 2-decimal values make round(sum,2) an exact
    decimal reconstruction on both paths."""
    from arrow_spark.operators.rollup import cascade_rollup

    e = table(spark, sf_dir, "events")
    day = cascade_rollup(e, "ts", "value", keys=["event_type"], levels=["hour", "day"])["day"]
    return day.select(
        "event_type",
        "bucket",
        F.round("sum_v", 2).alias("sum_v"),
        "n_v",
        F.round("min_v", 2).alias("min_v"),
        F.round("max_v", 2).alias("max_v"),
    )


STREAM_DEDUP_ORACLE = """
SELECT DISTINCT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp
FROM documents
"""


@query("stream_dedup", oracle=STREAM_DEDUP_ORACLE)
def stream_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming content dedup (ingest-side): distinct normalized-content
    fingerprints — unified model, so the batch run here IS the plan the
    stream runs; dropDuplicatesWithinWatermark stream ≡ batch is
    asserted in test_streaming.py."""
    from arrow_spark.streaming.dedup import stream_dedup_content

    docs = table(spark, sf_dir, "documents")
    return stream_dedup_content(docs).select("fp")


SESSIONIZE_ORACLE = """
WITH flagged AS (
  SELECT event_id, user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   -- floor(epoch) on both terms: Spark's unix_timestamp
                   -- truncates to whole seconds, so the oracle must too
                   OR floor(epoch(ts))::BIGINT - floor(epoch(lag(ts) OVER w))::BIGINT > 1800
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_id, user_id,
       CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
FROM flagged
"""


@query("sessionize_events", oracle=SESSIONIZE_ORACLE)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """batch sessionization: per-user 30-minute-gap session labels on
    every event row (the batch twin of session_window aggregation —
    user-partitioned lag + running sum, one shuffle, no global window)."""
    from arrow_spark.operators.sessions import sessionize

    e = table(spark, sf_dir, "events")
    out = sessionize(e, "user_id", "ts", 1800, tiebreak=["event_id"])
    return out.select("event_id", "user_id", "session_seq")


ROLLUP_REFRESH_ORACLE = """
SELECT event_type,
       date_trunc('day', ts)  AS bucket,
       round(sum(value), 2)   AS sum_v,
       count(value)           AS n_v,
       round(min(value), 2)   AS min_v,
       round(max(value), 2)   AS max_v
FROM events
GROUP BY 1, 2
"""


@query("rollup_incremental_refresh", oracle=ROLLUP_REFRESH_ORACLE)
def rollup_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """continuous-aggregate refresh: the daily rollup of the first ~80%
    of the stream is folded together with the late 20% delta via partial
    merging (operators/rollup.py::refresh_rollup) — history is never
    rescanned. The oracle aggregates ALL raw rows directly, so the hash
    match proves the incremental path exactly equals a full recompute."""
    from arrow_spark.operators.rollup import cascade_rollup, refresh_rollup

    e = table(spark, sf_dir, "events")
    cutoff = F.col("event_id") % 5 != 0  # deterministic 80/20 split
    prev = cascade_rollup(
        e.where(cutoff), "ts", "value", keys=["event_type"], levels=["day"]
    )["day"]
    merged = refresh_rollup(
        prev, e.where(~cutoff), "ts", "value", keys=["event_type"], level="day"
    )
    return merged.select(
        "event_type",
        "bucket",
        F.round("sum_v", 2).alias("sum_v"),
        "n_v",
        F.round("min_v", 2).alias("min_v"),
        F.round("max_v", 2).alias("max_v"),
    )


INTERVAL_JOIN_LEFT_ORACLE = """
SELECT c.event_id  AS click_id,
       c.user_id   AS user_id,
       c.ts        AS click_ts,
       p.event_id  AS purchase_id,
       p.ts        AS purchase_ts,
       round(p.value, 2) AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') c
LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 4 HOUR
"""


@query("stream_interval_join_left", oracle=INTERVAL_JOIN_LEFT_ORACLE)
def stream_interval_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream interval join: every click appears,
    clicks with no same-user purchase in the following 4 hours carry
    nulls — the funnel-abandonment shape. Unbounded, Spark emits the
    null rows once the watermark passes the interval bound (state
    provably expires; stream-vs-batch agreement on watermark-closed
    rows is pinned in tests/test_streaming.py); this batch run is
    exact and oracle-checked."""
    from arrow_spark.streaming import interval_join

    e = table(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.round("value", 2).alias("purchase_value"),
    )
    return interval_join(
        clicks, purchases, "click_ts", "purchase_ts",
        on=["user_id"], lower="0 seconds", upper="4 hours", how="left",
    )


STATIC_ENRICH_ORACLE = """
WITH dim AS (
  SELECT user_id, count(*) AS user_events,
         -- exact-cents average: integer sum, ONE deterministic division,
         -- then a floor-snap — round(avg(value), 4) flipped at a .xxxx5
         -- midpoint at sf0.1 (found by the sf0.1 oracle sweep)
         floor(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
               / (100 * count(*)) * 1e4 + 0.5) / 1e4 AS user_avg
  FROM events GROUP BY user_id
)
SELECT e.event_id, e.user_id, e.event_type,
       round(e.value, 2) AS value, dim.user_events, dim.user_avg
FROM events e LEFT JOIN dim USING (user_id)
WHERE e.event_type = 'purchase'
"""


@query("stream_static_enrich", oracle=STATIC_ENRICH_ORACLE)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stream-static dimension enrichment: purchase events joined to a
    bounded per-user profile frame (broadcast — the stream side never
    shuffles). The identical builder runs unbounded, re-reading the
    dimension every micro-batch; stream-vs-batch equality is pinned in
    tests/test_streaming.py, and this batch run is oracle-checked."""
    from arrow_spark.streaming.joins import enrich_with_static

    e = table(spark, sf_dir, "events")
    dim = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("user_events"),
        (
            F.floor(
                F.sum(F.round(F.col("value") * 100).cast("long")).cast("double")
                / (100 * F.count(F.lit(1)))
                * 1e4
                + F.lit(0.5)
            )
            / 1e4
        ).alias("user_avg"),
    )
    stream = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "event_type", F.round("value", 2).alias("value")
    )
    return enrich_with_static(stream, dim, ["user_id"])


WINDOWED_TOPK_ORACLE = """
WITH counts AS (
  SELECT date_trunc('hour', ts) AS window_start,
         date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
         event_type, count(*) AS n
  FROM events GROUP BY 1, 2, 3
)
SELECT event_type, n, window_start, window_end,
       CAST(row_number() OVER (PARTITION BY window_start
                               ORDER BY n DESC, event_type) AS INT) AS rank
FROM counts QUALIFY rank <= 3
"""


@query("stream_windowed_topk", oracle=WINDOWED_TOPK_ORACLE)
def stream_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending event types: hourly top-3 by count. Streaming form =
    the same windowed-counts aggregation (watermark-bounded state) with
    the rank pushed into foreachBatch (tests/test_streaming.py runs the
    live-stream variant); this batch plan is what the oracle checks."""
    from arrow_spark.streaming import windowed_topk

    e = table(spark, sf_dir, "events")
    out = windowed_topk(e, "ts", "1 hour", "event_type", k=3)
    return out.select("event_type", "n", "window_start", "window_end", "rank")


DRIFT_MONITOR_ORACLE = """
WITH ref AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS r FROM events GROUP BY 1
), nr AS (
  SELECT CAST(sum(r) AS BIGINT) AS nr FROM ref
), cells AS (
  SELECT date_trunc('hour', ts) AS window_start, event_type,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), wtot AS (
  SELECT window_start, CAST(sum(c) AS BIGINT) AS ng FROM cells GROUP BY 1
), terms AS (
  SELECT cells.window_start, wtot.ng, nr.nr,
         sum(abs(c * nr.nr - coalesce(ref.r, 0) * wtot.ng)) AS present_num,
         CAST(sum(coalesce(ref.r, 0)) AS BIGINT) AS r_present
  FROM cells
  LEFT JOIN ref ON cells.event_type = ref.event_type
  JOIN wtot ON cells.window_start = wtot.window_start, nr
  GROUP BY cells.window_start, wtot.ng, nr.nr
)
SELECT window_start, ng AS n_events,
       CAST(present_num + (nr - r_present) * ng AS DOUBLE)
         / CAST(2 * ng * nr AS DOUBLE) AS tv
FROM terms
"""


@query("stream_drift_monitor", oracle=DRIFT_MONITOR_ORACLE)
def stream_drift_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hourly event-type mix vs the full-corpus distribution as TV
    distance — the streaming drift monitor's batch twin (the stream
    runs the identical windowed-count aggregation with watermark state;
    foreachBatch reduces each micro-batch with mix_tv_from_counts —
    tests/test_streaming.py runs the live variant). All-integer TV
    numerator with algebraic absent-key mass ⇒ hash-exact
    (streaming/drift.py)."""
    from arrow_spark.streaming.drift import windowed_drift

    e = table(spark, sf_dir, "events")
    ref = e.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("r"))
    return windowed_drift(e, "ts", "1 hour", "event_type", ref)


INTERVAL_JOIN_FULL_ORACLE = """
SELECT coalesce(c.user_id, p.user_id) AS user_id,
       c.event_id  AS click_id,
       c.ts        AS click_ts,
       p.event_id  AS purchase_id,
       p.ts        AS purchase_ts,
       round(p.value, 2) AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') c
FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 4 HOUR
"""


@query("stream_interval_join_full", oracle=INTERVAL_JOIN_FULL_ORACLE)
def stream_interval_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER stream-stream interval join — both unmatched clicks
    AND orphan purchases (no preceding same-user click within 4 h)
    surface with nulls, the key coalesced from whichever side matched;
    completes the interval-join mode matrix (inner / left / full).
    Streaming form: watermarks on both sides + the bounded time
    condition let Spark expire state and emit the null rows at
    watermark close; this batch run is exact and oracle-checked."""
    from arrow_spark.streaming import interval_join

    e = table(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.round("value", 2).alias("purchase_value"),
    )
    return interval_join(
        clicks, purchases, "click_ts", "purchase_ts",
        on=["user_id"], lower="0 seconds", upper="4 hours", how="full_outer",
    )
