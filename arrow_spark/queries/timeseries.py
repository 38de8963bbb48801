"""Time-series densification queries: gap-filled bucketed series with
LOCF and linear interpolation (operators/gapfill.py). The oracle
rebuilds the whole pipeline — epoch bucketing, per-group grid,
IGNORE NULLS windows, the interpolation arithmetic — in DuckDB SQL, so
the value hash checks every filled cell, not just shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from arrow_spark.catalog import table
from arrow_spark.operators.gapfill import gap_fill
from arrow_spark.queries.base import query

GAPFILL_ORACLE = """
WITH b AS (
  SELECT user_id,
         CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS bucket,
         count(*) AS n_rows,
         floor((round(sum(value), 2) / count(*)) * 1e6 + 0.5) / 1e6 AS v
  FROM events
  WHERE user_id < 8
  GROUP BY 1, 2
), s AS (
  SELECT user_id, min(bucket) AS mn, max(bucket) AS mx FROM b GROUP BY 1
), grid AS (
  SELECT user_id, unnest(generate_series(mn, mx, 3600)) AS bucket FROM s
), d AS (
  SELECT grid.user_id, grid.bucket,
         coalesce(b.n_rows, 0) AS n_rows, b.v
  FROM grid LEFT JOIN b USING (user_id, bucket)
), f AS (
  SELECT user_id, bucket, n_rows, v,
    last_value(v IGNORE NULLS) OVER past AS v_locf,
    first_value(v IGNORE NULLS) OVER fut AS next_v,
    last_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS)
      OVER past AS prev_t,
    first_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS)
      OVER fut AS next_t
  FROM d
  WINDOW past AS (PARTITION BY user_id ORDER BY bucket
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         fut AS (PARTITION BY user_id ORDER BY bucket
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, bucket, n_rows, v, v_locf,
  floor((CASE WHEN v IS NOT NULL THEN v
              WHEN prev_t IS NULL THEN next_v
              WHEN next_t IS NULL THEN v_locf
              ELSE v_locf + (next_v - v_locf)
                   * ((bucket - prev_t) / (next_t - prev_t))
         END) * 1e6 + 0.5) / 1e6 AS v_interp
FROM f
"""


@query("gapfill_timeseries", oracle=GAPFILL_ORACLE)
def gapfill_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-user mean event value, densified over each user's
    active range with LOCF and linear interpolation filling the silent
    hours (time_bucket_gapfill/locf/interpolate pattern; Arrow's own
    surface stops at fill_null_forward over dense input)."""
    e = table(spark, sf_dir, "events").where(F.col("user_id") < 8)
    v = (
        F.floor((F.round(F.sum("value"), 2) / F.count(F.lit(1))) * 1e6 + F.lit(0.5))
        / 1e6
    )
    return gap_fill(e, "ts", 3600, ["user_id"], v, fill="both")


INTERVAL_JOIN_ORACLE = """
WITH b AS (
  SELECT event_id, user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS s
  FROM events
), l AS (
  SELECT event_id AS l_id, user_id, s AS ls, s + 600 AS le
  FROM b WHERE event_type = 'view'
), r AS (
  SELECT event_id AS r_id, user_id, s AS rs, s + 300 AS re
  FROM b WHERE event_type = 'click'
)
SELECT l.user_id, l_id, r_id,
       greatest(ls, rs) AS ov_start, least(le, re) AS ov_end
FROM l JOIN r ON l.user_id = r.user_id AND ls <= re AND rs <= le
"""


@query("interval_overlap_join", oracle=INTERVAL_JOIN_ORACLE)
def interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """range join: 10-minute view windows × 5-minute click windows per
    user, overlapping pairs only. The engine path is the binned
    equi-join (operators/rangejoin.py — owner-bin dedup, no cartesian);
    the oracle is DuckDB's plain range-predicate join, so the hash
    proves the binning is lossless and duplicate-free."""
    from arrow_spark.operators.rangejoin import interval_join

    e = table(spark, sf_dir, "events")
    base = e.select(
        "event_id", "user_id", "event_type", F.unix_timestamp("ts").alias("s")
    )
    left = base.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("l_id"),
        "user_id",
        F.col("s").alias("ls"),
        (F.col("s") + 600).alias("le"),
    )
    right = base.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("r_id"),
        "user_id",
        F.col("s").alias("rs"),
        (F.col("s") + 300).alias("re"),
    )
    out = interval_join(
        left, right, "ls", "le", "rs", "re", by=["user_id"], bin_width=900
    )
    return out.select(
        "user_id",
        "l_id",
        "r_id",
        F.greatest("ls", "rs").alias("ov_start"),
        F.least("le", "re").alias("ov_end"),
    )


OHLC_ORACLE = """
WITH e AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS bucket,
         event_id, value
  FROM events
), r AS (
  SELECT *,
         row_number() OVER (PARTITION BY event_type, bucket
                            ORDER BY event_id ASC) AS rn_a,
         row_number() OVER (PARTITION BY event_type, bucket
                            ORDER BY event_id DESC) AS rn_d
  FROM e
)
SELECT event_type, bucket,
       min(CASE WHEN rn_a = 1 THEN value END) AS open,
       max(value) AS high,
       min(value) AS low,
       min(CASE WHEN rn_d = 1 THEN value END) AS close,
       count(*) AS n_ticks,
       floor(round(sum(value), 2) * 1e6 + 0.5) / 1e6 AS volume
FROM r
GROUP BY event_type, bucket
"""


@query("ohlc_resample", oracle=OHLC_ORACLE)
def ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling: hourly open/high/low/close per event type (the
    financial resample pattern). Open/close pick the first/last tick by
    the strictly-monotonic event_id, so ties can't flip between engines;
    one window + one agg sharing the same (type, bucket) exchange."""
    from pyspark.sql import Window as W

    from arrow_spark.operators.gapfill import time_bucket

    e = table(spark, sf_dir, "events").select(
        "event_type",
        time_bucket(F.col("ts"), 3600).alias("bucket"),
        "event_id",
        "value",
    )
    wa = W.partitionBy("event_type", "bucket").orderBy(F.col("event_id").asc())
    wd = W.partitionBy("event_type", "bucket").orderBy(F.col("event_id").desc())
    r = e.withColumn("rn_a", F.row_number().over(wa)).withColumn(
        "rn_d", F.row_number().over(wd)
    )
    return r.groupBy("event_type", "bucket").agg(
        F.min(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.min(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.count(F.lit(1)).alias("n_ticks"),
        (F.floor(F.round(F.sum("value"), 2) * 1e6 + F.lit(0.5)) / 1e6).alias(
            "volume"
        ),
    )


FUNNEL_ORACLE = """
WITH e AS (
  SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS s
  FROM events
), s1 AS (
  SELECT user_id, min(s) AS t1 FROM e WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, min(e.s) AS t2
  FROM e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.s > s1.t1
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, min(e.s) AS t3
  FROM e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.s > s2.t2
  GROUP BY e.user_id
)
SELECT s1.user_id, t1, t2, t3,
       1 + (CASE WHEN t2 IS NULL THEN 0 ELSE 1 END)
         + (CASE WHEN t3 IS NULL THEN 0 ELSE 1 END) AS stage
FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
        LEFT JOIN s3 ON s1.user_id = s3.user_id
"""


@query("funnel_stages", oracle=FUNNEL_ORACLE)
def funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ordered conversion funnel view → click → purchase per user: each
    stage is the earliest qualifying event strictly after the previous
    stage's timestamp. Three (user)-keyed aggregations — same shuffle
    key throughout, so the exchanges line up — and no window over the
    whole event stream."""
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("s")
    )
    s1 = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("s").alias("t1"))
    )
    s2 = (
        e.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where(F.col("s") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("s").alias("t2"))
    )
    s3 = (
        e.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where(F.col("s") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("s").alias("t3"))
    )
    stage = (
        F.lit(1)
        + F.when(F.col("t2").isNull(), 0).otherwise(1)
        + F.when(F.col("t3").isNull(), 0).otherwise(1)
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select("user_id", "t1", "t2", "t3", stage.alias("stage"))
    )


EWMA_ORACLE = """
WITH base AS (
  SELECT user_id, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT a.user_id, a.event_id, a.cents,
       sum(b.cents / CAST(CAST(1 AS BIGINT) << (a.rn - b.rn) AS DOUBLE))
       / sum(1.0 / CAST(CAST(1 AS BIGINT) << (a.rn - b.rn) AS DOUBLE)) AS ewma_cents
FROM base a JOIN base b
  ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - 31 AND a.rn
GROUP BY a.user_id, a.event_id, a.cents
"""


@query("ewma_smooth", oracle=EWMA_ORACLE)
def ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-32 normalized EWMA (α=1/2) of integer-snapped event values
    per user. The dyadic-weight contract (operators/smoothing.py) makes
    every float EXACT, so the hash check is bit-for-bit: the oracle
    replays the trailing window as a bounded self-join and lands on the
    identical doubles. Plan: ONE hash-partition on user_id, then a
    single codegen projection — no self-join on the Spark side."""
    from arrow_spark.operators.smoothing import ewma

    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return ewma(
        ev, ["user_id"], ["ts", "event_id"], "cents", out_col="ewma_cents"
    ).select("user_id", "event_id", "cents", "ewma_cents")


COHORT_ORACLE = """
WITH pa AS (
  SELECT DISTINCT user_id AS u, CAST(floor(epoch(ts) / 604800) AS BIGINT) AS p
  FROM events
), cohort AS (
  SELECT u, min(p) AS cohort_p FROM pa GROUP BY u
), act AS (
  SELECT pa.u, cohort_p, p - cohort_p AS "offset" FROM pa JOIN cohort USING (u)
), mat AS (
  SELECT cohort_p, "offset", count(DISTINCT u) AS n_active FROM act GROUP BY 1, 2
), sz AS (
  SELECT cohort_p, CAST(count(*) AS BIGINT) AS cohort_size FROM cohort GROUP BY 1
)
SELECT m.cohort_p, m."offset", CAST(n_active AS BIGINT) AS n_active, cohort_size,
       CAST(n_active AS DOUBLE) / CAST(cohort_size AS DOUBLE) AS retention
FROM mat m JOIN sz USING (cohort_p)
"""


@query("cohort_retention", oracle=COHORT_ORACLE)
def cohort_retention_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix over the events stream. Integer
    epoch-bucket periods (no calendar-week conventions) and an exact
    n_active/cohort_size ratio make every cell hash-exact."""
    from arrow_spark.operators.cohorts import cohort_retention

    return cohort_retention(table(spark, sf_dir, "events"))


CUSUM_ORACLE = """
WITH base AS (
  SELECT user_id, event_id, ts, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), med AS (
  SELECT user_id, median(cents) AS target FROM base GROUP BY 1
), dev AS (
  SELECT b.user_id, b.event_id, b.cents,
         b.cents - m.target AS dh, -(b.cents - m.target) AS dl,
         ROW_NUMBER() OVER (PARTITION BY b.user_id ORDER BY b.ts, b.event_id) AS rn
  FROM base b JOIN med m USING (user_id)
), cum AS (
  SELECT user_id, event_id, cents, rn,
         sum(dh) OVER (PARTITION BY user_id ORDER BY rn) AS ch,
         sum(dl) OVER (PARTITION BY user_id ORDER BY rn) AS cl
  FROM dev
), runmin AS (
  SELECT user_id, event_id, cents, ch, cl,
         min(ch) OVER (PARTITION BY user_id ORDER BY rn) AS mh,
         min(cl) OVER (PARTITION BY user_id ORDER BY rn) AS ml
  FROM cum
)
SELECT user_id, event_id, cents,
       ch - least(0, mh) AS cusum_hi,
       cl - least(0, ml) AS cusum_lo,
       (ch - least(0, mh) > 20000) OR (cl - least(0, ml) > 20000) AS drift_flag
FROM runmin
"""


@query("changepoint_cusum", oracle=CUSUM_ORACLE)
def changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM drift statistics per user over integer-snapped
    event values, median target, threshold 20000 cents. The clamp-free
    running-extrema identity (operators/changepoint.py) keeps everything
    on the 0.5 grid — every statistic and flag replays bit-exact."""
    from arrow_spark.operators.changepoint import cusum_changepoints

    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return cusum_changepoints(
        ev, ["user_id"], ["ts", "event_id"], "cents", threshold=20000.0
    ).select("user_id", "event_id", "cents", "cusum_hi", "cusum_lo", "drift_flag")


KM_ORACLE = """
WITH subj AS (
  SELECT user_id % 3 AS segment,
         CAST(date_diff('day', min(ts), max(ts)) AS BIGINT) AS t,
         CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
           AS event
  FROM events GROUP BY user_id
), per_t AS (
  SELECT segment, t, CAST(sum(event) AS BIGINT) AS d_events,
         CAST(count(*) AS BIGINT) AS n_subjects
  FROM subj GROUP BY 1, 2
), w AS (
  SELECT segment, t, d_events, n_subjects,
         n_subjects - d_events AS n_censored,
         CAST(sum(n_subjects) OVER (PARTITION BY segment)
              - coalesce(sum(n_subjects) OVER (PARTITION BY segment ORDER BY t
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS n_at_risk
  FROM per_t
), f AS (
  SELECT *, CAST(1 AS DOUBLE) - CAST(d_events AS DOUBLE) / CAST(n_at_risk AS DOUBLE)
            AS fct
  FROM w
)
SELECT a.segment, a.t, a.n_at_risk, a.d_events, a.n_censored,
       list_reduce(list(b.fct ORDER BY b.t), (x, y) -> x * y) AS survival
FROM f a JOIN f b ON a.segment = b.segment AND b.t <= a.t
GROUP BY a.segment, a.t, a.n_at_risk, a.d_events, a.n_censored
"""


@query("survival_kaplan_meier", oracle=KM_ORACLE)
def survival_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curves per user segment: duration = active
    days, event = made a purchase (others censored). Integer counts +
    one deterministic division per step + identical ordered left-fold
    products on both engines ⇒ every survival value is bit-exact."""
    from arrow_spark.operators.survival import kaplan_meier

    subj = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.datediff(F.max("ts"), F.min("ts")).cast("long").alias("t"),
            F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("event"),
        )
        .withColumn("segment", F.col("user_id") % 3)
    )
    return kaplan_meier(subj, ["segment"], "t", "event")


def _holt_oracle(window: int = 16) -> str:
    """Chained per-step replay of the Holt recursion: the row's trailing
    window is pivoted to w1..wN columns, then each step updates (l, b)
    with the identical half-and-sum expressions (partial head windows
    skip missing steps via CASE — matching the fold's shorter list)."""
    pivots = ",\n         ".join(
        f"max(CASE WHEN pos = {j} THEN w END) AS w{j}" for j in range(1, window + 1)
    )
    steps = []
    for k in range(2, window + 1):
        carry = ", ".join(f"w{j}" for j in range(k + 1, window + 1))
        carry = (carry + "," if carry else "")
        l2 = f"0.5 * w{k} + 0.5 * (l + b)"
        steps.append(f"""s{k} AS (
  SELECT user_id, event_id, cents, {carry}
         CASE WHEN w{k} IS NULL THEN l ELSE {l2} END AS l,
         CASE WHEN w{k} IS NULL THEN b
              ELSE 0.5 * (({l2}) - l) + 0.5 * b END AS b
  FROM s{k - 1}
)""")
    return f"""
WITH base AS (
  SELECT user_id, event_id, CAST(round(value * 100) AS BIGINT) AS cents,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), wv AS (
  SELECT a.user_id, a.event_id, a.cents,
         b.rn - greatest(a.rn - {window - 1}, 1) + 1 AS pos, b.cents AS w
  FROM base a JOIN base b
    ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - {window - 1} AND a.rn
), piv AS (
  SELECT user_id, event_id, cents,
         {pivots}
  FROM wv GROUP BY 1, 2, 3
), s1 AS (
  SELECT user_id, event_id, cents,
         {', '.join(f'w{j}' for j in range(2, window + 1))},
         CAST(w1 AS DOUBLE) AS l, CAST(0 AS DOUBLE) AS b
  FROM piv
),
{','.join(steps)}
SELECT user_id, event_id, cents, l AS level, b AS trend, l + b AS forecast
FROM s{window}
"""


@query("holt_trend_smooth", oracle=_holt_oracle())
def holt_trend_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """span-16 Holt level+trend smoothing (α=β=½) of integer-snapped
    event values per user — the trend-aware sibling of ewma_smooth.
    Dyadic halving keeps every level/trend/forecast exact, so the
    chained-step oracle replay is bit-for-bit."""
    from arrow_spark.operators.smoothing import holt_smooth

    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return holt_smooth(
        ev, ["user_id"], ["ts", "event_id"], "cents", window=16
    ).select("user_id", "event_id", "cents", "level", "trend", "forecast")


TWA_ORACLE = """
WITH p AS (
  SELECT event_type, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS t,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), seg AS (
  SELECT event_type, t, cents,
         lead(t) OVER (PARTITION BY event_type ORDER BY t, event_id) - t AS dt
  FROM p
), b AS (
  SELECT event_type,
         CAST(floor(t / 86400) * 86400 AS BIGINT) AS bucket_start, cents, dt
  FROM seg
)
SELECT event_type, bucket_start,
       count(*) AS n_points,
       CAST(coalesce(sum(dt), 0) AS BIGINT) AS total_dt,
       CASE WHEN coalesce(sum(dt), 0) > 0
            THEN floor(CAST(sum(cents * dt) AS DOUBLE) / sum(dt) * 1e6 + 0.5) / 1e6
       END AS twa_cents
FROM b
GROUP BY 1, 2
"""


@query("timeseries_time_weighted_avg", oracle=TWA_ORACLE)
def timeseries_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF time-weighted daily average of event values per event_type
    (the TimescaleDB time_weight/average pair): each point's value is
    weighted by how long it stayed the latest observation. One lead()
    window + one group-by, both on the series key; decimal moment sums
    + a single division keep the value hash exact."""
    from arrow_spark.operators.timeweight import time_weighted_avg

    e = table(spark, sf_dir, "events")
    return time_weighted_avg(
        e,
        ["event_type"],
        "ts",
        F.round(F.col("value") * 100),
        bucket_seconds=86400,
        tiebreak=["event_id"],
    )


LTTB_ORACLE = """
WITH p AS (
  SELECT event_type, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS t,
         CAST(round(value * 100) AS BIGINT) AS v_cents
  FROM events
), rn AS (
  SELECT event_type, event_id, t, v_cents,
         row_number() OVER (PARTITION BY event_type ORDER BY t, event_id) AS r,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM p
), bk AS (
  SELECT event_type, event_id, t, v_cents,
         CAST(floor((r - 1) * 32 / n) AS BIGINT) AS bucket
  FROM rn
), cent AS (
  SELECT event_type, bucket,
         CAST(sum(t) AS DOUBLE) AS st, CAST(sum(v_cents) AS DOUBLE) AS sv,
         CAST(count(*) AS DOUBLE) AS c
  FROM bk GROUP BY 1, 2
), j AS (
  SELECT bk.event_type, bk.bucket, bk.t, bk.v_cents, bk.event_id,
         abs((pv.st / pv.c - nx.st / nx.c)
               * (CAST(bk.v_cents AS DOUBLE) - nx.sv / nx.c)
             - (pv.st / pv.c - CAST(bk.t AS DOUBLE))
               * (pv.sv / pv.c - nx.sv / nx.c)) AS area2
  FROM bk
  LEFT JOIN cent pv ON pv.event_type = bk.event_type AND pv.bucket = bk.bucket - 1
  LEFT JOIN cent nx ON nx.event_type = bk.event_type AND nx.bucket = bk.bucket + 1
), pick AS (
  SELECT event_type, bucket, t, v_cents, area2,
         row_number() OVER (PARTITION BY event_type, bucket
                            ORDER BY area2 DESC NULLS LAST, t ASC, event_id ASC)
           AS pk
  FROM j
)
SELECT event_type, bucket, t, v_cents, area2 FROM pick WHERE pk = 1
"""


@query("timeseries_lttb_downsample", oracle=LTTB_ORACLE)
def timeseries_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bucket LTTB downsample (fixed-anchor parallel variant) of each
    event_type's value series — per equal-count bucket, the point whose
    triangle against the neighbor-bucket centroids is largest. Integer
    bucket assignment + single-division centroids + one fixed-shape
    area expression ⇒ the selected points hash-match the SQL replay."""
    from arrow_spark.operators.downsample import lttb_downsample

    e = table(spark, sf_dir, "events")
    return lttb_downsample(
        e,
        ["event_type"],
        "ts",
        F.round(F.col("value") * 100),
        n_buckets=32,
        tiebreak=["event_id"],
    )


BACKTEST_ORACLE = f"""
WITH h AS (
  {_holt_oracle().strip()}
), o AS (
  SELECT h.user_id, h.event_id, h.cents, h.forecast, e.ts
  FROM h JOIN events e USING (event_id)
), nx AS (
  SELECT user_id, forecast,
         lead(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM o
)
SELECT user_id,
       CAST(count(nxt) AS BIGINT) AS n_evals,
       CASE WHEN count(nxt) > 0 THEN sum(abs(forecast - nxt)) END AS sum_abs_err,
       CASE WHEN count(nxt) > 0 THEN sum(abs(forecast - nxt)) / count(nxt) END
         AS mae_cents
FROM nx
GROUP BY user_id
"""


@query("forecast_backtest_holt", oracle=BACKTEST_ORACLE)
def forecast_backtest_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin 1-step backtest of the Holt forecaster: per user,
    the mean absolute error of forecast_t against the NEXT observed
    value — the evaluation loop a forecasting pipeline runs before
    trusting a model. Every error term is a dyadic (exact Holt forecast
    minus integer cents, all on the 2^-15 grid), so the error SUM is
    order-independent exact and the MAE a single division — hash-exact
    without any snapping."""
    from pyspark.sql import Window as W

    from arrow_spark.operators.smoothing import holt_smooth

    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    sm = holt_smooth(ev, ["user_id"], ["ts", "event_id"], "cents", window=16)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nx = sm.select(
        "user_id", "forecast", F.lead("cents").over(w).alias("nxt")
    )
    err = F.abs(F.col("forecast") - F.col("nxt"))
    return nx.groupBy("user_id").agg(
        F.count("nxt").cast("long").alias("n_evals"),
        F.when(F.count("nxt") > 0, F.sum(err)).alias("sum_abs_err"),
        F.when(F.count("nxt") > 0, F.sum(err) / F.count("nxt")).alias("mae_cents"),
    )


SEASONAL_DECOMP_ORACLE = """
WITH hourly AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS bucket,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
), ph AS (
  SELECT event_type, bucket,
         CAST(floor(bucket / 3600.0) AS BIGINT) % 24 AS phase, cents
  FROM hourly
), tr AS (
  SELECT event_type, bucket, phase, cents,
         CAST(2 * sum(cents) OVER (PARTITION BY event_type ORDER BY bucket
                ROWS BETWEEN 11 PRECEDING AND 11 FOLLOWING)
              + lag(cents, 12) OVER o + lead(cents, 12) OVER o
              AS DOUBLE) / 48.0 AS trend
  FROM ph
  WINDOW o AS (PARTITION BY event_type ORDER BY bucket)
), ds AS (
  SELECT *, CASE WHEN trend IS NOT NULL THEN
           CAST(floor((CAST(cents AS DOUBLE) - trend) * 1e6 + 0.5) AS BIGINT)
         END AS dmicro
  FROM tr
), seas AS (
  SELECT event_type, phase,
         CAST(sum(dmicro) AS DOUBLE)
           / CAST(count(dmicro) * 1000000 AS DOUBLE) AS seasonal
  FROM ds WHERE dmicro IS NOT NULL GROUP BY 1, 2
)
SELECT ds.event_type, ds.bucket, ds.phase, ds.cents, ds.trend, seas.seasonal,
       CAST(ds.cents AS DOUBLE) - ds.trend - seas.seasonal AS residual
FROM ds LEFT JOIN seas ON ds.event_type = seas.event_type
                      AND ds.phase = seas.phase
"""


@query("timeseries_seasonal_decompose", oracle=SEASONAL_DECOMP_ORACLE)
def timeseries_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """classical additive decomposition of the hourly per-event-type
    cents series with a daily (period-24) season: centered 2×24 MA
    trend whose ×2 numerator stays integer, micro-snapped per-phase
    seasonal means (integer sum + ONE division), fixed-order residual
    chain — hash-exact end to end (operators/smoothing.py::
    seasonal_decompose). Per-event cents snap BEFORE the bucket sum so
    the series itself is exact integers."""
    from arrow_spark.operators.smoothing import seasonal_decompose

    ev = table(spark, sf_dir, "events")
    hourly = (
        ev.select(
            "event_type",
            (F.floor(F.unix_timestamp("ts") / 3600) * 3600)
            .cast("long")
            .alias("bucket"),
            F.round(F.col("value") * 100).cast("long").alias("c"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.sum("c").cast("long").alias("cents"))
        .withColumn(
            "phase", F.floor(F.col("bucket") / 3600.0).cast("long") % 24
        )
    )
    return seasonal_decompose(
        hourly, ["event_type"], "bucket", "cents", "phase", period=24
    )


ROLLING_CORR_ORACLE = """
WITH hourly AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS bucket,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events WHERE event_type IN ('click', 'view') GROUP BY 1, 2
), xy AS (
  SELECT 'click_view' AS pair, a.bucket, a.cents AS x, b.cents AS y
  FROM hourly a JOIN hourly b ON a.bucket = b.bucket
  WHERE a.event_type = 'click' AND b.event_type = 'view'
), m AS (
  SELECT pair, bucket, x, y,
         count(*) OVER w AS n,
         sum(x) OVER w AS sx, sum(y) OVER w AS sy,
         sum(x * y) OVER w AS sxy,
         sum(x * x) OVER w AS sxx, sum(y * y) OVER w AS syy
  FROM xy
  WINDOW w AS (PARTITION BY pair ORDER BY bucket
               ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
), c AS (
  SELECT pair, bucket, x, y, n,
         CAST(n * sxy - sx * sy AS DOUBLE) AS num,
         CAST(n * sxx - sx * sx AS DOUBLE) AS dx,
         CAST(n * syy - sy * sy AS DOUBLE) AS dy
  FROM m
)
SELECT pair, bucket, x, y,
       CASE WHEN n = 24 AND dx > 0 AND dy > 0
            THEN num / (sqrt(dx) * sqrt(dy)) END AS corr
FROM c
"""


@query("timeseries_rolling_corr", oracle=ROLLING_CORR_ORACLE)
def timeseries_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """24-hour rolling Pearson correlation between the click and view
    hourly cents series — five decimal(38,0) moment sums in ONE window
    pass, then a fixed double expression whose only irrational op is
    IEEE sqrt (correctly rounded, so cross-engine bit-identical):
    rolling correlation is hash-exact, not tolerance-tested
    (operators/regression.py::rolling_corr). Partial/degenerate windows
    yield NULL, never NaN."""
    from arrow_spark.operators.regression import rolling_corr

    ev = table(spark, sf_dir, "events")
    hourly = (
        ev.where(F.col("event_type").isin("click", "view"))
        .select(
            "event_type",
            (F.floor(F.unix_timestamp("ts") / 3600) * 3600)
            .cast("long")
            .alias("bucket"),
            F.round(F.col("value") * 100).cast("long").alias("c"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.sum("c").cast("long").alias("cents"))
    )
    clicks = hourly.where(F.col("event_type") == "click").select(
        "bucket", F.col("cents").alias("x")
    )
    views = hourly.where(F.col("event_type") == "view").select(
        "bucket", F.col("cents").alias("y")
    )
    xy = clicks.join(views, "bucket").select(
        F.lit("click_view").alias("pair"), "bucket", "x", "y"
    )
    return rolling_corr(xy, ["pair"], "bucket", "x", "y", window_rows=24)


_TREND_BASE = """
pts AS (
  SELECT user_id,
         list(struct_pack(t := s, v := cents) ORDER BY s, cents) AS l
  FROM (
    SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
  ) GROUP BY user_id
), sized AS (
  SELECT user_id, l, CAST(len(l) AS BIGINT) AS n FROM pts
)"""

MANN_KENDALL_ORACLE = f"""
WITH {_TREND_BASE},
dd AS (
  SELECT user_id, n,
         CASE WHEN n >= 2 THEN
           flatten(list_transform(range(1, n::INT), i ->
             list_transform(range(i + 1, n::INT + 1), j -> l[j].v - l[i].v)))
         END AS diffs
  FROM sized
), cd AS (
  SELECT user_id, n,
         CASE WHEN n >= 2 THEN CAST(len(list_filter(diffs, x -> x > 0)) AS BIGINT) END AS c,
         CASE WHEN n >= 2 THEN CAST(len(list_filter(diffs, x -> x < 0)) AS BIGINT) END AS d
  FROM dd
)
SELECT user_id, n,
       coalesce(c, 0) AS concordant,
       coalesce(d, 0) AS discordant,
       coalesce(c - d, 0) AS s_stat,
       CASE WHEN n >= 2 THEN CAST(c - d AS DOUBLE) / CAST(n * (n - 1) / 2 AS DOUBLE)
       END AS tau
FROM cd
"""


@query("trend_mann_kendall", oracle=MANN_KENDALL_ORACLE)
def trend_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend statistics per user over the cents
    event series — all pairwise sign counts computed IN-ROW over the
    time-ordered array (one key Exchange, no self-join; bounded-series
    contract like holt/lttb), all-integer until the single tau division
    (operators/robust_trend.py). The nonparametric companion to
    groupwise_ols_trend."""
    from arrow_spark.operators.robust_trend import mann_kendall

    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("s"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return mann_kendall(ev, ["user_id"], "s", "cents")


THEIL_SEN_ORACLE = f"""
WITH {_TREND_BASE},
sl AS (
  SELECT user_id, n,
         CASE WHEN n >= 2 THEN
           list_sort(list_filter(
             flatten(list_transform(range(1, n::INT), i ->
               list_transform(range(i + 1, n::INT + 1), j ->
                 CASE WHEN l[j].t = l[i].t THEN NULL
                      ELSE CAST(l[j].v - l[i].v AS DOUBLE)
                           / CAST(l[j].t - l[i].t AS DOUBLE) END))),
             x -> x IS NOT NULL))
         END AS sl
  FROM sized
), m AS (
  SELECT user_id, n, sl, CAST(coalesce(len(sl), 0) AS BIGINT) AS m FROM sl
)
SELECT user_id, n, m AS n_slopes,
       CASE WHEN m > 0 THEN
         CASE WHEN m % 2 = 1 THEN sl[CAST((m + 1) / 2 AS INT)]
              ELSE (sl[CAST(m / 2 AS INT)] + sl[CAST(m / 2 + 1 AS INT)]) / 2
         END
       END AS slope
FROM m
"""


@query("trend_theil_sen", oracle=THEIL_SEN_ORACLE)
def trend_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust slope per user (median of all pairwise slopes,
    29% breakdown vs OLS's 0) — pair slopes and the median pick happen
    IN-ROW over the time-ordered array; each slope is one IEEE division
    of exact integers and the even-count median is the fixed-order
    (a+b)/2, so the estimator is hash-exact
    (operators/robust_trend.py)."""
    from arrow_spark.operators.robust_trend import theil_sen

    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("s"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return theil_sen(ev, ["user_id"], "s", "cents")


ROLLING_MEDIAN_ORACLE = """
WITH daily AS (
  SELECT o_orderpriority AS g, o_orderdate AS d,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev
  FROM orders GROUP BY 1, 2
)
SELECT g, d, rev,
       list_extract(
         list_sort(list(rev) OVER w),
         CAST((count(rev) OVER w + 1) // 2 AS INT)
       ) AS med7
FROM daily
WINDOW w AS (PARTITION BY g ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


@query("timeseries_rolling_median", oracle=ROLLING_MEDIAN_ORACLE)
def timeseries_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT 7-row rolling median of daily revenue cents per order
    priority — the robust companion to a rolling mean (one outlier day
    cannot move it). Nearest-rank-low k = (n+1) DIV 2 over the sorted
    window (true median on full odd windows, lower-middle on the
    leading edge), all-integer so hash-exact.

    Scale: the input is the (priority × day) LATTICE — aggregate-sized
    regardless of row count — so the per-row sorted-window state is
    7 values and the window partitions by priority. The row-scale
    stage is the one map-side-combined daily group-by; the reference's
    single-array rolling kernels (compute/kernels/vector_run_* and
    aggregate_quantile.cc) assume one memory-resident array, this is
    the distributed lattice form."""
    daily = (
        table(spark, sf_dir, "orders")
        .select(
            F.col("o_orderpriority").alias("g"),
            F.col("o_orderdate").alias("d"),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
        )
        .groupBy("g", "d")
        .agg(F.sum("cents").cast("long").alias("rev"))
    )
    w = W.partitionBy("g").orderBy("d").rowsBetween(-6, 0)
    arr = F.sort_array(F.collect_list("rev").over(w))
    return daily.select(
        "g",
        "d",
        "rev",
        F.element_at(arr, ((F.size(arr) + 1) / 2).cast("int")).alias("med7"),
    )
