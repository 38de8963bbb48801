"""Temporal kernel family: component extraction, truncation/rounding,
differences, formatting/parsing, timezone ops.

Arrow refs: scalar_temporal_unary.cc, scalar_temporal_binary.cc
(SURVEY §2.2.5). Engine-calendar pitfalls handled explicitly:
Spark dayofweek is 1=Sunday vs DuckDB dayofweek 0=Sunday; DuckDB
date_diff counts boundary crossings vs Spark's elapsed intervals — the
oracles use matching formulations so semantics, not engine quirks, are
what is compared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arrow_spark.catalog import table
from arrow_spark.queries.base import query

EXTRACT_ORACLE = """
SELECT
  o_orderkey,
  year(o_orderdate)                     AS y,
  month(o_orderdate)                    AS mo,
  day(o_orderdate)                      AS d,
  hour(o_orderdate)                     AS h,
  minute(o_orderdate)                   AS mi,
  second(o_orderdate)                   AS s,
  quarter(o_orderdate)                  AS q,
  dayofweek(o_orderdate) + 1            AS dow,
  dayofyear(o_orderdate)                AS doy,
  weekofyear(o_orderdate)               AS woy,
  isoyear(o_orderdate)                  AS iso_y,
  CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
  year(o_orderdate) % 4 = 0 AND (year(o_orderdate) % 100 <> 0 OR year(o_orderdate) % 400 = 0) AS leap
FROM orders WHERE o_orderkey % 11 = 0
"""


@query("temporal_extract", oracle=EXTRACT_ORACLE)
def temporal_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day/hour/minute/second/quarter/day_of_week/day_of_year/
    iso_week/iso_year/is_leap_year component extraction."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 11 == 0)
    d = F.col("o_orderdate")
    yr = F.year(d)
    return o.select(
        "o_orderkey",
        yr.alias("y"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("d"),
        F.hour(d).alias("h"),
        F.minute(d).alias("mi"),
        F.second(d).alias("s"),
        F.quarter(d).alias("q"),
        F.dayofweek(d).alias("dow"),
        F.dayofyear(d).alias("doy"),
        F.weekofyear(d).alias("woy"),
        F.expr("extract(YEAROFWEEK FROM o_orderdate)").cast("long").alias("iso_y"),
        F.last_day(d.cast("date")).alias("month_end"),
        ((yr % 4 == 0) & ((yr % 100 != 0) | (yr % 400 == 0))).alias("leap"),
    )


TRUNC_ORACLE = """
SELECT
  event_id,
  date_trunc('year',    ts) AS t_year,
  date_trunc('quarter', ts) AS t_quarter,
  date_trunc('month',   ts) AS t_month,
  date_trunc('week',    ts) AS t_week,
  date_trunc('day',     ts) AS t_day,
  date_trunc('hour',    ts) AS t_hour,
  date_trunc('minute',  ts) AS t_minute
FROM events WHERE event_id % 13 = 0
"""


@query("temporal_trunc", oracle=TRUNC_ORACLE)
def temporal_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """floor_temporal at every calendar unit (RoundTemporalOptions)."""
    e = table(spark, sf_dir, "events").where(F.col("event_id") % 13 == 0)
    ts = F.col("ts")
    return e.select(
        "event_id",
        *[
            F.date_trunc(unit, ts).alias(f"t_{unit}")
            for unit in ("year", "quarter", "month", "week", "day", "hour", "minute")
        ],
    )


DIFF_ORACLE = """
SELECT
  l_orderkey, l_linenumber,
  datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))   AS days_wait,
  CAST(floor((epoch(l_shipdate) - epoch(o_orderdate)) / 3600) AS BIGINT) AS hours_between,
  CAST(floor((epoch(l_shipdate) - epoch(o_orderdate)) / 60) AS BIGINT)   AS minutes_between,
  CAST(epoch(l_shipdate) - epoch(o_orderdate) AS BIGINT)                 AS seconds_between,
  (year(l_shipdate) - year(o_orderdate)) * 12 + (month(l_shipdate) - month(o_orderdate)) AS months_delta,
  year(l_shipdate) - year(o_orderdate)                                   AS years_delta
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_orderkey % 30 = 0
"""


@query("temporal_between", oracle=DIFF_ORACLE)
def temporal_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """days/hours/minutes/seconds/months/years_between as epoch-exact
    elapsed units (Arrow's *_between semantics)."""
    l = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 30 == 0)
    o = table(spark, sf_dir, "orders")
    j = l.join(o, l.l_orderkey == o.o_orderkey)
    ship, order = F.col("l_shipdate"), F.col("o_orderdate")
    # NTZ → session-tz timestamp (UTC session ⇒ same wall time) → epoch
    esec = ship.cast("timestamp").cast("double") - order.cast("timestamp").cast("double")
    return j.select(
        "l_orderkey",
        "l_linenumber",
        F.datediff(ship.cast("date"), order.cast("date")).alias("days_wait"),
        F.floor(esec / 3600).alias("hours_between"),
        F.floor(esec / 60).alias("minutes_between"),
        esec.cast("long").alias("seconds_between"),
        ((F.year(ship) - F.year(order)) * 12 + (F.month(ship) - F.month(order))).alias(
            "months_delta"
        ),
        (F.year(ship) - F.year(order)).alias("years_delta"),
    )


FORMAT_ORACLE = """
SELECT
  event_id,
  strftime(ts, '%Y-%m-%d %H:%M:%S')                     AS fmt_full,
  strftime(ts, '%Y-%m')                                 AS fmt_ym,
  strptime(strftime(ts, '%Y-%m-%d'), '%Y-%m-%d')        AS reparsed,
  epoch_ms(ts) // 1000                                  AS epoch_s
FROM events WHERE event_id % 17 = 0
"""


@query("temporal_strftime_strptime", oracle=FORMAT_ORACLE)
def temporal_strftime_strptime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """strftime/strptime round-trip + epoch extraction."""
    e = table(spark, sf_dir, "events").where(F.col("event_id") % 17 == 0)
    ts = F.col("ts")
    ts_type = e.schema["ts"].dataType
    return e.select(
        "event_id",
        F.date_format(ts, "yyyy-MM-dd HH:mm:ss").alias("fmt_full"),
        F.date_format(ts, "yyyy-MM").alias("fmt_ym"),
        F.to_timestamp(F.date_format(ts, "yyyy-MM-dd"), "yyyy-MM-dd")
        .cast(ts_type)
        .alias("reparsed"),
        F.floor(ts.cast("double")).cast("long").alias("epoch_s"),
    )


TZ_ORACLE = """
SELECT
  event_id,
  CAST(floor(epoch(timezone('America/New_York', ts))) AS BIGINT) AS instant_if_ny,
  CAST(floor(epoch(ts)) AS BIGINT)                                AS instant_if_utc
FROM events WHERE event_id % 19 = 0
"""


@query("temporal_assume_timezone", oracle=TZ_ORACLE)
def temporal_assume_timezone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """assume_timezone: interpret a naive timestamp in a zone → instant.

    Output epoch seconds (zone-free) so engine tz-display conventions
    can't leak into the comparison.
    """
    e = table(spark, sf_dir, "events").where(F.col("event_id") % 19 == 0)
    ts = F.col("ts").cast("timestamp")
    return e.select(
        "event_id",
        F.floor(F.to_utc_timestamp(ts, "America/New_York").cast("double")).alias("instant_if_ny"),
        F.floor(ts.cast("double")).alias("instant_if_utc"),
    )
