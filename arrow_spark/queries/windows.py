"""Ordered / windowed operators: rank family, cumulative ops, fill
forward/backward, pairwise diff, range-frame aggregation.

Arrow refs: vector_rank.cc (rank, RankOptions tiebreakers),
vector_cumulative_ops.cc (cumulative_{sum,prod,min,max,mean}),
vector_replace.cc (fill_null_forward/backward), vector_pairwise.cc
(pairwise_diff), vector_select_k.cc.

Arrow arrays are implicitly ordered; a distributed DataFrame is not, so
every ordered op here takes an explicit (partition, order) spec — the
`events` fixture orders by (user_id, event_id). Window partitioning keys
keep this shuffle-parallel at 100 TB (no global single-partition window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from arrow_spark.catalog import table
from arrow_spark.queries.base import query

RANK_ORACLE = """
SELECT
  l_orderkey, l_linenumber,
  rank()         OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rnk,
  dense_rank()   OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS drnk,
  round(percent_rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity), 6) AS prnk,
  round(cume_dist()    OVER (PARTITION BY l_returnflag ORDER BY l_quantity), 6) AS cdist
FROM lineitem
WHERE l_orderkey % 20 = 0
"""


@query("window_rank", oracle=RANK_ORACLE)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / percent_rank / cume_dist (RankOptions family).

    Ties share rank values, so the result is deterministic even though
    the tie order is not.
    """
    l = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 20 == 0)
    w = W.partitionBy("l_returnflag").orderBy("l_quantity")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


ROWNUM_ORACLE = """
SELECT c_mktsegment, c_custkey, c_acctbal
FROM (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
  FROM customer
) WHERE rn <= 3
"""


@query("window_top_n_per_group", oracle=ROWNUM_ORACLE)
def window_top_n_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number top-N per group (select_k per partition)."""
    c = table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return (
        c.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("c_mktsegment", "c_custkey", "c_acctbal")
    )


CUMULATIVE_ORACLE = """
SELECT
  user_id, event_id,
  round(sum(value) OVER w, 6)                      AS cum_sum,
  min(value)       OVER w                          AS cum_min,
  max(value)       OVER w                          AS cum_max,
  floor((round(sum(value) OVER w, 2) / (count(value) OVER w)) * 1e6 + 0.5) / 1e6 AS cum_mean
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@query("cumulative_ops", oracle=CUMULATIVE_ORACLE)
def cumulative_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cumulative_sum/min/max/mean under explicit (user_id, event_id) order."""
    e = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 6).alias("cum_sum"),
        F.min("value").over(w).alias("cum_min"),
        F.max("value").over(w).alias("cum_max"),
        # Mean of 2-decimal data lands exactly on 1e-6 rounding boundaries
        # where engines' summation-order noise flips the rounded digit.
        # round(sum,2) first reconstructs the exact decimal sum on both
        # engines (error ≪ 0.005), so mean = round(sum,2)/n is bit-identical
        # on both sides and the final floor-round cannot disagree.
        (
            F.floor(
                (F.round(F.sum("value").over(w), 2) / F.count("value").over(w)) * 1e6
                + F.lit(0.5)
            )
            / 1e6
        ).alias("cum_mean"),
    )


FILL_ORACLE = """
SELECT
  user_id, event_id,
  last_value(nullable_v IGNORE NULLS) OVER
    (PARTITION BY user_id ORDER BY event_id
     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill,
  first_value(nullable_v IGNORE NULLS) OVER
    (PARTITION BY user_id ORDER BY event_id
     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS bfill
FROM (
  SELECT user_id, event_id,
         CASE WHEN event_type = 'error' THEN NULL ELSE value END AS nullable_v
  FROM events
)
"""


@query("fill_null_forward_backward", oracle=FILL_ORACLE)
def fill_null_forward_backward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fill_null_forward / fill_null_backward (vector_replace.cc) as
    ignore-nulls last/first over directional frames."""
    e = table(spark, sf_dir, "events").withColumn(
        "nullable_v", F.when(F.col("event_type") == "error", None).otherwise(F.col("value"))
    )
    fwd = (
        W.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    bwd = (
        W.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    return e.select(
        "user_id",
        "event_id",
        F.last("nullable_v", ignorenulls=True).over(fwd).alias("ffill"),
        F.first("nullable_v", ignorenulls=True).over(bwd).alias("bfill"),
    )


PAIRWISE_ORACLE = """
SELECT
  user_id, event_id,
  round(value - lag(value) OVER (PARTITION BY user_id ORDER BY event_id), 6) AS diff,
  lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS next_type
FROM events
"""


@query("pairwise_diff", oracle=PAIRWISE_ORACLE)
def pairwise_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pairwise_diff (vector_pairwise.cc) ≡ x - lag(x); plus lead."""
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("event_id")
    return e.select(
        "user_id",
        "event_id",
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("diff"),
        F.lead("event_type").over(w).alias("next_type"),
    )


RANGE_FRAME_ORACLE = """
SELECT
  user_id, event_id,
  round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch(ts)
        RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 6) AS sum_1h
FROM events
"""


@query("window_range_frame", oracle=RANGE_FRAME_ORACLE)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """value-range frame: trailing 1h sum per user (time-series rollup)."""
    e = table(spark, sf_dir, "events").withColumn(
        "ts_sec", F.col("ts").cast("double")
    )
    w = W.partitionBy("user_id").orderBy("ts_sec").rangeBetween(-3600, 0)
    return e.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 6).alias("sum_1h"),
    )


VALUE_FNS_ORACLE = """
SELECT user_id, event_id,
  round(first_value(value) OVER w, 2)  AS first_v,
  round(last_value(value) OVER wf, 2)  AS last_v,
  round(nth_value(value, 3) OVER wf, 2) AS third_v,
  round(lead(value, 2) OVER w, 2)      AS lead2,
  round(lag(value, 2, -1.0) OVER w, 2) AS lag2_def
FROM events
WINDOW
  w  AS (PARTITION BY user_id ORDER BY event_id),
  wf AS (PARTITION BY user_id ORDER BY event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


@query("window_value_functions", oracle=VALUE_FNS_ORACLE)
def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value + lead/lag with offsets and defaults —
    the positional window family (SURVEY §2.2.8; Arrow reaches these
    only via sort + take kernels)."""
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("event_id")
    wf = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return e.select(
        "user_id",
        "event_id",
        F.round(F.first("value").over(w), 2).alias("first_v"),
        F.round(F.last("value").over(wf), 2).alias("last_v"),
        F.round(F.nth_value("value", 3).over(wf), 2).alias("third_v"),
        F.round(F.lead("value", 2).over(w), 2).alias("lead2"),
        F.round(F.lag("value", 2, -1.0).over(w), 2).alias("lag2_def"),
    )
