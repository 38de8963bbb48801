"""Relational core: scan → filter → project → aggregate → sort/fetch,
pivot, set ops.  Mirrors Acero nodes `source/scan/filter/project/
aggregate/order_by/fetch/pivot_*` (reference: cpp/src/arrow/acero/
*_node.cc, SURVEY §2.1) and the scalar-aggregate kernel family
(reference: cpp/src/arrow/compute/kernels/aggregate_*.cc, SURVEY §2.2.1).

Float-valued aggregates are rounded identically in the Spark query and
the DuckDB oracle: double summation order differs between engines, so
exact-bit equality is only meaningful after rounding away the ~1e-10
relative accumulation error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arrow_spark.catalog import table
from arrow_spark.queries.base import query

# ---------------------------------------------------------------------------
# Q1 pricing summary — the flagship slice (scan, filter, project, hash-agg,
# sort). Arrow ref: acero/tpch_benchmark.cc Q1; scalar_aggregate_node.cc.
# ---------------------------------------------------------------------------

def _mean6(col: str):
    """Boundary-safe 6-decimal mean of 2-decimal-granular data:
    round(sum,2) reconstructs the exact decimal sum on both engines, so
    the quotient (and its floor-round) is bit-identical cross-engine."""
    return (
        F.floor((F.round(F.sum(col), 2) / F.count(col)) * 1e6 + F.lit(0.5)) / 1e6
    )


Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  round(sum(l_quantity), 2)                                          AS sum_qty,
  round(sum(l_extendedprice), 2)                                     AS sum_base_price,
  floor(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
            * (100 - CAST(round(l_discount * 100) AS BIGINT)))::DOUBLE
        / 1e4 * 100 + 0.5) / 100                                     AS sum_disc_price,
  floor(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
            * (100 - CAST(round(l_discount * 100) AS BIGINT))
            * (100 + CAST(round(l_tax * 100) AS BIGINT)))::DOUBLE
        / 1e6 * 100 + 0.5) / 100                                     AS sum_charge,
  floor((round(sum(l_quantity), 2) / count(l_quantity)) * 1e6 + 0.5) / 1e6           AS avg_qty,
  floor((round(sum(l_extendedprice), 2) / count(l_extendedprice)) * 1e6 + 0.5) / 1e6 AS avg_price,
  floor((round(sum(l_discount), 2) / count(l_discount)) * 1e6 + 0.5) / 1e6           AS avg_disc,
  count(*)                                                           AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@query("q1_pricing_summary", oracle=Q1_ORACLE)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: map-side partial agg + final agg, filter pushed to scan."""
    l = table(spark, sf_dir, "lineitem")
    # exact-decimal product sums: price/disc/tax are 2-decimal, so the
    # per-row products are exact integers in ten-thousandths/millionths
    # and the group sums are EXACT at any scale (decimal(38) operand —
    # long sums of the millionth-products would overflow ~1e8 rows).
    # Plain round(sum(double-product), 2) flips at .xx5 midpoints once
    # engine sum orders diverge — demonstrated live by q3 at sf0.1.
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_f = 100 - F.round(F.col("l_discount") * 100).cast("long")
    tax_f = 100 + F.round(F.col("l_tax") * 100).cast("long")
    dp_tt = (price_c * disc_f).cast("decimal(38,0)")
    ch_m = (price_c * disc_f * tax_f).cast("decimal(38,0)")
    return (
        l.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast(l.schema["l_shipdate"].dataType))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            (F.floor(F.sum(dp_tt).cast("double") / 1e4 * 100 + F.lit(0.5)) / 100).alias("sum_disc_price"),
            (F.floor(F.sum(ch_m).cast("double") / 1e6 * 100 + F.lit(0.5)) / 100).alias("sum_charge"),
            # Tie-safe mean: round(sum,2)/count is bit-identical across
            # engines (see windows.cumulative_ops for the rationale).
            _mean6("l_quantity").alias("avg_qty"),
            _mean6("l_extendedprice").alias("avg_price"),
            _mean6("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q6_ORACLE = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


@query("q6_forecast_revenue", oracle=Q6_ORACLE)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan+filter+scalar-agg — every predicate reaches
    the parquet scan, zero shuffle beyond the final reduce."""
    l = table(spark, sf_dir, "lineitem")
    ship = F.col("l_shipdate")
    ts_type = l.schema["l_shipdate"].dataType
    return (
        l.where(
            (ship >= F.lit("1996-01-01 00:00:00").cast(ts_type))
            & (ship < F.lit("1997-01-01 00:00:00").cast(ts_type))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


Q18_ORACLE = """
SELECT c_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, qty_sum
FROM (
  SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
         round(sum(l_quantity), 2) AS qty_sum
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  GROUP BY o_custkey, o_orderkey, o_totalprice
)
WHERE qty_sum > 150
"""


@query("q18_large_orders", oracle=Q18_ORACLE)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: join + group + HAVING on the aggregate."""
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
        )
        .agg(F.round(F.sum("l_quantity"), 2).alias("qty_sum"))
        .where(F.col("qty_sum") > 150)
        .select("c_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("totalprice"), "qty_sum")
    )


# ---------------------------------------------------------------------------
# Statistical aggregates: variance/stddev/skew/kurtosis.
# Arrow ref: aggregate_var_std.cc, SURVEY §2.2.1. Spark's skewness/kurtosis
# are population moments (g1, excess g2); the oracle spells those formulas
# out because DuckDB's builtins use the sample-adjusted variants.
# ---------------------------------------------------------------------------

AGG_STATS_ORACLE = """
WITH mu AS (
  SELECT l_returnflag, avg(l_quantity) AS m
  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY l_returnflag
)
SELECT
  l.l_returnflag,
  round(var_samp(l_quantity), 6)    AS var_qty,
  round(stddev_samp(l_quantity), 6) AS std_qty,
  round(var_pop(l_quantity), 6)     AS varpop_qty,
  round(avg(pow(l_quantity - mu.m, 3)) / pow(avg(pow(l_quantity - mu.m, 2)), 1.5), 6) AS skew_qty,
  round(avg(pow(l_quantity - mu.m, 4)) / pow(avg(pow(l_quantity - mu.m, 2)), 2) - 3, 6) AS kurt_qty
FROM lineitem l JOIN mu ON l.l_returnflag = mu.l_returnflag
WHERE l_quantity IS NOT NULL
GROUP BY l.l_returnflag
"""


@query("agg_stats", oracle=AGG_STATS_ORACLE)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """variance/stddev/skewness/kurtosis (population-moment semantics)."""
    l = table(spark, sf_dir, "lineitem").where(F.col("l_quantity").isNotNull())
    return l.groupBy("l_returnflag").agg(
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("std_qty"),
        F.round(F.var_pop("l_quantity"), 6).alias("varpop_qty"),
        F.round(F.skewness("l_quantity"), 6).alias("skew_qty"),
        F.round(F.kurtosis("l_quantity"), 6).alias("kurt_qty"),
    )


# ---------------------------------------------------------------------------
# Count family — Arrow CountOptions {ONLY_VALID, ONLY_NULL, ALL} and
# count_distinct / any / all (aggregate_basic.cc, api_aggregate.h:64).
# ---------------------------------------------------------------------------

AGG_COUNTS_ORACLE = """
SELECT
  o_orderpriority,
  count(*)                                   AS cnt_all,
  count(o_totalprice)                        AS cnt_valid,
  count(*) - count(o_totalprice)             AS cnt_null,
  count(DISTINCT o_orderstatus)              AS cnt_distinct_status,
  bool_or(o_totalprice > 100000)             AS any_big,
  bool_and(o_totalprice > 0)                 AS all_positive
FROM orders
GROUP BY o_orderpriority
"""


@query("agg_counts", oracle=AGG_COUNTS_ORACLE)
def agg_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count ALL / ONLY_VALID / ONLY_NULL, count_distinct, any, all."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt_all"),
        F.count("o_totalprice").alias("cnt_valid"),
        (F.count(F.lit(1)) - F.count("o_totalprice")).alias("cnt_null"),
        F.count_distinct("o_orderstatus").alias("cnt_distinct_status"),
        F.bool_or(F.col("o_totalprice") > 100000).alias("any_big"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
    )


# ---------------------------------------------------------------------------
# min/max/min_max + index-style argmin/argmax (aggregate_basic.cc `index`,
# `min_max`; deterministic via unique-key tiebreak on the *_by column).
# ---------------------------------------------------------------------------

AGG_MINMAX_ORACLE = """
SELECT
  c_mktsegment,
  round(min(c_acctbal), 2)  AS min_bal,
  round(max(c_acctbal), 2)  AS max_bal,
  min(c_custkey)            AS min_key,
  max(c_custkey)            AS max_key,
  arg_min(c_custkey, c_custkey) AS first_key,
  arg_min(c_acctbal, c_custkey) AS first_bal,
  arg_max(c_acctbal, c_custkey) AS last_bal
FROM customer
GROUP BY c_mktsegment
"""


@query("agg_minmax_firstlast", oracle=AGG_MINMAX_ORACLE)
def agg_minmax_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max/min_max + first/last under an explicit key order.

    Arrow's `first`/`last` are input-order dependent; a distributed engine
    needs an explicit order, so they are expressed as min_by/max_by on the
    unique c_custkey (same trick Arrow users need for chunked tables).
    """
    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        F.min("c_custkey").alias("min_key"),
        F.max("c_custkey").alias("max_key"),
        F.min("c_custkey").alias("first_key"),
        F.min_by("c_acctbal", "c_custkey").alias("first_bal"),
        F.max_by("c_acctbal", "c_custkey").alias("last_bal"),
    )


# ---------------------------------------------------------------------------
# product (aggregate_basic.cc `product`) — per-order group to keep the
# double product in range, then rounded.
# ---------------------------------------------------------------------------

AGG_PRODUCT_ORACLE = """
SELECT l_orderkey, round(product(1 + l_discount), 6) AS disc_factor
FROM lineitem
WHERE l_orderkey % 100 = 0 AND l_discount IS NOT NULL
GROUP BY l_orderkey
"""


@query("agg_product", oracle=AGG_PRODUCT_ORACLE)
def agg_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    """product aggregate over small per-order groups."""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.where((F.col("l_orderkey") % 100 == 0) & F.col("l_discount").isNotNull())
        .groupBy("l_orderkey")
        .agg(F.round(F.product(1 + F.col("l_discount")), 6).alias("disc_factor"))
    )


# ---------------------------------------------------------------------------
# Quantiles: quantile (linear interpolation) / median / tdigest analog.
# Arrow ref: aggregate_quantile.cc, aggregate_tdigest.cc.
# ---------------------------------------------------------------------------

AGG_QUANTILE_ORACLE = """
SELECT
  l_linestatus,
  round(quantile_cont(l_extendedprice, 0.5), 6)  AS p50,
  round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
  round(quantile_cont(l_extendedprice, 0.95), 6) AS p95,
  round(median(l_extendedprice), 6)              AS med
FROM lineitem
WHERE l_extendedprice IS NOT NULL
GROUP BY l_linestatus
"""


@query("agg_quantile", oracle=AGG_QUANTILE_ORACLE)
def agg_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """exact interpolated quantiles + median (Arrow QuantileOptions LINEAR)."""
    l = table(spark, sf_dir, "lineitem").where(F.col("l_extendedprice").isNotNull())
    return l.groupBy("l_linestatus").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.25)), 6).alias("p25"),
        F.round(F.percentile("l_extendedprice", F.lit(0.95)), 6).alias("p95"),
        F.round(F.median("l_extendedprice"), 6).alias("med"),
    )


# ---------------------------------------------------------------------------
# mode (aggregate_mode.cc) — deterministic variant: smallest value among the
# most frequent (Arrow ModeOptions returns values sorted by count desc then
# value asc; engines' bare mode() tie-breaks arbitrarily).
# ---------------------------------------------------------------------------

AGG_MODE_ORACLE = """
WITH counts AS (
  SELECT l_returnflag, l_quantity AS v, count(*) AS n
  FROM lineitem WHERE l_quantity IS NOT NULL
  GROUP BY l_returnflag, l_quantity
), ranked AS (
  SELECT l_returnflag, v, n,
         row_number() OVER (PARTITION BY l_returnflag ORDER BY n DESC, v ASC) AS rn
  FROM counts
)
SELECT l_returnflag, v AS mode_qty, n AS mode_count
FROM ranked WHERE rn = 1
"""


@query("agg_mode", oracle=AGG_MODE_ORACLE)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mode with Arrow's deterministic tie-break (count desc, value asc)."""
    from pyspark.sql import Window as W

    l = table(spark, sf_dir, "lineitem").where(F.col("l_quantity").isNotNull())
    counts = l.groupBy("l_returnflag", F.col("l_quantity").alias("v")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = W.partitionBy("l_returnflag").orderBy(F.col("n").desc(), F.col("v").asc())
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("l_returnflag", F.col("v").alias("mode_qty"), F.col("n").alias("mode_count"))
    )


# ---------------------------------------------------------------------------
# unique / value_counts (vector_hash.cc:791,807)
# ---------------------------------------------------------------------------

VALUE_COUNTS_ORACLE = """
SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
FROM orders GROUP BY o_orderstatus, o_orderpriority
"""


@query("value_counts", oracle=VALUE_COUNTS_ORACLE)
def value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """value_counts ≡ groupBy().count()."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus", "o_orderpriority").agg(F.count(F.lit(1)).alias("cnt"))


UNIQUE_ORACLE = "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer"


@query("unique_distinct", oracle=UNIQUE_ORACLE)
def unique_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unique ≡ distinct (hash-based, map-side partial dedup)."""
    return table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


# ---------------------------------------------------------------------------
# Set operations — Spark-native capabilities beyond Arrow (SURVEY §2.1
# 'missing relational ops'); included for engine completeness.
# ---------------------------------------------------------------------------

SET_OPS_ORACLE = """
SELECT c_custkey FROM customer WHERE c_acctbal > 0
INTERSECT
SELECT o_custkey AS c_custkey FROM orders
"""


@query("set_intersect", oracle=SET_OPS_ORACLE)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) of two key sets."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    pos = c.where(F.col("c_acctbal") > 0).select("c_custkey")
    with_orders = o.select(F.col("o_custkey").alias("c_custkey"))
    return pos.intersect(with_orders)


SET_EXCEPT_ORACLE = """
SELECT c_custkey FROM customer
EXCEPT
SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 150000
"""


@query("set_except", oracle=SET_EXCEPT_ORACLE)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customers without any big-ticket order."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 150000)
    return c.select("c_custkey").subtract(o.select(F.col("o_custkey").alias("c_custkey")))


UNION_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
UNION ALL
SELECT s_nationkey AS nationkey FROM supplier
"""


@query("union_all", oracle=UNION_ORACLE)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acero `union` node: bag union, no dedup (union_node.cc:129)."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s)


# ---------------------------------------------------------------------------
# order_by + fetch (order_by_node.cc, fetch_node.cc:216): multi-key sort,
# null placement, offset+limit. Deterministic via unique-key tiebreak.
# ---------------------------------------------------------------------------

SORT_FETCH_ORACLE = """
SELECT c_custkey, c_acctbal, c_mktsegment
FROM customer
ORDER BY c_acctbal DESC NULLS LAST, c_custkey ASC
LIMIT 25 OFFSET 10
"""


@query("sort_fetch", oracle=SORT_FETCH_ORACLE)
def sort_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """total sort (nulls-last) then offset+limit fetch."""
    c = table(spark, sf_dir, "customer")
    return (
        c.select("c_custkey", "c_acctbal", "c_mktsegment")
        .orderBy(F.col("c_acctbal").desc_nulls_last(), F.col("c_custkey").asc())
        .offset(10)
        .limit(25)
    )


TOPK_ORACLE = """
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice IS NOT NULL
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 15
"""


@query("select_k", oracle=TOPK_ORACLE)
def select_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """select_k_unstable ≡ ORDER BY ... LIMIT k.

    Catalyst plans TakeOrderedAndProject: per-partition top-k heaps then a
    driver merge — no full shuffle/sort, same as Arrow's select_k kernel
    (vector_select_k.cc) but distributed.
    """
    o = table(spark, sf_dir, "orders").where(F.col("o_totalprice").isNotNull())
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(15)
    )


# ---------------------------------------------------------------------------
# pivot_wider (aggregate_pivot.cc / hash_aggregate_pivot.cc) and
# pivot_longer (pivot_longer_node.cc:278)
# ---------------------------------------------------------------------------

PIVOT_WIDER_ORACLE = """
SELECT
  l_returnflag,
  round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS "O",
  round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS "F"
FROM lineitem
GROUP BY l_returnflag
"""


@query("pivot_wider", oracle=PIVOT_WIDER_ORACLE)
def pivot_wider(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hash_pivot_wider: long→wide with fixed key list (no scan for keys)."""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )


PIVOT_LONGER_ORACLE = """
SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
UNION ALL
SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM part
"""


@query("pivot_longer", oracle=PIVOT_LONGER_ORACLE)
def pivot_longer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pivot_longer (unpivot/melt); null cells kept, matching Arrow."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey", F.col("p_size").cast("double").alias("p_size"), "p_retailprice"
    ).unpivot("p_partkey", ["p_size", "p_retailprice"], "metric", "value")


# ---------------------------------------------------------------------------
# cube / rollup — Spark-native grouping-set capability (SURVEY §2.1 notes
# Arrow lacks these; included as engine extensions).
# ---------------------------------------------------------------------------

CUBE_ORACLE = """
SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@query("cube_agg", oracle=CUBE_ORACLE)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets over two keys."""
    l = table(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty")
    )


SEGMENT_AGG_ORACLE = """
SELECT event_type, user_id,
       count(*) AS n,
       round(sum(value), 2) AS sum_value,
       max(value) AS max_value
FROM events
GROUP BY 1, 2
"""


@query("segment_agg", oracle=SEGMENT_AGG_ORACLE)
def segment_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """segment-key aggregation (Acero options.h:304-313 SegmentedAggregate):
    events partitioned on the segment key (event_type), then grouped by
    (segment, user_id) — the aggregate adds NO Exchange beyond the segment
    partitioning (plan-pinned in test_plans.py); the oracle is the plain
    groupBy twin, proving result equivalence."""
    from arrow_spark.operators.segmented import segmented_aggregate

    return segmented_aggregate(
        table(spark, sf_dir, "events"),
        ["event_type"],
        ["user_id"],
        [
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.max("value").alias("max_value"),
        ],
    )
