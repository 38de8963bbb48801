"""TPC-H classics beyond Q1/Q3/Q5/Q6/Q18 (those live in relational.py /
joins.py).  The reference ships a decimal-accurate TPC-H generator +
benchmark harness (cpp/src/arrow/acero/tpch_node.cc, tpch_benchmark.cc);
these queries exercise the same relational surface — semi/anti joins from
(NOT) EXISTS decorrelation, correlated scalar subqueries, disjunctive
join predicates, left-outer + double aggregation — as full plans.

Schema adaptations (driver testdata has no partsupp table and no
commitdate/receiptdate/shipmode/phone/container columns):
- "late" lineitems (Q4/Q21) use ``l_shipdate > o_orderdate + N days``
  instead of receipt-vs-commit.
- Q12's shipmode classes become shipping-delay buckets.
- Q13's comment filter becomes an order-priority filter.
- Q17/Q19 drop the container predicate; brand/size/quantity remain.
- Q22's country code is the nation key; the "no recent orders" anti
  predicate is date-bounded because every synthetic customer has orders.

Float determinism (see relational.py docstring): sums of 2-decimal
columns use round(sum,2) (exact reconstruction); sums of 4-decimal
volume products use round(sum,4) + floor(x*100+0.5)/100 (see _sum2x);
ratios divide two already-exact sums then apply floor(x*1e6+0.5)/1e6 —
all bit-deterministic given bit-identical inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arrow_spark.catalog import table
from arrow_spark.queries.base import query


def _ts(df: DataFrame, col: str, lit: str):
    return F.lit(lit).cast(df.schema[col].dataType)


def _floor6(col):
    return F.floor(col * 1e6 + F.lit(0.5)) / 1e6


def _sum2x(col):
    """Tie-safe 2-decimal rounding of a sum of 4-decimal-granular values
    (price × (1−disc)): round(sum,4) reconstructs the exact decimal sum
    bit-identically on both engines, then floor(x*100+0.5)/100 is
    deterministic on that identical double (plain round(sum,2) flips at
    .xx5 dyadic midpoints — seen live on q10 at sf0.01)."""
    return F.floor(F.round(F.sum(col), 4) * 100 + F.lit(0.5)) / 100


# ---------------------------------------------------------------------------
# Q4 — order priority checking: EXISTS → left-semi join with a residual
# non-equi condition (Catalyst decorrelates to exactly this plan shape).
# ---------------------------------------------------------------------------

Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
"""


@query("q4_order_priority", oracle=Q4_ORACLE)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: date-windowed orders having a late lineitem (semi join).

    Scale: the semi join shuffles on orderkey only; the date filter is
    pushed to the orders scan so the build side is one quarter of data.
    """
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    o = o.where(
        (F.col("o_orderdate") >= _ts(o, "o_orderdate", "1996-07-01 00:00:00"))
        & (F.col("o_orderdate") < _ts(o, "o_orderdate", "1996-10-01 00:00:00"))
    )
    cond = (l.l_orderkey == o.o_orderkey) & (
        l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 90 DAYS")
    )
    return (
        o.join(l, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations; nation joined twice under
# column-renaming aliases (no ambiguous lineage).
# ---------------------------------------------------------------------------

Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year, floor(round(sum(volume), 4) * 100 + 0.5) / 100 AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_7')
      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_2'))
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@query("q7_volume_shipping", oracle=Q7_ORACLE)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: two-nation trade volume by year.

    Scale: nation (25 rows) broadcasts twice; the symmetric nation-pair
    disjunction is a residual on broadcast joins, so only
    lineitem⋈orders shuffles.
    """
    n = table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    l = l.where(
        (F.col("l_shipdate") >= _ts(l, "l_shipdate", "1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts(l, "l_shipdate", "1998-01-01 00:00:00"))
    )
    pair = (
        ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_7"))
        | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_2"))
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(_sum2x(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q8 — national market share: conditional-sum ratio per year.
# ---------------------------------------------------------------------------

Q8_ORACLE = """
SELECT o_year,
  floor((round(sum(CASE WHEN nation = 'NATION_7' THEN volume ELSE 0 END), 4)
        / round(sum(volume), 4)) * 1e6 + 0.5) / 1e6 AS mkt_share
FROM (
  SELECT year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
) all_nations
GROUP BY o_year
"""


@query("q8_market_share", oracle=Q8_ORACLE)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_7 supplier share of ECONOMY-part volume sold to
    ASIA customers, per order year.

    Scale: 5 of 6 dims broadcast; the part filter prunes the fact join
    via runtime bloom pushdown before the single lineitem⋈orders shuffle.
    """
    p = table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation"))
    o = o.where(
        (F.col("o_orderdate") >= _ts(o, "o_orderdate", "1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts(o, "o_orderdate", "1998-01-01 00:00:00"))
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
    )
    num = F.round(F.sum(F.when(F.col("nation") == "NATION_7", volume).otherwise(0.0)), 4)
    den = F.round(F.sum(volume), 4)
    return joined.groupBy(F.year("o_orderdate").cast("long").alias("o_year")).agg(
        _floor6(num / den).alias("mkt_share")
    )


# ---------------------------------------------------------------------------
# Q10 — returned-item reporting: top-20 customers by returned revenue.
# ---------------------------------------------------------------------------

Q10_ORACLE = """
SELECT c_custkey, c_name,
       floor(round(sum(l_extendedprice * (1 - l_discount)), 4) * 100 + 0.5) / 100 AS revenue,
       round(c_acctbal, 2) AS acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@query("q10_returned_items", oracle=Q10_ORACLE)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: quarter of orders, returned lines only, top 20 by lost
    revenue (rounded-revenue then custkey tiebreak keeps the LIMIT
    deterministic cross-engine).

    Scale: TakeOrderedAndProject caps driver transfer at 20 rows; only
    the fact join and the customer-grouped agg shuffle.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    o = o.where(
        (F.col("o_orderdate") >= _ts(o, "o_orderdate", "1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts(o, "o_orderdate", "1996-04-01 00:00:00"))
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_sum2x(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select(
            "c_custkey", "c_name", "revenue", F.round("c_acctbal", 2).alias("acctbal"), "n_name"
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q12 — shipping delay buckets (shipmode analog) × order priority.
# ---------------------------------------------------------------------------

Q12_ORACLE = """
SELECT ship_bucket,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
    AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT)
    AS low_line_count
FROM (
  SELECT o_orderpriority,
         CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 365
                THEN 'SLOW'
              WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 90
                THEN 'MEDIUM'
              ELSE 'FAST' END AS ship_bucket
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
) t
GROUP BY ship_bucket
"""


@query("q12_shipping_modes", oracle=Q12_ORACLE)
def q12_shipping_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + CASE classification + conditional counts."""
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    l = l.where(
        (F.col("l_shipdate") >= _ts(l, "l_shipdate", "1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts(l, "l_shipdate", "1997-01-01 00:00:00"))
    )
    delay = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    bucket = (
        F.when(delay > 365, "SLOW").when(delay > 90, "MEDIUM").otherwise("FAST")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution: conditional left outer join
# feeding a second aggregation.
# ---------------------------------------------------------------------------

Q13_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""


@query("q13_customer_distribution", oracle=Q13_ORACLE)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: LEFT OUTER with an ON-clause filter (zero-order
    customers survive with count 0), then a histogram of the counts.

    Scale: first agg shuffles on custkey; the second input is one row
    per customer and the histogram fan-in is tiny.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "4-NOT SPECIFIED")
    per_cust = (
        c.join(o, cond, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# Q14 — promotion effect: percentage ratio of conditional revenue.
# ---------------------------------------------------------------------------

Q14_ORACLE = """
SELECT floor(((100.0 * round(sum(CASE WHEN p_type = 'PROMO'
                                      THEN l_extendedprice * (1 - l_discount)
                                      ELSE 0 END), 4))
       / round(sum(l_extendedprice * (1 - l_discount)), 4)) * 1e6 + 0.5) / 1e6
  AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
"""


@query("q14_promo_effect", oracle=Q14_ORACLE)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: PROMO revenue share for one month (part broadcasts)."""
    p = table(spark, sf_dir, "part")
    l = table(spark, sf_dir, "lineitem")
    l = l.where(
        (F.col("l_shipdate") >= _ts(l, "l_shipdate", "1996-09-01 00:00:00"))
        & (F.col("l_shipdate") < _ts(l, "l_shipdate", "1996-10-01 00:00:00"))
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.round(F.sum(F.when(F.col("p_type") == "PROMO", volume).otherwise(0.0)), 4)
    total = F.round(F.sum(volume), 4)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(_floor6((F.lit(100.0) * promo) / total).alias("promo_revenue"))
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier: scalar-max subquery against a derived revenue view.
# ---------------------------------------------------------------------------

Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         floor(round(sum(l_extendedprice * (1 - l_discount)), 4) * 100 + 0.5) / 100 AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


@query("q15_top_supplier", oracle=Q15_ORACLE)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) hitting the max quarterly revenue.

    The max is compared on already-rounded revenue so the equality is
    cross-engine exact. Scale: the revenue frame is one row per supplier;
    its scalar max broadcasts back (1-row join), no second shuffle.
    """
    s = table(spark, sf_dir, "supplier")
    l = table(spark, sf_dir, "lineitem")
    l = l.where(
        (F.col("l_shipdate") >= _ts(l, "l_shipdate", "1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts(l, "l_shipdate", "1996-04-01 00:00:00"))
    )
    revenue = (
        l.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(_sum2x(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue"))
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue: correlated avg-quantity subquery.
# ---------------------------------------------------------------------------

Q17_ORACLE = """
SELECT floor(((round(sum(l_extendedprice), 2)) / 7.0) * 1e6 + 0.5) / 1e6 AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN (SELECT l_partkey AS a_partkey,
             round(sum(l_quantity), 2) / count(l_quantity) AS avg_qty
      FROM lineitem GROUP BY l_partkey) a
  ON a_partkey = l_partkey
WHERE p_brand = 'Brand#23' AND l_quantity < 0.2 * avg_qty
"""


@query("q17_small_qty_revenue", oracle=Q17_ORACLE)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: lines below 20% of their part's average quantity.

    The per-part average uses the exact round(sum,2)/count quotient so
    the `<` comparison cannot flip between engines. Scale: the average
    is computed only for the brand's parts (semi-filter first), then
    joined back — both joins broadcast the small side.
    """
    p = table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    l = table(spark, sf_dir, "lineitem")
    brand_lines = l.join(
        F.broadcast(p.select("p_partkey")), l.l_partkey == F.col("p_partkey"), "left_semi"
    )
    avg_q = brand_lines.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.round(F.sum("l_quantity"), 2) / F.count("l_quantity")).alias("avg_qty")
    )
    return (
        brand_lines.join(F.broadcast(avg_q), F.col("l_partkey") == F.col("a_partkey"))
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(_floor6(F.round(F.sum("l_extendedprice"), 2) / 7.0).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# Q19 — discounted revenue: OR-of-ANDs residual over a part equi-join.
# ---------------------------------------------------------------------------

Q19_ORACLE = """
SELECT floor(round(sum(l_extendedprice * (1 - l_discount)), 4) * 100 + 0.5) / 100 AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#17' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


@query("q19_discounted_revenue", oracle=Q19_ORACLE)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunctive brand/size/quantity predicate as a residual
    on the part equi-join (Arrow's residual-filter join,
    hash_join_node.cc options.h:678).

    Scale: part broadcasts; Catalyst extracts the common l_quantity
    bounds [1,30] as a pushable conjunct below the join.
    """
    p = table(spark, sf_dir, "part")
    l = table(spark, sf_dir, "lineitem")
    clause = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#17") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .where(clause)
        .agg(_sum2x(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting. Oracle keeps the classic
# EXISTS / NOT EXISTS formulation; the Spark plan uses the equivalent
# per-order supplier-set aggregation (one shuffle instead of two
# semi/anti joins) — a deliberately different formulation, so the oracle
# match also cross-checks the rewrite.
# ---------------------------------------------------------------------------

Q21_ORACLE = """
WITH flagged AS (
  SELECT l_orderkey, l_suppkey,
         (l_shipdate > o_orderdate + INTERVAL 365 DAY) AS late,
         o_orderstatus
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
)
SELECT s_name, count(*) AS numwait
FROM flagged l1 JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE l1.late AND l1.o_orderstatus = 'F'
  AND EXISTS (SELECT 1 FROM flagged l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM flagged l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 25
"""


@query("q21_waiting_suppliers", oracle=Q21_ORACLE)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: sole-late supplier per multi-supplier order.

    EXISTS(other supplier) ≡ distinct suppliers ≥ 2; NOT EXISTS(other
    late supplier) ≡ distinct *late* suppliers == 1 given the candidate
    row itself is late. One orderkey-grouped agg replaces both
    correlated subqueries — shuffles: flag join + order agg + final
    s_name agg, all on bounded keys.
    """
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    flagged = l.join(o, l.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 365 DAYS")).alias("late"),
        "o_orderstatus",
    )
    # two-level agg instead of two count_distincts: a multi-distinct agg
    # plans an Expand (row doubling before the shuffle); collapsing to
    # (order, supplier) grain first costs one extra but narrower shuffle
    # and no expansion — measured 5.3s → 1.9s at sf0.1
    per_supp = flagged.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("late").alias("supp_late")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum(F.when(F.col("supp_late"), 1).otherwise(0)).alias("n_late_supp"),
    )
    candidates = (
        flagged.where(F.col("late") & (F.col("o_orderstatus") == "F"))
        .join(per_order, "l_orderkey")
        .where((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    )
    return (
        candidates.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Q22 — global sales opportunity: scalar-avg subquery + anti join.
# ---------------------------------------------------------------------------

Q22_ORACLE = """
WITH pool AS (
  SELECT c_custkey, c_nationkey, c_acctbal FROM customer
  WHERE c_nationkey BETWEEN 1 AND 7
), thresh AS (
  SELECT floor((round(sum(c_acctbal), 2) / count(c_acctbal)) * 1e6 + 0.5) / 1e6 AS avg_bal
  FROM pool WHERE c_acctbal > 0.0
)
SELECT c_nationkey AS cntrycode, count(*) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM pool, thresh
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
GROUP BY c_nationkey
"""


@query("q22_sales_opportunity", oracle=Q22_ORACLE)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: rich customers (above the pool's positive-balance
    average, exact-quotient threshold) with no recent orders, by nation.

    Scale: the 1-row threshold broadcasts; the anti join shuffles only
    the date-filtered order keys.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    pool = c.where(F.col("c_nationkey").between(1, 7)).select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    thresh = (
        pool.where(F.col("c_acctbal") > 0.0)
        .agg(_floor6(F.round(F.sum("c_acctbal"), 2) / F.count("c_acctbal")).alias("avg_bal"))
    )
    recent = o.where(
        F.col("o_orderdate") >= _ts(o, "o_orderdate", "1999-01-01 00:00:00")
    ).select("o_custkey")
    return (
        pool.join(F.broadcast(thresh))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, pool.c_custkey == recent.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )
