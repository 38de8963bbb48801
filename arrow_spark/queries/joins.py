"""Hash-join coverage: all 8 Arrow join types, null-safe key compare,
residual (theta) filter, and multi-table star joins.

Arrow ref: acero/hash_join_node.cc (JoinType options.h:548-557,
JoinKeyCmp::IS options.h:561, residual filter options.h:678-681).
Spark-first: Catalyst picks broadcast/shuffled-hash/sort-merge; small
dims broadcast automatically under the session's 64MB threshold, and the
runtime bloom-filter rule reproduces Arrow's bloom pushdown
(hash_join_node.cc:498-520) without custom code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arrow_spark.catalog import table
from arrow_spark.queries.base import query

# -- inner ------------------------------------------------------------------

JOIN_INNER_ORACLE = """
SELECT o_orderkey, c_custkey, c_mktsegment, o_totalprice
FROM orders JOIN customer ON o_custkey = c_custkey
"""


@query("join_inner", oracle=JOIN_INNER_ORACLE)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INNER equi-join; customer side broadcast by Catalyst."""
    o, c = table(spark, sf_dir, "orders"), table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_custkey", "c_mktsegment", "o_totalprice"
    )


# -- left / right / full outer ---------------------------------------------

JOIN_LEFT_ORACLE = """
SELECT c_custkey, c_name, o_orderkey, o_totalprice
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
"""


@query("join_left_outer", oracle=JOIN_LEFT_ORACLE)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join keeps unmatched build-side rows."""
    o, c = table(spark, sf_dir, "orders"), table(spark, sf_dir, "customer")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


JOIN_RIGHT_ORACLE = """
SELECT o_orderkey, c_custkey, c_acctbal
FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
"""


@query("join_right_outer", oracle=JOIN_RIGHT_ORACLE)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join."""
    o, c = table(spark, sf_dir, "orders"), table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "o_orderkey", "c_custkey", "c_acctbal"
    )


JOIN_FULL_ORACLE = """
SELECT c_custkey, o_orderkey
FROM customer FULL OUTER JOIN orders ON c_custkey = o_custkey
"""


@query("join_full_outer", oracle=JOIN_FULL_ORACLE)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join keeps unmatched rows from both sides."""
    o, c = table(spark, sf_dir, "orders"), table(spark, sf_dir, "customer")
    return c.join(o, c.c_custkey == o.o_custkey, "full").select("c_custkey", "o_orderkey")


# -- semi / anti (both sides, = Arrow LEFT/RIGHT SEMI/ANTI) -----------------

JOIN_LEFT_SEMI_ORACLE = """
SELECT c_custkey, c_mktsegment FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


@query("join_left_semi", oracle=JOIN_LEFT_SEMI_ORACLE)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI: left rows with ≥1 match, left columns only."""
    o, c = table(spark, sf_dir, "orders"), table(spark, sf_dir, "customer")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


JOIN_RIGHT_SEMI_ORACLE = """
SELECT o_orderkey, o_orderstatus FROM orders o
WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
"""


@query("join_right_semi", oracle=JOIN_RIGHT_SEMI_ORACLE)
def join_right_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow RIGHT SEMI ≡ Spark left_semi with sides swapped."""
    o, c = table(spark, sf_dir, "orders"), table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "left_semi").select(
        "o_orderkey", "o_orderstatus"
    )


JOIN_LEFT_ANTI_ORACLE = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


@query("join_left_anti", oracle=JOIN_LEFT_ANTI_ORACLE)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI: left rows with no match."""
    o, c = table(spark, sf_dir, "orders"), table(spark, sf_dir, "customer")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


JOIN_RIGHT_ANTI_ORACLE = """
SELECT p_partkey, p_brand FROM part p
WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
"""


@query("join_right_anti", oracle=JOIN_RIGHT_ANTI_ORACLE)
def join_right_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow RIGHT ANTI ≡ Spark left_anti with sides swapped."""
    l, p = table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "part")
    return p.join(l, p.p_partkey == l.l_partkey, "left_anti").select("p_partkey", "p_brand")


# -- null-safe key compare (JoinKeyCmp::IS ⇒ eqNullSafe) --------------------

JOIN_NULLSAFE_ORACLE = """
SELECT c_custkey, s_suppkey
FROM customer JOIN supplier ON c_nationkey IS NOT DISTINCT FROM s_nationkey
"""


@query("join_nullsafe", oracle=JOIN_NULLSAFE_ORACLE)
def join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """null-safe equi key (Arrow JoinKeyCmp::IS): NULL keys match NULL."""
    c, s = table(spark, sf_dir, "customer"), table(spark, sf_dir, "supplier")
    return c.join(s, c.c_nationkey.eqNullSafe(s.s_nationkey)).select(
        "c_custkey", "s_suppkey"
    )


# -- residual (theta) filter on an equi-join --------------------------------

JOIN_RESIDUAL_ORACLE = """
SELECT l_orderkey, l_linenumber, p_partkey,
       round(l_extendedprice - p_retailprice, 2) AS price_delta
FROM lineitem JOIN part
  ON l_partkey = p_partkey AND l_extendedprice > 2 * p_retailprice
"""


@query("join_residual_filter", oracle=JOIN_RESIDUAL_ORACLE)
def join_residual_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """equi-join + residual theta condition (options.h:678-681)."""
    l, p = table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "part")
    cond = (l.l_partkey == p.p_partkey) & (l.l_extendedprice > 2 * p.p_retailprice)
    return l.join(p, cond, "inner").select(
        "l_orderkey",
        "l_linenumber",
        "p_partkey",
        F.round(l.l_extendedprice - p.p_retailprice, 2).alias("price_delta"),
    )


# -- multi-table star joins (TPC-H Q3 / Q5 shapes) --------------------------

Q3_ORACLE = """
SELECT
  l_orderkey,
  floor(round(sum(l_extendedprice * (1 - l_discount)), 4) * 100 + 0.5) / 100 AS revenue,
  CAST(o_orderdate AS DATE) AS orderdate,
  o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
"""


@query("q3_shipping_priority", oracle=Q3_ORACLE)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: filtered 3-way join + agg; dims broadcast."""
    c = table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    o = o.where(F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast(o.schema["o_orderdate"].dataType))
    l = l.where(F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast(l.schema["l_shipdate"].dataType))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(
            # tie-safe 2-decimal rounding (see tpch._sum2x): plain
            # round(sum, 2) flips at .xx5 midpoints — q3 hit one at sf0.1
            (F.floor(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4) * 100 + F.lit(0.5)) / 100).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
    )


Q5_ORACLE = """
SELECT n_name,
       floor(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100) AS BIGINT)))::DOUBLE
             / 1e4 * 100 + 0.5) / 100 AS revenue
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


@query("q5_local_supplier", oracle=Q5_ORACLE)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table star join, small dims broadcast.

    At 100 TB only lineitem×orders shuffles; region/nation/customer/
    supplier stay broadcast. The s_nationkey = c_nationkey condition is
    the residual equi pair joining the two arms.
    """
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(
            F.broadcast(s),
            (s.s_suppkey == l.l_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .groupBy("n_name")
        .agg(
            # exact ten-thousandth integer sum (decimal(38) operand),
            # then one deterministic division + floor-snap — immune to
            # the .xx5 midpoint flip q3 hit at sf0.1
            (
                F.floor(
                    F.sum(
                        (
                            F.round(F.col("l_extendedprice") * 100).cast("long")
                            * (100 - F.round(F.col("l_discount") * 100).cast("long"))
                        ).cast("decimal(38,0)")
                    ).cast("double")
                    / 1e4
                    * 100
                    + F.lit(0.5)
                )
                / 100
            ).alias("revenue")
        )
    )
