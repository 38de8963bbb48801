"""TPC-H Q2/Q9/Q11/Q16/Q20 — the partsupp-dependent five, closing the
suite at 22/22. partsupp comes from the deterministic dbgen-equivalent
generator (arrow_spark.sources.tpchgen; reference analog
cpp/src/arrow/acero/tpch_node.cc): Spark generates it relationally and
every oracle regenerates the identical rows in DuckDB via PS_CTE, so
the hash match checks the generator AND the query cross-engine.

Schema adaptations (fixture has no p_mfgr/p_container/s_address/s_phone/
comment columns): Q2 outputs p_brand for p_mfgr and drops address/phone/
comment; Q16's supplier-complaints comment filter becomes a negative
account balance; Q20 outputs s_suppkey for s_address; name/type/brand
predicates use the fixture vocabularies.

Float determinism follows tpch.py: 2-decimal-granular sums use
round(sum,2); 4-decimal (price×(1−disc)) sums use _sum2x; Q11's HAVING
compares round(sum,2)*10000 > round(total,2) so both engines compare
bit-identical doubles (see module docstring there).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arrow_spark.catalog import table
from arrow_spark.queries.base import query
from arrow_spark.queries.tpch import _sum2x, _ts
from arrow_spark.sources.tpchgen import PS_CTE, partsupp


@query("tpch_partsupp_gen", oracle=PS_CTE + "SELECT * FROM partsupp")
def tpch_partsupp_gen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """the dbgen-equivalent partsupp generator itself: Spark's generated
    rows must hash-match DuckDB regenerating the table from the same
    integer formulas — cross-engine generator equality, row by row."""
    return partsupp(spark, sf_dir)


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier. The correlated MIN subquery becomes a
# per-part aggregation + join-back (one shuffle on ps_partkey); every
# dimension side broadcasts.
# ---------------------------------------------------------------------------

Q2_ORACLE = PS_CTE + """
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
FROM part, supplier, partsupp, nation, region
WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
  AND p_size BETWEEN 10 AND 20 AND p_type = 'LARGE'
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
  AND ps_supplycost = (
    SELECT min(ps_supplycost)
    FROM partsupp ps2, supplier s2, nation n2, region r2
    WHERE ps2.ps_partkey = part.p_partkey AND s2.s_suppkey = ps2.ps_suppkey
      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
      AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


@query("q2_min_cost_supplier", oracle=Q2_ORACLE)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2: cheapest EUROPE supplier per qualifying part.

    Scale: supplier/nation/region broadcast into the generated partsupp;
    the correlated MIN is a groupBy(ps_partkey) + join-back, so the only
    shuffles are on partkey. The LIMIT's order key (s_acctbal desc,
    n_name, s_name, p_partkey) is a total order — deterministic cutoff.
    The supplycost equality is safe: both sides are the identical
    generated 2-decimal doubles.
    """
    ps = partsupp(spark, sf_dir)
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    p = table(spark, sf_dir, "part").where(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "LARGE")
    )
    rs = (
        ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    mc = rs.groupBy("ps_partkey").agg(F.min("ps_supplycost").alias("__min_cost__"))
    return (
        rs.join(mc, "ps_partkey")
        .where(F.col("ps_supplycost") == F.col("__min_cost__"))
        .join(p, F.col("ps_partkey") == p.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit by nation and year.
# ---------------------------------------------------------------------------

Q9_ORACLE = PS_CTE + """
SELECT nation, o_year, floor(round(sum(amount), 4) * 100 + 0.5) / 100 AS sum_profit
FROM (
  SELECT n_name AS nation, year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) - ps_supplycost * l_quantity AS amount
  FROM lineitem
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON n_nationkey = s_nationkey
  WHERE p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
"""


@query("q9_product_type_profit", oracle=Q9_ORACLE)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: profit (revenue − supply cost) per nation per year for
    '%red%' parts.

    Scale: the name-filtered part set broadcasts and prunes lineitem
    early; partsupp (4 rows/part, generated — never materialized on
    disk) joins on the composite (partkey, suppkey); supplier + nation
    broadcast. One fact shuffle on orderkey, one agg shuffle on
    (nation, year).
    """
    ps = partsupp(spark, sf_dir)
    p = table(spark, sf_dir, "part").where(F.col("p_name").contains("red"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    j = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(ps, (l.l_partkey == ps.ps_partkey) & (l.l_suppkey == ps.ps_suppkey))
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, l.l_orderkey == o.o_orderkey)
    )
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "ps_supplycost"
    ) * F.col("l_quantity")
    return (
        j.groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(_sum2x(amount).alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# Q11 — important stock identification (global-total HAVING).
# ---------------------------------------------------------------------------

Q11_ORACLE = PS_CTE + """
, vr AS (
  SELECT ps_partkey, ps_supplycost * ps_availqty AS v
  FROM partsupp JOIN supplier ON ps_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
)
SELECT ps_partkey, round(sum(v), 2) AS value
FROM vr
GROUP BY ps_partkey
HAVING round(sum(v), 2) * 10000 > (SELECT round(sum(v), 2) FROM vr)
"""


@query("q11_important_stock", oracle=Q11_ORACLE)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: parts whose NATION_3 stock value exceeds 1/10000 of
    the national total.

    Scale: supplier⋈nation broadcasts into generated partsupp; the group
    agg and the grand total reuse one shuffled frame; the total (1 row)
    broadcasts back for the HAVING. Both engines compare
    round(sum,2)*10000 > round(total,2): the rounds reconstruct the
    exact 2-decimal sums, so the compared doubles are bit-identical.
    """
    ps = partsupp(spark, sf_dir)
    sn = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    vr = ps.join(F.broadcast(sn), ps.ps_suppkey == F.col("s_suppkey"))
    v = F.col("ps_supplycost") * F.col("ps_availqty")
    grouped = vr.groupBy("ps_partkey").agg(F.round(F.sum(v), 2).alias("value"))
    # scalar subquery (Spark 4 DataFrame.scalar): the grand total rides
    # into the HAVING as a subquery result, no cartesian/crossJoin stage
    total = vr.agg(F.round(F.sum(v), 2).alias("__total__")).scalar()
    return grouped.where(F.col("value") * 10000 > total).select("ps_partkey", "value")


# ---------------------------------------------------------------------------
# Q16 — parts/supplier relationship (anti join + count distinct).
# ---------------------------------------------------------------------------

Q16_ORACLE = PS_CTE + """
SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
FROM partsupp JOIN part ON p_partkey = ps_partkey
WHERE p_brand <> 'Brand#23' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


@query("q16_supplier_relationship", oracle=Q16_ORACLE)
def q16_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: distinct supplier count per (brand, type, size) for
    qualifying parts, excluding flagged suppliers (fixture adaptation:
    negative account balance stands in for the complaints comment).

    Scale: the filtered part side broadcasts; the NOT IN is a broadcast
    left-anti join (keys non-null by construction); one distinct-agg
    shuffle on the 3-column group key.
    """
    ps = partsupp(spark, sf_dir)
    bad = (
        table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    p = table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#23")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    return (
        ps.join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .join(F.broadcast(bad), ps.ps_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q20 — potential part promotion (nested IN chain → semi-join chain).
# ---------------------------------------------------------------------------

Q20_ORACLE = PS_CTE + """
SELECT s_name, s_suppkey
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_5'
  AND s_suppkey IN (
    SELECT ps_suppkey FROM partsupp
    WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      AND ps_availqty > (
        SELECT 0.5 * sum(l_quantity) FROM lineitem
        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'))
ORDER BY s_name
"""


@query("q20_part_promotion", oracle=Q20_ORACLE)
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20: NATION_5 suppliers overstocked (availqty > half of a
    year's shipped quantity) in 'small%' parts.

    Scale: the correlated half-quantity subquery is a grouped agg on
    (l_partkey, l_suppkey) inner-joined to partsupp (inner join encodes
    the NULL-sum-excludes semantics of the SQL comparison); the part
    name filter and the final supplier membership are semi joins. The
    date filter pushes to the lineitem scan; sums of integral
    quantities are order-exact, so 0.5·sum compares identically.
    """
    ps = partsupp(spark, sf_dir)
    l = table(spark, sf_dir, "lineitem")
    l = l.where(
        (F.col("l_shipdate") >= _ts(l, "l_shipdate", "1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts(l, "l_shipdate", "1997-01-01 00:00:00"))
    )
    need = l.groupBy("l_partkey", "l_suppkey").agg(
        (F.lit(0.5) * F.sum("l_quantity")).alias("__half__")
    )
    pnames = (
        table(spark, sf_dir, "part")
        .where(F.col("p_name").startswith("small"))
        .select("p_partkey")
    )
    over = (
        ps.join(need, (ps.ps_partkey == need.l_partkey) & (ps.ps_suppkey == need.l_suppkey))
        .where(F.col("ps_availqty") > F.col("__half__"))
        .join(F.broadcast(pnames), ps.ps_partkey == pnames.p_partkey, "left_semi")
        .select("ps_suppkey")
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_5")
    return (
        s.join(over, s.s_suppkey == over.ps_suppkey, "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "s_suppkey")
        .orderBy("s_name")
    )


# -- standalone generator gate (fixed sf=0.001: 1500 orders, ~6000
# lineitems; the generator needs no input, so sf_dir is ignored) -----------

TPCHGEN_ORDERS_ORACLE = """
WITH r AS (SELECT unnest(generate_series(0, 1499)) AS i)
SELECT i AS o_orderkey,
       (i * 7919 + 3) % 150 AS o_custkey,
       ['F','O','P'][(i % 3) + 1] AS o_orderstatus,
       ((i * 48271) % 15000000 + 100000) / 100.0 AS o_totalprice,
       (DATE '1992-01-01' + ((i * 2654435761) % 2406)::INT)::TIMESTAMP AS o_orderdate,
       ['1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW'][((i * 11) % 5) + 1]
         AS o_orderpriority
FROM r
"""


@query("tpchgen_orders", oracle=TPCHGEN_ORDERS_ORACLE)
def tpchgen_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """standalone dbgen-equivalent orders at sf=0.001 (tpch_node.cc
    parity: generated from nothing but the scale factor; DuckDB
    re-derives every column from the same integer formulas — the hash
    match proves cross-engine generation, dates included)."""
    from arrow_spark.sources.tpchgen import generate_tables

    return generate_tables(spark, 0.001)["orders"]


TPCHGEN_LINEITEM_ORACLE = """
WITH r AS (SELECT unnest(generate_series(0, 1499)) AS i),
o AS (
  SELECT i AS o_orderkey,
         DATE '1992-01-01' + ((i * 2654435761) % 2406)::INT AS odate
  FROM r
), l AS (
  SELECT o_orderkey, odate,
         unnest(generate_series(1, (o_orderkey % 7)::INT + 1)) AS l_linenumber
  FROM o
), cols AS (
  SELECT o_orderkey, odate, l_linenumber,
         (o_orderkey * 7 + l_linenumber * 13) % 200 AS lpart
  FROM l
)
SELECT o_orderkey AS l_orderkey,
       lpart AS l_partkey,
       (lpart + (l_linenumber % 4) * (2 + (lpart // 10) % 2)) % 10 AS l_suppkey,
       l_linenumber,
       ((o_orderkey * 5 + l_linenumber * 7) % 50 + 1)::DOUBLE AS l_quantity,
       ((o_orderkey * 5 + l_linenumber * 7) % 50 + 1)::DOUBLE
         * (((lpart * 2654435761) % 20001 + 90000) / 100.0) AS l_extendedprice,
       ((o_orderkey + l_linenumber) % 11) / 100.0 AS l_discount,
       ((o_orderkey * 3 + l_linenumber) % 9) / 100.0 AS l_tax,
       ['A','N','R'][((o_orderkey + l_linenumber) % 3) + 1] AS l_returnflag,
       ['F','O'][((o_orderkey + l_linenumber * 3) % 2) + 1] AS l_linestatus,
       (odate + ((o_orderkey + l_linenumber * 3) % 122 + 1)::INT)::TIMESTAMP AS l_shipdate
FROM cols
"""


@query("tpchgen_lineitem", oracle=TPCHGEN_LINEITEM_ORACLE)
def tpchgen_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """standalone dbgen-equivalent lineitem at sf=0.001 — the 1..7
    per-order line fan-out, FK-consistent part/supplier assignment
    (lands inside generated partsupp by the shared stride formula), and
    price arithmetic all re-derived by the DuckDB oracle."""
    from arrow_spark.sources.tpchgen import generate_tables

    return generate_tables(spark, 0.001)["lineitem"]
