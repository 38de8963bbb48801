"""Round-8 analytics wave: calendar-aligned growth, price-volume-mix
decomposition, and ABC classification — the quarter-review queries a
revenue team runs after the pareto/RFM/attribution set (analytics_w7)
establishes who matters.

Hash-exactness follows the repo discipline: cents/quantities in BIGINT
end-to-end, cumulative compares by integer cross-multiplication, and
each output spends at most one fixed IEEE double tree over exact sums.
Reference anchor: the reference ships the scan/aggregate/window
primitives (cpp/src/arrow/acero/*.cc, compute/api_aggregate.h); these
are the composite analytics a warehouse user writes ON those
primitives, expressed lattice-first so every window runs on
aggregate-sized frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arrow_spark.catalog import table
from arrow_spark.queries.base import query

# ---------------------------------------------------------------------------
# Year-over-year growth on the month lattice

YOY_ORACLE = """
WITH monthly AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
         CAST(month(o_orderdate) AS BIGINT) AS m,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev
  FROM orders GROUP BY 1, 2
)
SELECT a.y, a.m, a.rev, b.rev AS prev_rev,
       CASE WHEN b.rev IS NOT NULL AND b.rev <> 0
            THEN CAST(a.rev - b.rev AS DOUBLE) / CAST(b.rev AS DOUBLE)
       END AS yoy_growth
FROM monthly a LEFT JOIN monthly b ON b.y = a.y - 1 AND b.m = a.m
"""


@query("analytics_yoy_growth", oracle=YOY_ORACLE)
def analytics_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year monthly revenue growth, calendar-aligned: month
    m of year y joins (y−1, m) on the MONTH LATTICE — the row-scale
    stage is one map-side-combined monthly group-by; the self-join runs
    on the ≤ |years|·12-row lattice (AQE broadcasts it). Growth is one
    exact-integer difference over one division, NULL when the prior
    year is absent or zero (never an ANSI /0)."""
    monthly = (
        table(spark, sf_dir, "orders")
        .select(
            F.year("o_orderdate").cast("long").alias("y"),
            F.month("o_orderdate").cast("long").alias("m"),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
        )
        .groupBy("y", "m")
        .agg(F.sum("cents").cast("long").alias("rev"))
    )
    prev = monthly.select(
        (F.col("y") + 1).alias("py"), F.col("m").alias("pm"),
        F.col("rev").alias("prev_rev"),
    )
    j = monthly.join(
        prev, (F.col("y") == F.col("py")) & (F.col("m") == F.col("pm")), "left"
    )
    return j.select(
        "y",
        "m",
        "rev",
        "prev_rev",
        F.when(
            F.col("prev_rev").isNotNull() & (F.col("prev_rev") != 0),
            (F.col("rev") - F.col("prev_rev")).cast("double")
            / F.col("prev_rev").cast("double"),
        ).alias("yoy_growth"),
    )


# ---------------------------------------------------------------------------
# Price-volume-mix decomposition between two ship years

PVM_ORACLE = """
WITH d AS (
  SELECT p.p_brand AS brand, year(l.l_shipdate) AS yr,
         CAST(l.l_quantity AS BIGINT) AS q,
         CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE year(l.l_shipdate) IN (1996, 1997)
),
cells AS (
  SELECT brand,
         CAST(sum(CASE WHEN yr = 1996 THEN q ELSE 0 END) AS BIGINT) AS q1,
         CAST(sum(CASE WHEN yr = 1997 THEN q ELSE 0 END) AS BIGINT) AS q2,
         CAST(sum(CASE WHEN yr = 1996 THEN cents ELSE 0 END) AS BIGINT) AS rev1,
         CAST(sum(CASE WHEN yr = 1997 THEN cents ELSE 0 END) AS BIGINT) AS rev2
  FROM d GROUP BY brand
)
SELECT brand, q1, q2, rev1, rev2, rev2 - rev1 AS delta_rev,
       CASE WHEN q1 > 0 AND q2 > 0 THEN
         (CAST(rev2 AS DOUBLE) / CAST(q2 AS DOUBLE)
          - CAST(rev1 AS DOUBLE) / CAST(q1 AS DOUBLE)) * CAST(q1 AS DOUBLE)
       END AS price_effect,
       CASE WHEN q1 > 0 THEN
         CAST(q2 - q1 AS DOUBLE) * (CAST(rev1 AS DOUBLE) / CAST(q1 AS DOUBLE))
       END AS volume_effect,
       CASE WHEN q1 > 0 AND q2 > 0 THEN
         (CAST(rev2 AS DOUBLE) / CAST(q2 AS DOUBLE)
          - CAST(rev1 AS DOUBLE) / CAST(q1 AS DOUBLE)) * CAST(q2 - q1 AS DOUBLE)
       END AS cross_effect
FROM cells
"""


@query("analytics_price_volume_mix", oracle=PVM_ORACLE)
def analytics_price_volume_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume-mix bridge per part brand between ship years 1996
    and 1997: ΔR = Δp·q1 + p1·Δq + Δp·Δq (price, volume, cross
    effects), the revenue-bridge decomposition a pricing team reads.
    delta_rev is exact integer cents; the effects are a fixed IEEE tree
    over exact (q, rev) sums with unit price p = rev/q, NULL when a
    year has no volume. One partkey equi-join (the only row-scale
    shuffle) and one map-side-combined brand group-by; the year pivot
    is an in-row conditional sum, never a second pass."""
    l = table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.year("l_shipdate").alias("yr"),
        F.col("l_quantity").cast("long").alias("q"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    ).where(F.col("yr").isin(1996, 1997))
    p = table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_brand").alias("brand")
    )
    d = l.join(p, l["l_partkey"] == p["p_partkey"])
    cells = d.groupBy("brand").agg(
        F.sum(F.when(F.col("yr") == 1996, F.col("q")).otherwise(0))
        .cast("long")
        .alias("q1"),
        F.sum(F.when(F.col("yr") == 1997, F.col("q")).otherwise(0))
        .cast("long")
        .alias("q2"),
        F.sum(F.when(F.col("yr") == 1996, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("rev1"),
        F.sum(F.when(F.col("yr") == 1997, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("rev2"),
    )
    q1d, q2d = F.col("q1").cast("double"), F.col("q2").cast("double")
    p1 = F.col("rev1").cast("double") / q1d
    p2 = F.col("rev2").cast("double") / q2d
    both = (F.col("q1") > 0) & (F.col("q2") > 0)
    return cells.select(
        "brand",
        "q1",
        "q2",
        "rev1",
        "rev2",
        (F.col("rev2") - F.col("rev1")).alias("delta_rev"),
        F.when(both, (p2 - p1) * q1d).alias("price_effect"),
        F.when(
            F.col("q1") > 0, (F.col("q2") - F.col("q1")).cast("double") * p1
        ).alias("volume_effect"),
        F.when(both, (p2 - p1) * (F.col("q2") - F.col("q1")).cast("double")).alias(
            "cross_effect"
        ),
    )


# ---------------------------------------------------------------------------
# ABC classification rollup

ABC_ORACLE = """
WITH pr AS (
  SELECT l_partkey AS pk,
         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev
  FROM lineitem GROUP BY 1
),
tot AS (SELECT CAST(sum(rev) AS HUGEINT) AS t FROM pr),
c AS (
  SELECT pk, rev,
         CAST(sum(rev) OVER (ORDER BY rev DESC, pk
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT) AS cum
  FROM pr
),
cls AS (
  SELECT CASE WHEN cum * 1000 <= t * 700 THEN 'A'
              WHEN cum * 1000 <= t * 900 THEN 'B'
              ELSE 'C' END AS abc,
         rev
  FROM c CROSS JOIN tot
)
SELECT abc, CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(rev) AS BIGINT) AS class_rev,
       CAST(sum(rev) AS DOUBLE) / (SELECT CAST(t AS DOUBLE) FROM tot) AS rev_share
FROM cls GROUP BY abc
"""


@query("analytics_abc_classification", oracle=ABC_ORACLE)
def analytics_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC revenue classification of parts (A: first 70% of revenue in
    value-desc order, B: to 90%, C: tail) rolled up per class —
    operators/pareto.py::abc_classify, which computes the value-desc
    cumulative WITHOUT a global window (the bucket-offset prefix plan:
    per-bucket windows + broadcast offsets) and classifies by integer
    cross-multiplication cum·1000 ≤ total·mille. The rollup is a 3-cell
    group-by; rev_share spends the one final double division."""
    from arrow_spark.operators.pareto import abc_classify

    pr = (
        table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("pk"),
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
        )
        .groupBy("pk")
        .agg(F.sum("cents").cast("long").alias("rev"))
    )
    cls = abc_classify(pr, "pk", "rev", a_mille=700, b_mille=900)
    tot = cls.agg(F.sum("val").cast("long").alias("t"))
    return (
        cls.groupBy("abc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("val").cast("long").alias("class_rev"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "abc",
            "n_parts",
            "class_rev",
            (F.col("class_rev").cast("double") / F.col("t").cast("double")).alias(
                "rev_share"
            ),
        )
    )
