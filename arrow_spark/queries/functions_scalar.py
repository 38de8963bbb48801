"""Scalar kernel families: arithmetic/math, rounding, comparison,
boolean (Kleene), validity, if_else/case_when/coalesce, set lookup,
checked (ANSI-`try_`) variants.

Arrow refs: scalar_arithmetic.cc, scalar_round.cc, scalar_compare.cc,
scalar_boolean.cc, scalar_validity.cc, scalar_if_else.cc,
scalar_set_lookup.cc (SURVEY §2.2.2-2.2.3). All expressions stay inside
whole-stage codegen — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arrow_spark.catalog import table
from arrow_spark.queries.base import query

ARITH_ORACLE = """
SELECT
  l_orderkey, l_linenumber,
  round(l_extendedprice + l_tax, 6)                 AS add_v,
  round(l_extendedprice - l_discount, 6)            AS sub_v,
  round(l_quantity * l_discount, 6)                 AS mul_v,
  l_extendedprice / nullif(l_quantity, 0)           AS div_v,
  round(-l_quantity, 6)                             AS neg_v,
  abs(l_quantity - 25)                              AS abs_v,
  CAST(sign(l_discount - 0.05) AS INT)              AS sign_v,
  round(power(l_quantity, 2), 6)                    AS pow_v,
  round(sqrt(l_extendedprice), 6)                   AS sqrt_v,
  round(exp(l_discount), 6)                         AS exp_v,
  round(ln(l_extendedprice), 6)                     AS ln_v,
  round(log10(l_extendedprice), 6)                  AS log10_v,
  round(log2(l_extendedprice), 6)                   AS log2_v,
  floor(l_extendedprice)                            AS floor_v,
  ceil(l_extendedprice)                             AS ceil_v,
  trunc(l_extendedprice)                            AS trunc_v,
  round(sin(l_discount), 6)                         AS sin_v,
  round(cos(l_discount), 6)                         AS cos_v,
  round(atan2(l_discount, l_tax + 0.01), 6)         AS atan2_v,
  round(sqrt(l_discount*l_discount + l_tax*l_tax), 6) AS hypot_v
FROM lineitem
WHERE l_orderkey % 25 = 0
"""


@query("scalar_arithmetic", oracle=ARITH_ORACLE)
def scalar_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """add/sub/mul/div/negate/abs/sign/power/sqrt/exp/ln/log10/log2/
    floor/ceil/trunc/trig — all JVM-codegen'd Column exprs."""
    l = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 25 == 0)
    ep, qt, dc, tx = (F.col(c) for c in ("l_extendedprice", "l_quantity", "l_discount", "l_tax"))
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round(ep + tx, 6).alias("add_v"),
        F.round(ep - dc, 6).alias("sub_v"),
        F.round(qt * dc, 6).alias("mul_v"),
        # UNROUNDED: IEEE double division is correctly rounded, so the
        # quotient is bit-identical on both engines; round(·, 6) is NOT
        # safe here — cents/integer quotients land near 1e-6 midpoints,
        # where Spark's exact-BigDecimal HALF_UP and DuckDB's
        # float-multiply rounding disagree (caught by the sf0.1 sweep:
        # 1034.499688 vs 1034.499687)
        (ep / F.nullif(qt, F.lit(0))).alias("div_v"),
        F.round(-qt, 6).alias("neg_v"),
        F.abs(qt - 25).alias("abs_v"),
        F.signum(dc - 0.05).cast("int").alias("sign_v"),
        F.round(F.pow(qt, 2), 6).alias("pow_v"),
        F.round(F.sqrt(ep), 6).alias("sqrt_v"),
        F.round(F.exp(dc), 6).alias("exp_v"),
        F.round(F.log(ep), 6).alias("ln_v"),
        F.round(F.log10(ep), 6).alias("log10_v"),
        F.round(F.log2(ep), 6).alias("log2_v"),
        # Spark floor/ceil return LONG, DuckDB return DOUBLE — align on double
        F.floor(ep).cast("double").alias("floor_v"),
        F.ceil(ep).cast("double").alias("ceil_v"),
        F.expr("double(bigint(l_extendedprice - (l_extendedprice % 1)))").alias("trunc_v"),
        F.round(F.sin(dc), 6).alias("sin_v"),
        F.round(F.cos(dc), 6).alias("cos_v"),
        F.round(F.atan2(dc, tx + 0.01), 6).alias("atan2_v"),
        F.round(F.sqrt(dc * dc + tx * tx), 6).alias("hypot_v"),
    )


BITWISE_ORACLE = """
SELECT
  l_orderkey,
  l_orderkey & 255                AS band,
  l_orderkey | 4096               AS bor,
  xor(l_orderkey, 1023)           AS bxor,
  ~l_orderkey                     AS bnot,
  l_linenumber << 3               AS shl,
  l_orderkey >> 2                 AS shr
FROM lineitem
WHERE l_orderkey % 50 = 0 AND l_linenumber = 1
"""


@query("scalar_bitwise", oracle=BITWISE_ORACLE)
def scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bit_wise_and/or/xor/not, shift_left, shift_right."""
    l = table(spark, sf_dir, "lineitem").where(
        (F.col("l_orderkey") % 50 == 0) & (F.col("l_linenumber") == 1)
    )
    k = F.col("l_orderkey")
    return l.select(
        "l_orderkey",
        k.bitwiseAND(F.lit(255)).alias("band"),
        k.bitwiseOR(F.lit(4096)).alias("bor"),
        k.bitwiseXOR(F.lit(1023)).alias("bxor"),
        F.bitwise_not(k).alias("bnot"),
        F.shiftleft(F.col("l_linenumber"), 3).alias("shl"),
        F.shiftright(k, 2).alias("shr"),
    )


ROUND_ORACLE = """
SELECT
  l_orderkey, l_linenumber,
  CAST(round(CAST(round(l_extendedprice * 100) AS DECIMAL(20,0)) / 100, 1)
       AS DOUBLE)                       AS round_1,
  CAST(round(CAST(round(l_extendedprice * 100) AS DECIMAL(20,0)) / 100, -2)
       AS DOUBLE)                       AS round_m2,
  round(l_extendedprice / 7, 0)         AS round_0,
  floor(l_extendedprice / 50) * 50      AS round_mult_down,
  ceil(l_extendedprice / 50) * 50       AS round_mult_up
FROM lineitem WHERE l_orderkey % 40 = 0
"""


@query("scalar_round_modes", oracle=ROUND_ORACLE)
def scalar_round_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round at +/- digits and round_to_multiple via floor/ceil compose.

    round_1/round_m2 operate on the EXACT cent-snapped decimal (Arrow's
    own RoundMode tests use exact inputs): rounding the raw double is
    engine-divergent on half-of-a-tenth lattice values — the stored
    double for X.?5 sits ~1e-12 below the decimal, Spark's BigDecimal
    HALF_UP rounds the true binary value (down) while DuckDB's float
    round re-parses the shortest repr '.?5' (up). Exact decimal inputs
    make HALF_UP (Spark) and half-away (DuckDB) agree for positives at
    every scale factor. round_0 stays on the raw double: full-precision
    quotients never sit on the ambiguous lattice."""
    l = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 40 == 0)
    ep = F.col("l_extendedprice")
    cents = (F.round(ep * 100).cast("decimal(20,0)") / 100)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round(cents, 1).cast("double").alias("round_1"),
        F.round(cents, -2).cast("double").alias("round_m2"),
        F.round(ep / 7, 0).alias("round_0"),
        (F.floor(ep / 50) * 50).cast("double").alias("round_mult_down"),
        (F.ceil(ep / 50) * 50).cast("double").alias("round_mult_up"),
    )


COMPARE_BOOL_ORACLE = """
SELECT
  o_orderkey,
  o_totalprice = 0                                   AS eq_v,
  o_totalprice <> 0                                  AS ne_v,
  o_totalprice < 50000                               AS lt_v,
  o_totalprice <= 50000                              AS le_v,
  o_totalprice > 150000                              AS gt_v,
  o_totalprice >= 150000                             AS ge_v,
  (o_totalprice > 50000) AND (o_orderstatus = 'F')   AS and_v,
  (o_totalprice > 50000) OR  (o_orderstatus = 'F')   AS or_v,
  NOT (o_orderstatus = 'F')                          AS not_v,
  (o_totalprice > 50000) != (o_orderstatus = 'F')    AS xor_v,
  greatest(o_totalprice, 100000.0)                   AS max_ew,
  least(o_totalprice, 100000.0)                      AS min_ew
FROM orders WHERE o_orderkey % 10 = 0
"""


@query("scalar_compare_boolean", oracle=COMPARE_BOOL_ORACLE)
def scalar_compare_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """comparison six-pack + Kleene and/or/not/xor +
    min/max_element_wise (least/greatest)."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 10 == 0)
    tp, st = F.col("o_totalprice"), F.col("o_orderstatus")
    return o.select(
        "o_orderkey",
        (tp == 0).alias("eq_v"),
        (tp != 0).alias("ne_v"),
        (tp < 50000).alias("lt_v"),
        (tp <= 50000).alias("le_v"),
        (tp > 150000).alias("gt_v"),
        (tp >= 150000).alias("ge_v"),
        ((tp > 50000) & (st == "F")).alias("and_v"),
        ((tp > 50000) | (st == "F")).alias("or_v"),
        (~(st == "F")).alias("not_v"),
        ((tp > 50000) != (st == "F")).alias("xor_v"),
        F.greatest(tp, F.lit(100000.0)).alias("max_ew"),
        F.least(tp, F.lit(100000.0)).alias("min_ew"),
    )


VALIDITY_ORACLE = """
SELECT
  o_orderkey,
  v IS NULL                                   AS is_null_v,
  v IS NOT NULL                               AS is_valid_v,
  isnan(nan_v)                                AS is_nan_v,
  NOT (isnan(nan_v) OR isinf(nan_v))          AS is_finite_v,
  isinf(inf_v)                                AS is_inf_v,
  coalesce(v, -1.0)                           AS coalesced
FROM (
  SELECT o_orderkey,
         CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_totalprice END AS v,
         CASE WHEN o_orderkey % 3 = 0 THEN 'nan'::DOUBLE ELSE 1.0 END  AS nan_v,
         CASE WHEN o_orderkey % 5 = 0 THEN 'inf'::DOUBLE ELSE 1.0 END  AS inf_v
  FROM orders WHERE o_orderkey % 7 = 0
)
"""


@query("scalar_validity", oracle=VALIDITY_ORACLE)
def scalar_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """is_null/is_valid/is_nan/is_finite/is_inf + coalesce; NaN≠NULL."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 7 == 0)
    o = o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "O", None).otherwise(F.col("o_totalprice")).alias("v"),
        F.when(F.col("o_orderkey") % 3 == 0, F.lit(float("nan"))).otherwise(F.lit(1.0)).alias("nan_v"),
        F.when(F.col("o_orderkey") % 5 == 0, F.lit(float("inf"))).otherwise(F.lit(1.0)).alias("inf_v"),
    )
    is_inf = F.abs(F.col("inf_v")) == F.lit(float("inf"))
    return o.select(
        "o_orderkey",
        F.isnull("v").alias("is_null_v"),
        F.col("v").isNotNull().alias("is_valid_v"),
        F.isnan("nan_v").alias("is_nan_v"),
        (~(F.isnan("nan_v") | (F.abs(F.col("nan_v")) == F.lit(float("inf"))))).alias("is_finite_v"),
        is_inf.alias("is_inf_v"),
        F.coalesce("v", F.lit(-1.0)).alias("coalesced"),
    )


IF_ELSE_ORACLE = """
SELECT
  o_orderkey,
  CASE WHEN o_totalprice > 150000 THEN 'big'
       WHEN o_totalprice > 50000  THEN 'mid'
       ELSE 'small' END                                  AS bucket,
  if(o_orderstatus = 'F', 1, 0)                          AS flag,
  nullif(o_orderstatus, 'O')                             AS nullif_v,
  coalesce(nullif(o_orderstatus, 'O'), 'open')           AS nvl_v,
  CASE CAST(o_orderkey % 3 AS INT) WHEN 0 THEN 'a' WHEN 1 THEN 'b' ELSE 'c' END AS choose_v
FROM orders WHERE o_orderkey % 9 = 0
"""


@query("scalar_if_else", oracle=IF_ELSE_ORACLE)
def scalar_if_else(spark: SparkSession, sf_dir: str) -> DataFrame:
    """if_else / case_when / choose / nullif / coalesce (scalar_if_else.cc)."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 9 == 0)
    tp = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.when(tp > 150000, "big").when(tp > 50000, "mid").otherwise("small").alias("bucket"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("flag"),
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("nullif_v"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias("nvl_v"),
        F.element_at(
            F.array(F.lit("a"), F.lit("b"), F.lit("c")),
            (F.col("o_orderkey") % 3).cast("int") + 1,
        ).alias("choose_v"),
    )


SET_LOOKUP_ORACLE = """
SELECT
  p_partkey,
  p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')            AS is_in_v,
  CASE p_brand WHEN 'Brand#1' THEN 0 WHEN 'Brand#2' THEN 1
               WHEN 'Brand#3' THEN 2 END                  AS index_in_v
FROM part
"""


@query("scalar_set_lookup", oracle=SET_LOOKUP_ORACLE)
def scalar_set_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """is_in / index_in (scalar_set_lookup.cc)."""
    p = table(spark, sf_dir, "part")
    brands = ["Brand#1", "Brand#2", "Brand#3"]
    idx = F.array_position(F.array(*[F.lit(b) for b in brands]), F.col("p_brand"))
    return p.select(
        "p_partkey",
        F.col("p_brand").isin(brands).alias("is_in_v"),
        F.when(idx > 0, (idx - 1).cast("int")).alias("index_in_v"),
    )


KLEENE_ORACLE = """
SELECT
  o_orderkey,
  CAST(a AND b AS INT)                           AS and_kleene,
  CAST(a OR b AS INT)                            AS or_kleene,
  CAST(NOT a AS INT)                             AS not_v,
  CAST(CASE WHEN a IS NULL OR b IS NULL THEN NULL
       ELSE a AND b END AS INT)                  AS and_propagating,
  CAST(a IS NOT DISTINCT FROM b AS INT)          AS null_safe_eq
FROM (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_totalprice > 100000 END AS a,
         CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_orderstatus = 'F'  END AS b
  FROM orders WHERE o_orderkey % 4 = 0
)
"""


@query("scalar_kleene_logic", oracle=KLEENE_ORACLE)
def scalar_kleene_logic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kleene (SQL three-valued) AND/OR vs Arrow's null-propagating
    non-Kleene variants (scalar_boolean.cc), plus null-safe equality.

    NULL AND FALSE = FALSE under Kleene; NULL under the propagating
    variant — both semantics expressed and oracle-checked."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 4 == 0)
    o = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, None)
        .otherwise(F.col("o_totalprice") > 100000)
        .alias("a"),
        F.when(F.col("o_orderkey") % 5 == 0, None)
        .otherwise(F.col("o_orderstatus") == "F")
        .alias("b"),
    )
    a, b = F.col("a"), F.col("b")
    # nullable booleans bridge to pandas asymmetrically across engines
    # (None vs NaN) — int-typed output is NaN on both sides
    return o.select(
        "o_orderkey",
        (a & b).cast("int").alias("and_kleene"),
        (a | b).cast("int").alias("or_kleene"),
        (~a).cast("int").alias("not_v"),
        F.when(a.isNull() | b.isNull(), None)
        .otherwise(a & b)
        .cast("int")
        .alias("and_propagating"),
        a.eqNullSafe(b).cast("int").alias("null_safe_eq"),
    )


TRY_ORACLE = """
SELECT
  doc_id,
  TRY_CAST(substr(text, 1, 3) AS INTEGER)   AS try_int,
  TRY_CAST(lang AS DOUBLE)                  AS try_double,
  TRY_CAST(n_chars AS SMALLINT)             AS try_small
FROM documents WHERE doc_id % 5 = 0
"""


@query("scalar_try_cast", oracle=TRY_ORACLE)
def scalar_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """checked-cast semantics: Arrow `cast` raises, Spark ANSI raises;
    the non-raising path is try_cast ⇒ NULL on failure."""
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") % 5 == 0)
    return d.select(
        "doc_id",
        F.expr("try_cast(substr(text, 1, 3) AS INT)").alias("try_int"),
        F.expr("try_cast(lang AS DOUBLE)").alias("try_double"),
        F.expr("try_cast(n_chars AS SMALLINT)").alias("try_small"),
    )
