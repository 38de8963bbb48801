"""Oracle-checked queries for the hypothesis-test operators
(`operators/stats_tests.py`): chi-square / mutual-information cells,
two-proportion z-test, two-sample KS, Benjamini-Hochberg FDR, and the
decile lift table.

Hash-exactness: every statistic follows the repo's integer-first
discipline — BIGINT counts and cross-products all the way down, one
fixed IEEE double tree (div/sqrt, both correctly rounded hence
bit-identical cross-engine) at the end. The two transcendental-bearing
queries (MI's ln, BH's logistic exp) micro-round those columns to 1e-6
— a 1-ulp libm skew cannot move a 6-decimal rounding of a non-midpoint
transcendental (the round-6 contract functions_scalar.py established).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arrow_spark.catalog import table
from arrow_spark.operators.stats_tests import (
    bh_adjust,
    brown_forsythe_cells,
    chi_square_cells,
    decile_lift,
    ks_two_sample,
    mutual_information_cells,
    spearman_corr,
    two_proportion_ztest,
)
from arrow_spark.queries.base import query

_CHI_CELLS_CTE = """
cells AS (
  SELECT o_orderpriority AS a, o_orderstatus AS b,
         CAST(count(*) AS BIGINT) AS obs
  FROM orders GROUP BY 1, 2
),
rt AS (SELECT a, CAST(sum(obs) AS BIGINT) AS row_tot FROM cells GROUP BY a),
ct AS (SELECT b, CAST(sum(obs) AS BIGINT) AS col_tot FROM cells GROUP BY b),
tot AS (SELECT CAST(sum(obs) AS BIGINT) AS n_total FROM cells)
"""

CHI_SQUARE_ORACLE = (
    "WITH "
    + _CHI_CELLS_CTE
    + """
SELECT a, b, obs, row_tot, col_tot,
       CAST(row_tot * col_tot AS DOUBLE) / CAST(n_total AS DOUBLE) AS expected,
       CAST(obs * n_total - row_tot * col_tot AS DOUBLE)
         * CAST(obs * n_total - row_tot * col_tot AS DOUBLE)
         / CAST(n_total * row_tot * col_tot AS DOUBLE) AS contrib
FROM cells JOIN rt USING (a) JOIN ct USING (b) CROSS JOIN tot
"""
)


@query("stats_chi_square_independence", oracle=CHI_SQUARE_ORACLE)
def stats_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence cells for order priority × status
    (reference ships only array moment kernels,
    cpp/src/arrow/compute/kernels/aggregate_variance.cc — the
    contingency marginals here are distributed group-bys). contrib =
    (obs·N − rt·ct)²/(N·rt·ct): BIGINT cross-products, one double
    square + division — hash-exact with no rounding at all."""
    return chi_square_cells(
        table(spark, sf_dir, "orders"), "o_orderpriority", "o_orderstatus"
    )


MUTUAL_INFO_ORACLE = (
    "WITH "
    + _CHI_CELLS_CTE
    + """
SELECT a, b, obs, row_tot, col_tot,
       round((CAST(obs AS DOUBLE) / CAST(n_total AS DOUBLE))
             * ln(CAST(obs * n_total AS DOUBLE)
                  / CAST(row_tot * col_tot AS DOUBLE)), 6) AS mi_term
FROM cells JOIN rt USING (a) JOIN ct USING (b) CROSS JOIN tot
"""
)


@query("stats_mutual_information", oracle=MUTUAL_INFO_ORACLE)
def stats_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell mutual-information terms (nats) for priority × status;
    ln is the lone transcendental so mi_term is micro-rounded to 1e-6.
    The cells are the artifact — a float sum across cells is
    order-dependent and never hash-stable."""
    return mutual_information_cells(
        table(spark, sf_dir, "orders"), "o_orderpriority", "o_orderstatus"
    )


TWO_PROP_ORACLE = """
WITH base AS (
  SELECT o_custkey % 2 AS g,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS s
  FROM orders
),
agg AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n, CAST(sum(s) AS BIGINT) AS x
  FROM base GROUP BY g
),
wide AS (
  SELECT max(CASE WHEN g = 0 THEN n END) AS n0,
         max(CASE WHEN g = 0 THEN x END) AS x0,
         max(CASE WHEN g = 1 THEN n END) AS n1,
         max(CASE WHEN g = 1 THEN x END) AS x1
  FROM agg
)
SELECT n0, x0, CAST(x0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS p0,
       n1, x1, CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
       CAST(x0 + x1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE) AS p_pool,
       (CAST(x0 AS DOUBLE) / CAST(n0 AS DOUBLE)
        - CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE))
       / sqrt((CAST(x0 + x1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE)
               * (1.0 - CAST(x0 + x1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE)))
              * ((1.0 / CAST(n0 AS DOUBLE)) + (1.0 / CAST(n1 AS DOUBLE)))) AS z
FROM wide
"""


@query("stats_two_proportion_ztest", oracle=TWO_PROP_ORACLE)
def stats_two_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pooled two-proportion z-test: group = o_custkey parity (a
    deterministic A/B split), success = order fully shipped ('F').
    Exact integer counts; p's and z are one fixed div/sqrt tree —
    hash-exact."""
    o = table(spark, sf_dir, "orders")
    base = o.select(
        (F.col("o_custkey") % 2).alias("g"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("s"),
    )
    return two_proportion_ztest(base, "g", "s")


KS_ORACLE = """
WITH vals AS (
  SELECT o_totalprice AS v, o_orderkey % 2 AS g FROM orders
),
steps AS (
  SELECT v,
         CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d0,
         CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d1
  FROM vals GROUP BY v
),
tot AS (SELECT CAST(sum(d0) AS BIGINT) AS n0, CAST(sum(d1) AS BIGINT) AS n1 FROM steps),
cum AS (
  SELECT v,
         CAST(sum(d0) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c0,
         CAST(sum(d1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c1
  FROM steps
),
d AS (
  SELECT v, abs(c0 * tot.n1 - c1 * tot.n0) AS diff FROM cum CROSS JOIN tot
),
mx AS (SELECT max(diff) AS ks_num FROM d)
SELECT tot.n0 AS n0, tot.n1 AS n1, mx.ks_num AS ks_num,
       CAST(mx.ks_num AS DOUBLE) / CAST(tot.n0 * tot.n1 AS DOUBLE) AS ks_stat,
       (SELECT min(v) FROM d WHERE d.diff = mx.ks_num) AS ks_at_value
FROM mx CROSS JOIN tot
"""


@query("stats_ks_two_sample", oracle=KS_ORACLE)
def stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between the total-price
    distributions of the two o_orderkey parity halves. The engine side
    has NO global window: CDF steps bucket by value range and cumulate
    as in-bucket window + broadcast bucket offsets (the exact_quantiles
    prefix pattern); the max |F0−F1| search runs on the integer lattice
    c0·n1 − c1·n0 with one final division."""
    o = table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("v"), (F.col("o_orderkey") % 2).alias("g")
    )
    return ks_two_sample(o, "v", "g")


_BH_STATS_CTE = """
c AS (
  SELECT c_nationkey,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
  FROM customer
),
gstat AS (
  SELECT CAST(count(*) AS BIGINT) AS n_all,
         CAST(sum(cents) AS BIGINT) AS s_all,
         CAST(sum(cents * cents) AS BIGINT) AS ssq_all
  FROM c
),
pern AS (
  SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS BIGINT) AS s
  FROM c GROUP BY c_nationkey
),
zt AS (
  SELECT c_nationkey, n,
         (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
          - CAST(s_all AS DOUBLE) / CAST(n_all AS DOUBLE))
         / sqrt(((CAST(ssq_all AS DOUBLE) - (CAST(s_all AS DOUBLE) * CAST(s_all AS DOUBLE))
                            / CAST(n_all AS DOUBLE))
                 / (CAST(n_all AS DOUBLE) - 1.0)) / CAST(n AS DOUBLE)) AS z
  FROM pern CROSS JOIN gstat
),
pv AS (
  SELECT c_nationkey, n, z,
         2.0 / (1.0 + exp(1.702 * abs(z))) AS p
  FROM zt
),
m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pv),
ranked AS (
  SELECT c_nationkey, n, z, p,
         row_number() OVER (ORDER BY p ASC, c_nationkey ASC) AS p_rank
  FROM pv
)
"""

BH_ORACLE = (
    "WITH "
    + _BH_STATS_CTE
    + """
SELECT c_nationkey, n, round(z, 6) AS z6, round(p, 6) AS p6, p_rank,
       round(least(min(p * CAST(m.m AS DOUBLE) / CAST(p_rank AS DOUBLE))
                   OVER (ORDER BY p_rank DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   1.0), 6) AS p_adj6
FROM ranked CROSS JOIN m
"""
)


@query("stats_fdr_bh_adjust", oracle=BH_ORACLE)
def stats_fdr_bh_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR over per-nation mean-acctbal z-tests.
    p comes from the logistic approximation 2/(1+e^{1.702|z|}) of the
    two-sided normal tail (exp is the lone transcendental → z/p/p_adj
    micro-round to 1e-6). The BH window spans 25 hypotheses — the
    number of TESTS, not rows; all data-scale work is the two
    integer-moment group-bys feeding z."""
    c = table(spark, sf_dir, "customer").select(
        "c_nationkey",
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    glob = c.agg(
        F.count(F.lit(1)).cast("long").alias("n_all"),
        F.sum("cents").cast("long").alias("s_all"),
        F.sum(F.col("cents") * F.col("cents")).cast("long").alias("ssq_all"),
    )
    pern = c.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
    )
    n_all_d = F.col("n_all").cast("double")
    var_all = (
        F.col("ssq_all").cast("double")
        - (F.col("s_all").cast("double") * F.col("s_all").cast("double")) / n_all_d
    ) / (n_all_d - F.lit(1.0))
    # an all-equal balance column has zero global variance: z is
    # undefined → NULL, never an ANSI /0 error
    z = F.when(
        var_all > 0,
        (
            F.col("s").cast("double") / F.col("n").cast("double")
            - F.col("s_all").cast("double") / n_all_d
        )
        / F.sqrt(var_all / F.col("n").cast("double")),
    )
    pv = (
        pern.crossJoin(F.broadcast(glob))
        .select(
            "c_nationkey",
            "n",
            z.alias("z"),
        )
        .withColumn("p", F.lit(2.0) / (F.lit(1.0) + F.exp(F.lit(1.702) * F.abs("z"))))
    )
    adj = bh_adjust(pv, "p", "c_nationkey")
    return adj.select(
        "c_nationkey",
        "n",
        F.round("z", 6).alias("z6"),
        F.round("p", 6).alias("p6"),
        "p_rank",
        F.round("p_adjusted", 6).alias("p_adj6"),
    )


LIFT_ORACLE = """
WITH y AS (
  SELECT o_custkey, max(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END) AS y
  FROM orders GROUP BY o_custkey
),
scored AS (
  SELECT c.c_custkey,
         CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) AS score,
         CAST(coalesce(y.y, 0) AS BIGINT) AS y
  FROM customer c LEFT JOIN y ON c.c_custkey = y.o_custkey
),
tiled AS (
  SELECT y, ntile(10) OVER (ORDER BY score DESC, c_custkey ASC) AS tile
  FROM scored
),
agg AS (
  SELECT tile, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
  FROM tiled GROUP BY tile
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot_n, CAST(sum(pos) AS BIGINT) AS tot_pos FROM agg)
SELECT tile, n, pos,
       CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) AS rate,
       CASE WHEN tot_pos = 0 THEN NULL
            ELSE CAST(pos * tot_n AS DOUBLE) / CAST(n * tot_pos AS DOUBLE)
       END AS lift,
       CAST(sum(pos) OVER (ORDER BY tile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_pos,
       CASE WHEN tot_pos = 0 THEN NULL
            ELSE CAST(sum(pos) OVER (ORDER BY tile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                 / CAST(tot_pos AS DOUBLE)
       END AS cum_gain
FROM agg CROSS JOIN tot
"""


@query("stats_decile_lift", oracle=LIFT_ORACLE)
def stats_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lift/gains table: customers ranked by account balance (cents,
    exact) into deciles; the outcome is "placed a >150k order". rate,
    lift and cum_gain are single divisions over BIGINT counts —
    hash-exact. ntile spans the scored-entity frame (one row per
    customer — aggregate-sized relative to the fact table)."""
    o = table(spark, sf_dir, "orders")
    y = o.groupBy("o_custkey").agg(
        F.max(F.when(F.col("o_totalprice") > 150000, 1).otherwise(0)).alias("y")
    )
    scored = (
        table(spark, sf_dir, "customer")
        .join(y, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(
            "c_custkey",
            F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long").alias("score"),
            F.coalesce(F.col("y"), F.lit(0)).cast("long").alias("y"),
        )
    )
    return decile_lift(scored, "score", "y", "c_custkey")


CRAMERS_V_ORACLE = (
    "WITH "
    + _CHI_CELLS_CTE
    + """,
snapped AS (
  SELECT CAST(floor(
           CAST(obs * n_total - row_tot * col_tot AS DOUBLE)
             * CAST(obs * n_total - row_tot * col_tot AS DOUBLE)
             / CAST(n_total * row_tot * col_tot AS DOUBLE) * 1000000 + 0.5
         ) AS BIGINT) AS contrib_micro
  FROM cells JOIN rt USING (a) JOIN ct USING (b) CROSS JOIN tot
),
dims AS (
  SELECT CAST(count(DISTINCT a) AS BIGINT) AS r,
         CAST(count(DISTINCT b) AS BIGINT) AS c
  FROM cells
)
SELECT CAST(sum(contrib_micro) AS BIGINT) AS chi2_micro, dims.r, dims.c,
       sqrt((CAST(sum(contrib_micro) AS BIGINT) / 1000000.0)
            / CAST(tot.n_total * least(dims.r - 1, dims.c - 1) AS DOUBLE)) AS cramers_v
FROM snapped CROSS JOIN dims CROSS JOIN tot
GROUP BY dims.r, dims.c, tot.n_total
"""
)


@query("stats_cramers_v", oracle=CRAMERS_V_ORACLE)
def stats_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V effect size for priority × status. The χ² total is a
    float sum in textbooks — order-dependent, never hash-stable — so
    each cell's contribution micro-snaps to 1e-6 BIGINT first and the
    total is an INTEGER sum (the credit-snapping pattern); V spends one
    division + sqrt at the end."""
    cells = chi_square_cells(
        table(spark, sf_dir, "orders"), "o_orderpriority", "o_orderstatus"
    )
    snapped = cells.select(
        F.floor(F.col("contrib") * 1000000 + F.lit(0.5)).cast("long").alias(
            "contrib_micro"
        ),
        "a",
        "b",
        "obs",
    )
    dims = cells.agg(
        F.countDistinct("a").cast("long").alias("r"),
        F.countDistinct("b").cast("long").alias("c"),
        F.sum("obs").cast("long").alias("n_total"),
    )
    agg = snapped.agg(F.sum("contrib_micro").cast("long").alias("chi2_micro"))
    return agg.crossJoin(F.broadcast(dims)).select(
        "chi2_micro",
        "r",
        "c",
        # a single-category dimension makes min(r-1, c-1) = 0:
        # V undefined → NULL, never an ANSI /0 error
        F.when(
            F.least(F.col("r") - 1, F.col("c") - 1) > 0,
            F.sqrt(
                (F.col("chi2_micro") / F.lit(1000000.0))
                / (F.col("n_total") * F.least(F.col("r") - 1, F.col("c") - 1)).cast(
                    "double"
                )
            ),
        ).alias("cramers_v"),
    )


KAPPA_ORACLE = """
WITH rated AS (
  SELECT CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS r1,
         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS r2
  FROM orders
),
counts AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN r1 = r2 THEN 1 ELSE 0 END) AS BIGINT) AS agree,
         CAST(sum(r1) AS BIGINT) AS r1_pos,
         CAST(sum(r2) AS BIGINT) AS r2_pos
  FROM rated
)
SELECT n, agree, r1_pos, r2_pos,
       CAST(agree * n - (r1_pos * r2_pos + (n - r1_pos) * (n - r2_pos)) AS DOUBLE)
         / CAST(n * n - (r1_pos * r2_pos + (n - r1_pos) * (n - r2_pos)) AS DOUBLE)
         AS kappa
FROM counts
"""


@query("stats_cohens_kappa", oracle=KAPPA_ORACLE)
def stats_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa agreement between two rule classifiers over
    orders (price>150k vs urgent-priority). κ = (p_o − p_e)/(1 − p_e)
    clears its denominators to the ALL-INTEGER form
    (agree·N − pe_num)/(N² − pe_num) — one division, hash-exact."""
    rated = table(spark, sf_dir, "orders").select(
        F.when(F.col("o_totalprice") > 150000, 1).otherwise(0).alias("r1"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        ).otherwise(0).alias("r2"),
    )
    counts = rated.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("r1") == F.col("r2"), 1).otherwise(0))
        .cast("long")
        .alias("agree"),
        F.sum("r1").cast("long").alias("r1_pos"),
        F.sum("r2").cast("long").alias("r2_pos"),
    )
    pe_num = F.col("r1_pos") * F.col("r2_pos") + (F.col("n") - F.col("r1_pos")) * (
        F.col("n") - F.col("r2_pos")
    )
    return counts.select(
        "n",
        "agree",
        "r1_pos",
        "r2_pos",
        # chance agreement pe = 1 (single-category raters) leaves
        # kappa undefined → NULL, never an ANSI /0 error
        F.when(
            (F.col("n") * F.col("n") - pe_num) > 0,
            (F.col("agree") * F.col("n") - pe_num).cast("double")
            / (F.col("n") * F.col("n") - pe_num).cast("double"),
        ).alias("kappa"),
    )


WOE_IV_ORACLE = """
WITH rated AS (
  SELECT o_orderpriority AS cat,
         CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS y
  FROM orders
),
cells AS (
  SELECT cat, CAST(sum(y) AS BIGINT) AS pos,
         CAST(sum(1 - y) AS BIGINT) AS neg
  FROM rated GROUP BY cat
),
tot AS (
  SELECT CAST(sum(pos) AS BIGINT) AS p_tot, CAST(sum(neg) AS BIGINT) AS n_tot
  FROM cells
)
SELECT cat, pos, neg,
       CASE WHEN pos * n_tot > 0 AND neg * p_tot > 0
            THEN round(ln(CAST(pos * n_tot AS DOUBLE)
                          / CAST(neg * p_tot AS DOUBLE)), 6) END AS woe6,
       CASE WHEN pos * n_tot > 0 AND neg * p_tot > 0
            THEN round((CAST(pos * n_tot - neg * p_tot AS DOUBLE)
                        / CAST(p_tot * n_tot AS DOUBLE))
                       * ln(CAST(pos * n_tot AS DOUBLE)
                            / CAST(neg * p_tot AS DOUBLE)), 6) END AS iv_term6
FROM cells CROSS JOIN tot
"""


@query("quality_woe_iv", oracle=WOE_IV_ORACLE)
def quality_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence + information-value terms per order-priority
    category against the big-order outcome (the credit-scoring
    predictor screen). woe = ln(pos·Nneg / (neg·Npos)) — integer
    cross-products, one ln (micro-rounded); iv_term's distribution
    difference is the exact rational (pos·Nneg − neg·Npos)/(Npos·Nneg).
    Category cells are the artifact (IV = Σ iv_term left to the
    reader — float sums are order-dependent)."""
    rated = table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("cat"),
        F.when(F.col("o_totalprice") > 150000, 1).otherwise(0).alias("y"),
    )
    cells = rated.groupBy("cat").agg(
        F.sum("y").cast("long").alias("pos"),
        F.sum(F.lit(1) - F.col("y")).cast("long").alias("neg"),
    )
    tot = cells.agg(
        F.sum("pos").cast("long").alias("p_tot"),
        F.sum("neg").cast("long").alias("n_tot"),
    )
    ratio = (F.col("pos") * F.col("n_tot")).cast("double") / (
        F.col("neg") * F.col("p_tot")
    ).cast("double")
    dist_diff = (
        F.col("pos") * F.col("n_tot") - F.col("neg") * F.col("p_tot")
    ).cast("double") / (F.col("p_tot") * F.col("n_tot")).cast("double")
    # an all-positive or all-negative cell leaves WoE undefined: NULL
    # on BOTH sides, never Spark's ANSI /0 error or DuckDB's ln(0)
    # range error (the oracle carries the mirrored CASE guard)
    defined = ((F.col("pos") * F.col("n_tot")) > 0) & (
        (F.col("neg") * F.col("p_tot")) > 0
    )
    return cells.crossJoin(F.broadcast(tot)).select(
        "cat",
        "pos",
        "neg",
        F.when(defined, F.round(F.log(ratio), 6)).alias("woe6"),
        F.when(defined, F.round(dist_diff * F.log(ratio), 6)).alias("iv_term6"),
    )


SPEARMAN_ORACLE = """
WITH p AS (
  SELECT l_returnflag AS flag,
         CAST(l_quantity AS BIGINT) AS qty,
         CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS dc,
         CAST(count(*) AS BIGINT) AS w
  FROM lineitem GROUP BY 1, 2, 3
),
fx AS (SELECT flag, qty, CAST(sum(w) AS BIGINT) AS c FROM p GROUP BY 1, 2),
rx AS (
  SELECT flag, qty,
         2 * (sum(c) OVER (PARTITION BY flag ORDER BY qty) - c) + c + 1 AS r2
  FROM fx
),
fy AS (SELECT flag, dc, CAST(sum(w) AS BIGINT) AS c FROM p GROUP BY 1, 2),
ry AS (
  SELECT flag, dc,
         2 * (sum(c) OVER (PARTITION BY flag ORDER BY dc) - c) + c + 1 AS r2
  FROM fy
),
m AS (
  SELECT p.flag,
         CAST(sum(w) AS HUGEINT) AS n,
         CAST(sum(w * rx.r2) AS HUGEINT) AS sx,
         CAST(sum(w * ry.r2) AS HUGEINT) AS sy,
         CAST(sum(w * rx.r2 * rx.r2) AS HUGEINT) AS sxx,
         CAST(sum(w * ry.r2 * ry.r2) AS HUGEINT) AS syy,
         CAST(sum(w * rx.r2 * ry.r2) AS HUGEINT) AS sxy
  FROM p
  JOIN rx ON p.flag = rx.flag AND p.qty = rx.qty
  JOIN ry ON p.flag = ry.flag AND p.dc = ry.dc
  GROUP BY 1
)
SELECT flag, CAST(n AS BIGINT) AS n_pairs,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
            * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS rho
FROM m
"""


@query("stats_spearman_rank_corr", oracle=SPEARMAN_ORACLE)
def stats_spearman_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation (tie-aware average ranks) between
    quantity and discount per return flag (reference ships only product
    -moment kernels, aggregate_covariance via compute; rank correlation
    is the robust analog).

    Hash-exact discipline: both variables have tiny integer domains
    (qty 1..50, discount cents 0..10), so ranking never sorts rows —
    value-frequency tables are domain-sized and doubled average ranks
    (min_rank + max_rank = 2*cum_before + c + 1) stay integral. The
    windows run over <=50-row per-flag frames; all moments are exact
    decimal(38,0) sums of BIGINT products; rho is one fixed IEEE tree
    (sub/div and two correctly-rounded sqrts) — bit-identical
    cross-engine, per the rolling_corr precedent. Doubling the ranks
    scales numerator and radicands by 4 exactly, so rho is unchanged.
    At 100 TB the only shuffles are the (flag,qty,dc) cell group-by
    (map-side combined to <=3*50*11 cells) and domain-sized joins."""
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("long").alias("qty"),
        F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long").alias("dc"),
    )
    return spearman_corr(li, "flag", "qty", "dc")


BENFORD_ORACLE = """
WITH c AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                          AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders
),
d AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM c GROUP BY 1),
t AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM d)
SELECT digit, n,
       CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE) AS share,
       floor(ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0) * 1e6 + 0.5) / 1e6
         AS benford_p6
FROM d CROSS JOIN t
"""


@query("stats_benford_first_digit", oracle=BENFORD_ORACLE)
def stats_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit: first-significant-digit distribution of
    order totals vs the log expectation ln(1+1/d)/ln 10 — the per-digit
    DRILL-DOWN companion to `quality_benford_check` (which emits one
    total-variation deviation per group via
    operators/inequality.py::benford_deviation); this is the table you
    read after that check flags a group.

    The digit comes from the cents BIGINT rendered as a string — both
    engines print integers identically, no float log10 in the digit
    path. share is an exact-integer division (bit-identical);
    benford_p6 bears the transcendental ln so it micro-rounds to 1e-6
    per the round-6 contract. One map-side-combined 9-cell group-by
    plus a 1-row broadcast total: map-only at any scale."""
    cents = table(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("cents")
    )
    d = cents.select(
        F.substring(F.col("cents").cast("string"), 1, 1).cast("long").alias("digit")
    ).groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("n"))
    t = d.agg(F.sum("n").cast("long").alias("n_total"))
    benford = (
        F.floor(
            F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
            / F.log(F.lit(10.0))
            * 1e6
            + F.lit(0.5)
        )
        / 1e6
    )
    return d.crossJoin(F.broadcast(t)).select(
        "digit",
        "n",
        (F.col("n").cast("double") / F.col("n_total").cast("double")).alias("share"),
        benford.alias("benford_p6"),
    )


BROWN_FORSYTHE_ORACLE = """
WITH d AS (
  SELECT event_type AS g, CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL
),
med AS (
  SELECT g, CAST(floor(2 * quantile_cont(v, 0.5) + 0.5) AS BIGINT) AS med2
  FROM d GROUP BY g
),
dev AS (
  SELECT d.g, abs(2 * d.v - med.med2) AS dv FROM d JOIN med ON d.g = med.g
),
cells AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(dv) AS HUGEINT) AS s,
         CAST(sum(CAST(dv AS HUGEINT) * CAST(dv AS HUGEINT)) AS HUGEINT) AS ss
  FROM dev GROUP BY g
),
tot AS (
  SELECT CAST(sum(n) AS HUGEINT) AS nn, CAST(sum(s) AS HUGEINT) AS stot FROM cells
)
SELECT g, n,
       CAST(s AS DOUBLE) / CAST(2 * n AS DOUBLE) AS mean_absdev,
       CAST(n * ss - s * s AS DOUBLE) / CAST(4 * n AS DOUBLE) AS within_ss,
       (CAST(s * nn - stot * n AS DOUBLE) / CAST(2 * nn AS DOUBLE))
         * (CAST(s * nn - stot * n AS DOUBLE) / CAST(2 * nn AS DOUBLE))
         / CAST(n AS DOUBLE) AS between_term
FROM cells CROSS JOIN tot
"""


@query("stats_brown_forsythe", oracle=BROWN_FORSYTHE_ORACLE)
def stats_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe variance-homogeneity cells per event type: the
    median-centered Levene transform z = |x - median|, emitted as
    per-group (n, mean|z|, within-group SS, between-group term) — the
    W statistic is their ratio, left to the reader because a float sum
    over groups is order-dependent (the chi-square-cells convention).

    Hash-exactness: medians of integer cents via the exact interpolated
    percentile (k or k+0.5 — representable, identical to DuckDB
    quantile_cont), DOUBLED to stay on the integer lattice; |2x - 2m|
    deviations are BIGINT, the moment sums exact decimal(38,0), and
    every output is a fixed IEEE division tree over exact operands.
    Scale: the per-group median is Spark's frequency-map percentile —
    bounded by the snapped cents domain, not row count; group count is
    the event-type domain; both shuffles are map-side combined."""
    d = (
        table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(
            F.col("event_type").alias("g"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("v"),
        )
    )
    return brown_forsythe_cells(d, "g", "v")


# ---------------------------------------------------------------------------
# Round-8 wave: Mann-Whitney U, one-way ANOVA cells, Jarque-Bera

MANN_WHITNEY_ORACLE = """
WITH vals AS (
  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
         o_orderkey % 2 AS g
  FROM orders
),
steps AS (
  SELECT v,
         CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d0,
         CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d1
  FROM vals GROUP BY v
),
tot AS (SELECT CAST(sum(d0) AS BIGINT) AS n0, CAST(sum(d1) AS BIGINT) AS n1 FROM steps),
r AS (
  SELECT v, d0, d1, d0 + d1 AS cnt,
         CAST(coalesce(sum(d0 + d1) OVER (
           ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         AS BIGINT) AS cb
  FROM steps
),
agg AS (
  SELECT CAST(sum(d1 * (2 * cb + cnt + 1)) AS BIGINT) AS r1_x2,
         sum(CAST(cnt AS HUGEINT) * CAST(cnt AS HUGEINT) * CAST(cnt AS HUGEINT)
             - CAST(cnt AS HUGEINT)) AS tie_t
  FROM r
),
folded AS (
  SELECT tot.n0, tot.n1, agg.r1_x2,
         agg.r1_x2 - tot.n1 * (tot.n1 + 1) AS u1_x2,
         CAST(agg.tie_t AS DOUBLE) AS tie_t,
         CAST(tot.n0 AS DOUBLE) AS n0d, CAST(tot.n1 AS DOUBLE) AS n1d,
         CAST(tot.n0 + tot.n1 AS DOUBLE) AS nd
  FROM tot CROSS JOIN agg
),
v AS (
  SELECT *,
         n0d * n1d * ((nd + 1.0) * nd * (nd - 1.0) - tie_t)
           / (12.0 * nd * (nd - 1.0)) AS var
  FROM folded
)
SELECT n0, n1, r1_x2, u1_x2,
       2 * n0 * n1 - u1_x2 AS u0_x2,
       tie_t,
       CASE WHEN n0 > 0 AND n1 > 0 AND var > 0
            THEN CAST(u1_x2 - n0 * n1 AS DOUBLE) / (2.0 * sqrt(var))
       END AS z
FROM v
"""


@query("stats_mann_whitney_u", oracle=MANN_WHITNEY_ORACLE)
def stats_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test between the total-price
    distributions of the two o_orderkey parity halves
    (operators/stats_tests.py::mann_whitney_u). Tie-averaged pooled
    ranks stay on the integer lattice by DOUBLING (a tied block of cnt
    after cb smaller values has doubled rank 2cb+cnt+1), so R1 and the
    U statistics are exact BIGINT; the tie-corrected normal z is one
    fixed IEEE tree over the exact sums. NO global window: the
    cumulative-before counts use the bucket-offset locate (the
    ks_two_sample pattern) — the only row-scale stage is one
    map-side-combined per-value count shuffle."""
    from arrow_spark.operators.stats_tests import mann_whitney_u

    o = table(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("v"),
        (F.col("o_orderkey") % 2).alias("g"),
    )
    return mann_whitney_u(o, "v", "g")


ANOVA_ORACLE = """
WITH d AS (
  SELECT o_orderpriority AS g,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
  FROM orders
),
cells AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(v AS HUGEINT)) AS HUGEINT) AS s,
         CAST(sum(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS HUGEINT) AS ss
  FROM d GROUP BY g
),
tot AS (
  SELECT CAST(sum(n) AS HUGEINT) AS nn, CAST(sum(s) AS HUGEINT) AS stot FROM cells
)
SELECT g, n,
       CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
       CAST(n * ss - s * s AS DOUBLE) / CAST(n AS DOUBLE) AS within_ss,
       (CAST(s * nn - stot * n AS DOUBLE) / CAST(nn AS DOUBLE))
         * (CAST(s * nn - stot * n AS DOUBLE) / CAST(nn AS DOUBLE))
         / CAST(n AS DOUBLE) AS between_term
FROM cells CROSS JOIN tot
"""


@query("stats_anova_oneway", oracle=ANOVA_ORACLE)
def stats_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA cells across order priorities on total-price
    cents (operators/stats_tests.py::anova_oneway_cells): per-group
    (n, mean, within_ss, between_term) with F = the caller's ratio of
    sums — unassembled because a float sum across groups is
    order-dependent (the chi-square-cells convention; the
    mean-separation companion to stats_brown_forsythe's spread test).
    Moments are exact decimal(38,0); one map-side-combined group-by
    plus a broadcast 1-row total — map-only at any scale."""
    from arrow_spark.operators.stats_tests import anova_oneway_cells

    d = table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("g"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("v"),
    )
    return anova_oneway_cells(d, "g", "v")


JARQUE_BERA_ORACLE = """
WITH d AS (
  SELECT CAST(floor(o_totalprice) AS BIGINT) AS v FROM orders
),
sums AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(CAST(v AS HUGEINT)) AS s1,
         sum(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS s2,
         sum(CAST(v AS HUGEINT) * CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS s3,
         sum(CAST(v AS HUGEINT) * CAST(v AS HUGEINT) * CAST(v AS HUGEINT)
             * CAST(v AS HUGEINT)) AS s4
  FROM d
),
e AS (
  SELECT n, CAST(n AS DOUBLE) AS nd,
         CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
         CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS e2,
         CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS e3,
         CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS e4
  FROM sums
),
m AS (
  SELECT n, nd, mean,
         e2 - mean * mean AS m2,
         e3 - 3.0 * mean * e2 + 2.0 * mean * mean * mean AS m3,
         e4 - 4.0 * mean * e3 + 6.0 * mean * mean * e2
           - 3.0 * mean * mean * mean * mean AS m4
  FROM e
),
sk AS (
  SELECT n, nd, mean, m2,
         CASE WHEN m2 > 0 THEN m3 / (m2 * sqrt(m2)) END AS skew,
         CASE WHEN m2 > 0 THEN m4 / (m2 * m2) - 3.0 END AS kurtosis_excess
  FROM m
)
SELECT n, mean, m2, skew, kurtosis_excess,
       CASE WHEN m2 > 0
            THEN nd / 6.0 * (skew * skew + kurtosis_excess * kurtosis_excess / 4.0)
       END AS jb
FROM sk
"""


@query("stats_jarque_bera", oracle=JARQUE_BERA_ORACLE)
def stats_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality statistic of order totals on the integer
    DOLLAR lattice (operators/stats_tests.py::jarque_bera — dollars,
    not cents, so N·v⁴ stays inside decimal(38,0)/HUGEINT). Power sums
    S1..S4 are exact; skewness, excess kurtosis, and
    JB = n/6·(S² + K²/4) are one fixed IEEE tree (+,−,·,/ and sqrt
    only — no micro-rounding needed). Map-only: one aggregation over
    the scan, no shuffle beyond the 1-row fold."""
    from arrow_spark.operators.stats_tests import jarque_bera

    d = table(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice")).cast("long").alias("v")
    )
    return jarque_bera(d, "v")


KENDALL_ORACLE = """
WITH base AS (
  SELECT CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) AS x,
         CAST(coalesce(o.spend, 0) AS BIGINT) AS y
  FROM customer c LEFT JOIN (
    SELECT o_custkey,
           sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS spend
    FROM orders GROUP BY 1
  ) o ON c.c_custkey = o.o_custkey
),
stats AS (
  SELECT min(x) AS xlo, max(x) AS xhi, min(y) AS ylo, max(y) AS yhi FROM base
),
cells AS (
  SELECT
    CASE WHEN s.xhi = s.xlo THEN 0
         ELSE least(CAST(floor(CAST(b.x - s.xlo AS DOUBLE)
                          / (CAST(s.xhi - s.xlo AS DOUBLE) / 64.0)) AS INT), 63)
    END AS gx,
    CASE WHEN s.yhi = s.ylo THEN 0
         ELSE least(CAST(floor(CAST(b.y - s.ylo AS DOUBLE)
                          / (CAST(s.yhi - s.ylo AS DOUBLE) / 64.0)) AS INT), 63)
    END AS gy,
    CAST(count(*) AS BIGINT) AS cnt
  FROM base b CROSS JOIN stats s GROUP BY 1, 2
),
grid AS (
  SELECT a.a AS gx, b.b AS gy
  FROM generate_series(0, 63) a(a) CROSS JOIN generate_series(0, 63) b(b)
),
dense AS (
  SELECT g.gx, g.gy, CAST(coalesce(c.cnt, 0) AS BIGINT) AS cnt
  FROM grid g LEFT JOIN cells c ON c.gx = g.gx AND c.gy = g.gy
),
ax AS (
  SELECT gx, gy, cnt,
         CAST(coalesce(sum(cnt) OVER (PARTITION BY gy ORDER BY gx DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS ax
  FROM dense
),
b2 AS (
  SELECT gx, gy, cnt,
         CAST(coalesce(sum(ax) OVER (PARTITION BY gx ORDER BY gy DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS gt2d,
         CAST(coalesce(sum(ax) OVER (PARTITION BY gx ORDER BY gy ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS lt2d
  FROM ax
),
cd AS (
  SELECT sum(CAST(cnt AS HUGEINT) * CAST(gt2d AS HUGEINT)) AS c,
         sum(CAST(cnt AS HUGEINT) * CAST(lt2d AS HUGEINT)) AS d,
         CAST(sum(cnt) AS BIGINT) AS n
  FROM b2
),
tx AS (
  SELECT sum(CAST(m AS HUGEINT) * (m - 1) / 2) AS ties_x
  FROM (SELECT sum(cnt) AS m FROM dense GROUP BY gx)
),
ty AS (
  SELECT sum(CAST(m AS HUGEINT) * (m - 1) / 2) AS ties_y
  FROM (SELECT sum(cnt) AS m FROM dense GROUP BY gy)
),
folded AS (
  SELECT cd.n, cd.c, cd.d, tx.ties_x, ty.ties_y,
         CAST(CAST(cd.n AS HUGEINT) * (cd.n - 1) / 2 AS DOUBLE) AS n0d
  FROM cd CROSS JOIN tx CROSS JOIN ty
)
SELECT n, CAST(c AS DOUBLE) AS concordant, CAST(d AS DOUBLE) AS discordant,
       CAST(c - d AS DOUBLE) AS s_stat,
       CAST(ties_x AS DOUBLE) AS ties_x, CAST(ties_y AS DOUBLE) AS ties_y,
       CASE WHEN sqrt((n0d - CAST(ties_x AS DOUBLE)) * (n0d - CAST(ties_y AS DOUBLE))) > 0
            THEN CAST(c - d AS DOUBLE)
                 / sqrt((n0d - CAST(ties_x AS DOUBLE)) * (n0d - CAST(ties_y AS DOUBLE)))
       END AS tau_b
FROM folded
"""


@query("stats_kendall_tau", oracle=KENDALL_ORACLE)
def stats_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between customer account balance and total order
    spend on the 64×64 BUCKET LATTICE
    (operators/stats_tests.py::kendall_tau_lattice): exact for the
    bucketed pair, with concordant/discordant pair counts from two
    chained suffix windows over the densified 4096-cell grid — the
    naive O(n²) pair sweep single-node kernels run is unrunnable at
    corpus scale, and the grid is the resolution dial. The only
    row-scale stages are the per-customer spend aggregation and one
    cell count shuffle. Integer pair algebra end-to-end; tau_b spends
    one fixed IEEE tree (divisions + sqrt), NULL when an axis is
    constant."""
    from arrow_spark.operators.stats_tests import kendall_tau_lattice

    c = table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long").alias("x"),
    )
    spend = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            ).alias("spend")
        )
    )
    base = c.join(spend, c["c_custkey"] == spend["o_custkey"], "left").select(
        "x", F.coalesce(F.col("spend"), F.lit(0)).cast("long").alias("y")
    )
    return kendall_tau_lattice(base, "x", "y", grid=64)


PERMUTATION_ORACLE = """
WITH base AS (
  SELECT CAST(o_orderkey AS VARCHAR) AS k,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
         o_orderkey % 2 AS gobs
  FROM orders
),
lab AS (
  SELECT b.b, base.v,
         CASE WHEN b.b = -1 THEN base.gobs
              ELSE ('0x' || substr(md5(base.k || ':' || b.b), 1, 1))::BIGINT % 2
         END AS g
  FROM base CROSS JOIN generate_series(-1, 63) b(b)
),
cells AS (
  SELECT b, g, CAST(count(*) AS BIGINT) AS n, sum(CAST(v AS HUGEINT)) AS s
  FROM lab GROUP BY b, g
),
wide AS (
  SELECT b,
         max(CASE WHEN g = 0 THEN n END) AS n0,
         max(CASE WHEN g = 0 THEN s END) AS s0,
         max(CASE WHEN g = 1 THEN n END) AS n1,
         max(CASE WHEN g = 1 THEN s END) AS s1
  FROM cells GROUP BY b
),
stats AS (
  SELECT b,
         CASE WHEN n0 IS NOT NULL AND n1 IS NOT NULL AND n0 > 0 AND n1 > 0
              THEN abs(CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)
                       - CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
         END AS stat
  FROM wide
),
obs AS (SELECT stat AS stat_obs FROM stats WHERE b = -1),
agg AS (
  SELECT CAST(sum(CASE WHEN stat IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS b_valid,
         CAST(sum(CASE WHEN stat >= obs.stat_obs THEN 1 ELSE 0 END) AS BIGINT) AS cnt_ge,
         max(obs.stat_obs) AS stat_obs
  FROM stats CROSS JOIN obs WHERE b >= 0
),
n_row AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base)
SELECT n, stat_obs, b_valid, cnt_ge,
       CASE WHEN b_valid > 0
            THEN CAST(cnt_ge + 1 AS DOUBLE) / CAST(b_valid + 1 AS DOUBLE)
       END AS p_value
FROM n_row CROSS JOIN agg
"""


@query("stats_permutation_test", oracle=PERMUTATION_ORACLE)
def stats_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation test for the mean total-price difference between
    the o_orderkey parity halves, with 64 DETERMINISTIC hash
    permutations (operators/stats_tests.py::permutation_test_hash):
    a distributed engine cannot shuffle labels, so permutation b
    labels each row parity(md5(key:b)) — reproducible on any engine
    with md5, which is exactly how the oracle replays it
    hash-for-hash. The explode is B× map work but the shuffle is
    partially aggregated to 2(B+1) cells at any scale; B is the
    resolution dial. Exact decimal sums; p = (1+#{stat_b ≥ stat_obs})
    / (1+B)."""
    from arrow_spark.operators.stats_tests import permutation_test_hash

    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("v"),
        (F.col("o_orderkey") % 2).alias("g"),
    )
    return permutation_test_hash(o, "k", "v", "g", n_perms=64)


RUNS_TEST_ORACLE = """
WITH daily AS (
  SELECT o_orderdate AS t,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
  FROM orders GROUP BY 1
),
med AS (
  SELECT CAST(floor(2 * quantile_cont(v, 0.5) + 0.5) AS BIGINT) AS med2 FROM daily
),
signed AS (
  SELECT t, CASE WHEN 2 * v > med.med2 THEN 1 ELSE 0 END AS sgn
  FROM daily CROSS JOIN med
),
flips AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(sgn) AS BIGINT) AS n_above,
         CAST(sum(CASE WHEN prev IS NOT NULL AND sgn <> prev THEN 1 ELSE 0 END)
              AS BIGINT) AS flips
  FROM (SELECT t, sgn, lag(sgn) OVER (ORDER BY t) AS prev FROM signed)
),
folded AS (
  SELECT n, n_above, n - n_above AS n_below, flips + 1 AS runs,
         CAST(n_above AS DOUBLE) AS a,
         CAST(n - n_above AS DOUBLE) AS bl,
         CAST(n AS DOUBLE) AS nd
  FROM flips
),
v AS (
  SELECT *, 2.0 * a * bl * (2.0 * a * bl - nd) / (nd * nd * (nd - 1.0)) AS var
  FROM folded
)
SELECT n, n_above, n_below, runs,
       CASE WHEN n_above > 0 AND n > n_above AND var > 0
            THEN (CAST(runs AS DOUBLE) - (1.0 + 2.0 * a * bl / nd)) / sqrt(var)
       END AS z
FROM v
"""


@query("stats_runs_test", oracle=RUNS_TEST_ORACLE)
def stats_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test for randomness of DAILY revenue around
    its median (operators/stats_tests.py::runs_test): signs from the
    doubled exact interpolated median (integer compares, ties below),
    runs counted as sign flips over the day order, normal z with
    NULL-guarded degenerate cases. The ordered window runs over the
    DAY LATTICE (grows with time, not volume); the row-scale stage is
    one map-side-combined daily group-by."""
    from arrow_spark.operators.stats_tests import runs_test

    daily = (
        table(spark, sf_dir, "orders")
        .select(
            F.col("o_orderdate").alias("t"),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
        )
        .groupBy("t")
        .agg(F.sum("cents").cast("long").alias("v"))
    )
    return runs_test(daily, "t", "v")


FRIEDMAN_ORACLE = """
WITH cells AS (
  SELECT o_orderdate AS t, o_orderpriority AS g,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
  FROM orders GROUP BY 1, 2
),
kk AS (SELECT CAST(count(DISTINCT g) AS BIGINT) AS k FROM cells),
complete AS (
  SELECT t FROM cells CROSS JOIN kk
  GROUP BY t, kk.k
  HAVING count(*) = kk.k AND count(DISTINCT g) = kk.k
),
kept AS (SELECT c.* FROM cells c JOIN complete USING (t)),
ranked AS (
  SELECT t, g,
         2 * (rank() OVER (PARTITION BY t ORDER BY v) - 1)
           + count(*) OVER (PARTITION BY t, v) + 1 AS r2
  FROM kept
),
per_group AS (
  SELECT g, CAST(sum(r2) AS BIGINT) AS r2_sum,
         CAST(count(*) AS BIGINT) AS n_blocks
  FROM ranked GROUP BY g
),
agg AS (
  SELECT max(n_blocks) AS n_blocks, CAST(count(*) AS BIGINT) AS k,
         sum(CAST(r2_sum AS HUGEINT) * CAST(r2_sum AS HUGEINT)) AS sum_rank2_sq
  FROM per_group
)
SELECT k, n_blocks, CAST(sum_rank2_sq AS DOUBLE) AS sum_rank2_sq,
       CASE WHEN n_blocks > 0 AND k > 1 THEN
         3.0 * CAST(sum_rank2_sq AS DOUBLE)
           / (CAST(n_blocks AS DOUBLE) * CAST(k AS DOUBLE)
              * (CAST(k AS DOUBLE) + 1.0))
         - 3.0 * CAST(n_blocks AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0)
       END AS chi2
FROM agg
"""


@query("stats_friedman", oracle=FRIEDMAN_ORACLE)
def stats_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test of daily revenue across the 5 order
    priorities over complete day blocks
    (operators/stats_tests.py::friedman_test): tie-averaged DOUBLED
    ranks inside 5-row day-partitioned windows (the ranked frame is
    the day×priority LATTICE — aggregate-sized at any volume), exact
    integer rank sums, χ² as one fixed IEEE tree. The nonparametric
    'do priorities earn differently day after day?' answer that
    one-way ANOVA gives parametrically."""
    from arrow_spark.operators.stats_tests import friedman_test

    daily = (
        table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderdate").alias("t"),
            F.col("o_orderpriority").alias("g"),
        )
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            )
            .cast("long")
            .alias("v")
        )
    )
    return friedman_test(daily, "t", "g", "v")
