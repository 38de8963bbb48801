"""Data-profiling and robust-statistics queries: the scans a pipeline
runs BEFORE trusting a 100 TB table — column profiles, categorical
entropy, robust location/spread (MAD, trimmed mean, IQR fences), plus
cohort LTV curves and a seasonal-naive forecast error baseline.

(Column profiling itself lives in operators/profile.py / the
`profile_table_stats` query — this module covers what that scan does
NOT: entropy balance, robust location/spread, cohort value curves,
forecastability.)

Hash-exactness follows the repo's integer-first discipline: counts and
cents in BIGINT end-to-end; every quantile is the nearest-rank ORDER
STATISTIC from the distributed bucket-locate (operators/quantiles.py —
no global sort, no float quantile definitions); transcendental terms
(entropy's ln) micro-snap per cell before the integer sum; each query
spends at most one fixed IEEE double tree at the very end.

Reference anchor: the reference ships single-node array kernels for
count_distinct/min_max (cpp/src/arrow/compute/api_aggregate.h) and
exact quantiles (compute/kernels/aggregate_quantile.cc); these are the
distributed table-level forms of the same contracts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from arrow_spark.catalog import table
from arrow_spark.operators.quantiles import exact_quantiles
from arrow_spark.queries.base import query

# ---------------------------------------------------------------------------
# Categorical entropy / Gini impurity profile

_ENTROPY_COLS = ("l_returnflag", "l_linestatus")

_ENTROPY_ONE = """
SELECT '{c}' AS col_name, CAST(count(DISTINCT {c}) AS BIGINT) AS n_cats,
       CAST(sum(term) AS BIGINT) AS entropy_micro,
       CAST(nn * nn - sum(c2) AS DOUBLE) / CAST(nn * nn AS DOUBLE) AS gini
FROM (
  SELECT CAST(floor(CAST(cnt AS DOUBLE) / n_total
                    * ln(CAST(n_total AS DOUBLE) / CAST(cnt AS DOUBLE))
                    * 1000000 + 0.5) AS BIGINT) AS term,
         cnt * cnt AS c2, n_total AS nn, {c}
  FROM (SELECT {c}, CAST(count(*) AS BIGINT) AS cnt FROM lineitem GROUP BY {c})
  CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n_total FROM lineitem)
) GROUP BY nn
"""

ENTROPY_ORACLE = " UNION ALL ".join(
    _ENTROPY_ONE.format(c=c) for c in _ENTROPY_COLS
)


@query("quality_entropy_profile", oracle=ENTROPY_ORACLE)
def quality_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy + Gini impurity per categorical column — the
    class-balance screen before stratified sampling or skew-aware
    partitioning. Each column is one group-by to |domain| cells; the
    entropy term −p·ln p micro-snaps PER CELL to BIGINT (cell count is
    domain-sized, so the integer sum is order-free), and Gini is the
    exact rational (N² − Σc²)/N² — one division."""
    li = table(spark, sf_dir, "lineitem")

    def one(c: str) -> DataFrame:
        cells = li.groupBy(c).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        tot = cells.agg(F.sum("cnt").cast("long").alias("n_total"))
        p = F.col("cnt").cast("double") / F.col("n_total")
        term = F.floor(
            p * F.log(F.col("n_total").cast("double") / F.col("cnt").cast("double"))
            * 1000000
            + F.lit(0.5)
        ).cast("long")
        return (
            cells.crossJoin(F.broadcast(tot))
            .select(
                term.alias("term"),
                (F.col("cnt") * F.col("cnt")).alias("c2"),
                "n_total",
            )
            .groupBy("n_total")
            .agg(
                F.lit(c).alias("col_name"),
                F.count(F.lit(1)).cast("long").alias("n_cats"),
                F.sum("term").cast("long").alias("entropy_micro"),
                (
                    (F.col("n_total") * F.col("n_total") - F.sum("c2")).cast("double")
                    / (F.col("n_total") * F.col("n_total")).cast("double")
                ).alias("gini"),
            )
            .select("col_name", "n_cats", "entropy_micro", "gini")
        )

    out = one(_ENTROPY_COLS[0])
    for c in _ENTROPY_COLS[1:]:
        out = out.unionAll(one(c))
    return out


# ---------------------------------------------------------------------------
# Cohort LTV curve

COHORT_LTV_ORACLE = """
WITH ev AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS wk,
         event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
cohort AS (
  SELECT user_id, CAST(min(wk) AS BIGINT) AS cohort_week FROM ev GROUP BY user_id
),
rev AS (
  SELECT c.cohort_week, e.wk - c.cohort_week AS weeks_since,
         CAST(sum(e.cents) AS BIGINT) AS rev_cents
  FROM ev e JOIN cohort c USING (user_id)
  WHERE e.event_type = 'purchase'
  GROUP BY 1, 2
)
SELECT cohort_week, weeks_since, rev_cents,
       CAST(sum(rev_cents) OVER (PARTITION BY cohort_week ORDER BY weeks_since
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_rev_cents
FROM rev
"""


@query("analytics_cohort_ltv", oracle=COHORT_LTV_ORACLE)
def analytics_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue per signup-cohort week (the LTV curve):
    first-activity week per user (one group-by), purchase revenue
    re-keyed to (cohort_week, weeks_since) — cents BIGINT so sums are
    exact — and the running total is a window over the cohort×week
    AGGREGATE frame, never the event stream."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("CAST(floor(unix_timestamp(ts)) DIV 604800 AS BIGINT)").alias("wk"),
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    cohort = ev.groupBy("user_id").agg(F.min("wk").cast("long").alias("cohort_week"))
    rev = (
        ev.where(F.col("event_type") == "purchase")
        .join(cohort, "user_id")
        .groupBy(
            "cohort_week", (F.col("wk") - F.col("cohort_week")).alias("weeks_since")
        )
        .agg(F.sum("cents").cast("long").alias("rev_cents"))
    )
    w = (
        W.partitionBy("cohort_week")
        .orderBy("weeks_since")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return rev.select(
        "cohort_week",
        "weeks_since",
        "rev_cents",
        F.sum("rev_cents").over(w).cast("long").alias("cum_rev_cents"),
    )


# ---------------------------------------------------------------------------
# Robust statistics over order totals (cents lattice)

_CENTS_CTE = """
d AS (
  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v FROM orders
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
ranked AS (SELECT v, row_number() OVER (ORDER BY v) AS r FROM d)
"""


def _rank_sql(q_mille: int) -> str:
    return f"CAST((n.n * {q_mille} + 999) // 1000 AS BIGINT)"


MAD_ORACLE = (
    "WITH "
    + _CENTS_CTE
    + f""",
med AS (
  SELECT (SELECT v FROM ranked WHERE r = {_rank_sql(500)}) AS med FROM n
),
dev AS (SELECT abs(d.v - med.med) AS dv FROM d CROSS JOIN med),
dranked AS (SELECT dv, row_number() OVER (ORDER BY dv) AS r FROM dev)
SELECT n.n, med.med AS median_cents,
       (SELECT dv FROM dranked WHERE r = {_rank_sql(500)}) AS mad_cents
FROM n CROSS JOIN med
"""
)


@query("stats_mad_robust", oracle=MAD_ORACLE)
def stats_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation of order totals: TWO passes of the
    distributed bucket-locate order statistic (median, then median of
    |x − med|) — no global sort in either; the 1-row median frame rides
    a broadcast, so the deviation pass is map-only before its own
    bucket shuffle. All cents BIGINT; nothing floats."""
    d = table(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("v")
    )
    med = exact_quantiles(d, "v", [500]).select(F.col("value").alias("median_cents"))
    dev = d.crossJoin(F.broadcast(med)).select(
        F.abs(F.col("v") - F.col("median_cents")).alias("dv")
    )
    mad = exact_quantiles(dev, "dv", [500]).select(F.col("value").alias("mad_cents"))
    n = d.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return n.crossJoin(F.broadcast(med)).crossJoin(F.broadcast(mad))


_EVENT_CENTS_CTE = """
d AS (
  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS v FROM events
  WHERE value IS NOT NULL
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
ranked AS (SELECT v, row_number() OVER (ORDER BY v) AS r FROM d)
"""

IQR_ORACLE = (
    "WITH "
    + _EVENT_CENTS_CTE
    + f""",
q AS (
  SELECT (SELECT v FROM ranked WHERE r = {_rank_sql(250)}) AS q1,
         (SELECT v FROM ranked WHERE r = {_rank_sql(750)}) AS q3
  FROM n
)
SELECT n.n, q.q1 AS q1_cents, q.q3 AS q3_cents,
       CAST((SELECT count(*) FROM d WHERE 2 * d.v < 5 * q.q1 - 3 * q.q3) AS BIGINT)
         AS n_low,
       CAST((SELECT count(*) FROM d WHERE 2 * d.v > 5 * q.q3 - 3 * q.q1) AS BIGINT)
         AS n_high
FROM n CROSS JOIN q
"""
)


@query("quality_outlier_iqr", oracle=IQR_ORACLE)
def quality_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier counts on event values (the long-tailed
    column — order totals are too uniform to fence): q1/q3 from the
    bucket-locate order statistic, fences compared on the INTEGER
    lattice (x < q1 − 1.5·IQR ⟺ 2x < 5q1 − 3q3 — no float fence to
    diverge), one broadcast of the 1-row quantile frame, one counting
    pass."""
    d = (
        table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("v"))
    )
    q = (
        exact_quantiles(d, "v", [250, 750])
        .groupBy()
        .pivot("q_mille", [250, 750])
        .agg(F.first("value"))
        .select(F.col("250").alias("q1_cents"), F.col("750").alias("q3_cents"))
    )
    counted = d.crossJoin(F.broadcast(q)).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.first("q1_cents").alias("q1_cents"),
        F.first("q3_cents").alias("q3_cents"),
        F.sum(
            F.when(
                2 * F.col("v") < 5 * F.col("q1_cents") - 3 * F.col("q3_cents"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_low"),
        F.sum(
            F.when(
                2 * F.col("v") > 5 * F.col("q3_cents") - 3 * F.col("q1_cents"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_high"),
    )
    return counted.select("n", "q1_cents", "q3_cents", "n_low", "n_high")


TRIMMED_ORACLE = (
    "WITH "
    + _CENTS_CTE
    + f""",
q AS (
  SELECT (SELECT v FROM ranked WHERE r = {_rank_sql(100)}) AS v10,
         (SELECT v FROM ranked WHERE r = {_rank_sql(900)}) AS v90
  FROM n
),
kept AS (
  SELECT CAST(count(*) AS BIGINT) AS n_kept, CAST(sum(d.v) AS BIGINT) AS sum_cents
  FROM d CROSS JOIN q WHERE d.v >= q.v10 AND d.v <= q.v90
)
SELECT q.v10 AS v10_cents, q.v90 AS v90_cents, kept.n_kept, kept.sum_cents,
       CAST(kept.sum_cents AS DOUBLE) / CAST(kept.n_kept AS DOUBLE)
         AS trimmed_mean_cents
FROM q CROSS JOIN kept
"""
)


@query("stats_trimmed_mean", oracle=TRIMMED_ORACLE)
def stats_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10–90 trimmed mean of order totals by VALUE fences (keep
    v10 ≤ x ≤ v90, ties included on both sides — value-based trimming
    is deterministic where rank-based tie-dropping is not): quantile
    locate, one broadcast, one integer-sum pass, one final division."""
    d = table(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("v")
    )
    q = (
        exact_quantiles(d, "v", [100, 900])
        .groupBy()
        .pivot("q_mille", [100, 900])
        .agg(F.first("value"))
        .select(F.col("100").alias("v10_cents"), F.col("900").alias("v90_cents"))
    )
    kept = (
        d.crossJoin(F.broadcast(q))
        .where((F.col("v") >= F.col("v10_cents")) & (F.col("v") <= F.col("v90_cents")))
        .agg(
            F.first("v10_cents").alias("v10_cents"),
            F.first("v90_cents").alias("v90_cents"),
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.sum("v").cast("long").alias("sum_cents"),
        )
    )
    return kept.select(
        "v10_cents",
        "v90_cents",
        "n_kept",
        "sum_cents",
        (F.col("sum_cents").cast("double") / F.col("n_kept").cast("double")).alias(
            "trimmed_mean_cents"
        ),
    )


# ---------------------------------------------------------------------------
# Seasonal-naive forecast error (MASE)

MASE_ORACLE = """
WITH daily AS (
  SELECT CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS day,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1
),
scored AS (
  SELECT t.day, abs(t.cents - s.cents) AS e7, abs(t.cents - o.cents) AS e1
  FROM daily t
  JOIN daily s ON s.day = t.day - 7
  JOIN daily o ON o.day = t.day - 1
)
SELECT CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(e7) AS BIGINT) AS sum_err_seasonal,
       CAST(sum(e1) AS BIGINT) AS sum_err_naive,
       CAST(sum(e7) AS DOUBLE) / CAST(sum(e1) AS DOUBLE) AS mase
FROM scored
"""


@query("timeseries_seasonal_naive_mase", oracle=MASE_ORACLE)
def timeseries_seasonal_naive_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MASE of the weekly-seasonal naive forecast on daily revenue:
    is last week's same-day a better predictor than yesterday? The
    fact table folds to a days-sized frame in one group-by; both lag
    joins are broadcast equi-joins on that tiny frame; errors are
    integer cents; the ratio is the one division."""
    daily = (
        table(spark, sf_dir, "orders")
        .groupBy(
            F.expr("CAST(floor(unix_timestamp(o_orderdate)) DIV 86400 AS BIGINT)")
            .alias("day")
        )
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    t = daily.alias("t")
    s = F.broadcast(daily.alias("s"))
    o = F.broadcast(daily.alias("o"))
    scored = (
        t.join(s, F.col("s.day") == F.col("t.day") - 7)
        .join(o, F.col("o.day") == F.col("t.day") - 1)
        .select(
            F.abs(F.col("t.cents") - F.col("s.cents")).alias("e7"),
            F.abs(F.col("t.cents") - F.col("o.cents")).alias("e1"),
        )
    )
    return scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("e7").cast("long").alias("sum_err_seasonal"),
        F.sum("e1").cast("long").alias("sum_err_naive"),
        # a perfectly naive-predictable series (zero naive error)
        # leaves MASE undefined → NULL, never an ANSI /0 error
        F.when(
            F.sum("e1") > 0,
            F.sum("e7").cast("double") / F.sum("e1").cast("double"),
        ).alias("mase"),
    )


# ---------------------------------------------------------------------------
# Grouped + weighted exact quantiles (registered r8; operators landed r7)

GROUPED_QUANTILES_ORACLE = """
WITH d AS (
  SELECT l_returnflag AS flag,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS v
  FROM lineitem
), n AS (
  SELECT flag, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY flag
), ranked AS (
  SELECT flag, v, row_number() OVER (PARTITION BY flag ORDER BY v) AS rn FROM d
), targets AS (
  SELECT n.flag, q_mille, (n.n * q_mille + 999) // 1000 AS rank
  FROM (SELECT unnest([250, 500, 750, 900]) AS q_mille), n
)
SELECT t.flag, CAST(t.q_mille AS INT) AS q_mille,
       CAST(t.rank AS BIGINT) AS rank, r.v AS value
FROM targets t JOIN ranked r ON r.flag = t.flag AND r.rn = t.rank
"""


@query("exact_quantiles_grouped", oracle=GROUPED_QUANTILES_ORACLE)
def exact_quantiles_grouped_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT p25/p50/p75/p90 of extended-price cents PER RETURN FLAG
    without a per-group sort — the grouped bucket-locate
    (operators/quantiles.py::exact_quantiles_grouped): per-group stats
    join back on the group key, one map-side-combined
    (group, bucket)-count shuffle of ≤ |groups|·256 cells, offsets over
    the tiny per-group bucket frames, and an in-bucket rank window over
    only the located (group, bucket) cells. The grouped analog of
    approx_percentile for audit cuts that cannot tolerate GK error
    (reference: compute/kernels/aggregate_quantile.cc — single-node;
    this is the distributed grouped form). Oracle = naive per-group
    full-sort row_number: different algebra, identical order
    statistics."""
    from arrow_spark.operators.quantiles import exact_quantiles_grouped

    l = table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("v"),
    )
    return exact_quantiles_grouped(l, "flag", "v", [250, 500, 750, 900])


WEIGHTED_QUANTILES_ORACLE = """
WITH d AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
         CAST(l_quantity AS BIGINT) AS w
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND CAST(l_quantity AS BIGINT) > 0
), agg AS (
  SELECT v, CAST(sum(w) AS BIGINT) AS w FROM d GROUP BY v
), tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM agg),
c AS (
  SELECT v, CAST(sum(w) OVER (ORDER BY v) AS BIGINT) AS cw,
         CAST(sum(w) OVER (ORDER BY v) - w AS BIGINT) AS cwp
  FROM agg
), targets AS (
  SELECT q_mille, (tot.tw * q_mille + 999) // 1000 AS rank_w
  FROM (SELECT unnest([100, 250, 500, 750, 900]) AS q_mille), tot
)
SELECT CAST(t.q_mille AS INT) AS q_mille, CAST(t.rank_w AS BIGINT) AS rank_w,
       c.v AS value
FROM targets t JOIN c ON t.rank_w > c.cwp AND t.rank_w <= c.cw
"""


@query("exact_quantiles_weighted", oracle=WEIGHTED_QUANTILES_ORACLE)
def exact_quantiles_weighted_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT quantity-weighted p10/p25/p50/p75/p90 of extended-price
    cents — rank over TOTAL WEIGHT, the weighted-median generalization
    (billing units, importance-weighted corpora). The weighted
    bucket-locate (operators/quantiles.py::exact_quantiles_weighted):
    ties collapse by value first so in-bucket frames are
    distinct-value-sized, per-bucket WEIGHT SUMS replace counts
    (≤256 cells), and only located buckets get the in-bucket
    cumulative-weight window (reference: WeightedQuantileOptions,
    api_aggregate.h). Oracle = the naive cumulative-weight scan over
    the sorted distinct values; integer weights end-to-end, so the
    located value is exact on both engines."""
    from arrow_spark.operators.quantiles import exact_quantiles_weighted

    l = table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("v"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    return exact_quantiles_weighted(l, "v", "w", [100, 250, 500, 750, 900])
