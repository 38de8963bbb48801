"""Classical hypothesis-test statistics as distributed relational ops:
chi-square independence cells, mutual information, two-proportion
z-test, two-sample Kolmogorov-Smirnov, Benjamini-Hochberg FDR, and the
decile lift/gains table.

Reference anchor: the reference ships single-array moment/variance
kernels (cpp/src/arrow/compute/kernels/aggregate_variance.cc) and
leaves test statistics to callers; at warehouse scale the test inputs
(contingency cells, CDF steps, per-group moments) are themselves
distributed aggregates, so the statistics are built here as relational
compositions over group-by frames.

Determinism discipline (the hash-exact contract every oracle-checked
query in this repo follows): keep arithmetic in BIGINT as long as
possible — counts, cross-products of counts, scaled ranks — and spend
at most a FIXED tree of IEEE double ops (mult/div/sqrt are correctly
rounded, hence bit-identical cross-engine) at the very end. Sums of
doubles across rows are ORDER-dependent and never hash-stable, so no
statistic here ever sums a float column; transcendental outputs (ln)
are micro-rounded by the caller.

Scale notes per op:
- chi-square / MI: one (a,b) group-by shuffle; marginals are two more
  group-bys broadcast back (cell count = |A|·|B|, tiny by nature).
- two-proportion z: one group-by; the 2-row frame folds to one row.
- KS: one per-value count shuffle, then the same bucket-offset prefix
  trick exact_quantiles uses — NO global window; the only ordered
  window runs inside a value bucket, offsets come from the ≤n_buckets
  totals frame.
- BH: one window over the hypothesis frame — m hypotheses is small by
  construction (it is the number of TESTS, not rows).
- decile lift: ntile over the scored-entity frame; at corpus scale
  swap the ntile for bucketed approx-boundary assignment (documented).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = [
    "chi_square_cells",
    "mutual_information_cells",
    "two_proportion_ztest",
    "ks_two_sample",
    "bh_adjust",
    "decile_lift",
    "spearman_corr",
    "brown_forsythe_cells",
    "mann_whitney_u",
    "anova_oneway_cells",
    "jarque_bera",
    "kendall_tau_lattice",
    "permutation_test_hash",
    "runs_test",
    "friedman_test",
]


def chi_square_cells(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Per-cell chi-square contributions for the A×B contingency table:
    (a, b, obs, row_tot, col_tot, expected, contrib) with
    contrib = (obs·N − rt·ct)² / (N·rt·ct) — BIGINT cross-products, one
    double square + one division, bit-exact cross-engine. The full χ²
    is sum(contrib); it is left to the reader because a float sum over
    cells is order-dependent (the cells themselves are the artifact)."""
    a, b = F.col(col_a).alias("a"), F.col(col_b).alias("b")
    cells = df.select(a, b).groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("obs")
    )
    row_tot = cells.groupBy("a").agg(F.sum("obs").alias("row_tot"))
    col_tot = cells.groupBy("b").agg(F.sum("obs").alias("col_tot"))
    total = cells.agg(F.sum("obs").alias("n_total"))
    d = F.col("obs") * F.col("n_total") - F.col("row_tot") * F.col("col_tot")
    denom = F.col("n_total") * F.col("row_tot") * F.col("col_tot")
    return (
        cells.join(F.broadcast(row_tot), "a")
        .join(F.broadcast(col_tot), "b")
        .crossJoin(F.broadcast(total))
        .select(
            "a",
            "b",
            "obs",
            "row_tot",
            "col_tot",
            (
                (F.col("row_tot") * F.col("col_tot")).cast("double")
                / F.col("n_total").cast("double")
            ).alias("expected"),
            (
                d.cast("double") * d.cast("double") / denom.cast("double")
            ).alias("contrib"),
        )
    )


def mutual_information_cells(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Per-cell mutual-information terms (natural log, nats):
    term = (obs/N) · ln(obs·N / (rt·ct)), micro-rounded to 1e-6 (ln is
    the one transcendental — 1-ulp libm skew cannot move a 6-decimal
    rounding of a non-midpoint transcendental). MI = sum(term); cells
    are the artifact for the same order-dependence reason as χ²."""
    a, b = F.col(col_a).alias("a"), F.col(col_b).alias("b")
    cells = df.select(a, b).groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("obs")
    )
    row_tot = cells.groupBy("a").agg(F.sum("obs").alias("row_tot"))
    col_tot = cells.groupBy("b").agg(F.sum("obs").alias("col_tot"))
    total = cells.agg(F.sum("obs").alias("n_total"))
    ratio = (F.col("obs") * F.col("n_total")).cast("double") / (
        F.col("row_tot") * F.col("col_tot")
    ).cast("double")
    term = (
        F.col("obs").cast("double") / F.col("n_total").cast("double")
    ) * F.log(ratio)
    return (
        cells.join(F.broadcast(row_tot), "a")
        .join(F.broadcast(col_tot), "b")
        .crossJoin(F.broadcast(total))
        .select(
            "a",
            "b",
            "obs",
            "row_tot",
            "col_tot",
            F.round(term, 6).alias("mi_term"),
        )
        )


def two_proportion_ztest(
    df: DataFrame, group_col: str, success_col: str
) -> DataFrame:
    """Pooled two-proportion z-test over a 0/1 group column and a 0/1
    success column → one row (n0, x0, p0, n1, x1, p1, p_pool, z).
    Counts are exact integers; p's and z are a fixed double tree
    (divisions + one sqrt) — bit-exact cross-engine."""
    g = df.select(
        F.col(group_col).cast("long").alias("g"),
        F.col(success_col).cast("long").alias("s"),
    )
    agg = g.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("s").cast("long").alias("x"),
    )
    wide = agg.agg(
        F.max(F.when(F.col("g") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("g") == 0, F.col("x"))).alias("x0"),
        F.max(F.when(F.col("g") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("g") == 1, F.col("x"))).alias("x1"),
    )
    n0d, n1d = F.col("n0").cast("double"), F.col("n1").cast("double")
    p0 = F.col("x0").cast("double") / n0d
    p1 = F.col("x1").cast("double") / n1d
    p_pool = (F.col("x0") + F.col("x1")).cast("double") / (
        F.col("n0") + F.col("n1")
    ).cast("double")
    se = F.sqrt(
        (p_pool * (F.lit(1.0) - p_pool))
        * ((F.lit(1.0) / n0d) + (F.lit(1.0) / n1d))
    )
    return wide.select(
        "n0",
        "x0",
        p0.alias("p0"),
        "n1",
        "x1",
        p1.alias("p1"),
        p_pool.alias("p_pool"),
        # all-success or all-failure pools give se = 0: z is undefined
        # (NULL), never an ANSI /0 error; DuckDB's double /0 is NULL
        # too, so the oracle hash contract is unchanged
        F.when(
            (p_pool > 0) & (p_pool < 1), (p0 - p1) / se
        ).alias("z"),
    )


def ks_two_sample(
    df: DataFrame, value_col: str, group_col: str, n_buckets: int = 256
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between the value
    distributions of groups 0 and 1 → one row
    (n0, n1, ks_num, ks_stat, ks_at_value).

    D = max over CDF steps of |F0 − F1| is computed on the INTEGER
    lattice: at each distinct value, diff = |c0·n1 − c1·n0| (cumulative
    counts cross-scaled), ks_num = max(diff), ks_stat = ks_num/(n0·n1)
    — one final division. ks_at_value is the smallest value attaining
    the max (deterministic under ties).

    No global window: distinct values bucket by equi-width range (the
    exact_quantiles locate pattern); cumulative counts = in-bucket
    window (ordered inside one bucket only) + broadcast bucket offsets
    from the ≤n_buckets totals frame."""
    v = F.col(value_col).cast("double")
    g = F.col(group_col).cast("long")
    base = df.where(v.isNotNull()).select(v.alias("v"), g.alias("g"))
    steps = base.groupBy("v").agg(
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0)).cast("long").alias("d0"),
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).cast("long").alias("d1"),
    )
    stats = steps.agg(
        F.sum("d0").alias("n0"),
        F.sum("d1").alias("n1"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    )
    width = (F.col("hi") - F.col("lo")) / F.lit(float(n_buckets))
    bucket = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.least(
            F.floor((F.col("v") - F.col("lo")) / width).cast("int"),
            F.lit(n_buckets - 1),
        )
    )
    bucketed = steps.crossJoin(F.broadcast(stats)).withColumn("b", bucket)
    totals = bucketed.groupBy("b").agg(
        F.sum("d0").alias("t0"), F.sum("d1").alias("t1")
    )
    prior = W.orderBy("b").rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.select(
        "b",
        F.coalesce(F.sum("t0").over(prior), F.lit(0).cast("long")).alias("off0"),
        F.coalesce(F.sum("t1").over(prior), F.lit(0).cast("long")).alias("off1"),
    )
    local = W.partitionBy("b").orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    cum = (
        bucketed.join(F.broadcast(offsets), "b")
        .select(
            "v",
            "n0",
            "n1",
            (F.col("off0") + F.sum("d0").over(local)).alias("c0"),
            (F.col("off1") + F.sum("d1").over(local)).alias("c1"),
        )
        .withColumn(
            "diff", F.abs(F.col("c0") * F.col("n1") - F.col("c1") * F.col("n0"))
        )
    )
    peak = cum.agg(F.max("diff").alias("ks_num"))
    at = (
        cum.select("v", "diff")
        .join(F.broadcast(peak), F.col("diff") == F.col("ks_num"))
        .agg(F.max("ks_num").alias("ks_num"), F.min("v").alias("ks_at_value"))
    )
    return (
        stats.select("n0", "n1")
        .crossJoin(F.broadcast(at))
        .select(
            "n0",
            "n1",
            "ks_num",
            # an empty group leaves D undefined: NULL, never an ANSI
            # /0 error
            F.when(
                (F.col("n0") > 0) & (F.col("n1") > 0),
                F.col("ks_num").cast("double")
                / (F.col("n0") * F.col("n1")).cast("double"),
            ).alias("ks_stat"),
            "ks_at_value",
        )
    )


def bh_adjust(df: DataFrame, p_col: str, key_col: str) -> DataFrame:
    """Benjamini-Hochberg FDR adjustment: rank p ascending (key breaks
    ties deterministically), raw_k = p_k·m/k, adjusted = reverse
    running min of raw (monotone envelope), capped at 1. One window
    over the hypothesis frame — m is the number of TESTS (small by
    construction: one per group under test), not data rows."""
    m = df.count()
    asc = W.orderBy(F.col(p_col).asc(), F.col(key_col).asc())
    ranked = df.withColumn("p_rank", F.row_number().over(asc)).withColumn(
        "raw",
        F.col(p_col) * F.lit(float(m)) / F.col("p_rank").cast("double"),
    )
    desc = W.orderBy(F.col("p_rank").desc()).rowsBetween(
        W.unboundedPreceding, 0
    )
    return ranked.withColumn(
        "p_adjusted", F.least(F.min("raw").over(desc), F.lit(1.0))
    ).drop("raw")


def decile_lift(
    df: DataFrame, score_col: str, label_col: str, key_col: str, n_tiles: int = 10
) -> DataFrame:
    """Model lift/gains table: rank entities by score descending into
    n_tiles equal-count tiles (key breaks ties deterministically) →
    (tile, n, pos, rate, lift, cum_pos, cum_gain). rate/lift/gain come
    from BIGINT counts via single divisions — hash-exact. ntile is a
    global window over the SCORED-ENTITY frame; at corpus scale
    replace with approx-boundary bucket assignment (the scored frame
    here is one row per entity, aggregate-sized)."""
    ranked = df.select(
        F.col(score_col).alias("score"),
        F.col(label_col).cast("long").alias("y"),
        F.col(key_col).alias("k"),
    ).withColumn(
        "tile",
        F.ntile(n_tiles).over(
            W.orderBy(F.col("score").desc(), F.col("k").asc())
        ),
    )
    agg = ranked.groupBy("tile").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    tot = agg.agg(
        F.sum("n").alias("tot_n"), F.sum("pos").alias("tot_pos")
    )
    cum = W.orderBy("tile").rowsBetween(W.unboundedPreceding, 0)
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            "tile",
            "n",
            "pos",
            (F.col("pos").cast("double") / F.col("n").cast("double")).alias(
                "rate"
            ),
            # zero positives overall leave lift/gain undefined: NULL,
            # never an ANSI /0 error
            F.when(
                F.col("tot_pos") > 0,
                (F.col("pos") * F.col("tot_n")).cast("double")
                / (F.col("n") * F.col("tot_pos")).cast("double"),
            ).alias("lift"),
            "tot_pos",
        )
        .withColumn("cum_pos", F.sum("pos").over(cum).cast("long"))
        .withColumn(
            "cum_gain",
            F.when(
                F.col("tot_pos") > 0,
                F.col("cum_pos").cast("double") / F.col("tot_pos").cast("double"),
            ),
        )
        .drop("tot_pos")
    )


def spearman_corr(
    df: DataFrame, group_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Tie-aware Spearman rank correlation per group:
    (group, n_pairs, rho).

    Expects integer-domain x/y columns (the caller snaps to a lattice);
    ranking never sorts rows — per-group value-frequency tables are
    domain-sized, and DOUBLED average ranks (min_rank + max_rank =
    2*cum_before + c + 1) stay integral, so every moment is an exact
    decimal(38,0) sum and rho is one fixed IEEE sub/div/sqrt tree
    (bit-identical cross-engine). Doubling the ranks scales numerator
    and radicands by exactly 4, leaving rho unchanged. The windows run
    over per-group frames bounded by the VALUE DOMAIN, not row count;
    the (group, x, y) cell group-by is map-side combined."""
    d38 = "decimal(38,0)"
    p = df.groupBy(
        F.col(group_col).alias("g"), F.col(x_col).alias("x"), F.col(y_col).alias("y")
    ).agg(F.count(F.lit(1)).cast("long").alias("w"))

    def rank2(freq: DataFrame, key: str, out: str) -> DataFrame:
        win = (
            W.partitionBy("g")
            .orderBy(key)
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        return freq.select(
            "g",
            key,
            (2 * (F.sum("c").over(win) - F.col("c")) + F.col("c") + 1).alias(out),
        )

    rx = rank2(p.groupBy("g", "x").agg(F.sum("w").cast("long").alias("c")), "x", "r2x")
    ry = rank2(p.groupBy("g", "y").agg(F.sum("w").cast("long").alias("c")), "y", "r2y")
    m = (
        p.join(rx, ["g", "x"])
        .join(ry, ["g", "y"])
        .select(
            "g",
            F.col("w").cast(d38).alias("w"),
            F.col("r2x").cast(d38).alias("rx"),
            F.col("r2y").cast(d38).alias("ry"),
        )
        .groupBy("g")
        .agg(
            F.sum("w").alias("n"),
            F.sum(F.col("w") * F.col("rx")).alias("sx"),
            F.sum(F.col("w") * F.col("ry")).alias("sy"),
            F.sum(F.col("w") * F.col("rx") * F.col("rx")).alias("sxx"),
            F.sum(F.col("w") * F.col("ry") * F.col("ry")).alias("syy"),
            F.sum(F.col("w") * F.col("rx") * F.col("ry")).alias("sxy"),
        )
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vxd = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vyd = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    # zero rank variance (a constant column) leaves rho undefined:
    # NULL, not a division error — DuckDB's double /0 is NULL too, and
    # Spark 4's ANSI default would otherwise THROW on degenerate groups
    rho = F.when(
        (vxd == 0) | (vyd == 0), F.lit(None).cast("double")
    ).otherwise(num / (F.sqrt(vxd.cast("double")) * F.sqrt(vyd.cast("double"))))
    return m.select(
        F.col("g").alias(group_col),
        F.col("n").cast("long").alias("n_pairs"),
        rho.alias("rho"),
    )


def brown_forsythe_cells(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Brown-Forsythe variance-homogeneity cells per group:
    (group, n, mean_absdev, within_ss, between_term) over the
    median-centered Levene transform z = |x - median(x_group)|. The W
    statistic is the caller's ratio of sums over these cells — left
    unassembled because a float sum across groups is order-dependent
    (the chi-square-cells convention).

    Expects an integer value column. Per-group medians use the exact
    interpolated percentile (k or k+0.5, representable), DOUBLED onto
    the integer lattice so |2x - 2m| deviations are BIGINT and all
    moments exact decimal(38,0); every output is a fixed IEEE division
    tree over exact operands. The percentile's frequency map is
    bounded by the snapped value DOMAIN, not row count."""
    d38 = "decimal(38,0)"
    d = df.select(
        F.col(group_col).alias("g"), F.col(value_col).cast("long").alias("v")
    ).where(F.col("v").isNotNull())
    med = d.groupBy("g").agg(
        F.floor(2 * F.percentile("v", F.lit(0.5)) + F.lit(0.5))
        .cast("long")
        .alias("med2")
    )
    dev = d.join(F.broadcast(med), "g").select(
        "g", F.abs(2 * F.col("v") - F.col("med2")).cast(d38).alias("dv")
    )
    cells = dev.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dv").alias("s"),
        F.sum(F.col("dv") * F.col("dv")).alias("ss"),
    )
    tot = cells.agg(F.sum("n").cast(d38).alias("nn"), F.sum("s").alias("stot"))
    nd = F.col("n").cast(d38)
    diff = (F.col("s") * F.col("nn") - F.col("stot") * nd).cast("double")
    half = diff / (F.lit(2) * F.col("nn")).cast("double")
    return cells.crossJoin(F.broadcast(tot)).select(
        F.col("g").alias(group_col),
        "n",
        (F.col("s").cast("double") / (F.lit(2) * nd).cast("double")).alias(
            "mean_absdev"
        ),
        (
            (nd * F.col("ss") - F.col("s") * F.col("s")).cast("double")
            / (F.lit(4) * nd).cast("double")
        ).alias("within_ss"),
        (half * half / nd.cast("double")).alias("between_term"),
    )


def mann_whitney_u(
    df: DataFrame, value_col: str, group_col: str, n_buckets: int = 256
) -> DataFrame:
    """Two-sample Mann-Whitney U (Wilcoxon rank-sum) between groups 0
    and 1 → one row (n0, n1, r1_x2, u1_x2, u0_x2, tie_t, z).

    Ranks are tie-averaged over the POOLED sample, kept on the integer
    lattice by DOUBLING: a tied block of cnt values after cb smaller
    ones has doubled rank 2·cb + cnt + 1, so r1_x2 = Σ d1·(2cb+cnt+1)
    and u1_x2 = r1_x2 − n1(n1+1) are exact BIGINT (u = u1_x2/2). z is
    the normal approximation with the tie correction
    T = Σ(cnt³ − cnt): z = (u1_x2 − n0·n1) / (2·sqrt(var)),
    var = n0·n1·((N+1)·N·(N−1) − T) / (12·N·(N−1)) — a fixed IEEE tree
    over exact operands (T sums in decimal(38,0): a fully-tied column
    is cnt = N). Degenerate inputs (an empty group, all values tied)
    leave z NULL, never an ANSI /0.

    NO global window: distinct values bucket by equi-width range and
    the cumulative-before counts come from an in-bucket window plus
    broadcast bucket offsets — the same locate pattern as
    ks_two_sample above, so the only row-scale stage is the per-value
    count shuffle (map-side combined)."""
    d38 = "decimal(38,0)"
    v = F.col(value_col).cast("long")
    g = F.col(group_col).cast("long")
    base = df.where(v.isNotNull()).select(v.alias("v"), g.alias("g"))
    steps = base.groupBy("v").agg(
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0)).cast("long").alias("d0"),
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).cast("long").alias("d1"),
    )
    stats = steps.agg(
        F.sum("d0").alias("n0"),
        F.sum("d1").alias("n1"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    )
    width = (F.col("hi") - F.col("lo")).cast("double") / F.lit(float(n_buckets))
    bucket = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.least(
            F.floor((F.col("v") - F.col("lo")).cast("double") / width).cast("int"),
            F.lit(n_buckets - 1),
        )
    )
    bucketed = steps.crossJoin(F.broadcast(stats)).withColumn("b", bucket)
    totals = bucketed.groupBy("b").agg(
        (F.sum("d0") + F.sum("d1")).cast("long").alias("t")
    )
    prior = W.orderBy("b").rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.select(
        "b", F.coalesce(F.sum("t").over(prior), F.lit(0).cast("long")).alias("off")
    )
    before = W.partitionBy("b").orderBy("v").rowsBetween(W.unboundedPreceding, -1)
    cnt = (F.col("d0") + F.col("d1")).cast("long")
    ranked = (
        bucketed.join(F.broadcast(offsets), "b")
        .withColumn(
            "cb",
            F.col("off")
            + F.coalesce(F.sum(F.col("d0") + F.col("d1")).over(before), F.lit(0)),
        )
        .withColumn("r2", 2 * F.col("cb") + cnt + 1)
    )
    cntd = cnt.cast(d38)
    # accumulate d1*r2 in decimal(38,0): r1_x2 ~ N(N+1) overflows int64
    # past ~3e9 rows (same reason tie_t is decimal); cast down only at output
    agg = ranked.agg(
        F.sum(F.col("d1").cast(d38) * F.col("r2").cast(d38))
        .cast("long")
        .alias("r1_x2"),
        F.sum(cntd * cntd * cntd - cntd).alias("tie_t"),
    )
    n0d, n1d = F.col("n0").cast("double"), F.col("n1").cast("double")
    nd = (F.col("n0") + F.col("n1")).cast("double")
    var = (
        n0d
        * n1d
        * ((nd + F.lit(1.0)) * nd * (nd - F.lit(1.0)) - F.col("tie_t").cast("double"))
        / (F.lit(12.0) * nd * (nd - F.lit(1.0)))
    )
    u1_x2 = F.col("r1_x2") - F.col("n1") * (F.col("n1") + 1)
    return (
        stats.select("n0", "n1")
        .crossJoin(F.broadcast(agg))
        .select(
            "n0",
            "n1",
            "r1_x2",
            u1_x2.alias("u1_x2"),
            (2 * F.col("n0") * F.col("n1") - u1_x2).alias("u0_x2"),
            F.col("tie_t").cast("double").alias("tie_t"),
            F.when(
                (F.col("n0") > 0) & (F.col("n1") > 0) & (var > 0),
                (u1_x2 - F.col("n0") * F.col("n1")).cast("double")
                / (F.lit(2.0) * F.sqrt(var)),
            ).alias("z"),
        )
    )


def anova_oneway_cells(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """One-way ANOVA cells per group over an integer value column:
    (group, n, mean, within_ss, between_term). F is the caller's ratio
    (Σ between / (k−1)) / (Σ within / (N−k)) — left unassembled
    because a float sum across groups is order-dependent (the
    chi-square-cells convention; same shape as brown_forsythe_cells
    but over RAW values: BF tests spread homogeneity, this tests mean
    separation).

    Moments are exact decimal(38,0) sums of v and v²; within_ss =
    (n·ss − s²)/n and between_term = n·(mean_g − mean)² =
    ((s·N − S·n)/N)²/n are fixed IEEE trees over the exact sums. One
    map-side-combined group-by plus a broadcast 1-row total."""
    d38 = "decimal(38,0)"
    d = df.select(
        F.col(group_col).alias("g"), F.col(value_col).cast("long").alias("v")
    ).where(F.col("v").isNotNull())
    cells = d.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("v").cast(d38)).alias("s"),
        F.sum((F.col("v").cast(d38) * F.col("v").cast(d38))).alias("ss"),
    )
    tot = cells.agg(F.sum("n").cast(d38).alias("nn"), F.sum("s").alias("stot"))
    nd = F.col("n").cast(d38)
    half = (F.col("s") * F.col("nn") - F.col("stot") * nd).cast("double") / F.col(
        "nn"
    ).cast("double")
    return cells.crossJoin(F.broadcast(tot)).select(
        F.col("g").alias(group_col),
        "n",
        (F.col("s").cast("double") / nd.cast("double")).alias("mean"),
        (
            (nd * F.col("ss") - F.col("s") * F.col("s")).cast("double")
            / nd.cast("double")
        ).alias("within_ss"),
        (half * half / nd.cast("double")).alias("between_term"),
    )


def jarque_bera(df: DataFrame, value_col: str) -> DataFrame:
    """Jarque-Bera normality statistic over an integer value column →
    one row (n, mean, m2, skew, kurtosis_excess, jb).

    Power sums S1..S4 accumulate exactly in decimal(38,0) (keep the
    value lattice coarse enough that N·v⁴ < 10³⁸ — dollars, not
    cents, for price-like columns); the central moments and
    JB = n/6·(S² + K²/4) are then one fixed IEEE tree over the exact
    sums — only +,−,·,/ and sqrt, all correctly rounded, so the result
    is bit-identical cross-engine with no micro-rounding. A constant
    column (m2 = 0) leaves skew/kurtosis/jb NULL, never an ANSI /0."""
    d38 = "decimal(38,0)"
    d = df.select(F.col(value_col).cast("long").alias("v")).where(
        F.col("v").isNotNull()
    )
    vd = F.col("v").cast(d38)
    sums = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(vd).alias("s1"),
        F.sum(vd * vd).alias("s2"),
        F.sum(vd * vd * vd).alias("s3"),
        F.sum(vd * vd * vd * vd).alias("s4"),
    )
    nd = F.col("n").cast("double")
    s1, s2 = F.col("s1").cast("double"), F.col("s2").cast("double")
    s3, s4 = F.col("s3").cast("double"), F.col("s4").cast("double")
    mean = s1 / nd
    m2 = s2 / nd - mean * mean
    m3 = s3 / nd - F.lit(3.0) * mean * (s2 / nd) + F.lit(2.0) * mean * mean * mean
    m4 = (
        s4 / nd
        - F.lit(4.0) * mean * (s3 / nd)
        + F.lit(6.0) * mean * mean * (s2 / nd)
        - F.lit(3.0) * mean * mean * mean * mean
    )
    skew = m3 / (m2 * F.sqrt(m2))
    kurt = m4 / (m2 * m2) - F.lit(3.0)
    ok = m2 > 0
    return sums.select(
        "n",
        mean.alias("mean"),
        m2.alias("m2"),
        F.when(ok, skew).alias("skew"),
        F.when(ok, kurt).alias("kurtosis_excess"),
        F.when(
            ok,
            nd
            / F.lit(6.0)
            * (skew * skew + kurt * kurt / F.lit(4.0)),
        ).alias("jb"),
    )


def kendall_tau_lattice(
    df: DataFrame, x_col: str, y_col: str, grid: int = 64
) -> DataFrame:
    """Kendall tau-b of the GRID-BUCKETED pair (x, y) → one row
    (n, concordant, discordant, s_stat, ties_x, ties_y, tau_b).

    The statistic is EXACT for the bucketed variables (equi-width
    ``grid`` buckets per dim over [min, max]): every pair of rows is
    concordant, discordant, or tied according to its bucket cells, and
    pair counts come from the CELL lattice, never row pairs —
    C = Σ_cell cnt·suffix2d (strictly-greater quadrant), computed with
    two chained window passes over the DENSIFIED grid² frame (suffix
    over x within each y row, then suffix over y of those within each
    x column); ties are per-axis (m choose 2) sums. All counts are
    exact decimal(38,0); tau_b = (C−D)/sqrt((n0−n1)(n0−n2)) spends one
    fixed IEEE tree, NULL when an axis is constant (never an ANSI /0).

    Scale: the row-scale stages are one pass for (min, max) and ONE
    map-side-combined cell count shuffle of ≤ grid² cells; the
    quadratic pair algebra runs entirely on the 4096-cell lattice. The
    naive O(n²) pair sweep (what single-node rank-correlation kernels
    do over arrays) is unrunnable at corpus scale; bucketing is the
    standard escalation and the bucket count is the caller's
    resolution/size dial."""
    d38 = "decimal(38,0)"
    spark = df.sparkSession
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    base = df.where(x.isNotNull() & y.isNotNull()).select(
        x.alias("x"), y.alias("y")
    )
    stats = base.agg(
        F.min("x").alias("xlo"),
        F.max("x").alias("xhi"),
        F.min("y").alias("ylo"),
        F.max("y").alias("yhi"),
    )

    def bucket(col, lo, hi):
        width = (F.col(hi) - F.col(lo)).cast("double") / F.lit(float(grid))
        return F.when(F.col(hi) == F.col(lo), F.lit(0)).otherwise(
            F.least(
                F.floor((F.col(col) - F.col(lo)).cast("double") / width).cast("int"),
                F.lit(grid - 1),
            )
        )

    cells = (
        base.crossJoin(F.broadcast(stats))
        .select(bucket("x", "xlo", "xhi").alias("gx"), bucket("y", "ylo", "yhi").alias("gy"))
        .groupBy("gx", "gy")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    gxs = spark.range(grid).select(F.col("id").cast("int").alias("gx"))
    gys = spark.range(grid).select(F.col("id").cast("int").alias("gy"))
    dense = (
        gxs.crossJoin(gys)
        .join(cells, ["gx", "gy"], "left")
        .select("gx", "gy", F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("cnt"))
    )
    # suffix over x within each y row (strictly greater x)
    wx = W.partitionBy("gy").orderBy(F.col("gx").desc()).rowsBetween(
        W.unboundedPreceding, -1
    )
    a = dense.withColumn("ax", F.coalesce(F.sum("cnt").over(wx), F.lit(0)))
    # then suffix over y within each x column (strictly greater y of ax)
    wy = W.partitionBy("gx").orderBy(F.col("gy").desc()).rowsBetween(
        W.unboundedPreceding, -1
    )
    both = a.withColumn(
        "gt2d", F.coalesce(F.sum("ax").over(wy), F.lit(0))
    )
    # mirrored: strictly greater x, strictly LESSER y
    wyl = W.partitionBy("gx").orderBy(F.col("gy").asc()).rowsBetween(
        W.unboundedPreceding, -1
    )
    both = both.withColumn("lt2d", F.coalesce(F.sum("ax").over(wyl), F.lit(0)))
    cd = both.agg(
        F.sum(F.col("cnt").cast(d38) * F.col("gt2d").cast(d38)).alias("c"),
        F.sum(F.col("cnt").cast(d38) * F.col("lt2d").cast(d38)).alias("d"),
        F.sum("cnt").cast("long").alias("n"),
    )
    tx = (
        dense.groupBy("gx")
        .agg(F.sum("cnt").cast(d38).alias("m"))
        .agg(F.sum(F.col("m") * (F.col("m") - 1) / 2).alias("ties_x"))
    )
    ty = (
        dense.groupBy("gy")
        .agg(F.sum("cnt").cast(d38).alias("m"))
        .agg(F.sum(F.col("m") * (F.col("m") - 1) / 2).alias("ties_y"))
    )
    out = cd.crossJoin(F.broadcast(tx)).crossJoin(F.broadcast(ty))
    nd = F.col("n").cast(d38)
    n0 = (nd * (nd - 1) / 2).cast("double")
    denom = F.sqrt(
        (n0 - F.col("ties_x").cast("double")) * (n0 - F.col("ties_y").cast("double"))
    )
    s = (F.col("c") - F.col("d")).cast("double")
    return out.select(
        "n",
        F.col("c").cast("double").alias("concordant"),
        F.col("d").cast("double").alias("discordant"),
        s.alias("s_stat"),
        F.col("ties_x").cast("double").alias("ties_x"),
        F.col("ties_y").cast("double").alias("ties_y"),
        F.when(denom > 0, s / denom).alias("tau_b"),
    )


def permutation_test_hash(
    df: DataFrame,
    key_col: str,
    value_col: str,
    group_col: str,
    n_perms: int = 64,
) -> DataFrame:
    """Permutation test for a difference in group means, with
    DETERMINISTIC hash permutations → one row
    (n, stat_obs, b_valid, cnt_ge, p_value).

    A classical permutation test shuffles labels; a distributed,
    replayable engine cannot shuffle (no stable row order, no shared
    RNG), so permutation b assigns each row the label
    parity(md5(key:b)) — i.i.d. fair coin labels, reproducible on any
    engine that computes md5 (the oracle replays them hash-for-hash).
    stat = |mean₀ − mean₁|; p = (1 + #{b: stat_b ≥ stat_obs})
    / (1 + B_valid) (add-one: the observed labeling counts as one
    permutation). Permutations where a side is empty are excluded from
    B_valid (degenerate, stat undefined — NULL never compares).

    Scale: the explode is B× map work but the shuffle is partially
    aggregated to 2(B+1) cells regardless of row count — B is the
    cost/resolution dial. Sums are exact decimal(38,0); each stat is
    a fixed IEEE tree; comparisons are on identical doubles."""
    d38 = "decimal(38,0)"
    base = df.select(
        F.col(key_col).cast("string").alias("k"),
        F.col(value_col).cast("long").alias("v"),
        F.col(group_col).cast("long").alias("gobs"),
    ).where(F.col("v").isNotNull() & F.col("gobs").isNotNull())
    bs = F.explode(
        F.array(*[F.lit(b) for b in range(-1, n_perms)])
    ).alias("b")
    lab = F.when(
        F.col("b") == -1, F.col("gobs")
    ).otherwise(
        F.conv(F.substring(F.md5(F.concat_ws(":", F.col("k"), F.col("b"))), 1, 1), 16, 10)
        .cast("long")
        % 2
    )
    cells = (
        base.select("k", "v", "gobs", bs)
        .withColumn("g", lab)
        .groupBy("b", "g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("v").cast(d38)).alias("s"),
        )
    )
    wide = cells.groupBy("b").agg(
        F.max(F.when(F.col("g") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("g") == 0, F.col("s"))).alias("s0"),
        F.max(F.when(F.col("g") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("g") == 1, F.col("s"))).alias("s1"),
    )
    stat = F.abs(
        F.col("s0").cast("double") / F.col("n0").cast("double")
        - F.col("s1").cast("double") / F.col("n1").cast("double")
    )
    stats = wide.select(
        "b",
        F.when(
            F.col("n0").isNotNull()
            & F.col("n1").isNotNull()
            & (F.col("n0") > 0)
            & (F.col("n1") > 0),
            stat,
        ).alias("stat"),
    )
    obs = stats.where(F.col("b") == -1).select(
        F.col("stat").alias("stat_obs")
    )
    perms = stats.where(F.col("b") >= 0)
    n_row = base.agg(F.count(F.lit(1)).cast("long").alias("n"))
    agg = perms.crossJoin(F.broadcast(obs)).agg(
        F.sum(F.when(F.col("stat").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("b_valid"),
        F.sum(
            F.when(
                F.col("stat_obs").isNotNull() & (F.col("stat") >= F.col("stat_obs")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("cnt_ge"),
        F.max("stat_obs").alias("stat_obs"),
    )
    # degenerate OBSERVED labeling (a group empty) ⇒ stat_obs NULL ⇒ the
    # test is undefined: emit NULL p, not a spuriously significant 1/(B+1)
    return n_row.crossJoin(F.broadcast(agg)).select(
        "n",
        "stat_obs",
        "b_valid",
        "cnt_ge",
        F.when(
            (F.col("b_valid") > 0) & F.col("stat_obs").isNotNull(),
            (F.col("cnt_ge") + 1).cast("double")
            / (F.col("b_valid") + 1).cast("double"),
        ).alias("p_value"),
    )


def runs_test(df: DataFrame, order_col: str, value_col: str) -> DataFrame:
    """Wald-Wolfowitz runs test for randomness of a sequence around its
    median → one row (n, n_above, n_below, runs, z).

    Signs come from the doubled exact interpolated median (the
    brown_forsythe convention: 2v > med2 ⇒ above, ties count below —
    integer compares only); runs = 1 + Σ[sign ≠ lag(sign)] in order;
    z = (R − μ)/sqrt(var) with μ = 1 + 2ab/n,
    var = 2ab(2ab − n)/(n²(n−1)) — one fixed IEEE tree, NULL when a
    side is empty or var ≤ 0.

    Intended for LATTICE-sized series (daily/hourly aggregates): the
    one ordered window runs over the aggregate frame, which grows with
    TIME, not volume. The row-scale input should already be folded by
    the caller."""
    d = df.select(
        F.col(order_col).alias("t"), F.col(value_col).cast("long").alias("v")
    ).where(F.col("v").isNotNull())
    med = d.agg(
        F.floor(2 * F.percentile("v", F.lit(0.5)) + F.lit(0.5))
        .cast("long")
        .alias("med2")
    )
    signed = d.crossJoin(F.broadcast(med)).withColumn(
        "sgn", (2 * F.col("v") > F.col("med2")).cast("int")
    )
    w = W.orderBy("t")
    flips = signed.withColumn("prev", F.lag("sgn").over(w)).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("sgn").cast("long").alias("n_above"),
        F.sum(
            F.when(
                F.col("prev").isNotNull() & (F.col("sgn") != F.col("prev")), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("flips"),
    )
    a = F.col("n_above").cast("double")
    bl = (F.col("n") - F.col("n_above")).cast("double")
    nd = F.col("n").cast("double")
    mu = F.lit(1.0) + F.lit(2.0) * a * bl / nd
    var = (
        F.lit(2.0)
        * a
        * bl
        * (F.lit(2.0) * a * bl - nd)
        / (nd * nd * (nd - F.lit(1.0)))
    )
    runs = (F.col("flips") + 1).alias("runs")
    return flips.select(
        "n",
        "n_above",
        (F.col("n") - F.col("n_above")).alias("n_below"),
        runs,
        F.when(
            (F.col("n_above") > 0) & (F.col("n") > F.col("n_above")) & (var > 0),
            ((F.col("flips") + 1).cast("double") - mu) / F.sqrt(var),
        ).alias("z"),
    )


def friedman_test(
    df: DataFrame, block_col: str, group_col: str, value_col: str
) -> DataFrame:
    """Friedman rank test (repeated measures across k groups over n
    blocks) → one row (k, n_blocks, sum_rank2_sq, chi2).

    Within each COMPLETE block (all k groups present exactly once),
    values take tie-averaged ranks kept integer by DOUBLING:
    r2 = 2·(rank−1) + ties + 1. Per-group doubled rank sums R2_j are
    exact BIGINT, Σ R2_j² exact decimal, and
    χ² = 3·Σ R2_j²/(n·k·(k+1)) − 3·n·(k+1) (the untied Friedman
    statistic with averaged ties) spends one fixed IEEE tree.
    Incomplete blocks are dropped (the classical test requires a full
    design); k from the group domain.

    Scale: ranks run in k-row windows partitioned by BLOCK — intended
    for lattice blocks (days, stores), so the ranked frame is
    aggregate-sized; the row-scale stage is whatever group-by built
    the (block, group, value) cells upstream."""
    d38 = "decimal(38,0)"
    cells = df.select(
        F.col(block_col).alias("t"),
        F.col(group_col).alias("g"),
        F.col(value_col).cast("long").alias("v"),
    ).where(F.col("v").isNotNull())
    k_row = cells.agg(F.countDistinct("g").cast("long").alias("k"))
    complete = (
        cells.groupBy("t")
        .agg(
            F.count(F.lit(1)).cast("long").alias("c"),
            F.countDistinct("g").cast("long").alias("dg"),
        )
        .crossJoin(F.broadcast(k_row))
        .where((F.col("c") == F.col("k")) & (F.col("dg") == F.col("k")))
        .select("t")
    )
    kept = cells.join(complete, "t")
    wr = W.partitionBy("t").orderBy("v")
    wt = W.partitionBy("t", "v")
    ranked = kept.withColumn(
        "r2",
        2 * (F.rank().over(wr) - 1) + F.count(F.lit(1)).over(wt) + 1,
    )
    per_group = ranked.groupBy("g").agg(
        F.sum("r2").cast("long").alias("r2_sum"),
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
    )
    agg = per_group.agg(
        F.max("n_blocks").alias("n_blocks"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.col("r2_sum").cast(d38) * F.col("r2_sum").cast(d38)).alias(
            "sum_rank2_sq"
        ),
    )
    nd = F.col("n_blocks").cast("double")
    kd = F.col("k").cast("double")
    chi2 = (
        F.lit(3.0) * F.col("sum_rank2_sq").cast("double") / (nd * kd * (kd + 1.0))
        - F.lit(3.0) * nd * (kd + 1.0)
    )
    return agg.select(
        "k",
        "n_blocks",
        F.col("sum_rank2_sq").cast("double").alias("sum_rank2_sq"),
        F.when((F.col("n_blocks") > 0) & (F.col("k") > 1), chi2).alias("chi2"),
    )
