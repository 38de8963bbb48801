"""Concentration diagnostics: Gini coefficient and Benford conformity.

Two data-shape monitors a large pipeline runs routinely:

- ``gini``: how concentrated is a quantity across its holders (spend
  across customers, tokens across documents, traffic across domains)?
  The complement of the Simpson/TV monitors: those watch categorical
  mixtures, Gini watches a numeric distribution's inequality.
- ``benford_deviation``: first-significant-digit distribution vs
  Benford's law — the classic bulk-numeric fraud/corruption smoke test
  (fabricated or unit-mangled numbers drift from it).

Exactness: Gini uses the rank form G = Σ(2r − n − 1)·x / (n·Σx). For
tied values the coefficient sum is INVARIANT to how ranks are assigned
within the tie block (coefficients permute across equal x), so no
cross-engine tie-break contract is needed — integer sums in
decimal(38,0), ONE final division, hash-exact. Benford extracts the
first digit from the integer's DECIMAL STRING (no log10, whose last-ulp
behavior is engine-specific) and compares against micro-snapped literal
Benford masses with the same all-integer TV numerator trick as
llm/corpus.py::tv_drift.

Scale: Gini is one per-group rank window over the holders table —
row-scale sort, but "holders" is already an aggregate (per-customer,
per-domain); for unbounded groups the stratified_split two-level rank
decomposition applies verbatim. Benford is ONE map-side-combined
digit aggregation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["gini", "benford_deviation", "hhi", "BENFORD_MICROS"]

#: P(first digit = d) = log10(1 + 1/d), snapped to micros once, here —
#: runtime never evaluates a logarithm.
BENFORD_MICROS = (
    301030,  # 1
    176091,  # 2
    124939,  # 3
    96910,   # 4
    79181,   # 5
    66947,   # 6
    57992,   # 7
    51153,   # 8
    45757,   # 9
)


def gini(
    df: DataFrame, group_cols: Sequence[str], value_col: str
) -> DataFrame:
    """Per-group Gini coefficient over non-negative integer values:
    (groups…, n, total, gini). 0 = perfectly even, →1 = one holder has
    everything. Groups with n < 2 or zero total yield NULL (no
    inequality is defined). NULL and negative values are excluded
    (Lorenz algebra requires x ≥ 0)."""
    groups = list(group_cols)
    v = F.col(value_col).cast("long")
    base = df.where(v.isNotNull() & (v >= 0)).select(
        *groups, v.alias("x")
    )
    r = F.row_number().over(W.partitionBy(*groups).orderBy("x"))
    ranked = base.withColumn("r", r)
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = ranked.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("total"),
        F.sum(d(2 * F.col("r")) * d(F.col("x"))).alias("rx2"),
    )
    num = F.col("rx2") - d(F.col("n") + 1) * d(F.col("total"))
    g = F.when(
        (F.col("n") >= 2) & (F.col("total") > 0),
        num.cast("double") / (d(F.col("n")) * d(F.col("total"))).cast("double"),
    )
    return agg.select(*groups, "n", "total", g.alias("gini"))


def benford_deviation(
    df: DataFrame, group_cols: Sequence[str], value_col: str
) -> DataFrame:
    """Per-group total-variation distance between the first-digit
    distribution of positive integer ``value_col`` and Benford's law:
    (groups…, n, benford_tv). First digit comes from the decimal string
    (engine-portable; no log10). TV numerator is all-integer:
    Σ_d |c_d·1e6 − p_d_micros·n| / (2·n·1e6) — digits with zero count
    still contribute, recovered from the constant digit table, so the
    statistic is exact with ONE division."""
    groups = list(group_cols)
    v = F.col(value_col).cast("long")
    digit = F.substring(v.cast("string"), 1, 1).cast("int")
    base = df.where(v.isNotNull() & (v > 0)).select(
        *groups, digit.alias("digit")
    )
    cells = base.groupBy(*groups, "digit").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    totals = cells.groupBy(*groups).agg(F.sum("c").cast("long").alias("n"))
    # per-present-digit |c·1e6 − p·n|; absent digits contribute p·n,
    # recovered as (1e6 − Σ_present p)·n
    p_map = F.create_map(
        *[x for dgt, p in enumerate(BENFORD_MICROS, start=1) for x in (F.lit(dgt), F.lit(p))]
    )
    term = F.abs(
        F.col("c") * F.lit(1_000_000) - p_map[F.col("digit")] * F.col("n")
    )
    joined = cells.join(F.broadcast(totals), groups)
    agg = joined.groupBy(*groups, "n").agg(
        F.sum(term).alias("present_num"),
        F.sum(p_map[F.col("digit")]).cast("long").alias("p_present"),
    )
    tv_num = F.col("present_num") + (
        F.lit(1_000_000) - F.col("p_present")
    ) * F.col("n")
    return agg.select(
        *groups,
        "n",
        (
            tv_num.cast("double")
            / (F.lit(2) * F.col("n") * F.lit(1_000_000)).cast("double")
        ).alias("benford_tv"),
    )


def hhi(df: DataFrame, group_cols: Sequence[str], weight_col: str) -> DataFrame:
    """Herfindahl-Hirschman concentration per group:
    (group..., n_holders, total_weight, hhi) with
    HHI = Σ share_i² = Σ w_i² / (Σ w_i)² over the group's holder rows —
    the antitrust-standard market-concentration index (1 = monopoly,
    1/k = k equal holders). Input is the already-aggregated holder
    frame (e.g. per-(nation, supplier) revenue cents).

    Exactness: Σw and Σw² are exact decimal(38,0) sums of the integer
    weight; the denominator squares in DOUBLE on both engines so the
    oracle's rounding path matches (CAST(sum) AS DOUBLE squared, not
    CAST(sum*sum)). One map-side-combined group-by, no windows."""
    d38 = "decimal(38,0)"
    gcols = list(group_cols)
    w = F.col(weight_col).cast("long")
    return (
        df.select(*gcols, w.alias("w"))
        .groupBy(*gcols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_holders"),
            F.sum("w").cast("long").alias("total_weight"),
            F.when(F.sum("w") == 0, F.lit(None).cast("double"))
            .otherwise(
                F.sum(F.col("w").cast(d38) * F.col("w").cast(d38)).cast("double")
                / (F.sum("w").cast("double") * F.sum("w").cast("double"))
            )
            .alias("hhi"),
        )
    )
