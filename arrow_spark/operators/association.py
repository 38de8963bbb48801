"""Association-rule mining: pairwise support / confidence / lift.

Market-basket analysis — the classic co-occurrence miner ("parts bought
together"), and on a training corpus the same algebra surfaces term
co-occurrence affinity. This is the frequent-itemset primitive at
k = 2, which is what production jobs actually run at scale (higher-k
Apriori explodes combinatorially and is run on the filtered pair
output, not the raw corpus).

Relational shape: ONE within-basket self-join generates pairs — the
join key is the basket id, so cost is Σ_b |b|², bounded by basket size
(the lineitem-per-order shape: tens, not millions; for pathological
baskets cap upstream). Item counts are a broadcast-sized dimension.
No driver loops, no UDFs.

Exactness: support/confidence/lift are SINGLE IEEE divisions of exact
integer counts (lift = n·c_xy / (c_x·c_y) — one division, not three
chained ones), so every statistic is hash-exact. No min-support →
emit-all contract keeps the result deterministic without a ranking
step; callers threshold with ``min_pair_count``.

Reference anchor: the reference ships hash/count kernels but no miner;
its users (and Spark's own MLlib FPGrowth, which is RDD-based and
driver-heavy for this case) run exactly this pair algebra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["association_rules"]


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 1,
) -> DataFrame:
    """Mine unordered item pairs from (basket, item) rows:
    (item_x, item_y, n_x, n_y, n_xy, support, confidence_xy,
    confidence_yx, lift) with item_x < item_y.

    Counts are basket-level (duplicates within a basket collapse).
    support = n_xy/n_baskets; confidence_xy = P(y|x) = n_xy/n_x;
    lift = n·n_xy/(n_x·n_y) — >1 means genuinely associated, <1
    substitutes. Pairs below ``min_pair_count`` baskets are dropped
    BEFORE the dimension joins (the volume knob)."""
    baskets = df.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("i")
    ).distinct()
    totals = baskets.agg(
        F.countDistinct("b").cast("long").alias("n_baskets")
    )
    items = baskets.groupBy("i").agg(F.count(F.lit(1)).cast("long").alias("n_i"))
    a = baskets.select("b", F.col("i").alias("item_x"))
    bb = baskets.select("b", F.col("i").alias("item_y"))
    pairs = (
        a.join(bb, "b")
        .where(F.col("item_x") < F.col("item_y"))
        .groupBy("item_x", "item_y")
        .agg(F.count(F.lit(1)).cast("long").alias("n_xy"))
        .where(F.col("n_xy") >= min_pair_count)
    )
    nx = items.select(F.col("i").alias("item_x"), F.col("n_i").alias("n_x"))
    ny = items.select(F.col("i").alias("item_y"), F.col("n_i").alias("n_y"))
    out = (
        pairs.join(F.broadcast(nx), "item_x")
        .join(F.broadcast(ny), "item_y")
        .crossJoin(F.broadcast(totals))
    )
    n = F.col("n_baskets")
    return out.select(
        "item_x",
        "item_y",
        "n_x",
        "n_y",
        "n_xy",
        (F.col("n_xy").cast("double") / n.cast("double")).alias("support"),
        (F.col("n_xy").cast("double") / F.col("n_x").cast("double")).alias(
            "confidence_xy"
        ),
        (F.col("n_xy").cast("double") / F.col("n_y").cast("double")).alias(
            "confidence_yx"
        ),
        (
            (n * F.col("n_xy")).cast("double")
            / (F.col("n_x") * F.col("n_y")).cast("double")
        ).alias("lift"),
    )
