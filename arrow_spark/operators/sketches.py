"""Distributed Count-Min sketch as a DataFrame (mergeable relational
sketch representation).

Arrow ships fixed sketch kernels (tdigest aggregate_tdigest.cc,
approximate_median); Spark exposes HLL/approx-quantile natively (covered
by the approx_sketches query). This adds the frequency-sketch family as
a CUSTOM operator in the engine's own terms: the sketch IS a DataFrame
of (row, bucket, cnt) cells, so it shuffles, persists, and merges with
plain relational ops — no opaque binary blobs.

Scale: the build's shuffle is bounded by depth × width cells per
partition after map-side combine, regardless of input row count or
distinct-key cardinality — that bound is the reason to use a CMS over an
exact groupBy count at 100 TB. Merging two sketches (e.g. per-day builds
into a month) is a union + sum groupBy over ≤ depth × width rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def _cells(col: Column, width: int, depth: int) -> Column:
    """depth (row, bucket) pairs per value; row i uses xxhash64 seeded i
    (independent-enough hash family, fully deterministic)."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"),
                    F.pmod(F.xxhash64(col, F.lit(i)), F.lit(width)).alias("bucket"),
                )
                for i in range(depth)
            ]
        )
    )


def count_min_build(
    df: DataFrame, col: str, width: int = 1024, depth: int = 4
) -> DataFrame:
    """Build a CMS over df[col] → DataFrame(row, bucket, cnt)."""
    return (
        df.select(_cells(F.col(col), width, depth).alias("c"))
        .select("c.row", "c.bucket")
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def count_min_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two same-shape sketches: cellwise sum. Exact: building on
    the union of inputs ≡ merging per-input builds (tested)."""
    return (
        a.unionByName(b).groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))
    )


def count_min_estimate(
    sketch: DataFrame, items: DataFrame, col: str, width: int = 1024, depth: int = 4
) -> DataFrame:
    """Estimate the frequency of each distinct items[col]:
    min over depth rows of the addressed cells. Guarantees
    estimate ≥ true count (never undercounts); overcount is bounded by
    colliding mass ~ N/width per row, driven down by the min.
    """
    probes = (
        items.select(F.col(col).alias("item")).distinct()
        .select("item", _cells(F.col("item"), width, depth).alias("c"))
        .select("item", "c.row", "c.bucket")
    )
    joined = probes.join(sketch, ["row", "bucket"], "left").select(
        "item", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    return joined.groupBy("item").agg(F.min("cnt").alias("est"))


# -- HyperLogLog (Datasketches HLL, Spark-native binary sketches) -----------


def hll_build(
    df: DataFrame, key_cols, value_col: str, lgk: int = 12
) -> DataFrame:
    """Mergeable distinct-count sketch per key group: one Datasketches
    HLL binary per group (Spark's hll_sketch_agg — the same sketch
    family the reference ecosystem exposes via approx_count_distinct).

    Scale: a partial sketch per partition merges map-side, so the
    shuffle carries one ~2^lgk-byte blob per (partition, group) —
    independent of row count and of distinct-value cardinality. Persist
    the per-day sketch frame and answer month/year distincts by
    hll_merge, never rescanning the raw data (the cascade_rollup
    pattern, but for COUNT DISTINCT, which plain partial sums cannot
    cascade).
    """
    keys = list(key_cols)
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("hll")
    )


def hll_merge(sketches: DataFrame, key_cols) -> DataFrame:
    """Merge sketch frames to a coarser key (union-of-sketches ≡ sketch
    of union — the mergeability law the unit tests assert)."""
    keys = list(key_cols)
    return sketches.groupBy(*keys).agg(F.hll_union_agg("hll").alias("hll"))


def hll_estimate(sketches: DataFrame, out_col: str = "approx_distinct") -> DataFrame:
    """Attach the distinct-count estimate for each group's sketch."""
    return sketches.withColumn(out_col, F.hll_sketch_estimate("hll"))


# -- fixed-width histogram (mergeable quantile sketch) -----------------------


def histogram_build(
    df: DataFrame, value_col: str, keys=(), cents_per_bucket: int = 5000
) -> DataFrame:
    """Mergeable quantile sketch for 2-decimal money columns: bucket =
    whole-cent value div bucket width — pure integer arithmetic, so the
    sketch is bit-deterministic in any engine (unlike log-bucketing,
    whose libm boundaries can differ). Quantile error ≤ one bucket
    width; shuffle carries ≤ (keys × buckets) cells after map-side
    combine, regardless of row count — the same scale contract as the
    Count-Min and HLL families above."""
    keys = list(keys)
    cents = F.round(F.col(value_col) * 100, 0).cast("long")
    bucket = F.floor(cents / F.lit(cents_per_bucket)).alias("bucket")
    return df.groupBy(*keys, bucket).agg(F.count(F.lit(1)).alias("n"))


def histogram_merge(hists: DataFrame, keys=()) -> DataFrame:
    """Merge sketches to coarser keys: union + sum (exact)."""
    keys = list(keys)
    return hists.groupBy(*keys, "bucket").agg(F.sum("n").alias("n"))


def histogram_quantile(
    hist: DataFrame, q: float, keys=(), cents_per_bucket: int = 5000, out_col: str = "q_ub"
) -> DataFrame:
    """Quantile upper bound per key group: the smallest bucket whose
    cumulative count reaches q·total, returned as the bucket's upper
    value bound — deterministic integer arithmetic end to end."""
    keys = list(keys)
    w = (W.partitionBy(*keys) if keys else W.partitionBy()).orderBy("bucket")
    cum = F.sum("n").over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
    tot = F.sum("n").over(
        (W.partitionBy(*keys) if keys else W.partitionBy()).rowsBetween(
            W.unboundedPreceding, W.unboundedFollowing
        )
    )
    flagged = hist.select(*keys, "bucket", cum.alias("__cum__"), tot.alias("__tot__"))
    hit = flagged.where(F.col("__cum__") * F.lit(1.0) >= F.lit(q) * F.col("__tot__"))
    gb = hit.groupBy(*keys) if keys else hit.groupBy()
    return gb.agg(
        (((F.min("bucket") + 1) * cents_per_bucket) / F.lit(100.0)).alias(out_col)
    )
