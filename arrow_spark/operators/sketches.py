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


# -- Bloom filter ------------------------------------------------------------


def _bloom_positions(col: Column, m_bits: int, k: int) -> Column:
    """k bit positions per value: xxhash64 seeded 0..k-1, mod m (same
    deterministic hash family as the CMS cells)."""
    return F.array(
        *[F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m_bits)) for i in range(k)]
    )


def bloom_build(
    df: DataFrame,
    col: str,
    keys=(),
    m_bits: int = 4096,
    k: int = 4,
) -> DataFrame:
    """Per-group Bloom filter as a relational sketch: one row per group
    with a dense ``words`` array (m_bits/64 longs). The Arrow engine
    builds blooms inside the hash join (reference
    acero/bloom_filter.h — partitioned build, OR-merged); here the
    filter is a first-class frame you can persist, ship, and AND into
    any scan as a pre-join guard.

    Scale: the shuffle after map-side bit_or is ≤ groups × m_bits/64
    word cells regardless of input cardinality — the same bounded-state
    argument as the CMS. Word index is dense via sequence, so absent
    words materialize as 0 and merges stay positional.
    """
    n_words = (m_bits + 63) // 64
    pos = F.explode(_bloom_positions(F.col(col), m_bits, k)).alias("pos")
    cells = (
        df.select(*[F.col(c) for c in keys], pos)
        .select(
            *[F.col(c) for c in keys],
            (F.col("pos") / 64).cast("int").alias("word"),
            # the pyspark shiftleft wrapper takes only a literal shift;
            # call_function reaches the SQL form, which shifts by a column
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("pos") % 64).cast("int")
            ).alias("bit"),
        )
        .groupBy(*[F.col(c) for c in keys], F.col("word"))
        .agg(F.bit_or("bit").alias("bits"))
    )
    words = F.transform(
        F.sequence(F.lit(0), F.lit(n_words - 1)),
        # __wm__ is a MAP keyed by word index — element_at takes the key
        # itself here (the 1-based form is for arrays)
        lambda w: F.coalesce(
            F.element_at(F.col("__wm__"), w.cast("int")), F.lit(0).cast("long")
        ),
    )
    return (
        cells.groupBy(*[F.col(c) for c in keys])
        .agg(F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("__wm__"))
        .select(*[F.col(c) for c in keys], words.alias("words"))
    )


def bloom_merge(sketches: DataFrame, keys=()) -> DataFrame:
    """OR-merge bloom rows that share ``keys`` (e.g. per-day builds into
    one month filter): explode to word cells, bit_or, reassemble —
    bounded by groups × words rows like the build."""
    cells = sketches.select(
        *[F.col(c) for c in keys], F.posexplode("words").alias("word", "bits")
    ).groupBy(*[F.col(c) for c in keys], F.col("word")).agg(
        F.bit_or("bits").alias("bits")
    )
    return (
        cells.groupBy(*[F.col(c) for c in keys])
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("word", "bits"))),
                lambda s: s["bits"],
            ).alias("words")
        )
    )


def bloom_might_contain(words_col: Column, value: Column, m_bits: int, k: int) -> Column:
    """Membership probe: all k bits set ⇒ maybe present (false positives
    tunable via m/k); any bit clear ⇒ definitely absent. Pure codegen
    expression — usable as a scan filter guard before an expensive join."""
    return F.forall(
        _bloom_positions(value, m_bits, k),
        lambda p: F.getbit(
            F.element_at(words_col, (p / 64).cast("int") + 1), (p % 64).cast("int")
        )
        == 1,
    )
