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

from arrow_spark.functions.portable_hash import portable_hash64


def _seeded_hash(col: Column, seed: int, hash_family: str) -> Column:
    """Seeded non-negative hash under the chosen family.

    'xxhash64' (default): fastest, JVM-native — but no DuckDB twin, so
    results get rows-only verification. 'portable': md5-derived 60-bit
    (functions/portable_hash.py) — bit-identical in DuckDB, so the
    sketch becomes exactly SQL-replayable; the value is cast to string
    first so both engines hash the same bytes.
    """
    if hash_family == "xxhash64":
        return F.xxhash64(col, F.lit(seed))
    if hash_family == "portable":
        return portable_hash64(col.cast("string"), seed)
    raise ValueError(f"unknown hash_family {hash_family!r}")


def _hash_slots(col: Column, n_slots: int, m: int, hash_family: str) -> list[Column]:
    """n_slots independent bucket positions in [0, m) per value.

    xxhash64: one seeded hash per slot (each is a single JVM op).
    portable: ONE md5 per value, sliced into non-overlapping hex windows
    — measured ~3× cheaper than per-slot md5 calls at sf0.1 (Catalyst's
    subexpression elimination evaluates the shared md5 once), and each
    slice is still a verbatim DuckDB expression:
    ('0x' || substr(md5('0:' || x), 1 + i*w, w))::BIGINT % m.
    Slot width w = 32/n_slots hex chars (≥ 24 bits for n_slots ≤ 5, so
    modulo bias against sketch-sized m is negligible); more than 8 slots
    falls back to per-seed hashes.
    """
    if hash_family == "portable" and n_slots <= 8:
        w = min(32 // n_slots, 15)
        h = F.md5(F.concat(F.lit("0:"), col.cast("string")))
        return [
            F.pmod(
                F.conv(F.substring(h, 1 + i * w, w), 16, 10).cast("long"), F.lit(m)
            )
            for i in range(n_slots)
        ]
    return [
        F.pmod(_seeded_hash(col, i, hash_family), F.lit(m)) for i in range(n_slots)
    ]


def _cells(col: Column, width: int, depth: int, hash_family: str = "xxhash64") -> Column:
    """depth (row, bucket) pairs per value; row i uses hash slot i
    (independent-enough hash family, fully deterministic)."""
    slots = _hash_slots(col, depth, width, hash_family)
    return F.explode(
        F.array(
            *[
                F.struct(F.lit(i).alias("row"), slots[i].alias("bucket"))
                for i in range(depth)
            ]
        )
    )


def count_min_build(
    df: DataFrame, col: str, width: int = 1024, depth: int = 4,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Build a CMS over df[col] → DataFrame(row, bucket, cnt)."""
    return (
        df.select(_cells(F.col(col), width, depth, hash_family).alias("c"))
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
    sketch: DataFrame, items: DataFrame, col: str, width: int = 1024, depth: int = 4,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Estimate the frequency of each distinct items[col]:
    min over depth rows of the addressed cells. Guarantees
    estimate ≥ true count (never undercounts); overcount is bounded by
    colliding mass ~ N/width per row, driven down by the min.
    """
    probes = (
        items.select(F.col(col).alias("item")).distinct()
        .select("item", _cells(F.col("item"), width, depth, hash_family).alias("c"))
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


# -- relational HyperLogLog (registers as rows, hash-exact in any engine) ----


def hll_alpha(m: int) -> float:
    """Flajolet et al. bias-correction constant for m registers."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_rel_build(
    df: DataFrame,
    col: str,
    keys=(),
    p: int = 9,
    max_rank: int = 40,
    hash_family: str = "portable",
) -> DataFrame:
    """HyperLogLog registers as a relational frame — (keys…, bucket,
    rank) rows, one per NON-ZERO register (absent bucket ≡ register 0).

    Unlike hll_build's opaque Datasketches binary, every piece here is
    engine-portable integer arithmetic: bucket = top p bits of the
    60-bit hash, rank = 1 + leading-zero count of the remaining w=60-p
    bits (capped at ``max_rank`` so the 2^(max_rank-rank) harmonic terms
    stay exact BIGINTs). The leading-zero count is length-of-binary-
    string arithmetic (bin(x) exists in Spark and DuckDB with identical
    minimal-form semantics) — no float log2 whose boundary rounding
    could disagree across engines.

    Scale contract is the same as the sketch family above: map-side max
    per (group, bucket) bounds the shuffle at groups × 2^p rows
    regardless of input cardinality, and coarser rollups merge by
    another max groupBy without rescanning data.
    """
    keys = list(keys)
    w = 60 - p
    h = _seeded_hash(F.col(col), 0, hash_family)
    bucket = F.shiftright(h, w).alias("bucket")
    rest = h.bitwiseAND(F.lit((1 << w) - 1))
    rank = F.least(
        F.when(rest == 0, F.lit(w + 1)).otherwise(
            F.lit(w) - F.length(F.bin(rest)) + 1
        ),
        F.lit(max_rank),
    ).alias("rank")
    return (
        df.select(*[F.col(c) for c in keys], bucket, rank)
        .groupBy(*keys, "bucket")
        .agg(F.max("rank").alias("rank"))
    )


def hll_rel_merge(regs: DataFrame, keys=()) -> DataFrame:
    """Merge register frames to coarser keys: positionwise max (union of
    sketches ≡ sketch of union, exactly as for the binary form)."""
    keys = list(keys)
    return regs.groupBy(*keys, "bucket").agg(F.max("rank").alias("rank"))


def hll_rel_estimate(
    regs: DataFrame, keys=(), p: int = 9, max_rank: int = 40
) -> DataFrame:
    """Distinct-count estimate per key group from a register frame.

    The harmonic mean is computed as ONE integer sum — S = Σ 2^(R-rank)
    over present registers + V·2^R for the V zero registers (R =
    max_rank) — so it is bit-exact and order-independent in any engine;
    the only float ops are the final α·m²·2^R / S division and the
    small-range linear-counting branch m·ln(m/V), both single
    expressions an oracle replays verbatim. Output rounded to 4
    decimals.
    """
    keys = list(keys)
    m = 1 << p
    alpha = hll_alpha(m)
    gb = regs.groupBy(*keys) if keys else regs.groupBy()
    agg = gb.agg(
        F.count(F.lit(1)).alias("__present__"),
        F.sum(
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                (F.lit(max_rank) - F.col("rank")).cast("int"),
            )
        ).alias("__s_present__"),
    )
    v = F.lit(m) - F.col("__present__")
    s_int = F.col("__s_present__") + v * F.lit(1 << max_rank)
    raw = F.lit(alpha) * F.lit(float(m * m * (1 << max_rank))) / s_int.cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *keys,
        v.alias("zero_registers"),
        s_int.alias("harmonic_scaled"),
        (F.floor(est * 1e4 + F.lit(0.5)) / 1e4).alias("approx_distinct"),
    )


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


def _bloom_positions(
    col: Column, m_bits: int, k: int, hash_family: str = "xxhash64"
) -> Column:
    """k bit positions per value, mod m (same deterministic hash-slot
    scheme as the CMS cells — one md5 sliced k ways on the portable
    path)."""
    return F.array(*_hash_slots(col, k, m_bits, hash_family))


def bloom_build(
    df: DataFrame,
    col: str,
    keys=(),
    m_bits: int = 4096,
    k: int = 4,
    hash_family: str = "xxhash64",
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
    pos = F.explode(_bloom_positions(F.col(col), m_bits, k, hash_family)).alias("pos")
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


def bloom_might_contain(
    words_col: Column, value: Column, m_bits: int, k: int,
    hash_family: str = "xxhash64",
) -> Column:
    """Membership probe: all k bits set ⇒ maybe present (false positives
    tunable via m/k); any bit clear ⇒ definitely absent. Pure codegen
    expression — usable as a scan filter guard before an expensive join."""
    return F.forall(
        _bloom_positions(value, m_bits, k, hash_family),
        lambda p: F.getbit(
            F.element_at(words_col, (p / 64).cast("int") + 1), (p % 64).cast("int")
        )
        == 1,
    )


# -- Join-cardinality estimation from Count-Min sketches --------------------


def cms_join_cardinality(
    a: DataFrame,
    col_a: str,
    b: DataFrame,
    col_b: str,
    width: int = 1024,
    depth: int = 4,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Estimate |A ⋈ B| on an equi-key WITHOUT running the join.

    |A ⋈ B| = Σ_v fA(v)·fB(v); each CMS row overestimates that inner
    product by non-negative collision mass, so the estimate is
    min-over-depth of the per-row dot products — never an undercount,
    expected overshoot ≈ |A|·|B|/width per row before the min. The
    planner use case at 100 TB: decide broadcast vs shuffle vs salting
    from two sketch scans (each one map-side-combined aggregation over
    width·depth cells) and a cell-aligned equi-join of two depth×width
    tables — instead of materializing a join that may be quadratic.

    Reference anchor: join-size estimation is the textbook AMS/CMS
    application (Alon-Matias-Szegedy; Cormode-Muthukrishnan §4) the
    reference's sketch-less compute layer leaves to its callers.
    """
    sa = count_min_build(a, col_a, width, depth, hash_family)
    sb = count_min_build(b, col_b, width, depth, hash_family)
    dots = (
        sa.alias("sa")
        .join(sb.alias("sb"), ["row", "bucket"])
        .groupBy("row")
        .agg(F.sum(F.col("sa.cnt") * F.col("sb.cnt")).alias("dot"))
    )
    # A depth row whose aligned (row,bucket) cells are all empty has dot
    # product 0 but drops out of the inner join entirely — min() must
    # still range over it (disjoint key sets estimate 0, not NULL). A
    # static depth-row frame left-joined to the surviving dots keeps the
    # bound exact; it is depth rows, literally driver-sized.
    rows = a.sparkSession.createDataFrame(
        [(i,) for i in range(depth)], "row int"
    )
    full = rows.join(dots, "row", "left").select(
        F.coalesce(F.col("dot"), F.lit(0)).alias("dot")
    )
    return full.agg(F.min("dot").cast("long").alias("join_size_est"))


def heavy_hitters(df: DataFrame, item_col: str, k: int) -> DataFrame:
    """EXACT φ-heavy hitters (frequency > N/k) by the two-pass
    candidate-then-recount scheme — the distributed pattern that makes
    "top items by share" safe at any scale without a global sort.

    Pass 1 (candidates): count items per PHYSICAL partition and keep
    those with per-partition share > 1/k. Pigeonhole guarantees no
    miss: freq(x) > N/k = Σ_p N_p/k forces freq_p(x) > N_p/k in at
    least one partition, so every true heavy hitter is a candidate.
    Partitioning is nondeterministic — the CANDIDATE set varies run to
    run — but pass 2 recounts candidates exactly and applies the strict
    global threshold, so the RESULT is deterministic (false candidates
    are filtered, true hitters can't be missed). This is the relational
    twin of per-partition Misra-Gries + exact verification, with no UDF
    anywhere.

    Pass 2 shuffles only the candidate-filtered rows (broadcast
    semi-join); candidate volume is bounded by k per partition — at
    1000 executors and k=100 that is ≤ 100k strings, KBs.

    All thresholds are integer cross-multiplications (c·k > n) — no
    division until the final share column. Returns (item, cnt, share),
    share = cnt/N in one IEEE division.

    Reference anchor: the reference ships value_counts / dictionary
    kernels (cpp/src/arrow/compute/kernels/vector_hash.cc) but no
    share-threshold mining; its users run exactly this two-pass shape.
    """
    item = F.col(item_col)
    cells = df.groupBy(
        F.spark_partition_id().alias("__p__"), item.alias("item")
    ).agg(F.count(F.lit(1)).alias("c"))
    ptot = cells.groupBy("__p__").agg(F.sum("c").alias("np"))
    cand = (
        cells.join(ptot, "__p__")
        .where(F.col("c") * k > F.col("np"))
        .select("item")
        .distinct()
    )
    exact = (
        df.select(item.alias("item"))
        .join(F.broadcast(cand), "item", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    total = df.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        exact.crossJoin(F.broadcast(total))
        .where(F.col("cnt") * k > F.col("n"))
        .select(
            "item",
            "cnt",
            (F.col("cnt").cast("double") / F.col("n").cast("double")).alias(
                "share"
            ),
        )
    )
