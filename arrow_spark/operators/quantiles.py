"""Exact distributed order statistics: the k-th smallest value without
a global sort.

``approx_percentile`` (GK) is Spark's scale answer for quantiles, and
this repo ships it in the profiler and the binned quantile transform —
but audits, SLO contracts, and billing cuts need the EXACT percentile.
The naive exact form is a full sort (one reducer holds the order); this
operator instead runs the distributed order-statistics locate:

1. ONE aggregation: n, min, max.
2. ONE map-side-combined count per equi-width value bucket — the only
   row-scale shuffle, carrying ≤ n_buckets cells.
3. cumulative offsets over the TINY bucket frame locate, for each
   requested rank k, the single bucket containing it.
4. rows of ONLY the located buckets (a broadcast semi-join — expected
   n/n_buckets rows each) get an in-bucket value rank; offset + rank
   == k reads off the answer.

Determinism: ranks are integer (k = ⌈q·n⌉ via integer ceil on
per-mille quantiles — no float quantile definitions to diverge);
ordering is by value alone, which leaves row numbering within ties
nondeterministic but the k-th smallest VALUE exact and unique — the
contract order statistics actually carry. Bucket boundaries use double
arithmetic on (min, max), identical cross-engine.

Skew note: a bucket holding far more than n/n_buckets rows would make
the in-bucket rank window a near-global single-partition sort — at
100 TB a near-constant column is not pathological, it's Tuesday. The
ungrouped form therefore ESCALATES: a located bucket holding more than
``hot_bucket_factor`` × the expected share recurses the locate one
level into that bucket (fresh sub-range, fresh n_buckets), and a
bucket whose min == max (all ties) short-circuits to a literal — the
answer is that single value, no sort at all. The locate itself runs on
driver-side metadata (one 1-row stats collect + one ≤n_buckets-cell
count collect per level — the same bounded-metadata discipline as the
ANN codebook collects), which also turns the located-bucket semi-join
into a literal IN filter the scan can push down.

Reference anchor: the reference ships exact quantile/rank kernels for
in-memory arrays (cpp/src/arrow/compute/kernels/aggregate_quantile.cc)
— single-node only; this is the distributed form of the same contract.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["exact_quantiles", "exact_quantiles_grouped", "exact_quantiles_weighted"]

_OUT_SCHEMA = "q_mille int, rank bigint, value bigint"


def _rank_values(
    base: DataFrame,
    n: int,
    lo: int,
    hi: int,
    ranks: Sequence[int],
    n_buckets: int,
    hot_bucket_rows: int | None,
    hot_bucket_factor: int,
    depth: int,
) -> DataFrame:
    """(rank, value) for each 1-based rank in ``ranks`` (all ≤ n) over
    ``base`` (a single ``v: long`` column, NULL-free, with known count
    n and range [lo, hi]). The bucket-locate itself happens on
    driver-side metadata: ONE ≤n_buckets-cell count collect locates
    every rank's bucket, cold buckets get the in-bucket row_number
    readoff behind a literal IN filter, and a HOT bucket (cnt >
    threshold) recurses one level with a fresh sub-range. A bucket
    whose slo == shi is all ties — its answer is that value, emitted
    as a literal with no sort at any scale."""
    spark = base.sparkSession
    if lo == hi:
        return spark.createDataFrame(
            [(int(r), int(lo)) for r in ranks], "rank bigint, value bigint"
        )
    width = float(hi - lo) / float(n_buckets)
    bexpr = F.least(
        F.floor((F.col("v") - F.lit(int(lo))).cast("double") / F.lit(width)).cast(
            "int"
        ),
        F.lit(n_buckets - 1),
    )
    cnts = {
        r["b"]: r["cnt"]
        for r in base.select(bexpr.alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .collect()
    }
    bs = sorted(cnts)
    offsets, off = {}, 0
    for b in bs:
        offsets[b] = off
        off += cnts[b]
    per_bucket: dict[int, list[tuple[int, int]]] = {}
    i = 0
    for r in sorted(ranks):
        while offsets[bs[i]] + cnts[bs[i]] < r:
            i += 1
        per_bucket.setdefault(bs[i], []).append((r, r - offsets[bs[i]]))
    threshold = (
        hot_bucket_rows
        if hot_bucket_rows is not None
        else max(hot_bucket_factor * (n // n_buckets + 1), n_buckets)
    )
    cold = {
        b: lst for b, lst in per_bucket.items() if depth <= 0 or cnts[b] <= threshold
    }
    hot = {b: lst for b, lst in per_bucket.items() if b not in cold}
    parts: list[DataFrame] = []
    if cold:
        tgt = spark.createDataFrame(
            [(int(b), int(r), int(lr)) for b, lst in cold.items() for r, lr in lst],
            "tb int, rank bigint, lr int",
        )
        ranked = (
            base.withColumn("b", bexpr)
            .where(F.col("b").isin(*[int(b) for b in cold]))
            .withColumn("r", F.row_number().over(W.partitionBy("b").orderBy("v")))
        )
        parts.append(
            ranked.join(
                F.broadcast(tgt),
                (F.col("b") == F.col("tb")) & (F.col("r") == F.col("lr")),
            ).select("rank", F.col("v").cast("long").alias("value"))
        )
    if hot:
        sub_stats = {
            r["b"]: (r["slo"], r["shi"])
            for r in base.withColumn("b", bexpr)
            .where(F.col("b").isin(*[int(b) for b in hot]))
            .groupBy("b")
            .agg(F.min("v").alias("slo"), F.max("v").alias("shi"))
            .collect()
        }
        for b in sorted(hot):
            slo, shi = sub_stats[b]
            local = _rank_values(
                base.where(bexpr == int(b)),
                cnts[b],
                slo,
                shi,
                [lr for _, lr in hot[b]],
                n_buckets,
                hot_bucket_rows,
                hot_bucket_factor,
                depth - 1,
            )
            parts.append(
                local.select(
                    (F.col("rank") + F.lit(int(offsets[b]))).cast("long").alias(
                        "rank"
                    ),
                    "value",
                )
            )
    return reduce(DataFrame.unionByName, parts)


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    q_mille: Sequence[int],
    n_buckets: int = 256,
    hot_bucket_rows: int | None = None,
    hot_bucket_factor: int = 8,
    max_recursion: int = 1,
) -> DataFrame:
    """Exact per-mille quantiles of an integer column:
    (q_mille, rank, value) with rank = ⌈q·n/1000⌉ (nearest-rank,
    1-based) and value = the rank-th smallest. NULLs are excluded;
    empty input yields no rows.

    A located bucket holding more than ``hot_bucket_factor`` × the
    expected n/n_buckets share (or ``hot_bucket_rows`` rows when set)
    recurses the locate one level (``max_recursion``) instead of
    sorting the whole bucket in one window partition — the skew
    escalation the module docstring describes. All-ties buckets
    resolve to a literal without touching a row."""
    spark = df.sparkSession
    v = F.col(value_col).cast("long")
    base = df.where(v.isNotNull()).select(v.alias("v"))
    head = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    ).first()
    n = head["n"]
    pairs = [(int(q), (n * int(q) + 999) // 1000) for q in q_mille]
    pairs = [(q, r) for q, r in pairs if 1 <= r <= n]
    if n == 0 or not pairs:
        return spark.createDataFrame([], _OUT_SCHEMA)
    values = _rank_values(
        base,
        n,
        head["lo"],
        head["hi"],
        sorted({r for _, r in pairs}),
        n_buckets,
        hot_bucket_rows,
        hot_bucket_factor,
        max_recursion,
    )
    qdf = spark.createDataFrame(pairs, "q_mille int, rank bigint")
    return values.join(F.broadcast(qdf), "rank").select("q_mille", "rank", "value")


def exact_quantiles_grouped(
    df: DataFrame,
    group_cols: str | Sequence[str],
    value_col: str,
    q_mille: Sequence[int],
    n_buckets: int = 256,
) -> DataFrame:
    """Exact per-mille quantiles of an integer column PER GROUP:
    (group..., q_mille, rank, value) with rank = ⌈q·n_g/1000⌉
    (nearest-rank, 1-based within the group) and value = the rank-th
    smallest in that group. NULL values are excluded; groups the
    filter empties yield no rows.

    The same bucket-locate plan as :func:`exact_quantiles`, keyed by
    group everywhere: per-group (n, lo, hi) joins back on the group
    key (AQE broadcasts the stats frame when the group count is
    small), bucket counts shuffle ≤ |groups|·n_buckets cells, the
    cumulative window runs over ≤n_buckets-row per-group frames, and
    the in-bucket rank window over (group, located-bucket) partitions
    — expected n_g/n_buckets rows each. No global sort, no per-group
    row sort; the ONLY row-scale stages are one group-key join and
    one map-side-combined count. This is the exact analog of a
    grouped ``approx_percentile`` for audit/SLO cuts that cannot
    tolerate GK error.

    Skew note: unlike the ungrouped form (which escalates hot buckets
    via the driver-side recursive locate above), this grouped plan
    stays fully declarative — a data-dependent per-group escalation
    would need an unbounded per-group metadata collect. A (group,
    bucket) cell holding ≫ n_g/n_buckets rows (near-constant column
    within one group) therefore sorts that cell in one window
    partition; the named escalation is an unconditional second
    bucketing level keyed by (group, bucket), worth adding if a
    profiled workload hits it."""
    gcols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    v = F.col(value_col).cast("long")
    base = df.where(v.isNotNull()).select(*gcols, v.alias("v"))
    stats = base.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
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
    bucketed = base.join(stats, gcols).withColumn("b", bucket).select(*gcols, "v", "b")
    counts = bucketed.groupBy(*gcols, "b").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    cum = (
        W.partitionBy(*gcols).orderBy("b").rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "off", F.coalesce(F.sum("cnt").over(cum), F.lit(0).cast("long"))
    )
    qf = F.broadcast(
        df.sparkSession.createDataFrame([(int(q),) for q in q_mille], "q_mille int")
    )
    targets = (
        stats.crossJoin(qf)
        .select(
            *gcols,
            "q_mille",
            F.expr("CAST((n * q_mille + 999) DIV 1000 AS BIGINT)").alias("rank"),
        )
        .where(F.col("rank") >= 1)
    )
    o = offsets.select(
        *[F.col(g).alias(f"o_{g}") for g in gcols], "b", "cnt", "off"
    )
    located = targets.join(
        o,
        [F.col(g) == F.col(f"o_{g}") for g in gcols]
        + [F.col("off") < F.col("rank"), F.col("rank") <= F.col("off") + F.col("cnt")],
    ).select(*gcols, "q_mille", "rank", "b", "off")
    hot = located.select(*gcols, "b").distinct()
    ranked = (
        bucketed.join(hot, [*gcols, "b"], "left_semi")
        .withColumn(
            "r", F.row_number().over(W.partitionBy(*gcols, "b").orderBy("v"))
        )
        .select(
            *[F.col(g).alias(f"r_{g}") for g in gcols],
            F.col("b").alias("r_b"),
            "v",
            "r",
        )
    )
    return (
        located.join(
            ranked,
            [F.col(g) == F.col(f"r_{g}") for g in gcols]
            + [
                F.col("b") == F.col("r_b"),
                F.col("rank") == F.col("off") + F.col("r"),
            ],
        )
        .select(*gcols, "q_mille", "rank", F.col("v").alias("value"))
    )


def exact_quantiles_weighted(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    q_mille: Sequence[int],
    n_buckets: int = 256,
) -> DataFrame:
    """Exact weighted per-mille quantiles of an integer column:
    (q_mille, rank_w, value) where rank_w = ⌈q·W/1000⌉ (W = total
    weight, BIGINT) and value = the smallest v whose cumulative weight
    in value order reaches rank_w — the weighted-median generalization
    (importance-weighted corpora, resampled mixtures, billing units).
    Rows with NULL or non-positive weight are excluded.

    Same bucket-locate plan as :func:`exact_quantiles` with COUNTS
    replaced by WEIGHT SUMS: one stats aggregation, one
    map-side-combined per-bucket weight shuffle (≤ n_buckets cells),
    offsets over the tiny bucket frame, and an in-bucket cumulative
    weight window over only the located buckets. No global sort. Ties
    collapse by value first (a (v) pre-aggregation), so in-bucket
    frames are distinct-value-sized and the answer is deterministic
    with no row-order contract."""
    v = F.col(value_col).cast("long")
    w = F.col(weight_col).cast("long")
    base = (
        df.where(v.isNotNull() & w.isNotNull() & (w > 0))
        .select(v.alias("v"), w.alias("w"))
        .groupBy("v")
        .agg(F.sum("w").cast("long").alias("w"))
    )
    stats = base.agg(
        F.sum("w").cast("long").alias("tw"),
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
    bucketed = base.crossJoin(F.broadcast(stats)).withColumn("b", bucket).select(
        "v", "w", "b"
    )
    counts = bucketed.groupBy("b").agg(F.sum("w").cast("long").alias("bw"))
    cum = W.orderBy("b").rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "off", F.coalesce(F.sum("bw").over(cum), F.lit(0).cast("long"))
    )
    targets = (
        stats.crossJoin(
            F.broadcast(
                df.sparkSession.createDataFrame(
                    [(int(q),) for q in q_mille], "q_mille int"
                )
            )
        )
        .select(
            "q_mille",
            F.expr("CAST((tw * q_mille + 999) DIV 1000 AS BIGINT)").alias("rank_w"),
        )
        .where(F.col("rank_w") >= 1)
    )
    located = targets.join(
        F.broadcast(offsets),
        (F.col("off") < F.col("rank_w"))
        & (F.col("rank_w") <= F.col("off") + F.col("bw")),
    ).select("q_mille", "rank_w", "b", "off")
    hot = located.select("b").distinct()
    cw = F.sum("w").over(
        W.partitionBy("b").orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    )
    ranked = (
        bucketed.join(F.broadcast(hot), "b", "left_semi")
        .withColumn("cw", cw)
        .withColumn("cw_prev", F.col("cw") - F.col("w"))
    )
    return (
        located.join(
            ranked,
            (located["b"] == ranked["b"])
            & (F.col("rank_w") > F.col("off") + F.col("cw_prev"))
            & (F.col("rank_w") <= F.col("off") + F.col("cw")),
        )
        .select("q_mille", "rank_w", F.col("v").alias("value"))
    )


_MODES = ("linear", "lower", "higher", "nearest", "midpoint")


def quantile_interpolated(
    df: DataFrame,
    value_col: str,
    q_mille: Sequence[int],
    interpolations: Sequence[str] = _MODES,
    n_buckets: int = 256,
    hot_bucket_rows: int | None = None,
    hot_bucket_factor: int = 8,
    max_recursion: int = 1,
) -> DataFrame:
    """Arrow's five ``QuantileOptions.interpolation`` modes over an
    integer column, exactly and distributed: (q_mille, interpolation,
    value double).

    Reference semantics (cpp/src/arrow/compute/api_aggregate.h:139,
    kernels/aggregate_quantile.cc::QuantileToDataPoint): with sorted
    values v[0..n-1], index = (n-1)·q, di = ⌊index⌋, frac = index−di:

    - LINEAR   v[di] + frac·(v[di+1] − v[di])
    - LOWER    v[di]
    - HIGHER   v[di] if frac == 0 else v[di+1]
    - NEAREST  LOWER if frac < 0.5, HIGHER if frac > 0.5, and at
      exactly 0.5 banker's rounding on di (even → LOWER, odd → HIGHER)
    - MIDPOINT (v[di] + v[di+1 if frac else di]) / 2

    (``exact_quantiles`` above serves a DIFFERENT, also-exact contract:
    nearest-rank k = ⌈q·n⌉ — the order statistic itself, no
    interpolation. This operator is the Arrow-parity surface.)

    Determinism: the locate mirrors the reference's double arithmetic
    bit-for-bit — index = (n−1)·(q_mille/1000.0) as an IEEE double,
    di = trunc(index), frac = index − di (Python floats ARE IEEE
    doubles, so this is the identical expression tree to
    QuantileToDataPoint) — and the LINEAR combine is the reference's
    own frac·hi + (1−frac)·lo tree, making every cell bit-exact vs
    pc.quantile, not merely within tolerance. The two bracketing
    order statistics come from the same driver-side bucket locate as
    ``exact_quantiles`` (bounded metadata: 1 stats row + ≤n_buckets
    cells per level, hot-bucket escalation included).

    Scale: identical profile to ``exact_quantiles`` — the only
    row-scale stages are one map-side-combined bucket count and the
    located-bucket readoff behind a literal IN pushdown; output is
    |q|·|modes| rows."""
    spark = df.sparkSession
    modes = [m.lower() for m in interpolations]
    bad = [m for m in modes if m not in _MODES]
    if bad:
        raise ValueError(f"unknown interpolation modes: {bad}")
    v = F.col(value_col).cast("long")
    base = df.where(v.isNotNull()).select(v.alias("v"))
    head = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    ).first()
    n = head["n"]
    out_schema = "q_mille int, interpolation string, value double"
    locs = []
    for q in q_mille:
        q = int(q)
        # Arrow raises Invalid for q outside [0,1] (QuantileOptions
        # validation) — silent drop would make a typo like q=5000 vanish
        if not 0 <= q <= 1000:
            raise ValueError(f"q_mille must be in [0, 1000], got {q}")
        if n == 0:
            continue
        # bit-exact mirror of QuantileToDataPoint/GetQuantileByInterp
        # (aggregate_quantile.cc:46,217): double product, truncation,
        # double residue — NOT exact integer per-mille arithmetic, which
        # disagrees with the reference by 1 ULP on ~half of inputs
        index = (n - 1) * (q / 1000.0)
        di = int(index)
        frac = index - di
        locs.append((q, di, frac))
    if not locs:
        return spark.createDataFrame([], out_schema)
    ranks = sorted(
        {di + 1 for _, di, _ in locs} | {di + 2 for _, di, frac in locs if frac != 0}
    )
    values = _rank_values(
        base,
        n,
        head["lo"],
        head["hi"],
        ranks,
        n_buckets,
        hot_bucket_rows,
        hot_bucket_factor,
        max_recursion,
    )
    qdf = spark.createDataFrame(
        [
            (q, di, frac, di + 1, (di + 2) if frac != 0 else (di + 1))
            for q, di, frac in locs
        ],
        "q_mille int, di bigint, frac double, rlo bigint, rhi bigint",
    )
    vlo = values.select(F.col("rank").alias("rlo"), F.col("value").alias("vlo"))
    vhi = values.select(F.col("rank").alias("rhi"), F.col("value").alias("vhi"))
    brack = qdf.join(F.broadcast(vlo), "rlo").join(F.broadcast(vhi), "rhi")
    lo_d = F.col("vlo").cast("double")
    hi_d = F.col("vhi").cast("double")
    frac_c = F.col("frac")
    mode_val = {
        # reference uses fraction*higher + (1-fraction)*lower, NOT
        # lo + frac*(hi-lo) ("more stable than naive linear
        # interpolation", aggregate_quantile.cc GetQuantileByInterp) —
        # same IEEE tree + same double frac makes LINEAR bit-exact
        "linear": frac_c * hi_d + (F.lit(1.0) - frac_c) * lo_d,
        "lower": lo_d,
        "higher": hi_d,
        "nearest": F.when(frac_c < 0.5, lo_d)
        .when(frac_c > 0.5, hi_d)
        .otherwise(F.when(F.col("di") % 2 == 0, lo_d).otherwise(hi_d)),
        "midpoint": (F.col("vlo") + F.col("vhi")).cast("double") / F.lit(2.0),
    }
    # one pass: a per-row inline array of (mode, value) structs — a
    # 5-way union of selects would re-execute the whole locate subplan
    # per mode (10 scans for a 25-cell result)
    pairs = F.array(
        *[
            F.struct(
                F.lit(m).alias("interpolation"), mode_val[m].alias("value")
            )
            for m in modes
        ]
    )
    return brack.select("q_mille", F.inline(pairs))
