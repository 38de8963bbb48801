"""exact_quantiles: brute-force equality, ties, degenerate columns."""

from __future__ import annotations

import math
import random

import pytest

from arrow_spark.operators.quantiles import exact_quantiles


def _run(spark, vals, qs, n_buckets=16):
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    out = exact_quantiles(df, "x", qs, n_buckets=n_buckets)
    return {r["q_mille"]: (r["rank"], r["value"]) for r in out.collect()}


def _brute(vals, q):
    s = sorted(vals)
    k = math.ceil(q * len(s) / 1000)
    return (k, s[k - 1])


def test_exact_quantiles_matches_brute_force(spark):
    rng = random.Random(5)
    vals = [rng.randint(-1000, 1000) for _ in range(997)]
    got = _run(spark, vals, [10, 250, 500, 750, 990, 1000])
    for q in (10, 250, 500, 750, 990, 1000):
        assert got[q] == _brute(vals, q), q


def test_exact_quantiles_heavy_ties(spark):
    vals = [5] * 400 + [9] * 100
    got = _run(spark, vals, [500, 900])
    assert got[500] == (250, 5)
    assert got[900] == (450, 9)


def test_exact_quantiles_all_equal_degenerate(spark):
    got = _run(spark, [7] * 50, [500])
    assert got[500] == (25, 7)


def test_exact_quantiles_single_row(spark):
    got = _run(spark, [42], [1, 500, 1000])
    assert got == {1: (1, 42), 500: (1, 42), 1000: (1, 42)}


def test_exact_quantiles_skewed_bucket(spark):
    # one huge outlier forces nearly all rows into bucket 0: the locate
    # must still find exact answers inside the hot bucket
    vals = list(range(100)) + [10_000_000]
    got = _run(spark, vals, [500], n_buckets=8)
    assert got[500] == _brute(vals, 500)


def test_exact_quantiles_hot_bucket_recursion_matches_brute_force(spark):
    # 5000 rows piled into a narrow band + one huge outlier: bucket 0
    # holds ~everything, crossing the forced hot threshold, so the
    # locate recurses one level with a fresh sub-range instead of
    # sorting the whole bucket in a single window partition
    rng = random.Random(13)
    vals = [rng.randint(0, 50) for _ in range(5000)] + [10_000_000]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    out = exact_quantiles(df, "x", [100, 500, 900], n_buckets=8, hot_bucket_rows=500)
    got = {r["q_mille"]: (r["rank"], r["value"]) for r in out.collect()}
    for q in (100, 500, 900):
        assert got[q] == _brute(vals, q), q


def test_exact_quantiles_all_ties_hot_bucket_is_literal(spark):
    # the hot bucket is one repeated value: the recursion's slo == shi
    # shortcut answers from metadata — correctness must hold and no
    # window over the tie pile is needed
    vals = [7] * 4000 + list(range(1000, 1050))
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    out = exact_quantiles(df, "x", [250, 500, 999], n_buckets=8, hot_bucket_rows=100)
    got = {r["q_mille"]: (r["rank"], r["value"]) for r in out.collect()}
    for q in (250, 500, 999):
        assert got[q] == _brute(vals, q), q


def test_exact_quantiles_recursion_depth_zero_still_exact(spark):
    vals = [3] * 900 + [50, 60]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    out = exact_quantiles(
        df, "x", [500, 1000], n_buckets=4, hot_bucket_rows=10, max_recursion=0
    )
    got = {r["q_mille"]: (r["rank"], r["value"]) for r in out.collect()}
    assert got[500] == _brute(vals, 500)
    assert got[1000] == _brute(vals, 1000)


def test_exact_quantiles_plan_no_global_sort(spark):
    df = spark.createDataFrame([(v,) for v in range(100)], "x long")
    plan = (
        exact_quantiles(df, "x", [500], n_buckets=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # in-bucket rank windows exist; a single-partition GLOBAL sort of
    # the base data (Exchange SinglePartition feeding a Sort over the
    # full input) must not
    assert "CartesianProduct" not in plan


def test_exact_quantiles_grouped_matches_brute_force(spark):
    from arrow_spark.operators.quantiles import exact_quantiles_grouped

    rng = random.Random(11)
    rows = [("a", rng.randint(-500, 500)) for _ in range(613)] + [
        ("b", rng.randint(0, 9)) for _ in range(88)
    ] + [("c", 42)]
    df = spark.createDataFrame(rows, "g string, x long")
    out = exact_quantiles_grouped(df, "g", "x", [10, 500, 900, 1000], n_buckets=16)
    got = {(r["g"], r["q_mille"]): (r["rank"], r["value"]) for r in out.collect()}
    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vals in by_g.items():
        for q in (10, 500, 900, 1000):
            assert got[(g, q)] == _brute(vals, q), (g, q)


def test_exact_quantiles_grouped_nulls_and_multikey(spark):
    from arrow_spark.operators.quantiles import exact_quantiles_grouped

    rows = [
        ("x", 1, 10), ("x", 1, 20), ("x", 1, None),
        ("x", 2, 5), ("y", 1, 7),
    ]
    df = spark.createDataFrame(rows, "g1 string, g2 int, v long")
    out = exact_quantiles_grouped(df, ["g1", "g2"], "v", [500, 1000], n_buckets=4)
    got = {(r["g1"], r["g2"], r["q_mille"]): r["value"] for r in out.collect()}
    # ("x",1): values [10,20] → p50 rank ceil(1)=1 → 10; p100 → 20
    assert got[("x", 1, 500)] == 10 and got[("x", 1, 1000)] == 20
    assert got[("x", 2, 500)] == 5
    assert got[("y", 1, 500)] == 7
    # null excluded: rank for ("x",1,1000) was 2 not 3
    rows_out = {
        (r["g1"], r["g2"], r["q_mille"]): r["rank"] for r in out.collect()
    }
    assert rows_out[("x", 1, 1000)] == 2


def test_exact_quantiles_grouped_plan_no_cartesian(spark):
    from arrow_spark.operators.quantiles import exact_quantiles_grouped

    df = spark.createDataFrame(
        [(str(i % 3), v) for i, v in enumerate(range(90))], "g string, x long"
    )
    plan = (
        exact_quantiles_grouped(df, "g", "x", [500], n_buckets=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan


def _brute_weighted(pairs, q):
    # pairs: (value, weight); rank over total weight, smallest v whose
    # cumulative weight reaches ceil(q*W/1000)
    s = sorted(pairs)
    tw = sum(w for _, w in s)
    k = math.ceil(q * tw / 1000)
    c = 0
    for v, w in s:
        c += w
        if c >= k:
            return (k, v)
    raise AssertionError("unreachable")


def test_exact_quantiles_weighted_matches_brute_force(spark):
    from arrow_spark.operators.quantiles import exact_quantiles_weighted

    rng = random.Random(7)
    pairs = [(rng.randint(-100, 100), rng.randint(1, 9)) for _ in range(311)]
    df = spark.createDataFrame(pairs, "x long, w long")
    out = exact_quantiles_weighted(df, "x", "w", [10, 500, 900, 1000], n_buckets=16)
    got = {r["q_mille"]: (r["rank_w"], r["value"]) for r in out.collect()}
    for q in (10, 500, 900, 1000):
        assert got[q] == _brute_weighted(pairs, q), q


def test_exact_quantiles_weighted_unit_weights_match_unweighted(spark):
    from arrow_spark.operators.quantiles import (
        exact_quantiles,
        exact_quantiles_weighted,
    )

    vals = [5, 1, 9, 3, 3, 7, 2, 8, 4, 6]
    df = spark.createDataFrame([(v, 1) for v in vals], "x long, w long")
    wq = exact_quantiles_weighted(df, "x", "w", [250, 500, 750], n_buckets=4)
    uq = exact_quantiles(
        spark.createDataFrame([(v,) for v in vals], "x long"),
        "x",
        [250, 500, 750],
        n_buckets=4,
    )
    got_w = {r["q_mille"]: (r["rank_w"], r["value"]) for r in wq.collect()}
    got_u = {r["q_mille"]: (r["rank"], r["value"]) for r in uq.collect()}
    assert got_w == got_u


def test_exact_quantiles_weighted_skips_nonpositive_weights(spark):
    from arrow_spark.operators.quantiles import exact_quantiles_weighted

    df = spark.createDataFrame(
        [(1, 1), (100, 0), (200, -5), (3, 1)], "x long, w long"
    )
    out = exact_quantiles_weighted(df, "x", "w", [1000], n_buckets=4)
    r = out.collect()[0]
    assert (r["rank_w"], r["value"]) == (2, 3)


def test_quantile_interpolated_randomized_parity_vs_pyarrow(spark):
    """All five Arrow interpolation modes, cell-exact vs the reference
    binary's own pc.quantile on randomized inputs — including heavy
    ties and a frac == 0.5 banker's-rounding case (NEAREST)."""
    import random

    import pyarrow as pa
    import pyarrow.compute as pc

    from arrow_spark.operators.quantiles import quantile_interpolated

    rng = random.Random(421)
    cases = [
        [rng.randint(-500, 500) for _ in range(997)],   # generic, odd n
        [rng.randint(0, 5) for _ in range(1000)],       # heavy ties, even n
        [rng.randint(-10**9, 10**9) for _ in range(256)],  # wide range
        [7],                                            # single row
        [3, 9],                                         # n=2: q=500 -> frac .5
    ]
    qm = [0, 125, 250, 333, 500, 667, 875, 901, 1000]
    for vals in cases:
        df = spark.createDataFrame([(v,) for v in vals], "x long")
        got = {
            (r["q_mille"], r["interpolation"]): r["value"]
            for r in quantile_interpolated(df, "x", qm, n_buckets=16).collect()
        }
        arr = pa.array(vals)
        for q in qm:
            for mode in ("linear", "lower", "higher", "nearest", "midpoint"):
                want = pc.quantile(arr, q=q / 1000.0, interpolation=mode)[0].as_py()
                # bit-exact: the locate mirrors QuantileToDataPoint's
                # double arithmetic and LINEAR uses the reference's own
                # frac*hi + (1-frac)*lo combine tree (ADVICE r9 fix)
                assert got[(q, mode)] == want, (len(vals), q, mode)


def test_quantile_interpolated_nearest_bankers_tiebreak(spark):
    """frac == 0.5 exactly: NEAREST rounds to even di like the reference
    (QuantileToDataPoint: even di -> LOWER, odd di -> HIGHER)."""
    from arrow_spark.operators.quantiles import quantile_interpolated

    # n=3: q=250 -> index 0.5 (di=0 even -> LOWER=v[0]);
    #      q=750 -> index 1.5 (di=1 odd -> HIGHER=v[2])
    df = spark.createDataFrame([(10,), (20,), (30,)], "x long")
    got = {
        (r["q_mille"], r["interpolation"]): r["value"]
        for r in quantile_interpolated(df, "x", [250, 750], ["nearest"]).collect()
    }
    assert got[(250, "nearest")] == 10.0
    assert got[(750, "nearest")] == 30.0


def test_quantile_interpolated_rejects_out_of_range_q(spark):
    """Arrow raises Invalid for q outside [0,1]; a typo like q=5000 must
    error, not silently vanish from the output (ADVICE r9)."""
    from arrow_spark.operators.quantiles import quantile_interpolated

    df = spark.createDataFrame([(1,), (2,)], "x long")
    with pytest.raises(ValueError, match="q_mille"):
        quantile_interpolated(df, "x", [500, 5000])
    with pytest.raises(ValueError, match="q_mille"):
        quantile_interpolated(df, "x", [-1])


def test_quantile_interpolated_empty_and_nulls(spark):
    from arrow_spark.operators.quantiles import quantile_interpolated

    empty = spark.createDataFrame([], "x long")
    assert quantile_interpolated(empty, "x", [500]).count() == 0
    df = spark.createDataFrame([(None,), (5,), (None,)], "x long")
    rows = quantile_interpolated(df, "x", [500]).collect()
    assert all(r["value"] == 5.0 for r in rows) and len(rows) == 5
