"""time_weighted_avg + lttb_downsample unit tests (known-value series,
degenerate buckets, plan shape)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from arrow_spark.operators.downsample import lttb_downsample
from arrow_spark.operators.timeweight import time_weighted_avg


def _ts(sec: int):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=sec)


def test_twa_known_values(spark):
    # key a: v=100 holds 10s, v=300 holds 30s, final point dangles
    rows = [
        ("a", _ts(0), 100),
        ("a", _ts(10), 300),
        ("a", _ts(40), 999),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, cents long")
    out = time_weighted_avg(
        df, ["k"], "ts", F.col("cents"), bucket_seconds=86400
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_points"] == 3 and r["total_dt"] == 40
    assert r["twa_cents"] == (100 * 10 + 300 * 30) / 40  # 250.0


def test_twa_final_only_bucket_is_null_not_nan(spark):
    # second bucket holds only the key's final point: no duration -> NULL
    rows = [("a", _ts(0), 100), ("a", _ts(86400 + 5), 200)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, cents long")
    out = {r["bucket_start"]: r for r in
           time_weighted_avg(df, ["k"], "ts", F.col("cents"), 86400).collect()}
    day0 = min(out)
    assert out[day0]["twa_cents"] == 100.0  # held until next point
    last = out[max(out)]
    assert last["total_dt"] == 0 and last["twa_cents"] is None


def test_twa_segment_credited_to_start_bucket(spark):
    # a segment spanning the bucket edge is credited wholly to its start
    rows = [("a", _ts(86400 - 10), 100), ("a", _ts(86400 + 10), 200),
            ("a", _ts(86400 + 20), 0)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, cents long")
    out = {r["bucket_start"]: r for r in
           time_weighted_avg(df, ["k"], "ts", F.col("cents"), 86400).collect()}
    b0 = min(out)
    assert out[b0]["total_dt"] == 20 and out[b0]["twa_cents"] == 100.0


def test_lttb_keeps_first_point_and_spike(spark):
    # 12 flat points with one big spike: the spike's bucket must pick it
    rows = [("a", _ts(i * 10), 100) for i in range(12)]
    rows[7] = ("a", _ts(70), 5000)  # spike
    df = spark.createDataFrame(rows, "k string, ts timestamp, cents long")
    out = lttb_downsample(df, ["k"], "ts", F.col("cents"), n_buckets=4).collect()
    assert len(out) == 4  # one winner per bucket
    by_bucket = {r["bucket"]: r for r in out}
    assert by_bucket[0]["t"] == min(r["t"] for r in out)  # first point survives
    assert any(r["v_cents"] == 5000 for r in out)  # spike selected


def test_lttb_single_point_key(spark):
    df = spark.createDataFrame(
        [("a", _ts(0), 42)], "k string, ts timestamp, cents long"
    )
    out = lttb_downsample(df, ["k"], "ts", F.col("cents"), n_buckets=8).collect()
    assert len(out) == 1 and out[0]["v_cents"] == 42 and out[0]["area2"] is None


def test_twa_plan_two_exchanges_no_python(spark, sf_dir):
    from arrow_spark.catalog import table

    e = table(spark, str(sf_dir), "events")
    plan = (
        time_weighted_avg(e, ["event_type"], "ts", F.round(F.col("value") * 100), 86400)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan


def test_lttb_plan_no_cartesian_no_python(spark, sf_dir):
    from arrow_spark.catalog import table

    e = table(spark, str(sf_dir), "events")
    plan = (
        lttb_downsample(e, ["event_type"], "ts", F.round(F.col("value") * 100), 32)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan


def test_quantile_transform_binned_tracks_exact(spark, sf_dir):
    # scale-path twin: |q̂ − q| ≤ 1/n_bins + GK ε on a real column
    from arrow_spark.catalog import table
    from arrow_spark.operators.quantile_transform import (
        quantile_transform,
        quantile_transform_binned,
    )

    l = table(spark, str(sf_dir), "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    ids = ["l_orderkey", "l_linenumber"]
    # (orderkey, linenumber) is NOT unique in the fixture — join on the
    # value too (equal values share identical q in both variants)
    keys = [*ids, "value"]
    exact = quantile_transform(l, ids, ["l_extendedprice"]).select(
        *keys, F.col("q").alias("q_exact")
    )
    approx = quantile_transform_binned(
        l, ids, ["l_extendedprice"], n_bins=100
    ).select(*keys, F.col("q").alias("q_hat"))
    joined = exact.join(approx, keys)
    worst = joined.agg(
        F.max(F.abs(F.col("q_exact") - F.col("q_hat"))).alias("e")
    ).collect()[0]["e"]
    assert worst <= 1 / 100 + 1e-4 + 1e-9


def test_quantile_transform_decomposed_matches_window_exactly(spark, sf_dir):
    """The scale-safe default path (auto-switch above
    exact_partition_rows) must be VALUE-IDENTICAL to the window path —
    same integers, same single double division — including tie groups
    (l_quantity: ~50 distinct values over 60k rows)."""
    from arrow_spark.catalog import table
    from arrow_spark.operators.quantile_transform import quantile_transform

    l = table(spark, str(sf_dir), "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )
    ids = ["l_orderkey", "l_linenumber"]
    feats = ["l_quantity", "l_extendedprice"]
    keys = [*ids, "feature", "value"]
    win = quantile_transform(l, ids, feats, exact_partition_rows=10**12).select(
        *keys, F.col("q").alias("q_win")
    )
    dec = quantile_transform(l, ids, feats, exact_partition_rows=0).select(
        *keys, F.col("q").alias("q_dec")
    )
    joined = win.join(dec, keys)
    n_win, n_join, n_diff = (
        win.count(),
        joined.count(),
        joined.where(F.col("q_win") != F.col("q_dec")).count(),
    )
    assert n_join >= n_win and n_diff == 0


def test_quantile_transform_decomposed_plan_has_no_per_feature_sort(spark, sf_dir):
    """The decomposed plan's windows run over (feature, bucket) /
    (feature) on the distinct/bucket frames — never a window or sort
    partitioned by feature alone over the row-scale frame."""
    from arrow_spark.catalog import table
    from arrow_spark.operators.quantile_transform import quantile_transform

    l = table(spark, str(sf_dir), "lineitem")
    plan = (
        quantile_transform(l, ["l_orderkey"], ["l_extendedprice"], exact_partition_rows=0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # row-scale q delivery is a join, and no window partitions by the
    # bare feature column over row-scale data: every Window's partition
    # spec includes bucket (distinct frame) except the tiny
    # features×n_buckets offset window, which has ≤n_buckets rows/feature
    assert "percent_rank" not in plan
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan


def test_quantile_transform_binned_rowscale_stage_is_maponly(spark, sf_dir):
    from arrow_spark.catalog import table
    from arrow_spark.operators.quantile_transform import quantile_transform_binned

    l = table(spark, str(sf_dir), "lineitem")
    plan = (
        quantile_transform_binned(l, ["l_orderkey"], ["l_extendedprice"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the row-scale side reaches the result via broadcast join — no sort
    # of the full feature partition anywhere
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan
