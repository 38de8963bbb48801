"""linear_attribution tests: hand-computed splits, window edges."""

from __future__ import annotations

from arrow_spark.operators.attribution import linear_attribution


def _run(spark, convs, touches, window=100):
    c = spark.createDataFrame(convs, "u long, cid long, ct long, v long")
    t = spark.createDataFrame(touches, "u long, tt long, ch string")
    out = linear_attribution(
        c, t, "u", "cid", "ct", "v", "tt", "ch", window_seconds=window
    )
    return {r["channel"]: r for r in out.collect()}


def test_single_touch_full_credit(spark):
    got = _run(spark, [(1, 10, 100, 500)], [(1, 50, "a")])
    assert got["a"]["credited_micros"] == 500_000_000
    assert got["a"]["credited_value"] == 500.0
    assert got["a"]["n_touches"] == 1


def test_even_split_across_channels(spark):
    got = _run(
        spark, [(1, 10, 100, 900)], [(1, 40, "a"), (1, 50, "b"), (1, 60, "b")]
    )
    assert got["a"]["credited_micros"] == 300_000_000
    assert got["b"]["credited_micros"] == 600_000_000
    assert got["b"]["n_touches"] == 2


def test_window_boundaries(spark):
    # touch AT ct is excluded (strictly before); touch at ct-window is
    # included (closed lower edge)
    got = _run(
        spark,
        [(1, 10, 100, 100)],
        [(1, 100, "late"), (1, 0, "edge"), (1, -1, "old")],
        window=100,
    )
    assert set(got) == {"edge"}
    assert got["edge"]["credited_micros"] == 100_000_000


def test_users_do_not_cross(spark):
    got = _run(spark, [(1, 10, 100, 100)], [(2, 50, "a")])
    assert got == {}


def test_rounding_thirds_exact_integer_sum(spark):
    # 100 split 3 ways: floor(33333333.33 + .5) = 33333334? No:
    # 100*1e6/3 = 33333333.33 -> floor(+.5) = 33333333 per touch
    got = _run(
        spark, [(1, 10, 100, 100)], [(1, 1, "a"), (1, 2, "a"), (1, 3, "a")]
    )
    assert got["a"]["credited_micros"] == 3 * 33333333
