"""association_rules: hand-computed support/confidence/lift."""

from __future__ import annotations

from arrow_spark.operators.association import association_rules


def _rules(spark, rows, min_pair=1):
    df = spark.createDataFrame(rows, "b long, i string")
    out = association_rules(df, "b", "i", min_pair_count=min_pair)
    return {(r["item_x"], r["item_y"]): r for r in out.collect()}


def test_perfect_association(spark):
    # a and b always together in 2 of 4 baskets
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "c"), (4, "d")]
    r = _rules(spark, rows)[("a", "b")]
    assert (r["n_x"], r["n_y"], r["n_xy"]) == (2, 2, 2)
    assert r["support"] == 0.5
    assert r["confidence_xy"] == 1.0 and r["confidence_yx"] == 1.0
    assert r["lift"] == 2.0  # 4*2/(2*2)


def test_independent_items_lift_one(spark):
    # x in all 4 baskets, y in 2: together 2, lift = 4*2/(4*2) = 1
    rows = (
        [(b, "x") for b in (1, 2, 3, 4)]
        + [(1, "y"), (2, "y")]
    )
    r = _rules(spark, rows)[("x", "y")]
    assert r["lift"] == 1.0
    assert r["confidence_yx"] == 1.0 and r["confidence_xy"] == 0.5


def test_duplicates_within_basket_collapse(spark):
    rows = [(1, "a"), (1, "a"), (1, "b"), (2, "a")]
    r = _rules(spark, rows)[("a", "b")]
    assert r["n_xy"] == 1 and r["n_x"] == 2


def test_min_pair_count_filters(spark):
    rows = [(1, "a"), (1, "b"), (2, "c"), (2, "d")]
    got = _rules(spark, rows, min_pair=2)
    assert got == {}


def test_canonical_order_no_mirror_pairs(spark):
    rows = [(1, "z"), (1, "a")]
    got = _rules(spark, rows)
    assert set(got) == {("a", "z")}
