"""mutual_best_match unit tests: matching property, ties, asymmetry."""

from __future__ import annotations

from arrow_spark.operators.linkage import mutual_best_match


def _match(spark, rows):
    pairs = spark.createDataFrame(rows, "l long, r long, s double")
    return sorted(
        (row["l"], row["r"]) for row in mutual_best_match(pairs, "l", "r", "s").collect()
    )


def test_mutual_best_keeps_reciprocal_argmax_only(spark):
    # l=1 prefers r=10 (0.9) and r=10 prefers l=1 -> kept.
    # l=2's best is r=10 too, but r=10's best is l=1 -> 2 unmatched.
    rows = [(1, 10, 0.9), (2, 10, 0.8), (2, 20, 0.5), (3, 20, 0.7)]
    assert _match(spark, rows) == [(1, 10), (3, 20)]


def test_result_is_a_matching(spark):
    # no left id and no right id may appear twice
    rows = [(i, j, 1.0 / (1 + abs(i - j))) for i in range(8) for j in range(8)]
    out = _match(spark, rows)
    lefts = [a for a, _ in out]
    rights = [b for _, b in out]
    assert len(set(lefts)) == len(lefts)
    assert len(set(rights)) == len(rights)
    # identity scores dominate: the diagonal is the stable assignment
    assert out == [(i, i) for i in range(8)]


def test_tie_breaks_to_smallest_partner_id(spark):
    rows = [(1, 10, 0.5), (1, 20, 0.5), (2, 20, 0.5)]
    # l=1 ties 10/20 -> picks 10; r=20's best is then l=1? l=1 ranked 20
    # second, so (1,20) has lr=2 and drops; (2,20) survives iff 20's best
    # left is 2: candidates for r=20 are l=1,l=2 equal score -> picks 1,
    # but (1,20) is not l=1's best -> no match for 20.
    assert _match(spark, rows) == [(1, 10)]


def test_single_pair_trivially_matches(spark):
    assert _match(spark, [(5, 7, 0.1)]) == [(5, 7)]


def test_plan_two_windows_no_join(spark):
    pairs = spark.createDataFrame(
        [(i, i % 3, 0.5) for i in range(20)], "l long, r long, s double"
    )
    plan = (
        mutual_best_match(pairs, "l", "r", "s")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert plan.count("Window [row_number()") == 2
    # Spark pushes the rank==1 filter into per-partition WindowGroupLimit
    # prunes — the property that keeps the window cheap at scale
    assert "WindowGroupLimit" in plan
