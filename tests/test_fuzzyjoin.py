"""Cross-table fuzzy join: result-invariance vs naive form, exact-once."""

from __future__ import annotations

import pandas as pd
import pytest

from arrow_spark.operators.fuzzyjoin import fuzzy_join


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "lid": [1, 2, 3],
                "lt": [
                    "alpha beta gamma delta",
                    "one two three four five six seven eight",
                    "zz yy xx",
                ],
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "rid": [10, 20, 30],
                "rt": [
                    "alpha beta gamma delta epsilon",   # J=4/5 with lid 1
                    "one two three nine",               # J=3/9 with lid 2
                    "totally different words here now", # no match
                ],
            }
        )
    )
    return left, right


def test_matches_naive_jaccard(sides):
    left, right = sides
    out = fuzzy_join(left, right, "lt", "rt", threshold=0.5).collect()
    pairs = sorted((r["lid"], r["rid"], round(r["jaccard"], 6)) for r in out)
    assert pairs == [(1, 10, 0.8)]


def test_lower_threshold_widens(sides):
    left, right = sides
    out = fuzzy_join(left, right, "lt", "rt", threshold=0.3).collect()
    pairs = sorted((r["lid"], r["rid"]) for r in out)
    assert pairs == [(1, 10), (2, 20)]


def test_identical_text_meets_exactly_once(spark):
    l = spark.createDataFrame(pd.DataFrame({"lid": [1], "lt": ["same tokens here"]}))
    r = spark.createDataFrame(pd.DataFrame({"rid": [2], "rt": ["same tokens here"]}))
    out = fuzzy_join(l, r, "lt", "rt", threshold=0.9).collect()
    assert len(out) == 1 and out[0]["jaccard"] == 1.0


def test_bad_threshold_rejected(sides):
    left, right = sides
    with pytest.raises(ValueError, match="threshold"):
        fuzzy_join(left, right, "lt", "rt", threshold=1.0)


def test_lsh_catches_identical_and_near_pairs(spark):
    import pandas as pd

    from arrow_spark.operators.fuzzyjoin import fuzzy_join_lsh

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    l = spark.createDataFrame(
        pd.DataFrame({"lid": [1, 2], "lt": [base, "completely unrelated text"]})
    )
    r = spark.createDataFrame(
        pd.DataFrame({"rid": [7, 8], "rt": [base, "different words entirely here"]})
    )
    out = fuzzy_join_lsh(l, r, "lid", "lt", "rid", "rt", threshold=0.9).collect()
    # identical signatures share every band bucket → guaranteed catch
    assert [(r["lid"], r["rid"], r["jaccard"]) for r in out] == [("1", "7", 1.0)]


def test_lsh_recall_floor_vs_exact(spark):
    import pandas as pd

    from arrow_spark.operators.fuzzyjoin import fuzzy_join, fuzzy_join_lsh

    words = [f"w{i}" for i in range(40)]
    lefts, rights = [], []
    for i in range(30):
        toks = [words[(i * 7 + j) % 40] for j in range(14)]
        lefts.append(" ".join(toks))
        rights.append(" ".join(toks[:12]))  # J = 12/14 ≈ 0.857
    l = spark.createDataFrame(pd.DataFrame({"lid": range(30), "lt": lefts}))
    r = spark.createDataFrame(pd.DataFrame({"rid": range(30), "rt": rights}))
    exact = fuzzy_join(l, r, "lt", "rt", threshold=0.5)
    exact_pairs = {(str(x["lid"]), str(x["rid"])) for x in exact.collect()}
    approx = fuzzy_join_lsh(l, r, "lid", "lt", "rid", "rt", threshold=0.5)
    approx_pairs = {(x["lid"], x["rid"]) for x in approx.collect()}
    assert approx_pairs <= exact_pairs  # verify step admits no false pair
    assert len(approx_pairs) >= 0.6 * len(exact_pairs)


def test_edit_distance_join_basic(spark):
    from arrow_spark.operators.fuzzyjoin import fuzzy_join_edit_distance

    probe = spark.createDataFrame(
        [(1, "kitten"), (2, "flawless")], "pid long, t string"
    )
    corpus = spark.createDataFrame(
        [(10, "kitten"), (11, "mitten"), (12, "sitting"), (13, "flawless")],
        "cid long, t string",
    )
    out = fuzzy_join_edit_distance(
        probe, corpus, "pid", "t", "cid", "t", max_dist=1, q=3
    )
    got = {(r["pid"], r["cid"]): r["dist"] for r in out.collect()}
    # kitten->kitten d=0, kitten->mitten d=1; sitting is d=3 (excluded)
    assert got == {(1, 10): 0, (1, 11): 1, (2, 13): 0}


def test_edit_distance_lossless_with_repeated_grams(spark):
    from arrow_spark.operators.fuzzyjoin import fuzzy_join_edit_distance

    # repeated q-grams ("ababab") — a distinct-gram join would
    # undercount shared grams; the multiset join must keep this pair
    probe = spark.createDataFrame([(1, "ababababab")], "pid long, t string")
    corpus = spark.createDataFrame([(9, "abababaXab")], "cid long, t string")
    out = fuzzy_join_edit_distance(
        probe, corpus, "pid", "t", "cid", "t", max_dist=1, q=3
    ).collect()
    assert [(r["pid"], r["cid"], r["dist"]) for r in out] == [(1, 9, 1)]


def test_edit_distance_short_strings_degenerate_bound(spark):
    from arrow_spark.operators.fuzzyjoin import fuzzy_join_edit_distance

    # strings shorter than q·d+q−1: bound ≤ 0, filter admits anything
    # sharing a gram; the verify step still gives the exact answer
    probe = spark.createDataFrame([(1, "abcd")], "pid long, t string")
    corpus = spark.createDataFrame(
        [(5, "abcX"), (6, "abXX")], "cid long, t string"
    )
    out = fuzzy_join_edit_distance(
        probe, corpus, "pid", "t", "cid", "t", max_dist=1, q=3
    )
    got = {(r["pid"], r["cid"]): r["dist"] for r in out.collect()}
    assert got == {(1, 5): 1}


def test_edit_distance_no_cross_join_plan(spark):
    from arrow_spark.operators.fuzzyjoin import fuzzy_join_edit_distance

    probe = spark.createDataFrame([(1, "abcdef")], "pid long, t string")
    corpus = spark.createDataFrame([(5, "abcdeg")], "cid long, t string")
    plan = (
        fuzzy_join_edit_distance(probe, corpus, "pid", "t", "cid", "t")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_edit_distance_top_k_per_probe(spark):
    from arrow_spark.operators.fuzzyjoin import fuzzy_join_edit_distance

    # probe 1 matches four corpus strings within d<=2; k=2 must keep
    # the two closest, ties broken by cid ASC (deterministic)
    probe = spark.createDataFrame(
        [(1, "kitten"), (2, "zzzzzz")], "pid long, t string"
    )
    corpus = spark.createDataFrame(
        [(10, "kitten"), (11, "mitten"), (12, "kitte"), (13, "bitten"),
         (14, "unrelatedxyz")],
        "cid long, t string",
    )
    full = fuzzy_join_edit_distance(
        probe, corpus, "pid", "t", "cid", "t", max_dist=2, q=3
    )
    assert {(r["pid"], r["cid"]) for r in full.collect()} == {
        (1, 10), (1, 11), (1, 12), (1, 13)
    }
    capped = fuzzy_join_edit_distance(
        probe, corpus, "pid", "t", "cid", "t", max_dist=2, q=3,
        top_k_per_probe=2,
    ).collect()
    got = sorted((r["pid"], r["cid"], r["dist"]) for r in capped)
    # dist 0 for cid 10; dist 1 for cids 11 and 12 — tie broken to 11
    assert got == [(1, 10, 0), (1, 11, 1)]
    # output bounded at k rows per probe
    from collections import Counter

    counts = Counter(r["pid"] for r in capped)
    assert all(v <= 2 for v in counts.values())


def test_edit_distance_broadcast_gate(spark):
    # ADVICE r11: F.broadcast(pg) bypasses autoBroadcastJoinThreshold, so
    # an unbounded probe must NOT be force-broadcast. The guard estimates
    # probe gram rows and falls back to a merge-hinted shuffle join; both
    # paths must return identical results.
    from arrow_spark.operators.fuzzyjoin import fuzzy_join_edit_distance

    probe = spark.createDataFrame(
        [(1, "kitten"), (2, "flawless")], "pid long, t string"
    )
    corpus = spark.createDataFrame(
        [(10, "kitten"), (11, "mitten"), (12, "sitting"), (13, "flawless")],
        "cid long, t string",
    )
    expected = {(1, 10): 0, (1, 11): 1, (2, 13): 0}

    shuffled = fuzzy_join_edit_distance(
        probe, corpus, "pid", "t", "cid", "t", max_dist=1, q=3,
        broadcast_probe=False,
    )
    assert {(r["pid"], r["cid"]): r["dist"] for r in shuffled.collect()} == expected
    plan = shuffled._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" not in plan  # nothing force-broadcast

    # a tiny gram budget must auto-select the shuffle path
    auto = fuzzy_join_edit_distance(
        probe, corpus, "pid", "t", "cid", "t", max_dist=1, q=3,
        probe_gram_budget=1,
    )
    assert {(r["pid"], r["cid"]): r["dist"] for r in auto.collect()} == expected
    plan = auto._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" not in plan
