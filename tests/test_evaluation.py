"""Evaluation-operator tests: AUC vs the brute-force pair definition,
hand-computed PR points, calibration bins, degenerate groups, plan pins.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from arrow_spark.operators.evaluation import calibration_bins, pr_curve, roc_auc


def _auc_brute(pairs):
    """AUC by its definition: P(score_pos > score_neg) + 0.5·P(==)."""
    pos = [s for y, s in pairs if y == 1]
    neg = [s for y, s in pairs if y == 0]
    if not pos or not neg:
        return None
    wins = sum(1 for p in pos for n in neg if p > n)
    ties = sum(1 for p in pos for n in neg if p == n)
    return (wins + 0.5 * ties) / (len(pos) * len(neg))


def _df(spark, pairs):
    return spark.createDataFrame(
        [(y, s) for y, s in pairs], "y long, score long"
    )


def test_auc_perfect_separation(spark):
    pairs = [(1, 10), (1, 9), (0, 2), (0, 1)]
    row = roc_auc(_df(spark, pairs), "y", "score").collect()[0]
    assert row["auc"] == 1.0 and row["n_pos"] == 2 and row["n_neg"] == 2


def test_auc_all_tied_is_half(spark):
    pairs = [(1, 5), (1, 5), (0, 5), (0, 5)]
    assert roc_auc(_df(spark, pairs), "y", "score").collect()[0]["auc"] == 0.5


def test_auc_inverted_is_zero(spark):
    pairs = [(0, 10), (1, 1)]
    assert roc_auc(_df(spark, pairs), "y", "score").collect()[0]["auc"] == 0.0


def test_auc_matches_brute_force_random(spark):
    rng = random.Random(7)
    pairs = [(rng.randint(0, 1), rng.randint(0, 12)) for _ in range(300)]
    got = roc_auc(_df(spark, pairs), "y", "score").collect()[0]["auc"]
    assert got == _auc_brute(pairs)


def test_auc_degenerate_group_null_not_nan(spark):
    # all-positive group: no ranking is defined — NULL, never NaN
    # (Spark sorts NaN above every number: a NaN auc would read as a
    # perfect classifier downstream)
    df = spark.createDataFrame(
        [("a", 1, 3), ("a", 1, 4), ("b", 1, 3), ("b", 0, 1)],
        "g string, y long, score long",
    )
    rows = {r["g"]: r["auc"] for r in roc_auc(df, "y", "score", ["g"]).collect()}
    assert rows["a"] is None and rows["b"] == 1.0


def test_auc_null_rows_excluded(spark):
    df = spark.createDataFrame(
        [(1, 10), (0, 1), (None, 99), (1, None)], "y long, score long"
    )
    row = roc_auc(df, "y", "score").collect()[0]
    assert (row["n_pos"], row["n_neg"], row["auc"]) == (1, 1, 1.0)


def test_pr_curve_hand_computed(spark):
    # scores desc: 3(pos), 2(neg), 1(pos)
    pairs = [(1, 3), (0, 2), (1, 1)]
    rows = {
        r["threshold"]: r
        for r in pr_curve(_df(spark, pairs), "y", "score").collect()
    }
    assert (rows[3]["tp"], rows[3]["fp"], rows[3]["fn"]) == (1, 0, 1)
    assert rows[3]["precision"] == 1.0 and rows[3]["recall"] == 0.5
    assert (rows[2]["tp"], rows[2]["fp"]) == (1, 1)
    assert rows[2]["precision"] == 0.5
    assert (rows[1]["tp"], rows[1]["fp"], rows[1]["fn"]) == (2, 1, 0)
    assert rows[1]["recall"] == 1.0


def test_pr_curve_tied_scores_one_row_per_threshold(spark):
    pairs = [(1, 5), (0, 5), (1, 5), (0, 2)]
    rows = pr_curve(_df(spark, pairs), "y", "score").collect()
    assert len(rows) == 2  # distinct thresholds, not input rows
    at5 = next(r for r in rows if r["threshold"] == 5)
    assert (at5["tp"], at5["fp"]) == (2, 1)


def test_calibration_bins_hand_computed(spark):
    # micros 50_000 → bin 0; 950_000 → bin 9; 1_000_000 clamps into bin 9
    df = spark.createDataFrame(
        [(0, 50_000), (0, 50_000), (1, 950_000), (1, 1_000_000)],
        "y long, micros long",
    )
    rows = {r["bin"]: r for r in calibration_bins(df, "y", "micros").collect()}
    assert set(rows) == {0, 9}
    assert rows[0]["n"] == 2 and rows[0]["frac_pos"] == 0.0
    assert rows[0]["mean_pred"] == 0.05
    assert rows[9]["n"] == 2 and rows[9]["frac_pos"] == 1.0
    assert rows[9]["mean_pred"] == 0.975


def test_auc_plan_no_join_two_exchanges(spark):
    # cells agg (1 exchange) + distinct-score window + totals reuse the
    # same group keys — never a join, never a row-scale sort
    df = spark.createDataFrame([("a", 1, 3), ("a", 0, 1)], "g string, y long, score long")
    plan = (
        roc_auc(df, "y", "score", ["g"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2


def test_calibration_plan_single_aggregation_no_window(spark):
    df = spark.createDataFrame([(1, 500_000)], "y long, micros long")
    plan = (
        calibration_bins(df, "y", "micros")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan and "Join" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1


def test_classification_report_hand_truth(spark):
    from arrow_spark.operators.evaluation import classification_report

    rows = [
        ("a", "a"), ("a", "a"), ("a", "b"),       # a: tp=2, fn=1
        ("b", "b"), ("b", "a"),                   # b: tp=1, fn=1
        ("c", "b"),                               # c: never predicted
    ]
    df = spark.createDataFrame(rows, "t string, p string")
    got = {r["cls"]: r for r in classification_report(df, "t", "p").collect()}
    a, b, c = got["a"], got["b"], got["c"]
    assert (a["support"], a["tp"], a["fp"], a["fn"]) == (3, 2, 1, 1)
    assert a["precision"] == 2 / 3 and a["recall"] == 2 / 3
    assert a["f1"] == 4 / 6  # 2tp/(2tp+fp+fn) = 4/6
    assert (b["tp"], b["fp"], b["fn"]) == (1, 2, 1)
    assert (c["support"], c["tp"], c["precision"]) == (1, 0, None)
    assert c["recall"] == 0.0 and c["f1"] == 0.0


def test_classification_report_invented_class(spark):
    from arrow_spark.operators.evaluation import classification_report

    # model predicts a class that never occurs in truth
    df = spark.createDataFrame([("a", "z"), ("a", "a")], "t string, p string")
    got = {r["cls"]: r for r in classification_report(df, "t", "p").collect()}
    assert got["z"]["support"] == 0 and got["z"]["precision"] == 0.0
    assert got["z"]["recall"] is None


def test_confusion_matrix_cells(spark):
    from arrow_spark.operators.evaluation import confusion_matrix

    df = spark.createDataFrame(
        [("a", "a"), ("a", "b"), ("a", "b"), (None, "a")], "t string, p string"
    )
    got = {(r["truth"], r["pred"]): r["n"] for r in confusion_matrix(df, "t", "p").collect()}
    assert got == {("a", "a"): 1, ("a", "b"): 2}  # NULL row excluded
