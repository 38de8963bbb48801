"""Cohort retention and keyness: hand-computable ground truths."""

from __future__ import annotations

from datetime import datetime

from arrow_spark.llm.corpus import keyness_terms
from arrow_spark.operators.cohorts import cohort_retention


def _ts(day: int) -> datetime:
    return datetime(2024, 1, day, 12, 0, 0)


def test_cohort_retention_hand_computed(spark):
    # week boundaries at epoch multiples of 604800; Jan 2024 days 1-7
    # and 8-14 land in consecutive buckets (Jan 4 2024 is a boundary).
    rows = [
        (1, _ts(1)), (1, _ts(9)),           # user 1: cohort w0, active w1
        (2, _ts(2)),                        # user 2: cohort w0 only
        (3, _ts(9)), (3, _ts(10)),          # user 3: cohort w1 (dedup within week)
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    base = 1704110400 // 604800  # floor(epoch(2024-01-01T12:00Z)/week) = 2817
    out = {(r["cohort_p"] - base, r["offset"]): r
           for r in cohort_retention(ev).collect()}
    assert out[(0, 0)]["cohort_size"] == 2 and out[(0, 0)]["retention"] == 1.0
    assert out[(0, 1)]["n_active"] == 1 and out[(0, 1)]["retention"] == 0.5
    assert out[(1, 0)]["cohort_size"] == 1
    assert (1, 1) not in out


def test_keyness_discriminative_term_ranks_first(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha alpha alpha beta", "s1"),
            (2, "alpha alpha beta beta", "s1"),
            (3, "gamma gamma gamma beta", "s2"),
            (4, "gamma beta beta beta", "s2"),
        ],
        "doc_id long, text string, lang string",
    ).withColumnRenamed("lang", "source")
    out = {(r["source"], r["rank"]): r["term"]
           for r in keyness_terms(docs, k=2).collect()}
    assert out[("s1", 1)] == "alpha"   # only in s1
    assert out[("s2", 1)] == "gamma"   # only in s2


def test_kaplan_meier_textbook_example(spark):
    from arrow_spark.operators.survival import kaplan_meier

    # classic toy: durations 1,2+,3,4+ (+= censored), one group
    rows = [(1, 1, 1), (1, 2, 0), (1, 3, 1), (1, 4, 0)]
    df = spark.createDataFrame(rows, "g long, t long, e long")
    out = {r["t"]: r for r in kaplan_meier(df, ["g"], "t", "e").collect()}
    # t=1: n=4, d=1 -> S=3/4 ; t=2: censored only, S unchanged
    # t=3: n=2, d=1 -> S=3/4 * 1/2 = 3/8 ; t=4: censored, unchanged
    assert out[1]["n_at_risk"] == 4 and out[1]["survival"] == 0.75
    assert out[2]["d_events"] == 0 and out[2]["survival"] == 0.75
    assert out[3]["n_at_risk"] == 2 and out[3]["survival"] == 0.375
    assert out[4]["n_censored"] == 1 and out[4]["survival"] == 0.375


def test_kaplan_meier_no_censoring_equals_empirical_survival(spark):
    from arrow_spark.operators.survival import kaplan_meier

    # all events observed: S(t) must equal the plain empirical fraction
    # still alive after t
    durations = [1, 1, 2, 3, 3, 3, 5, 8]
    df = spark.createDataFrame(
        [(1, t, 1) for t in durations], "g long, t long, e long"
    )
    out = {r["t"]: r["survival"] for r in kaplan_meier(df, ["g"], "t", "e").collect()}
    n = len(durations)
    for t in sorted(set(durations)):
        assert out[t] == sum(1 for d in durations if d > t) / n


def test_rfm_scores_hand_truth(spark):
    from arrow_spark.operators.cohorts import rfm_scores

    # 5 customers, clean quintiles; recency: SMALLER days = better
    rows = [
        (1, 1, 50, 500),   # most recent, most frequent, biggest spender
        (2, 10, 40, 400),
        (3, 20, 30, 300),
        (4, 30, 20, 200),
        (5, 40, 10, 100),
    ]
    df = spark.createDataFrame(rows, "id long, r long, f long, m long")
    got = {r["id"]: r for r in rfm_scores(df, "id", "r", "f", "m").collect()}
    assert got[1]["segment"] == "R5F5M5"
    assert got[5]["segment"] == "R1F1M1"
    assert got[3]["r_score"] == 3 and got[3]["f_score"] == 3
    assert got[1]["r"] == 1 and got[1]["m"] == 500


def test_rfm_tile_remainder_deterministic(spark):
    from arrow_spark.operators.cohorts import rfm_scores

    # 7 ids over 5 tiles: remainder goes to the FIRST tiles (SQL rule);
    # ties in value resolve by id
    rows = [(i, 1, 1, 1) for i in range(1, 8)]
    df = spark.createDataFrame(rows, "id long, r long, f long, m long")
    got = {r["id"]: r["f_score"] for r in rfm_scores(df, "id", "r", "f", "m").collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 3, 6: 4, 7: 5}
