"""MAD outlier flagging: hand-computed truths, degenerate-MAD behavior,
and the one-Exchange/no-join plan pin. Plus CMS join-cardinality and
Simpson-index ground truths (small, exact)."""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_spark.catalog import table
from arrow_spark.llm.corpus import simpson_index
from arrow_spark.operators.outliers import mad_outliers
from arrow_spark.operators.sketches import cms_join_cardinality


def test_mad_hand_computed(spark):
    # group 1: values 1..9 plus a wild 1000. median=5.5, deviations
    # {4.5,3.5,2.5,1.5,0.5,0.5,1.5,2.5,3.5,994.5}, MAD=2.5,
    # threshold=3*1.4826*2.5=11.1195 -> only 1000 flagged
    rows = [(1, i, v) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 1000])]
    df = spark.createDataFrame(rows, "k long, i long, x long")
    out = {r["x"]: r for r in mad_outliers(df, ["k"], "x").collect()}
    assert out[1000]["is_outlier"] and out[1000]["median"] == 5.5
    assert out[1000]["mad"] == 2.5
    assert all(not out[v]["is_outlier"] for v in range(1, 10))


def test_mad_degenerate_group_flags_off_median(spark):
    # >half the group identical: MAD=0, anything off the median flags
    rows = [(1, i, v) for i, v in enumerate([5, 5, 5, 5, 6])]
    df = spark.createDataFrame(rows, "k long, i long, x long")
    out = {r["i"]: r["is_outlier"] for r in mad_outliers(df, ["k"], "x").collect()}
    assert out[4] is True and not any(out[i] for i in range(4))


def test_mad_plan_single_exchange_no_join(spark, sf_dir):
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    plan = (
        mad_outliers(ev, ["user_id"], "cents")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_cms_join_cardinality_never_undercounts(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    exact = l.join(o, l["l_orderkey"] == o["o_orderkey"]).count()
    est = cms_join_cardinality(l, "l_orderkey", o, "o_orderkey",
                               width=4096, depth=4).collect()[0]["join_size_est"]
    assert est >= exact
    # 4096 buckets vs ~1500 keys: collision mass is a few percent, not 2x
    assert est <= exact * 1.5


def test_cms_join_cardinality_deterministic(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    a = cms_join_cardinality(l, "l_suppkey", o, "o_custkey").collect()
    b = cms_join_cardinality(l, "l_suppkey", o, "o_custkey").collect()
    assert a == b


def test_simpson_index_ground_truth(spark):
    docs = spark.createDataFrame(
        [(1, "a a a a", "s1"), (2, "a b c d", "s2")],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in simpson_index(docs).collect()}
    # s1: n=4 of one word -> 4*3/(4*3) = 1.0 ; s2: all distinct -> 0.0
    assert out["s1"]["simpson"] == 1.0 and out["s1"]["simpson_num"] == 12
    assert out["s2"]["simpson"] == 0.0 and out["s2"]["distinct_words"] == 4


def test_cms_join_cardinality_empty_side(spark):
    a = spark.createDataFrame([(1,)], "k long").where("k < 0")  # empty
    b = spark.createDataFrame([(1,), (2,)], "k long")
    row = cms_join_cardinality(a, "k", b, "k").collect()[0]
    # empty sketch -> every depth row's dot product is 0 -> exact 0
    # estimate (min over the static depth-row frame, not NULL)
    assert row["join_size_est"] == 0


def test_cms_join_cardinality_disjoint_keys_estimates_zero_or_small(spark):
    # disjoint key sets: true join size 0; a depth row with no aligned
    # cells must still contribute its 0 dot product to the min
    a = spark.createDataFrame([(i,) for i in range(1, 5)], "k long")
    b = spark.createDataFrame([(i,) for i in range(1000, 1004)], "k long")
    row = cms_join_cardinality(a, "k", b, "k", width=4096, depth=4).collect()[0]
    assert row["join_size_est"] is not None
    assert 0 <= row["join_size_est"] <= 4  # >=0 exact, tiny collision slack


def test_mad_null_values_ignored_by_percentile(spark):
    rows = [(1, 0, 5), (1, 1, None), (1, 2, 7)]
    df = spark.createDataFrame(rows, "k long, i long, x long")
    out = {r["i"]: r for r in mad_outliers(df, ["k"], "x").collect()}
    assert out[0]["median"] == 6.0  # percentile skips the null
    assert out[1]["is_outlier"] is None  # null value -> null flag, not a crash


def test_seasonal_residuals_removes_known_seasonality(spark):
    from arrow_spark.operators.outliers import seasonal_residuals

    # season s baseline = 100*s; one genuine anomaly at (s=1, x=1000)
    rows = []
    i = 0
    for s in (0, 1):
        for v in (100 * s, 100 * s, 100 * s + 2, 100 * s - 2, 100 * s + 1):
            rows.append((1, i, s, v)); i += 1
    rows.append((1, i, 1, 1000))
    df = spark.createDataFrame(rows, "k long, i long, season long, x long")
    out = {r["i"]: r for r in seasonal_residuals(df, ["k"], "season", "x").collect()}
    assert out[i]["season_flag"] is True           # the planted anomaly
    assert sum(1 for r in out.values() if r["season_flag"]) == 1
    # season-1 median includes the anomaly row: sorted {98,100,100,101,
    # 102,1000} -> (100+101)/2
    assert out[0]["baseline"] == 0.0 and out[5]["baseline"] == 100.5
