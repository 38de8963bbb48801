"""Declaration-graph compilation: the Acero-style plan surface
(exec_plan.h Declaration) produces the same results as the direct
DataFrame API."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from arrow_spark.plans import Declaration


def test_scan_filter_project_aggregate_orderby(spark, sf_dir):
    plan = Declaration(
        "order_by",
        {"sort_keys": [("l_returnflag", "ascending")]},
        inputs=[
            Declaration(
                "aggregate",
                {
                    "aggregates": [
                        ("l_quantity", "hash_sum", "sum_qty"),
                        ("", "hash_count_all", "n"),
                    ],
                    "keys": ["l_returnflag"],
                },
                inputs=[
                    Declaration(
                        "scan",
                        {
                            "path": f"{sf_dir}/lineitem.parquet",
                            "filter": F.col("l_quantity") > 10,
                            "columns": ["l_returnflag", "l_quantity"],
                        },
                    )
                ],
            )
        ],
    )
    got = plan.to_dataframe(spark).collect()
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    want = (
        l.where(F.col("l_quantity") > 10)
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n"))
        .orderBy("l_returnflag")
        .collect()
    )
    assert [r.asDict() for r in got] == [r.asDict() for r in want]


def test_hashjoin_declaration_with_residual(spark, sf_dir):
    scan_o = Declaration("scan", {"path": f"{sf_dir}/orders.parquet"})
    scan_c = Declaration("scan", {"path": f"{sf_dir}/customer.parquet"})
    j = Declaration(
        "hashjoin",
        {
            "join_type": "inner",
            "left_keys": ["o_custkey"],
            "right_keys": ["c_custkey"],
            "filter": F.col("o_totalprice") > 100000,
        },
        inputs=[scan_o, scan_c],
    )
    df = j.to_dataframe(spark)
    n = df.count()
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    want = o.join(
        c, (o.o_custkey == c.c_custkey) & (o.o_totalprice > 100000)
    ).count()
    assert n == want and n > 0


def test_union_fetch(spark, sf_dir):
    s = Declaration("scan", {"path": f"{sf_dir}/region.parquet"})
    u = Declaration("union", {}, inputs=[s, s])
    fetched = Declaration("fetch", {"offset": 2, "count": 5}, inputs=[u])
    assert fetched.to_dataframe(spark).count() == 5


def test_asof_declaration(spark, sf_dir):
    import pandas as pd

    from arrow_spark.catalog import table

    e = table(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click")
    purch = e.where(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    d = Declaration(
        "asofjoin",
        {"on": "ts", "by": ["user_id"], "tolerance": -pd.Timedelta(days=1)},
        inputs=[
            Declaration("table_source", {"dataframe": clicks}),
            Declaration("table_source", {"dataframe": purch}),
        ],
    )
    out = d.to_dataframe(spark)
    assert out.count() == clicks.count()


def test_unknown_factory_raises(spark):
    with pytest.raises(KeyError):
        Declaration("flux_capacitor", {}).to_dataframe(spark)


def test_aggregate_with_segment_keys(spark, sf_dir):
    # AggregateNodeOptions.segment_keys (options.h:304-313) through the
    # Declaration facade — equals the plain grouped twin
    from arrow_spark.plans.declaration import Declaration

    src = Declaration("scan", {"path": f"{sf_dir}/lineitem.parquet",
                               "columns": ["l_returnflag", "l_linestatus", "l_quantity"]})
    agg = Declaration(
        "aggregate",
        {
            "aggregates": [("l_quantity", "hash_count", "n")],
            "keys": ["l_linestatus"],
            "segment_keys": ["l_returnflag"],
        },
        inputs=[src],
    )
    got = {(r.l_returnflag, r.l_linestatus): r.n for r in agg.to_dataframe(spark).collect()}
    import pyspark.sql.functions as F

    twin = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count("l_quantity").alias("n"))
    )
    assert got == {(r.l_returnflag, r.l_linestatus): r.n for r in twin.collect()}


def test_sorted_merge_factory(spark, sf_dir):
    evens = Declaration(
        "filter",
        {"filter_expression": F.col("o_orderkey") % 2 == 0},
        inputs=[Declaration("scan", {"path": f"{sf_dir}/orders.parquet",
                                     "columns": ["o_orderkey", "o_totalprice"]})],
    )
    odds = Declaration(
        "filter",
        {"filter_expression": F.col("o_orderkey") % 2 == 1},
        inputs=[Declaration("scan", {"path": f"{sf_dir}/orders.parquet",
                                     "columns": ["o_orderkey", "o_totalprice"]})],
    )
    plan = Declaration(
        "sorted_merge", {"sort_keys": [("o_orderkey", "ascending")]},
        inputs=[evens, odds],
    )
    got = [r.o_orderkey for r in plan.to_dataframe(spark).collect()]
    assert got == sorted(got)
    assert len(got) == spark.read.parquet(f"{sf_dir}/orders.parquet").count()


def test_tee_factory_writes_and_passes_through(spark, sf_dir, tmp_path):
    out_dir = str(tmp_path / "tee_out")
    plan = Declaration(
        "fetch", {"count": 5},
        inputs=[
            Declaration(
                "tee", {"base_dir": out_dir},
                inputs=[
                    Declaration(
                        "scan",
                        {"path": f"{sf_dir}/region.parquet",
                         "columns": ["r_regionkey", "r_name"]},
                    )
                ],
            )
        ],
    )
    passed = plan.to_dataframe(spark)
    assert passed.count() == 5
    written = spark.read.parquet(out_dir)
    assert sorted(r.r_name for r in written.collect()) == sorted(
        r.r_name for r in spark.read.parquet(f"{sf_dir}/region.parquet").collect()
    )


def test_pivot_wider_factory(spark, sf_dir):
    plan = Declaration(
        "pivot_wider",
        {"keys": ["l_returnflag"], "key_name": "l_linestatus",
         "key_names": ["O", "F"], "values": "l_quantity", "agg": "sum"},
        inputs=[Declaration("scan", {"path": f"{sf_dir}/lineitem.parquet"})],
    )
    got = {r.l_returnflag: (r.O, r.F) for r in plan.to_dataframe(spark).collect()}
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    want = {
        r.l_returnflag: (r.O, r.F)
        for r in l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum("l_quantity"))
        .collect()
    }
    assert got == want
