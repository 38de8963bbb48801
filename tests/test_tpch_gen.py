"""The dbgen-equivalent partsupp generator: structural invariants the
formula must keep at every fixture scale (the cross-engine row equality
itself is oracle-checked by tpch_partsupp_gen)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from arrow_spark.sources.tpchgen import partsupp


@pytest.mark.parametrize("s_cnt,p_cnt", [(10, 200), (100, 2000), (1000, 20000)])
def test_stride_keeps_four_suppliers_distinct(s_cnt, p_cnt):
    # pure-python mirror of the formula at every fixture (S, P) scale
    for p in range(p_cnt):
        stride = s_cnt // 4 + (p // s_cnt) % max(s_cnt // 4, 1)
        supps = {(p + i * stride) % s_cnt for i in range(4)}
        assert len(supps) == 4, (p, stride, supps)


def test_partsupp_shape_and_ranges(spark, sf_dir):
    ps = partsupp(spark, sf_dir)
    n_part = spark.read.parquet(f"{sf_dir}/part.parquet").count()
    n_supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").count()
    assert ps.count() == 4 * n_part
    per_part = ps.groupBy("ps_partkey").agg(
        F.countDistinct("ps_suppkey").alias("n")
    )
    assert per_part.where(F.col("n") != 4).count() == 0
    stats = ps.agg(
        F.min("ps_suppkey"), F.max("ps_suppkey"),
        F.min("ps_availqty"), F.max("ps_availqty"),
        F.min("ps_supplycost"), F.max("ps_supplycost"),
    ).first()
    assert stats[0] >= 0 and stats[1] < n_supp
    assert stats[2] >= 1 and stats[3] <= 9999
    assert stats[4] >= 1.0 and stats[5] < 1000.0


def test_partsupp_is_deterministic(spark, sf_dir):
    a = sorted(map(tuple, partsupp(spark, sf_dir).collect()))
    b = sorted(map(tuple, partsupp(spark, sf_dir).collect()))
    assert a == b


def test_generate_tables_fk_integrity_and_counts(spark):
    from arrow_spark.sources.tpchgen import gen_sizes, generate_tables

    t = generate_tables(spark, 0.001)
    sz = gen_sizes(0.001)
    for name in ("region", "nation", "supplier", "customer", "part", "orders"):
        assert t[name].count() == sz[name], name
    assert t["partsupp"].count() == 4 * sz["part"]
    li = t["lineitem"]
    # every lineitem (partkey, suppkey) exists in generated partsupp
    orphans = li.join(
        t["partsupp"],
        (li.l_partkey == F.col("ps_partkey")) & (li.l_suppkey == F.col("ps_suppkey")),
        "left_anti",
    ).count()
    assert orphans == 0
    # o_custkey indexes customer; keys dense 0..n-1
    assert t["orders"].agg(F.max("o_custkey")).first()[0] < sz["customer"]
    # 1..7 lines per order, line numbers dense
    per = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n"), F.max("l_linenumber").alias("mx")
    )
    assert per.where((F.col("n") != F.col("mx")) | (F.col("n") > 7)).count() == 0


def test_generated_q1_runs_and_is_deterministic(spark):
    # the tpch_benchmark.cc usage shape: run Q1 against generated data
    from arrow_spark.sources.tpchgen import generate_tables

    def q1(sf):
        li = generate_tables(spark, sf)["lineitem"]
        return {
            (r.l_returnflag, r.l_linestatus): (round(r.s, 2), r.n)
            for r in li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        }

    a, b = q1(0.001), q1(0.001)
    assert a == b and len(a) == 6
