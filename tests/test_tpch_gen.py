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
