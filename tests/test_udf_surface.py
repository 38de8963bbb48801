"""UDF registration surface parity (pyarrow register_* entry points,
SURVEY §2.2.10): scalar / vector / aggregate / tabular UDFs land in the
shared function registry and execute Arrow-batched."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from arrow_spark.functions import call
from arrow_spark.functions.udf import (
    apply_vector_function,
    call_tabular_function,
    register_aggregate_function,
    register_scalar_function,
    register_tabular_function,
    register_vector_function,
)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        pd.DataFrame({"x": [1.0, 2.0, 3.0, 4.0], "g": ["a", "a", "b", "b"]})
    )


def test_scalar_udf_roundtrip(spark, df):
    def affine(ctx, x: pd.Series) -> pd.Series:
        assert ctx.batch_length == len(x)
        return x * 2 + 1

    register_scalar_function(
        affine, "test_affine", {"summary": "2x+1"}, {"x": "double"}, "double"
    )
    out = df.select(call("test_affine", "x").alias("v")).orderBy("v").collect()
    assert [r.v for r in out] == [3.0, 5.0, 7.0, 9.0]


def test_vector_udf_whole_batch(spark, df):
    import pyarrow as pa

    def double_and_filter(ctx, batch: pa.RecordBatch):
        t = pa.table(batch)
        import pyarrow.compute as pc

        return t.filter(pc.greater(t.column("x"), 1.5))  # Table return shape

    register_vector_function(
        double_and_filter, "test_vecfilter", {"summary": "filter>1.5"}, {}, None
    )
    out = apply_vector_function("test_vecfilter", df, df.schema)
    assert out.count() == 3  # length-changing vector kernel


def test_aggregate_udf_group_by(spark, df):
    def span(ctx, x: pd.Series) -> float:
        return float(x.max() - x.min())

    register_aggregate_function(
        span, "test_span", {"summary": "max-min"}, {"x": "double"}, "double"
    )
    rows = {
        r.g: r.s
        for r in df.groupBy("g").agg(call("test_span", "x").alias("s")).collect()
    }
    assert rows == {"a": 1.0, "b": 1.0}
    scalar = df.agg(call("test_span", "x").alias("s")).collect()[0].s
    assert scalar == 3.0  # scalar mode over the whole input


def test_tabular_udf(spark):
    import pyarrow as pa

    def gen():
        return pa.table({"k": [1, 2, 3], "v": ["a", "b", "c"]})

    register_tabular_function(gen, "test_tab", {"summary": "const table"})
    out = call_tabular_function("test_tab", spark)
    assert out.count() == 3 and set(out.columns) == {"k", "v"}


def test_duplicate_name_rejected(spark):
    with pytest.raises(ValueError):
        register_scalar_function(
            lambda ctx, x: x, "test_affine", {"summary": "dup"}, {}, "double"
        )
