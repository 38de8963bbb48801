"""pyarrow-facade parity tests: the Table/TableGroupBy surface a
reference user would port to (python/pyarrow/table.pxi, acero.py)."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from arrow_spark.table import Table


@pytest.fixture(scope="module")
def t(spark):
    return Table.from_pydict(
        spark,
        {
            "k": ["a", "a", "b", "b", "c"],
            "v": [1.0, 2.0, 3.0, 4.0, None],
            "w": [10, 20, 30, 40, 50],
        },
    )


def test_introspection(t):
    assert t.num_rows == 5
    assert t.column_names == ["k", "v", "w"]
    assert t.num_columns == 3


def test_filter_select_slice(t):
    out = t.filter(F.col("w") > 15).select(["k", "w"]).sort_by("w")
    assert out.to_pydict()["w"] == [20, 30, 40, 50]
    assert t.sort_by("w").slice(1, 2).to_pydict()["w"] == [20, 30]


def test_group_by_aggregate_arrow_names(t):
    out = t.group_by("k").aggregate([("v", "sum"), ("w", "hash_max"), ("v", "count")])
    got = {r["k"]: r for r in out.to_pandas().to_dict("records")}
    assert got["a"]["v_sum"] == 3.0
    assert got["b"]["w_hash_max"] == 40
    assert got["c"]["v_count"] == 0  # null skipped, Arrow count ONLY_VALID default


def test_join_arrow_type_names(spark, t):
    dim = Table.from_pydict(spark, {"k": ["a", "b"], "tag": ["x", "y"]})
    out = t.join(dim, "k", join_type="inner")
    assert out.num_rows == 4
    anti = t.join(dim, "k", join_type="left anti")
    assert anti.to_pydict()["k"] == ["c"]
    rsemi = t.join(dim, "k", join_type="right semi")
    assert sorted(rsemi.to_pydict()["k"]) == ["a", "b"]


def test_append_rename_drop(t):
    out = t.append_column("v2", F.col("w") * 2).drop_columns(["v"])
    assert "v2" in out.column_names and "v" not in out.column_names
    renamed = out.rename_columns(["key", "weight", "double_w"])
    assert renamed.column_names == ["key", "weight", "double_w"]


def test_eager_kernel_call(t):
    col = t.call_function("add", "v", "w")
    assert t.df.select(col.alias("s")).collect()[0].s == 11.0


def test_join_asof_signed_tolerance(spark):
    """Table.join_asof parity: negative tolerance = backward within
    |tol| (pyarrow table.pxi semantics)."""
    import pandas as pd

    from arrow_spark.table import Table

    quotes = Table.from_pandas(
        spark,
        pd.DataFrame({"t": [1, 5, 10], "k": ["x", "x", "x"], "px": [1.0, 2.0, 3.0]}),
    )
    trades = Table.from_pandas(
        spark,
        pd.DataFrame({"ts": [6, 12, 30], "sym": ["x", "x", "x"], "qty": [7, 8, 9]}),
    )
    out = quotes.join_asof(
        trades, on="t", by="k", tolerance=-4, right_on="ts", right_by="sym"
    )
    rows = {r["t"]: r["qty"] for r in out.df.collect()}
    # t=10 ← trade at 6 (within 4 back); t=1,5 have no trade ≤ them in range
    assert rows == {1: None, 5: None, 10: 7}
