"""L4 facade parity checked against LIVE pyarrow on the same files.

The Dataset/Table facades mirror pyarrow's user surface
(python/pyarrow/dataset.py, table.pxi); these tests run the SAME
operation through pyarrow itself and through the facade on the same
fixture parquet and assert equal results — the parity claim is checked
against the reference binary, not our reading of its docs."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from arrow_spark.sources.dataset_facade import dataset as spark_dataset
from arrow_spark.table import Table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


def _rows(tbl: pa.Table):
    """Order-insensitive canonical rows: sorted tuples over sorted
    column names."""
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    return cols, sorted(
        zip(*data), key=lambda t: tuple((x is None, x) for x in t)
    )


def test_dataset_to_table_filter_projection_matches_pyarrow(spark):
    path = os.path.join(SF_DIR, "orders.parquet")
    want = pads.dataset(path).to_table(
        columns=["o_orderkey", "o_totalprice", "o_orderpriority"],
        filter=(pc.field("o_totalprice") > 200000.0)
        & (pc.field("o_orderpriority") == "1-URGENT"),
    )
    got = spark_dataset(spark, path).to_table(
        columns=["o_orderkey", "o_totalprice", "o_orderpriority"],
        filter="o_totalprice > 200000.0 AND o_orderpriority = '1-URGENT'",
    )
    assert want.num_rows > 0
    assert _rows(want) == _rows(got)


def test_dataset_count_rows_with_filter_matches_pyarrow(spark):
    path = os.path.join(SF_DIR, "lineitem.parquet")
    want = pads.dataset(path).count_rows(filter=pc.field("l_quantity") >= 30)
    got = spark_dataset(spark, path).count_rows(filter="l_quantity >= 30")
    assert want > 0 and got == want


def test_dataset_take_matches_pyarrow_file_order(spark):
    """take() defines dataset order as (file path, row position) —
    equal to pyarrow's file-sequential order for a single-file
    dataset, including result ordering."""
    path = os.path.join(SF_DIR, "customer.parquet")
    idx = [0, 7, 3, 101, 50]
    want = pads.dataset(path).take(idx, columns=["c_custkey", "c_name"])
    got = spark_dataset(spark, path).take(idx, columns=["c_custkey", "c_name"])
    # pyarrow take returns rows in the order of `indices`; the facade
    # returns them in position order — compare as positioned sets
    assert sorted(want.to_pylist(), key=lambda d: d["c_custkey"]) == sorted(
        got.to_pylist(), key=lambda d: d["c_custkey"]
    )


def test_table_group_by_aggregate_matches_pyarrow(spark):
    path = os.path.join(SF_DIR, "orders.parquet")
    at = pq.read_table(path)
    want = at.group_by("o_orderpriority").aggregate(
        [
            ("o_totalprice", "sum"),
            ("o_orderkey", "count"),
            ("o_totalprice", "min"),
            ("o_totalprice", "max"),
        ]
    )
    got = (
        Table(spark.read.parquet(path))
        .group_by("o_orderpriority")
        .aggregate(
            [
                ("o_totalprice", "sum"),
                ("o_orderkey", "count"),
                ("o_totalprice", "min"),
                ("o_totalprice", "max"),
            ]
        )
        ._df.toArrow()
    )
    wc, wr = _rows(want)
    gc, gr = _rows(got)
    assert wc == gc, "aggregate output names must match pyarrow's {col}_{fn}"
    assert len(wr) == len(gr) > 0
    for a, b in zip(wr, gr):
        assert a == pytest.approx(b)  # sums of doubles: float-order tolerance


def test_function_options_unparsed_fields_rejected():
    """List-/string-valued FunctionOptions fields the repr parser can't
    see must raise, not silently fall back to defaults (ADVICE r9)."""
    import pyarrow.compute as pc

    from arrow_spark.table import _function_options_dict

    # scalar-valued fields parse fine
    d = _function_options_dict(pc.ScalarAggregateOptions(skip_nulls=False, min_count=3))
    assert d == {"skip_nulls": False, "min_count": 3}
    # q is a list -> the bare-word regex can't capture it -> reject
    with pytest.raises(NotImplementedError, match="q"):
        _function_options_dict(pc.QuantileOptions(q=[0.5, 0.9]))


def test_function_options_equals_inside_quoted_value():
    """An '=' inside a quoted string VALUE must neither mint phantom
    field names nor mask the unparsed-field guard (ADVICE r10)."""
    from arrow_spark.table import _function_options_dict

    class FakeOpts:
        def __repr__(self):
            return "FakeOptions(delim='a=b', n=3)"

    # the quoted field itself is unsupported -> raise names 'delim',
    # never the phantom 'a' the old scan produced
    with pytest.raises(NotImplementedError, match="delim") as ei:
        _function_options_dict(FakeOpts())
    assert "'a'" not in str(ei.value)

    class MaskOpts:
        # pathological: value contains 'v=1' which the old scalar scan
        # parsed as the real field v -> silently wrong value
        def __repr__(self):
            return "MaskOptions(v='v=1')"

    with pytest.raises(NotImplementedError, match="v"):
        _function_options_dict(MaskOpts())


def test_table_group_by_mean_matches_pyarrow(spark):
    path = os.path.join(SF_DIR, "lineitem.parquet")
    at = pq.read_table(path)
    want = at.group_by("l_returnflag").aggregate([("l_quantity", "mean")])
    got = (
        Table(spark.read.parquet(path))
        .group_by("l_returnflag")
        .aggregate([("l_quantity", "mean")])
        ._df.toArrow()
    )
    wc, wr = _rows(want)
    gc, gr = _rows(got)
    assert wc == gc
    for a, b in zip(wr, gr):
        assert a == pytest.approx(b)


def test_table_filter_sort_unique_matches_pyarrow(spark):
    path = os.path.join(SF_DIR, "nation.parquet")
    at = pq.read_table(path)
    want = (
        at.filter(pc.field("n_regionkey") >= 2)
        .select(["n_regionkey", "n_name"])
        .sort_by([("n_name", "ascending")])
    )
    got = (
        Table(spark.read.parquet(path))
        .filter("n_regionkey >= 2")
        .select(["n_regionkey", "n_name"])
        .sort_by([("n_name", "ascending")])
        ._df.toArrow()
    )
    assert want.to_pylist() == got.to_pylist()

    want_u = at.select(["n_regionkey"]).group_by("n_regionkey").aggregate([])
    got_u = Table(spark.read.parquet(path)).select(["n_regionkey"]).unique()
    assert sorted(want_u.column("n_regionkey").to_pylist()) == sorted(
        got_u._df.toArrow().column("n_regionkey").to_pylist()
    )


def test_table_join_matches_pyarrow(spark):
    npath = os.path.join(SF_DIR, "nation.parquet")
    rpath = os.path.join(SF_DIR, "region.parquet")
    want = pq.read_table(npath).join(
        pq.read_table(rpath), keys="n_regionkey", right_keys="r_regionkey"
    )
    got = Table(spark.read.parquet(npath)).join(
        Table(spark.read.parquet(rpath)),
        keys="n_regionkey",
        right_keys="r_regionkey",
    )
    wc, wr = _rows(want)
    gc, gr = _rows(got._df.toArrow())
    assert wc == gc and wr == gr


def test_table_join_coalesce_modes_match_pyarrow(spark):
    """coalesce_keys parity on differing key names: True folds the
    right key into the left name for inner/left (full outer takes
    whichever side matched); right outer keeps the RIGHT key column
    (populated for unmatched right rows) and drops the left key;
    False keeps both key columns — exactly pyarrow's acero.py
    _perform_join behavior, checked live."""
    lt = pa.table({"lk": [1, 2, 3], "v": [10, 20, 30]})
    rt = pa.table({"rk": [2, 3, 4], "w": [200, 300, 400]})
    ls = Table(spark.createDataFrame(lt.to_pylist(), "lk long, v long"))
    rs = Table(spark.createDataFrame(rt.to_pylist(), "rk long, w long"))
    for join_type in ("inner", "left outer", "right outer", "full outer"):
        for coalesce in (True, False):
            want = lt.join(
                rt, "lk", right_keys="rk", join_type=join_type,
                coalesce_keys=coalesce,
            )
            got = ls.join(
                rs, "lk", right_keys="rk", join_type=join_type,
                coalesce_keys=coalesce,
            )._df.toArrow()
            assert _rows(want) == _rows(got), (join_type, coalesce)


def test_ipc_files_readable_by_pyarrow_feather(spark, tmp_path):
    """Interop, not just round-trip: files our writer emits must be
    readable by the reference's own Feather/IPC reader, and files the
    reference writes must be readable by our reader — equal contents
    both ways."""
    import pyarrow.feather as feather

    from arrow_spark.sources import read_ipc, write_ipc

    src = spark.read.parquet(os.path.join(SF_DIR, "nation.parquet"))
    want = sorted(
        (r["n_nationkey"], r["n_name"], r["n_regionkey"]) for r in src.collect()
    )

    # ours -> pyarrow
    out = str(tmp_path / "nation_ipc")
    write_ipc(src, out, compression="zstd")
    parts = sorted(
        os.path.join(out, f) for f in os.listdir(out) if f.endswith(".arrow")
    )
    assert parts
    got = []
    for p in parts:
        t = feather.read_table(p)
        got += list(
            zip(
                t.column("n_nationkey").to_pylist(),
                t.column("n_name").to_pylist(),
                t.column("n_regionkey").to_pylist(),
            )
        )
    assert sorted(got) == want

    # pyarrow -> ours
    pa_dir = tmp_path / "nation_pa"
    pa_dir.mkdir()
    feather.write_feather(
        pq.read_table(os.path.join(SF_DIR, "nation.parquet")),
        str(pa_dir / "part-0.arrow"),
        compression="zstd",
    )
    back = read_ipc(spark, str(pa_dir))
    got2 = sorted(
        (r["n_nationkey"], r["n_name"], r["n_regionkey"]) for r in back.collect()
    )
    assert got2 == want


def test_multifile_dataset_scan_matches_pyarrow(spark, tmp_path):
    """Multi-file dataset discovery: the same two-file directory read
    by pyarrow.dataset and by the facade yields identical filtered
    projections (order-insensitive) and identical count_rows."""
    src = pq.read_table(os.path.join(SF_DIR, "customer.parquet"))
    d = tmp_path / "multi"
    d.mkdir()
    n = src.num_rows
    pq.write_table(src.slice(0, n // 2), str(d / "a.parquet"))
    pq.write_table(src.slice(n // 2), str(d / "b.parquet"))

    want = pads.dataset(str(d)).to_table(
        columns=["c_custkey", "c_acctbal"], filter=pc.field("c_acctbal") > 0
    )
    got = spark_dataset(spark, str(d)).to_table(
        columns=["c_custkey", "c_acctbal"], filter="c_acctbal > 0"
    )
    assert want.num_rows > 0
    assert _rows(want) == _rows(got)
    assert pads.dataset(str(d)).count_rows() == spark_dataset(
        spark, str(d)
    ).count_rows()
