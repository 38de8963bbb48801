"""Type-adapter tests: Arrow-only types (unsigned, time32/64, half
float, dictionary, large offsets) read through the IPC source into
Spark types per the SURVEY §1.2 mapping — values preserved."""

from __future__ import annotations

import decimal

import pyarrow as pa
import pyarrow.ipc as ipc
import pytest

from arrow_spark.sources import read_ipc
from arrow_spark.types import normalize_arrow_schema, normalize_arrow_type


def _write_ipc_table(tmp_path, table: pa.Table) -> str:
    d = tmp_path / "arrow_only"
    d.mkdir()
    p = str(d / "part-0.arrow")
    with ipc.new_file(p, table.schema) as w:
        w.write_table(table)
    return str(d)


def test_unsigned_and_time_types_round_trip(spark, tmp_path):
    table = pa.table(
        {
            "u8": pa.array([0, 255, None], pa.uint8()),
            "u32": pa.array([0, 2**32 - 1, None], pa.uint32()),
            "u64": pa.array([0, 2**64 - 1, None], pa.uint64()),
            "t32": pa.array([0, 12 * 3600 * 1000, None], pa.time32("ms")),
            "t64": pa.array([0, 86399_999_999, None], pa.time64("us")),
            "f16": pa.array([1.5, -2.0, None], pa.float32()).cast(pa.float16()),
            "dict": pa.array(["a", "b", "a"]).dictionary_encode(),
            "ls": pa.array(["x", "y", None], pa.large_string()),
        }
    )
    path = _write_ipc_table(tmp_path, table)
    df = read_ipc(spark, path)
    dt = dict(df.dtypes)
    assert dt["u8"] == "smallint" and dt["u32"] == "bigint"
    assert dt["u64"] == "decimal(20,0)"
    assert dt["t32"] == "bigint" and dt["t64"] == "bigint"
    assert dt["f16"] == "float" and dt["dict"] == "string" and dt["ls"] == "string"
    rows = df.collect()
    assert rows[1].u8 == 255
    assert rows[1].u32 == 2**32 - 1
    assert rows[1].u64 == decimal.Decimal(2**64 - 1)  # lossless at the top
    assert rows[1].t32 == 12 * 3600 * 1_000_000  # micros since midnight
    assert rows[1].t64 == 86399_999_999
    assert rows[2].u8 is None and rows[2].ls is None
    assert rows[2].dict == "a"  # dictionary decoded


def test_ns_timestamp_truncates_to_us(spark, tmp_path):
    ts = pa.array([1_700_000_000_123_456_789], pa.timestamp("ns"))
    path = _write_ipc_table(tmp_path, pa.table({"ts": ts}))
    df = read_ipc(spark, path)
    assert dict(df.dtypes)["ts"].startswith("timestamp")
    v = df.collect()[0].ts
    assert v.microsecond == 123456  # ns truncated, µs kept


def test_decimal_over_38_rejected():
    with pytest.raises(NotImplementedError):
        normalize_arrow_type(pa.decimal256(50, 10))


def test_nested_normalization():
    s = pa.schema(
        [
            pa.field("l", pa.list_(pa.uint16())),
            pa.field("st", pa.struct([pa.field("x", pa.uint32())])),
        ]
    )
    norm, changed = normalize_arrow_schema(s)
    assert changed
    assert norm.field("l").type == pa.list_(pa.int32())
    assert norm.field("st").type == pa.struct([pa.field("x", pa.int64())])


def test_union_decodes_to_tagged_struct(spark, tmp_path):
    # sparse and dense unions (type_fwd.h ids 27-29) → struct(tag, branches)
    # through the real IPC read path
    import pyarrow as pa
    import pyarrow.ipc as ipc

    from arrow_spark.sources.ipc import read_ipc

    ints = pa.array([1, None, 3, None], pa.int64())
    strs = pa.array([None, "b", None, "d"], pa.string())
    codes = pa.array([0, 1, 0, 1], pa.int8())
    sparse = pa.UnionArray.from_sparse(codes, [ints, strs], field_names=["i", "s"])

    dints = pa.array([1, 3], pa.int64())
    dstrs = pa.array(["b", "d"], pa.string())
    offsets = pa.array([0, 0, 1, 1], pa.int32())
    dense = pa.UnionArray.from_dense(codes, offsets, [dints, dstrs], field_names=["i", "s"])

    for name, arr in (("sparse", sparse), ("dense", dense)):
        tbl = pa.table({"u": arr, "row": pa.array(range(4), pa.int64())})
        path = str(tmp_path / f"union_{name}")
        import os

        os.makedirs(path, exist_ok=True)
        with ipc.new_file(f"{path}/part0.arrow", tbl.schema) as w:
            w.write_table(tbl)
        df = read_ipc(spark, path)
        rows = {r.row: (r.u.tag, r.u.i, r.u.s) for r in df.collect()}
        assert rows == {
            0: (0, 1, None),
            1: (1, None, "b"),
            2: (0, 3, None),
            3: (1, None, "d"),
        }, name


def test_fixed_shape_tensor_decodes_to_flat_list(spark, tmp_path):
    """arrow.fixed_shape_tensor (canonical extension,
    cpp/src/arrow/extension/fixed_shape_tensor.h) → flat value list;
    the 2×2 shape survives only as the documented metadata note."""
    import numpy as np

    tensor_type = pa.fixed_shape_tensor(pa.float32(), [2, 2])
    storage = pa.array(
        [[1.0, 2.0, 3.0, 4.0], [5.0, 6.0, 7.0, 8.0]],
        pa.list_(pa.float32(), 4),
    )
    arr = pa.ExtensionArray.from_storage(tensor_type, storage)
    table = pa.table({"t": arr, "vec_id": pa.array([0, 1], pa.int64())})
    path = _write_ipc_table(tmp_path, table)
    df = read_ipc(spark, path)
    assert dict(df.dtypes)["t"] == "array<float>"
    got = {r["vec_id"]: list(r["t"]) for r in df.collect()}
    assert got[0] == [1.0, 2.0, 3.0, 4.0]
    assert got[1] == [5.0, 6.0, 7.0, 8.0]
    norm, changed = normalize_arrow_schema(table.schema)
    assert changed
    assert b"fixed_shape_tensor" in norm.field("t").metadata[b"arrow_spark.original_type"]
