"""Property test of the type-normalization boundary with random schemas.

Mirrors the reference's own edge-case hunt
(python/pyarrow/tests/strategies.py:22-50 — hypothesis strategies over
composed types): random nested types + random values, round-tripped
through types.py normalize_arrow_schema/normalize_batch (and, in a
reduced-example variant, the full IPC source path), asserting value
equality against pyarrow's own to_pylist().

Two property classes:
- VALUE-PRESERVING types (uint widenings, dictionary / run-end
  encodings, large_* physical variants, fixed_size_list, arbitrary
  struct/list/map nesting): normalized values must equal the original
  values exactly.
- VALUE-TRANSFORMING types (time32/time64 → µs-since-midnight int64,
  unions → tagged struct): the transform is deterministic, so the
  expected output is computed independently from the original pylist.
"""

from __future__ import annotations

import datetime
import decimal

import hypothesis as h
import hypothesis.strategies as st
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from arrow_spark.types import normalize_arrow_schema, normalize_batch

# -- type strategies ---------------------------------------------------------

_primitive = st.sampled_from(
    [
        pa.int8(), pa.int16(), pa.int32(), pa.int64(),
        pa.uint8(), pa.uint16(), pa.uint32(), pa.uint64(),
        pa.float32(), pa.float64(),
        pa.string(), pa.large_string(),
        pa.binary(), pa.large_binary(),
        pa.bool_(),
        pa.timestamp("us"), pa.timestamp("ms"), pa.timestamp("s"),
        pa.date32(),
        pa.decimal128(10, 2),
    ]
)


def _nested(inner):
    return st.one_of(
        inner.map(pa.list_),
        inner.map(pa.large_list),
        inner.map(lambda t: pa.list_(t, 3)),
        st.tuples(inner, inner).map(
            lambda ts: pa.struct([pa.field("a", ts[0]), pa.field("b", ts[1])])
        ),
        inner.map(lambda t: pa.map_(pa.string(), t)),
    )


_value_preserving_type = st.recursive(_primitive, _nested, max_leaves=4)

_INT_RANGES = {
    "int8": (-128, 127), "int16": (-(2**15), 2**15 - 1),
    "int32": (-(2**31), 2**31 - 1), "int64": (-(2**63), 2**63 - 1),
    "uint8": (0, 255), "uint16": (0, 2**16 - 1),
    "uint32": (0, 2**32 - 1), "uint64": (0, 2**64 - 1),
}


def _values_for(t, size):
    """Strategy for a python list of ``size`` values of arrow type t."""
    if pa.types.is_integer(t):
        lo, hi = _INT_RANGES[str(t)]
        elem = st.integers(lo, hi)
    elif pa.types.is_floating(t):
        elem = st.floats(allow_nan=False, width=32 if t == pa.float32() else 64)
    elif pa.types.is_boolean(t):
        elem = st.booleans()
    elif pa.types.is_string(t) or pa.types.is_large_string(t):
        elem = st.text(max_size=8)
    elif pa.types.is_binary(t) or pa.types.is_large_binary(t):
        elem = st.binary(max_size=8)
    elif pa.types.is_timestamp(t):
        elem = st.datetimes(
            min_value=datetime.datetime(1970, 1, 1),
            max_value=datetime.datetime(2200, 1, 1),
        )
    elif pa.types.is_date(t):
        elem = st.dates()
    elif pa.types.is_decimal(t):
        elem = st.decimals(
            min_value=decimal.Decimal("-99999999.99"),
            max_value=decimal.Decimal("99999999.99"),
            places=2,
        )
    elif pa.types.is_fixed_size_list(t):
        inner = _values_for(t.value_type, t.list_size)
        return st.lists(
            st.one_of(st.none(), inner), min_size=size, max_size=size
        )
    elif pa.types.is_list(t) or pa.types.is_large_list(t):
        inner = _values_for(t.value_type, 3)
        return st.lists(
            st.one_of(st.none(), inner), min_size=size, max_size=size
        )
    elif pa.types.is_struct(t):
        fields = {f.name: _values_for(f.type, 1).map(lambda v: v[0]) for f in t}
        row = st.fixed_dictionaries(fields)
        return st.lists(st.one_of(st.none(), row), min_size=size, max_size=size)
    elif pa.types.is_map(t):
        kv = st.tuples(
            st.text(max_size=4), _values_for(t.item_type, 1).map(lambda v: v[0])
        )
        row = st.lists(kv, max_size=3, unique_by=lambda p: p[0])
        return st.lists(st.one_of(st.none(), row), min_size=size, max_size=size)
    else:  # pragma: no cover
        raise AssertionError(f"no strategy for {t}")
    return st.lists(st.one_of(st.none(), elem), min_size=size, max_size=size)


def _canon(v):
    """Order-insensitive canonical form: map columns come back as
    key-value lists whose order is physical, and struct rows as dicts."""
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    if isinstance(v, list):
        return tuple(_canon(x) for x in v)
    if isinstance(v, tuple):
        return tuple(_canon(x) for x in v)
    if isinstance(v, float):
        return round(v, 6)
    return v


@st.composite
def _batch_and_type(draw):
    t = draw(_value_preserving_type)
    size = draw(st.integers(1, 12))
    vals = draw(_values_for(t, size))
    try:
        arr = pa.array(vals, type=t)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError, OverflowError):
        h.assume(False)
    return pa.record_batch([arr], names=["c"])


@h.given(_batch_and_type())
@h.settings(max_examples=120, deadline=None)
def test_normalize_preserves_values_random_schemas(batch):
    target, _ = normalize_arrow_schema(batch.schema)
    out = normalize_batch(batch, target)
    assert out.num_rows == batch.num_rows
    want = [_canon(v) for v in batch.column(0).to_pylist()]
    got = [_canon(v) for v in out.column(0).to_pylist()]
    assert got == want


@h.given(
    st.lists(
        st.one_of(st.none(), st.sampled_from(["aa", "bb", "cc", ""])),
        min_size=1,
        max_size=20,
    )
)
@h.settings(max_examples=60, deadline=None)
def test_normalize_decodes_dictionary_and_ree(vals):
    plain = pa.array(vals, pa.string())
    for enc in (pc.dictionary_encode(plain), pc.run_end_encode(plain)):
        batch = pa.record_batch([enc], names=["c"])
        target, changed = normalize_arrow_schema(batch.schema)
        assert changed and target.field("c").type == pa.string()
        out = normalize_batch(batch, target)
        assert out.column(0).to_pylist() == vals


def test_normalize_ree_of_time64_redispatches():
    """REE whose value type itself needs a structural transform: decode
    must re-enter the normalization switch (time64 ns -> int64 MICROS,
    i.e. divided by 1000) rather than raw-cast ns values (ADVICE r9)."""
    enc = pc.run_end_encode(pa.array([1_500_000_000, None, 3_000], pa.time64("ns")))
    batch = pa.record_batch([enc], names=["c"])
    target, changed = normalize_arrow_schema(batch.schema)
    assert changed and target.field("c").type == pa.int64()
    out = normalize_batch(batch, target)
    assert out.column(0).to_pylist() == [1_500_000, None, 3]


@h.given(
    st.lists(
        st.one_of(
            st.none(),
            st.times(),
        ),
        min_size=1,
        max_size=16,
    ),
    st.sampled_from(["s", "ms"]),
    st.sampled_from(["us", "ns"]),
)
@h.settings(max_examples=60, deadline=None)
def test_normalize_time_types_to_micros(times, unit32, unit64):
    # truncate to the unit's resolution so expected µs are exact
    def us_of(t, unit):
        full = ((t.hour * 60 + t.minute) * 60 + t.second) * 1_000_000 + t.microsecond
        q = {"s": 1_000_000, "ms": 1_000, "us": 1, "ns": 1}[unit]
        return (full // q) * q

    t32 = pa.array(
        [None if t is None else datetime.time(t.hour, t.minute, t.second)
         for t in times],
        pa.time32(unit32),
    )
    t64 = pa.array(times, pa.time64(unit64))
    batch = pa.record_batch([t32, t64], names=["a", "b"])
    target, changed = normalize_arrow_schema(batch.schema)
    assert changed
    out = normalize_batch(batch, target)
    assert out.schema.field("a").type == pa.int64()
    assert out.schema.field("b").type == pa.int64()
    want_a = [
        None if t is None
        else us_of(datetime.time(t.hour, t.minute, t.second), unit32)
        for t in times
    ]
    want_b = [None if t is None else us_of(t, unit64) for t in times]
    assert out.column(0).to_pylist() == want_a
    assert out.column(1).to_pylist() == want_b


@h.given(
    st.lists(st.sampled_from([0, 1]), min_size=1, max_size=16),
    st.data(),
    st.booleans(),
)
@h.settings(max_examples=60, deadline=None)
def test_normalize_union_to_tagged_struct(tags, data, dense):
    """Random sparse/dense unions decode to the tagged struct with
    exactly one populated branch per row, matching the union's own
    to_pylist()."""
    n = len(tags)
    ints = data.draw(_values_for(pa.int64(), n))
    strs = data.draw(_values_for(pa.string(), n))
    codes = pa.array(tags, pa.int8())
    if dense:
        offs, counters = [], [0, 0]
        d_ints, d_strs = [], []
        for t, iv, sv in zip(tags, ints, strs):
            offs.append(counters[t])
            counters[t] += 1
            (d_ints if t == 0 else d_strs).append(iv if t == 0 else sv)
        arr = pa.UnionArray.from_dense(
            codes,
            pa.array(offs, pa.int32()),
            [pa.array(d_ints, pa.int64()), pa.array(d_strs, pa.string())],
            ["i", "s"],
        )
    else:
        arr = pa.UnionArray.from_sparse(
            codes,
            [pa.array(ints, pa.int64()), pa.array(strs, pa.string())],
            ["i", "s"],
        )
    batch = pa.record_batch([arr], names=["u"])
    target, changed = normalize_arrow_schema(batch.schema)
    assert changed
    out = normalize_batch(batch, target)
    rows = out.column(0).to_pylist()
    want = arr.to_pylist()
    for tag, row, w in zip(tags, rows, want):
        assert row["tag"] == tag
        active = row["i"] if tag == 0 else row["s"]
        assert active == w
        assert (row["s"] if tag == 0 else row["i"]) is None


@pytest.mark.parametrize("seed", [0, 1])
def test_random_schema_through_ipc_source(spark, tmp_path, seed):
    """A fixed pair of exotic schemas through the FULL IPC source path
    (write with pyarrow, read with read_ipc through Spark): values equal
    the normalized pylist. (The per-example Spark job cost keeps this a
    sampled pin rather than a hypothesis sweep; the hypothesis sweeps
    above cover the normalize/decode kernel itself.)"""
    import random

    from arrow_spark.sources import read_ipc

    rng = random.Random(seed)
    n = 50
    plain = pa.array([rng.choice(["x", "y", None]) for _ in range(n)])
    t = pa.table({
        "d": pc.dictionary_encode(plain),
        "u32": pa.array([rng.randrange(2**32) for _ in range(n)], pa.uint32()),
        "u64": pa.array([rng.randrange(2**64) for _ in range(n)], pa.uint64()),
        "tm": pa.array(
            [datetime.time(rng.randrange(24), rng.randrange(60)) for _ in range(n)],
            pa.time64("us"),
        ),
        "ls": pa.array(
            [[rng.randrange(100)] * rng.randrange(3) for _ in range(n)],
            pa.large_list(pa.int32()),
        ),
    })
    path = tmp_path / f"exotic{seed}.arrow"
    with pa.ipc.new_file(str(path), t.schema) as w:
        w.write_table(t)
    df = read_ipc(spark, str(path))
    target, _ = normalize_arrow_schema(t.schema)
    want = normalize_batch(t.combine_chunks().to_batches()[0], target)
    got = df.toArrow().sort_by("u32")
    wtbl = pa.Table.from_batches([want]).sort_by("u32")
    # uint64 lands as decimal(20,0) Spark-side; compare canonically
    assert [_canon(c.to_pylist()) for c in got.columns] == [
        _canon(c.to_pylist()) for c in wtbl.columns
    ]
