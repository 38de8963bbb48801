"""Type adapters: Arrow's 45-type physical/logical system → Spark's
logical types (SURVEY §1.2 mapping table; reference type enum
cpp/src/arrow/type_fwd.h:328-477).

Spark has no unsigned ints, no time-of-day, no nanosecond timestamps,
and caps decimals at p=38; Arrow distinguishes many physical layouts
(large offsets, views, dictionary, REE) Spark doesn't. The adapter
normalizes an Arrow schema to representable types — documented, lossy
only where the SURVEY says so — and casts batches accordingly at the
I/O boundary (used by sources/ipc.py), which is exactly where pyarrow
itself normalizes when bridging to pandas/Spark.

| Arrow            | Spark                               | note |
|------------------|-------------------------------------|------|
| uint8/16/32      | next wider signed int               | lossless |
| uint64           | decimal(20,0)                       | lossless, doc'd lossy-on-write |
| half_float       | float                               | widened |
| time32/time64    | long (micros since midnight)        | convention, no Spark time type |
| timestamp[s/ms/ns]| timestamp[us]                      | ns truncates (doc'd) |
| large_string/view| string                              | physical detail |
| large_binary/fixed_size_binary/view | binary           | physical detail |
| dictionary/REE   | value type (decoded)                | physical encoding |
| decimal >38      | unsupported → error                 | explicit |
"""

from __future__ import annotations


def normalize_arrow_type(t):
    """Return the normalized pyarrow type for ``t`` (identity if already
    representable)."""
    import pyarrow as pa

    if isinstance(t, pa.BaseExtensionType):
        # canonical extension types (arrow.fixed_shape_tensor, arrow.uuid,
        # arrow.json, ...; reference extension_type.h / extension/) carry a
        # storage array plus metadata Spark has no slot for: decode to the
        # normalized storage (a tensor column becomes its flat value list —
        # the shape survives in the field metadata note).
        return normalize_arrow_type(t.storage_type)
    if pa.types.is_dictionary(t):
        return normalize_arrow_type(t.value_type)
    if hasattr(pa.types, "is_run_end_encoded") and pa.types.is_run_end_encoded(t):
        return normalize_arrow_type(t.value_type)
    if pa.types.is_uint8(t):
        return pa.int16()
    if pa.types.is_uint16(t):
        return pa.int32()
    if pa.types.is_uint32(t):
        return pa.int64()
    if pa.types.is_uint64(t):
        return pa.decimal128(20, 0)
    if pa.types.is_float16(t):
        return pa.float32()
    if pa.types.is_time(t):
        return pa.int64()  # micros-since-midnight convention
    if pa.types.is_timestamp(t):
        if t.unit != "us":
            return pa.timestamp("us", tz=t.tz)
        return t
    if pa.types.is_large_string(t) or (
        hasattr(pa.types, "is_string_view") and pa.types.is_string_view(t)
    ):
        return pa.string()
    if (
        pa.types.is_large_binary(t)
        or pa.types.is_fixed_size_binary(t)
        or (hasattr(pa.types, "is_binary_view") and pa.types.is_binary_view(t))
    ):
        return pa.binary()
    if pa.types.is_decimal(t):
        if t.precision > 38:
            raise NotImplementedError(
                f"decimal precision {t.precision} exceeds Spark's 38 (SURVEY §1.2: "
                "DECIMAL256 beyond p=38 unsupported by design)"
            )
        return t
    if pa.types.is_large_list(t):
        import pyarrow as pa2

        return pa2.list_(normalize_arrow_type(t.value_type))
    if pa.types.is_list(t) or pa.types.is_fixed_size_list(t):
        import pyarrow as pa2

        return pa2.list_(normalize_arrow_type(t.value_type))
    if pa.types.is_struct(t):
        import pyarrow as pa2

        return pa2.struct(
            [pa2.field(f.name, normalize_arrow_type(f.type), f.nullable) for f in t]
        )
    if pa.types.is_map(t):
        import pyarrow as pa2

        return pa2.map_(normalize_arrow_type(t.key_type), normalize_arrow_type(t.item_type))
    if pa.types.is_union(t):
        # sparse/dense union → struct(tag, one nullable field per branch):
        # exactly one branch non-null per row, tag = the Arrow type code.
        # Spark has no sum type; the tagged struct is the faithful logical
        # encoding (type_fwd.h ids 27-29 — the last §1.2 deferral).
        import pyarrow as pa2

        # tag is logically non-null, but StructArray.from_arrays yields
        # nullable children — declare nullable to keep the cast exact
        fields = [pa2.field("tag", pa2.int8(), True)]
        for i in range(t.num_fields):
            f = t.field(i)
            fields.append(
                pa2.field(f.name or f"_{i}", normalize_arrow_type(f.type), True)
            )
        return pa2.struct(fields)
    return t


def normalize_arrow_schema(schema):
    """Normalize a pyarrow schema; returns (normalized_schema, changed)."""
    import pyarrow as pa

    fields = []
    changed = False
    for f in schema:
        nt = normalize_arrow_type(f.type)

        def _time_note(src):
            return {b"arrow_spark.original_type": str(src).encode()}

        if nt is not f.type and not nt.equals(f.type):
            changed = True
            fields.append(pa.field(f.name, nt, f.nullable, metadata=_time_note(f.type)))
        else:
            fields.append(f)
    return pa.schema(fields), changed


def normalize_batch(batch, target_schema):
    """Cast a RecordBatch to the normalized schema (time types go
    through int64 micros; dictionary/REE decode is part of the cast)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    cols = []
    names = batch.schema.names
    for i, f in enumerate(target_schema):
        # lookup by name: under unified (evolved) schemas a batch may lack
        # a late-added column (pad nulls) or order fields differently
        if f.name not in names:
            cols.append(pa.nulls(batch.num_rows, f.type))
            continue
        col = batch.column(names.index(f.name))
        cols.append(_normalize_column(col, f.type))
    return pa.RecordBatch.from_arrays(cols, schema=target_schema)


def _normalize_column(col, target_type):
    """One column of normalize_batch's cast switch, recursion-safe: an
    REE wrapper decodes and then RE-DISPATCHES the decoded column so a
    value type that itself needs a structural transform (time64 unit
    division, union→tagged-struct) still gets it instead of a raw
    cast producing wrong values."""
    import pyarrow as pa
    import pyarrow.compute as pc

    src = col.type
    if pa.types.is_time32(src):
        # time32 is seconds or millis since midnight; scale to micros
        scale = {"s": 1_000_000, "ms": 1_000}[src.unit]
        col = pc.multiply(col.cast(pa.int32()).cast(pa.int64()), scale)
    elif pa.types.is_time64(src):
        col = col.cast(pa.int64())
        if src.unit == "ns":
            col = pc.divide(col, 1000)
    elif hasattr(pa.types, "is_run_end_encoded") and pa.types.is_run_end_encoded(
        src
    ):
        # no REE→plain cast exists (ArrowNotImplementedError — found by
        # the hypothesis sweep); decode explicitly, then recurse: the
        # decoded value type may itself need the structural branches
        col = _normalize_column(pc.run_end_decode(col), target_type)
    elif pa.types.is_union(src):
        col = _decode_union(col, target_type)
    elif isinstance(src, pa.BaseExtensionType):
        col = col.storage if hasattr(col, "storage") else col.combine_chunks().storage
        if not col.type.equals(target_type):
            col = _normalize_column(col, target_type)
    elif not col.type.equals(target_type):
        # timestamps may truncate sub-target precision (ns→us) —
        # that's the documented adapter semantics, so cast unsafely
        unsafe = pa.types.is_timestamp(target_type)
        col = col.cast(target_type, safe=not unsafe)
    return col


def _decode_union(col, target_struct_type):
    """UnionArray → StructArray(tag, branch...) per normalize_arrow_type.

    Sparse unions mask each full-length child outside its rows; dense
    unions scatter each compacted child back via its offsets (take with
    null indices elsewhere)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    src = col.type
    ids = np.asarray(col.type_codes)
    n = len(col)
    arrays = [pa.array(ids, pa.int8())]
    dense = src.mode == "dense"
    if dense:
        offsets = np.asarray(col.offsets)
    for pos in range(src.num_fields):
        code = src.type_codes[pos]
        mask = ids == code
        child = col.field(pos)
        target = target_struct_type.field(pos + 1).type
        if dense:
            idx = pa.array(np.where(mask, offsets, 0), pa.int64(), mask=~mask)
            vals = pc.take(child, idx)
        else:
            vals = pc.if_else(pa.array(mask), child, pa.nulls(n, child.type))
        if not vals.type.equals(target):
            vals = vals.cast(target)
        arrays.append(vals)
    names = [target_struct_type.field(i).name for i in range(target_struct_type.num_fields)]
    return pa.StructArray.from_arrays(arrays, names=names)
