"""Minimal substrait.Plan builder (protobuf wire format, no deps).

Produces serialized plans for the subset arrow_spark.plans.substrait
consumes. The same bytes are fed to pyarrow.substrait.run_query in
tests, so the encoding is validated by Acero's real consumer — if the
field numbers here were wrong, Acero would reject or mis-execute the
plan, and the cross-engine comparison would fail.

Expression/relation builders mirror the structures in the public
substrait spec (substrait-io/substrait proto/algebra.proto, plan.proto,
type.proto); the reference's consumer for the same messages is
cpp/src/arrow/engine/substrait/relation_internal.cc.
"""

from __future__ import annotations

import struct as _struct

# canonical extension YAML URIs (what Acero's ExtensionIdRegistry knows)
URI_ARITH = "https://github.com/substrait-io/substrait/blob/main/extensions/functions_arithmetic.yaml"
URI_CMP = "https://github.com/substrait-io/substrait/blob/main/extensions/functions_comparison.yaml"
URI_BOOL = "https://github.com/substrait-io/substrait/blob/main/extensions/functions_boolean.yaml"
URI_AGG = "https://github.com/substrait-io/substrait/blob/main/extensions/functions_aggregate_generic.yaml"
URI_STRING = "https://github.com/substrait-io/substrait/blob/main/extensions/functions_string.yaml"


def _varint(v: int) -> bytes:
    if v < 0:
        v += 1 << 64
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def f_varint(field: int, v: int) -> bytes:
    return _varint(field << 3) + _varint(v)


def f_msg(field: int, payload: bytes) -> bytes:
    return _varint(field << 3 | 2) + _varint(len(payload)) + payload


def f_str(field: int, s: str) -> bytes:
    return f_msg(field, s.encode("utf-8"))


def f_fp64(field: int, v: float) -> bytes:
    return _varint(field << 3 | 1) + _struct.pack("<d", v)


# -- types (type.proto oneof numbers; each kind: nullability = 2) -----------

_TYPE_NUM = {"bool": 1, "i8": 2, "i16": 3, "i32": 5, "i64": 7, "fp32": 10,
             "fp64": 11, "string": 12, "binary": 13, "timestamp": 14, "date": 16}


def typ(kind: str, nullable: bool = True) -> bytes:
    inner = f_varint(2, 1 if nullable else 2)  # Nullability NULLABLE/REQUIRED
    return f_msg(_TYPE_NUM[kind], inner)


def named_struct(names: list[str], kinds: list[str]) -> bytes:
    # NamedStruct { names=1, Type.Struct struct=2 }; Type.Struct
    # { repeated Type types=1, nullability=3 }
    struct_body = b"".join(f_msg(1, typ(k)) for k in kinds) + f_varint(3, 2)
    return b"".join(f_str(1, n) for n in names) + f_msg(2, struct_body)


# -- expressions ------------------------------------------------------------


def field_ref(idx: int) -> bytes:
    seg = f_msg(2, f_varint(1, idx))  # StructField { field=1 }
    ref = f_msg(1, seg) + f_msg(4, b"")  # direct_reference + RootReference
    return f_msg(2, ref)  # Expression.selection


def lit_i64(v: int) -> bytes:
    return f_msg(1, f_varint(7, v))


def lit_i32(v: int) -> bytes:
    return f_msg(1, f_varint(5, v))


def lit_fp64(v: float) -> bytes:
    return f_msg(1, f_fp64(11, v))


def lit_str(s: str) -> bytes:
    return f_msg(1, f_str(12, s))


def lit_date(days: int) -> bytes:
    return f_msg(1, f_varint(16, days))


def lit_timestamp(micros: int) -> bytes:
    """Timestamp literal, µs since epoch (Literal field 14, mirroring
    Type numbering; accepted by Acero run_query — pinned in tests)."""
    return f_msg(1, f_varint(14, micros))


def scalar_fn(anchor: int, args: list[bytes], output: bytes | None = None) -> bytes:
    body = f_varint(1, anchor)
    for a in args:
        body += f_msg(4, f_msg(3, a))  # FunctionArgument.value
    if output is not None:
        body += f_msg(3, output)  # output_type
    return f_msg(3, body)  # Expression.scalar_function


def outer_field_ref(idx: int, steps_out: int = 1) -> bytes:
    """FieldReference resolving idx in the enclosing relation's scope
    (OuterReference root, field 5) — correlation inside subqueries."""
    seg = f_msg(2, f_varint(1, idx))  # StructField { field=1 }
    ref = f_msg(1, seg) + f_msg(5, f_varint(1, steps_out))
    return f_msg(2, ref)


def raw_lit_i64(v: int) -> bytes:
    """Bare Literal message (i64) — for contexts that embed Literal
    directly rather than Expression (SwitchExpression.IfValue.if)."""
    return f_varint(7, v)


def raw_lit_str(s: str) -> bytes:
    """Bare Literal message (string)."""
    return f_str(12, s)


def switch(match: bytes, cases: list[tuple[bytes, bytes]],
           els: bytes | None = None) -> bytes:
    """Expression.SwitchExpression { ifs=1 {if=Literal, then=2},
    else=2, match=3 } — simple CASE. Each case's `if` is LITERAL BYTES
    (the Literal message, not an Expression)."""
    body = b""
    for lit, then in cases:
        body += f_msg(1, f_msg(1, lit) + f_msg(2, then))
    if els is not None:
        body += f_msg(2, els)
    body += f_msg(3, match)
    return f_msg(7, body)


def or_list(value: bytes, options: list[bytes]) -> bytes:
    """Expression.SingularOrList { value=1, options=2 } → IN-list."""
    return f_msg(8, f_msg(1, value) + b"".join(f_msg(2, o) for o in options))


def multi_or_list(values: list[bytes], options: list[list[bytes]]) -> bytes:
    """Expression.MultiOrList { value=1, options=2 Record{fields=1} } —
    row-wise IN: (v1,v2) IN ((a,b),(c,d))."""
    body = b"".join(f_msg(1, v) for v in values)
    for opt in options:
        body += f_msg(2, b"".join(f_msg(1, f) for f in opt))
    return f_msg(9, body)


def nested_list(values: list[bytes]) -> bytes:
    """Expression.Nested.List { values=1 } (Nested = field 13, list=4)."""
    return f_msg(13, f_msg(4, b"".join(f_msg(1, v) for v in values)))


def nested_struct(fields: list[bytes]) -> bytes:
    """Expression.Nested.Struct { fields=1 } (struct=3)."""
    return f_msg(13, f_msg(3, b"".join(f_msg(1, v) for v in fields)))


def nested_map(pairs: list[tuple[bytes, bytes]]) -> bytes:
    """Expression.Nested.Map { key_values=1 {key=1, value=2} } (map=5)."""
    body = b"".join(f_msg(1, f_msg(1, k) + f_msg(2, v)) for k, v in pairs)
    return f_msg(13, f_msg(5, body))


def subquery_scalar(rel_bytes: bytes) -> bytes:
    """Expression.Subquery.Scalar { input=1 } (Expression oneof field 12)."""
    return f_msg(12, f_msg(1, f_msg(1, rel_bytes)))


def subquery_in(needles: list[bytes], haystack: bytes) -> bytes:
    """Expression.Subquery.InPredicate { needles=1, haystack=2 }."""
    body = b"".join(f_msg(1, n) for n in needles) + f_msg(2, haystack)
    return f_msg(12, f_msg(2, body))


def subquery_exists(rel_bytes: bytes) -> bytes:
    """Expression.Subquery.SetPredicate { predicate_op=1 (EXISTS), tuples=2 }."""
    return f_msg(12, f_msg(3, f_varint(1, 1) + f_msg(2, rel_bytes)))


def cast(expr: bytes, to: bytes, safe: bool = False) -> bytes:
    # Expression oneof: window_function=5, if_then=6, singular_or_list=8,
    # cast=11 (field 4 skipped in the spec — pinned by the Acero round-trip)
    body = f_msg(1, to) + f_msg(2, expr) + f_varint(3, 1 if safe else 2)
    return f_msg(11, body)


def if_then(clauses: list[tuple[bytes, bytes]], els: bytes | None = None) -> bytes:
    body = b"".join(f_msg(1, f_msg(1, c) + f_msg(2, t)) for c, t in clauses)
    if els is not None:
        body += f_msg(2, els)
    return f_msg(6, body)


def agg_fn(anchor: int, args: list[bytes], output: bytes, distinct: bool = False) -> bytes:
    """AggregateFunction: reference=1, phase=4, output_type=5,
    invocation=6, arguments=7."""
    body = f_varint(1, anchor)
    body += f_varint(4, 3)  # AGGREGATION_PHASE_INITIAL_TO_RESULT
    body += f_msg(5, output)
    body += f_varint(6, 2 if distinct else 1)
    for a in args:
        body += f_msg(7, f_msg(3, a))
    return body


# -- relations --------------------------------------------------------------


def rel(kind: str, payload: bytes) -> bytes:
    nums = {"read": 1, "filter": 2, "fetch": 3, "aggregate": 4, "sort": 5,
            "join": 6, "project": 7, "set": 8, "cross": 12, "hash_join": 13,
            "merge_join": 14, "exchange": 15, "expand": 16, "window": 17,
            "nested_loop_join": 18, "write": 19, "ddl": 20,
            "reference": 21, "extension_single": 9, "extension_multi": 10,
            "extension_leaf": 11}
    return f_msg(nums[kind], payload)


def read_named(table_names: list[str], col_names: list[str], col_kinds: list[str],
               filter_expr: bytes | None = None) -> bytes:
    body = f_msg(2, named_struct(col_names, col_kinds))
    if filter_expr is not None:
        body += f_msg(3, filter_expr)
    body += f_msg(7, b"".join(f_str(1, n) for n in table_names))  # NamedTable
    return rel("read", body)


def filter_rel(input_rel: bytes, condition: bytes) -> bytes:
    return rel("filter", f_msg(2, input_rel) + f_msg(3, condition))


def project_rel(input_rel: bytes, exprs: list[bytes],
                emit: list[int] | None = None) -> bytes:
    body = b""
    if emit is not None:
        body += f_msg(1, f_msg(2, b"".join(f_varint(1, i) for i in emit)))
    body += f_msg(2, input_rel)
    body += b"".join(f_msg(3, e) for e in exprs)
    return rel("project", body)


def aggregate_rel(input_rel: bytes, group_exprs: list[bytes],
                  measures: list[bytes],
                  measure_filters: list[bytes | None] | None = None) -> bytes:
    body = f_msg(2, input_rel)
    body += f_msg(3, b"".join(f_msg(1, g) for g in group_exprs))  # one Grouping
    filters = measure_filters or [None] * len(measures)
    for meas, filt in zip(measures, filters):  # Measure { measure=1, filter=2 }
        payload = f_msg(1, meas)
        if filt is not None:
            payload += f_msg(2, filt)
        body += f_msg(4, payload)
    return rel("aggregate", body)


def aggregate_rel_sets(input_rel: bytes, grouping_sets: list[list[bytes]],
                       measures: list[bytes]) -> bytes:
    """AggregateRel with one Grouping per set (deprecated per-grouping
    expression encoding, field 3.1 — what older producers emit)."""
    body = f_msg(2, input_rel)
    for s in grouping_sets:
        body += f_msg(3, b"".join(f_msg(1, g) for g in s))
    body += b"".join(f_msg(4, f_msg(1, m)) for m in measures)
    return rel("aggregate", body)


def sort_rel(input_rel: bytes, sorts: list[tuple[bytes, int]]) -> bytes:
    """sorts: (expr, direction) with 1=asc_nf 2=asc_nl 3=desc_nf 4=desc_nl."""
    body = f_msg(2, input_rel)
    body += b"".join(f_msg(3, f_msg(1, e) + f_varint(2, d)) for e, d in sorts)
    return rel("sort", body)


def fetch_rel(input_rel: bytes, offset: int = 0, count: int = -1) -> bytes:
    body = f_msg(2, input_rel) + f_varint(3, offset) + f_varint(4, count)
    return rel("fetch", body)


def join_rel(left: bytes, right: bytes, condition: bytes, join_type: int = 1,
             post_filter: bytes | None = None) -> bytes:
    """JoinRel { common=1, left=2, right=3, expression=4,
    post_join_filter=5, type=6 }. pyarrow 16.1's consumer silently
    ignores field 5 (relation_internal.cc has no post_join_filter
    read); ours applies it after the join for every join type, which
    is the substrait-spec semantics."""
    body = f_msg(2, left) + f_msg(3, right) + f_msg(4, condition)
    if post_filter is not None:
        body += f_msg(5, post_filter)
    body += f_varint(6, join_type)
    return rel("join", body)


def set_rel(inputs: list[bytes], op: int = 6) -> bytes:
    return rel("set", b"".join(f_msg(2, r) for r in inputs) + f_varint(3, op))


def raw_field_ref(idx: int) -> bytes:
    """Bare FieldReference message (not wrapped in Expression) — what
    ExchangeRel.ScatterFields carries."""
    seg = f_msg(2, f_varint(1, idx))  # StructField { field=1 }
    return f_msg(1, seg) + f_msg(4, b"")  # direct_reference + RootReference


def keyed_join_rel(left: bytes, right: bytes, left_keys: list[int],
                   right_keys: list[int], join_type: int = 1,
                   kind: str = "hash", post_filter: bytes | None = None) -> bytes:
    """HashJoinRel (field 13) / MergeJoinRel (field 14):
    { left=2, right=3, left_keys=4, right_keys=5, post_join_filter=6,
    type=7 }; keys are bare FieldReferences into each side's own schema.
    JoinType here is the keyed-join enum: 5=LEFT_SEMI, 6=RIGHT_SEMI,
    7=LEFT_ANTI, 8=RIGHT_ANTI (unlike JoinRel)."""
    body = f_msg(2, left) + f_msg(3, right)
    body += b"".join(f_msg(4, raw_field_ref(i)) for i in left_keys)
    body += b"".join(f_msg(5, raw_field_ref(i)) for i in right_keys)
    if post_filter is not None:
        body += f_msg(6, post_filter)
    body += f_varint(7, join_type)
    return rel(f"{kind}_join", body)


def nested_loop_join_rel(left: bytes, right: bytes, expression: bytes | None = None,
                         join_type: int = 1) -> bytes:
    """NestedLoopJoinRel { common=1, left=2, right=3, expression=4,
    type=5 } (algebra.proto field 18). No expression → always-true."""
    body = f_msg(2, left) + f_msg(3, right)
    if expression is not None:
        body += f_msg(4, expression)
    body += f_varint(5, join_type)
    return rel("nested_loop_join", body)


def exchange_rel(input_rel: bytes, partition_count: int = 0,
                 scatter_fields: list[int] | None = None,
                 round_robin: bool = False, broadcast: bool = False) -> bytes:
    """ExchangeRel { common=1, input=2, partition_count=3,
    scatter_by_fields=5 | round_robin=8 | broadcast=9 } (field 15)."""
    body = f_msg(2, input_rel)
    if partition_count:
        body += f_varint(3, partition_count)
    if scatter_fields is not None:
        body += f_msg(5, b"".join(f_msg(1, raw_field_ref(i)) for i in scatter_fields))
    elif round_robin:
        body += f_msg(8, b"")
    elif broadcast:
        body += f_msg(9, b"")
    return rel("exchange", body)


def ddl_rel(table_names: list[str], obj: int, op: int,
            view_definition: bytes | None = None,
            col_names: list[str] | None = None,
            col_kinds: list[str] | None = None) -> bytes:
    """DdlRel { named_object=1, table_schema=3, object=5, op=6,
    view_definition=7 } (algebra.proto field 20). obj: 1=TABLE 2=VIEW;
    op: 1=CREATE 2=CREATE_OR_REPLACE 4=DROP 5=DROP_IF_EXIST."""
    body = f_msg(1, b"".join(f_str(1, n) for n in table_names))
    if col_names is not None:
        body += f_msg(3, named_struct(col_names, col_kinds or []))
    body += f_varint(5, obj) + f_varint(6, op)
    if view_definition is not None:
        body += f_msg(7, view_definition)
    return rel("ddl", body)


def expand_field_consistent(expr: bytes) -> bytes:
    """ExpandField { consistent_field=3 }: same expression in every copy."""
    return f_msg(3, expr)


def expand_field_switching(duplicates: list[bytes]) -> bytes:
    """ExpandField { switching_expressions=2 → SwitchingField.duplicates=1 }:
    copy i evaluates duplicates[i]."""
    return f_msg(2, b"".join(f_msg(1, d) for d in duplicates))


def expand_rel(input_rel: bytes, fields: list[bytes]) -> bytes:
    """ExpandRel { common=1, input=2, fields=4 } (algebra.proto field 16)."""
    return rel("expand", f_msg(2, input_rel) + b"".join(f_msg(4, f) for f in fields))


def write_rel_named(input_rel: bytes, table_names: list[str],
                    col_names: list[str] | None = None,
                    op: int = 1, output_mode: int = 2) -> bytes:
    """WriteRel { named_table=1, table_schema=3, op=4, input=5, output=6 }
    (algebra.proto field 19). op: 1=INSERT 2=DELETE 3=UPDATE 4=CTAS;
    output_mode: 1=NO_OUTPUT 2=MODIFIED_RECORDS."""
    body = f_msg(1, b"".join(f_str(1, n) for n in table_names))
    if col_names is not None:
        body += f_msg(3, b"".join(f_str(1, n) for n in col_names))
    body += f_varint(4, op) + f_msg(5, input_rel) + f_varint(6, output_mode)
    return rel("write", body)


# -- plan assembly ----------------------------------------------------------


def _any(type_url: str, value: bytes) -> bytes:
    """google.protobuf.Any { type_url=1, value=2 }."""
    return f_str(1, type_url) + f_msg(2, value)


def extension_single_rel(input_rel: bytes, type_url: str, value: bytes = b"") -> bytes:
    """ExtensionSingleRel { common=1, input=2, detail=3 } (field 9)."""
    return rel("extension_single", f_msg(2, input_rel) + f_msg(3, _any(type_url, value)))


def extension_multi_rel(inputs: list[bytes], type_url: str, value: bytes = b"") -> bytes:
    """ExtensionMultiRel { common=1, inputs=2, detail=3 } (field 10)."""
    body = b"".join(f_msg(2, r) for r in inputs) + f_msg(3, _any(type_url, value))
    return rel("extension_multi", body)


def extension_leaf_rel(type_url: str, value: bytes = b"") -> bytes:
    """ExtensionLeafRel { common=1, detail=2 } (field 11)."""
    return rel("extension_leaf", f_msg(2, _any(type_url, value)))


def reference_rel(subtree_ordinal: int) -> bytes:
    """ReferenceRel { subtree_ordinal=1 } (algebra.proto field 21):
    points at plan.relations[ordinal] — common-subplan sharing."""
    return rel("reference", f_varint(1, subtree_ordinal))


def plan(root_rel: bytes, names: list[str],
         functions: dict[int, tuple[str, str]] | None = None,
         subtrees: list[bytes] | None = None) -> bytes:
    """Assemble substrait.Plan bytes.

    functions: anchor -> (uri, name). URIs get uri anchors 1..N;
    declarations bind (uri anchor, function anchor, name).
    subtrees: extra non-root PlanRel entries, emitted BEFORE the root in
    declaration order — ReferenceRel ordinals index this list (the root
    is the last relation and referenceable too).
    """
    functions = functions or {}
    uris: dict[str, int] = {}
    for uri, _ in functions.values():
        uris.setdefault(uri, len(uris) + 1)
    out = b""
    for uri, ua in uris.items():
        out += f_msg(1, f_varint(1, ua) + f_str(2, uri))  # SimpleExtensionURI
    for anchor, (uri, name) in functions.items():
        ext_fn = f_varint(1, uris[uri]) + f_varint(2, anchor) + f_str(3, name)
        out += f_msg(2, f_msg(3, ext_fn))  # SimpleExtensionDeclaration.extension_function
    for sub in subtrees or []:
        out += f_msg(3, f_msg(1, sub))  # PlanRel.rel (referenceable subtree)
    root = f_msg(1, root_rel) + b"".join(f_str(2, n) for n in names)
    out += f_msg(3, f_msg(2, root))  # PlanRel.root
    out += f_msg(6, f_varint(1, 0) + f_varint(2, 44) + f_varint(3, 0)
                 + f_str(5, "arrow_spark"))  # Version
    return out


# -- window functions --------------------------------------------------------


def bound(kind, offset: int = 0) -> bytes:
    """WindowFunction.Bound: kind ∈ {'preceding','following','current',
    'unbounded'} (fields 1/2/3/4 per algebra.proto)."""
    if kind == "preceding":
        return f_msg(1, f_varint(1, offset))
    if kind == "following":
        return f_msg(2, f_varint(1, offset))
    if kind == "current":
        return f_msg(3, b"")
    return f_msg(4, b"")


def window_fn(anchor: int, args: list[bytes], output: bytes | None = None,
              bounds: tuple[bytes, bytes] | None = None,
              bounds_type: int = 0) -> bytes:
    """Body shared by Expression.WindowFunction and
    ConsistentPartitionWindowRel.WindowRelFunction: function_reference=1,
    upper_bound=4, lower_bound=5, phase=6, output_type=7, arguments=9,
    invocation=10, bounds_type=12. bounds=(lower, upper)."""
    body = f_varint(1, anchor)
    if bounds is not None:
        lo, hi = bounds
        body += f_msg(5, lo) + f_msg(4, hi)
    if bounds_type:
        body += f_varint(12, bounds_type)  # 1=ROWS, 2=RANGE
    body += f_varint(6, 3)  # AGGREGATION_PHASE_INITIAL_TO_RESULT
    if output is not None:
        body += f_msg(7, output)
    for a in args:
        body += f_msg(9, f_msg(3, a))  # FunctionArgument.value
    body += f_varint(10, 1)  # AGGREGATION_INVOCATION_ALL
    return body


def window_expr(fn_body: bytes, partitions: list[bytes],
                sorts: list[tuple[bytes, int]]) -> bytes:
    """Expression.window_function (field 5): fn body + partitions=2 + sorts=3."""
    body = fn_body
    body += b"".join(f_msg(2, p) for p in partitions)
    body += b"".join(f_msg(3, f_msg(1, e) + f_varint(2, d)) for e, d in sorts)
    return f_msg(5, body)


def window_rel(input_rel: bytes, fns: list[bytes], partitions: list[bytes],
               sorts: list[tuple[bytes, int]]) -> bytes:
    """ConsistentPartitionWindowRel (Rel field 17): input=2,
    window_functions=3, partition_expressions=4, sorts=5. Each entry in
    ``fns`` is a window_fn() body (no per-function partitions/sorts)."""
    body = f_msg(2, input_rel)
    body += b"".join(f_msg(3, fb) for fb in fns)
    body += b"".join(f_msg(4, p) for p in partitions)
    body += b"".join(f_msg(5, f_msg(1, e) + f_varint(2, d)) for e, d in sorts)
    return f_msg(17, body)
