"""Substrait plan consumer → Spark DataFrame.

The reference consumes serialized ``substrait.Plan`` protobufs into
Acero (cpp/src/arrow/engine/substrait/serde.h:106, relation_internal.cc;
Python surface pyarrow.substrait.run_query). This is the Spark-first
equivalent: a dependency-free protobuf wire-format decoder for the plan
subset Acero executes (read/filter/project/join/aggregate/sort/fetch/
set) that builds the same logical plan with the DataFrame API — so
Catalyst, not a hand interpreter, picks the physical strategy.

Wire format: every message is parsed with a generic field scanner
(varint / 64-bit / length-delimited / 32-bit), then typed accessors
pull the substrait field numbers (public substrait spec,
substrait-io/substrait proto/). Correctness of the numbers is pinned by
tests/test_substrait.py, which runs the SAME bytes through
pyarrow.substrait.run_query (Acero) and this consumer and compares.

Internally every relation's output is positional: columns are renamed
``_f0.._fn`` at each step, mirroring substrait's index-based
FieldReference semantics (join output = left fields ++ right fields,
project output = input ++ expressions, then RelCommon.emit remaps).
RelRoot.names applies the user-facing names at the end.
"""

from __future__ import annotations

import struct as _struct
from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Generic protobuf wire-format scanner
# ---------------------------------------------------------------------------


def _scan(buf: bytes) -> dict[int, list[tuple[int, object]]]:
    """field_number -> [(wire_type, raw_value), ...] in order."""
    out: dict[int, list[tuple[int, object]]] = {}
    i, n = 0, len(buf)
    while i < n:
        key, i = _varint(buf, i)
        field, wt = key >> 3, key & 7
        if wt == 0:
            val, i = _varint(buf, i)
        elif wt == 1:
            val, i = buf[i : i + 8], i + 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            val, i = buf[i : i + ln], i + ln
        elif wt == 5:
            val, i = buf[i : i + 4], i + 4
        else:
            raise ValueError(f"unsupported wire type {wt} (field {field})")
        out.setdefault(field, []).append((wt, val))
    return out


def _varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = result = 0
    while True:
        b = buf[i]
        result |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return result, i
        shift += 7


def _signed(v: int, bits: int = 64) -> int:
    return v - (1 << bits) if v >= 1 << (bits - 1) else v


class _Msg:
    """Typed accessors over a scanned message."""

    def __init__(self, buf: bytes):
        self.f = _scan(buf)

    def msg(self, n: int) -> "_Msg | None":
        vs = self.f.get(n)
        return _Msg(vs[-1][1]) if vs else None

    def msgs(self, n: int) -> list["_Msg"]:
        return [_Msg(v) for _, v in self.f.get(n, [])]

    def u64(self, n: int, default: int = 0) -> int:
        vs = self.f.get(n)
        return vs[-1][1] if vs else default

    def i64(self, n: int, default: int = 0) -> int:
        vs = self.f.get(n)
        return _signed(vs[-1][1]) if vs else default

    def s(self, n: int, default: str = "") -> str:
        vs = self.f.get(n)
        return vs[-1][1].decode("utf-8") if vs else default

    def strs(self, n: int) -> list[str]:
        return [v.decode("utf-8") for _, v in self.f.get(n, [])]

    def raw(self, n: int) -> bytes | None:
        vs = self.f.get(n)
        return vs[-1][1] if vs else None

    def raws(self, n: int) -> list[bytes]:
        """Repeated message field as encoded bytes (identity-comparable)."""
        return [v for _, v in self.f.get(n, [])]

    def ints(self, n: int) -> list[int]:
        """Repeated varint field, packed or not."""
        out: list[int] = []
        for wt, v in self.f.get(n, []):
            if wt == 0:
                out.append(_signed(v, 64))
            else:  # packed
                i = 0
                while i < len(v):
                    x, i = _varint(v, i)
                    out.append(_signed(x, 64))
        return out

    def fp64(self, n: int) -> float:
        vs = self.f.get(n)
        return _struct.unpack("<d", vs[-1][1])[0]

    def fp32(self, n: int) -> float:
        vs = self.f.get(n)
        return _struct.unpack("<f", vs[-1][1])[0]

    def has(self, n: int) -> bool:
        return n in self.f


# ---------------------------------------------------------------------------
# Substrait type → Spark type  (substrait type.proto oneof field numbers)
# ---------------------------------------------------------------------------

_TYPE_FIELDS: dict[int, T.DataType] = {
    1: T.BooleanType(),
    2: T.ByteType(),
    3: T.ShortType(),
    5: T.IntegerType(),
    7: T.LongType(),
    10: T.FloatType(),
    11: T.DoubleType(),
    12: T.StringType(),
    13: T.BinaryType(),
    14: T.TimestampNTZType(),
    16: T.DateType(),
}


def _decode_type(m: _Msg) -> T.DataType:
    for n, t in _TYPE_FIELDS.items():
        if m.has(n):
            return t
    if m.has(24):  # decimal { scale=1, precision=2 }
        d = m.msg(24)
        return T.DecimalType(d.u64(2, 38), d.u64(1, 0))
    if m.has(27):  # list { Type type=1 }
        return T.ArrayType(_decode_type(m.msg(27).msg(1)))
    if m.has(25):  # struct { repeated Type types=1 } — anonymous fields
        sub = m.msg(25)
        return T.StructType(
            [T.StructField(f"_{i}", _decode_type(t), True) for i, t in enumerate(sub.msgs(1))]
        )
    raise NotImplementedError(f"substrait type fields {sorted(m.f)} not supported")


# ---------------------------------------------------------------------------
# Expressions
# ---------------------------------------------------------------------------

_BINOPS: dict[str, Callable[[Column, Column], Column]] = {
    "add": lambda a, b: a + b,
    "subtract": lambda a, b: a - b,
    "multiply": lambda a, b: a * b,
    "divide": lambda a, b: a / b,
    "modulus": lambda a, b: a % b,
    "power": lambda a, b: F.pow(a, b),
    "equal": lambda a, b: a == b,
    "not_equal": lambda a, b: a != b,
    # JoinKeyCmp::IS when used as a JoinRel expression
    # (relation_internal.cc:726); plain null-safe equality elsewhere.
    # NOTE: pyarrow 16.1's own consumer cannot decode this name — the
    # substrait→arrow registry only maps equal/not_equal
    # (extension_set.cc:1109); the :1198 entry is arrow→substrait only.
    "is_not_distinct_from": lambda a, b: a.eqNullSafe(b),
    "lt": lambda a, b: a < b,
    "gt": lambda a, b: a > b,
    "lte": lambda a, b: a <= b,
    "gte": lambda a, b: a >= b,
    "and": lambda a, b: a & b,
    "or": lambda a, b: a | b,
    "xor": lambda a, b: a ^ b,
}

_UNARY: dict[str, Callable[[Column], Column]] = {
    "not": lambda a: ~a,
    "negate": lambda a: -a,
    "abs": F.abs,
    "is_null": lambda a: a.isNull(),
    "is_not_null": lambda a: a.isNotNull(),
    "is_nan": F.isnan,
    "upper": F.upper,
    "lower": F.lower,
    "sqrt": F.sqrt,
    "exp": F.exp,
    "ln": F.log,
}

_VARARG: dict[str, Callable[..., Column]] = {
    "concat": F.concat,
    "coalesce": F.coalesce,
}


class _Consumer:
    def __init__(
        self,
        spark: SparkSession,
        table_provider: Callable[[Sequence[str]], DataFrame],
        functions: dict[int, str],
        table_writer: Callable[[Sequence[str], DataFrame, int], None] | None = None,
        plan_rels: list["_Msg"] | None = None,
        extension_handler: Callable[[str, bytes, list[DataFrame]], DataFrame] | None = None,
    ):
        self.spark = spark
        self.provider = table_provider
        self.writer = table_writer
        self.extension_handler = extension_handler
        self.functions = functions  # anchor -> name (extension declarations)
        # all PlanRel trees in declaration order — ReferenceRel targets
        self.plan_rels = plan_rels or []
        self._subtree_cache: dict[int, DataFrame] = {}
        # subquery scopes: stack of enclosing-relation column lists for
        # OuterReference resolution; _mark_outer marks expressions that are
        # evaluated in the enclosing scope but embedded inside a subquery
        # frame (InPredicate needles), so their field refs need .outer()
        self._outer: list[list[str]] = []
        self._mark_outer = 0
        self._prefix = "_f"  # positional-name realm (changes inside subqueries)

    # -- expressions --------------------------------------------------------

    def expr(self, m: _Msg, cols: list[str]) -> Column:
        if m.has(1):
            return self.literal(m.msg(1))
        if m.has(2):  # FieldReference
            ref = m.msg(2)
            idx = self.field_index(ref)
            if ref.has(5):  # OuterReference { steps_out=1 }
                steps = max(ref.msg(5).u64(1, 1), 1)
                return F.col(self._outer[-steps][idx]).outer()
            col = F.col(cols[idx])
            return col.outer() if self._mark_outer else col
        if m.has(3):  # ScalarFunction
            return self.scalar_fn(m.msg(3), cols)
        if m.has(5):  # WindowFunction { partitions=2, sorts=3, … }
            wf = m.msg(5)
            parts = [self.expr(e, cols) for e in wf.msgs(2)]
            return self._window_column(wf, cols, parts, wf.msgs(3))
        if m.has(6):  # IfThen { ifs=1 {if=1 then=2}, else=2 }
            it = m.msg(6)
            clauses = it.msgs(1)
            col = None
            for c in clauses:
                cond = self.expr(c.msg(1), cols)
                then = self.expr(c.msg(2), cols)
                col = F.when(cond, then) if col is None else col.when(cond, then)
            if it.has(2):
                col = col.otherwise(self.expr(it.msg(2), cols))
            return col
        if m.has(7):  # SwitchExpression { ifs=1 {if=1,then=2}, else=2, match=3 }
            sw = m.msg(7)
            match = self.expr(sw.msg(3), cols)
            col = None
            for c in sw.msgs(1):
                cond = match == self.literal(c.msg(1))
                then = self.expr(c.msg(2), cols)
                col = F.when(cond, then) if col is None else col.when(cond, then)
            if sw.has(2):
                col = col.otherwise(self.expr(sw.msg(2), cols))
            return col
        if m.has(8):  # SingularOrList { value=1, options=2 } → IN
            sl = m.msg(8)
            v = self.expr(sl.msg(1), cols)
            return v.isin([self.expr(o, cols) for o in sl.msgs(2)])
        if m.has(9):  # MultiOrList { value=1 (repeated), options=2 Record }
            ml = m.msg(9)
            vals = [self.expr(v, cols) for v in ml.msgs(1)]
            cond = None
            for opt in ml.msgs(2):  # Record { fields=1 }
                fields = [self.expr(f, cols) for f in opt.msgs(1)]
                c = None
                for v, f in zip(vals, fields):
                    e = v == f
                    c = e if c is None else c & e
                cond = c if cond is None else cond | c
            return cond if cond is not None else F.lit(False)
        if m.has(13):  # Nested { struct=3, list=4, map=5 }
            nst = m.msg(13)
            if nst.has(4):  # List { values=1 }
                return F.array(*[self.expr(v, cols) for v in nst.msg(4).msgs(1)])
            if nst.has(3):  # Struct { fields=1 }
                return F.struct(*[self.expr(v, cols) for v in nst.msg(3).msgs(1)])
            if nst.has(5):  # Map { key_values=1 { key=1, value=2 } }
                kvs = nst.msg(5).msgs(1)
                flat = []
                for kv in kvs:
                    flat.append(self.expr(kv.msg(1), cols))
                    flat.append(self.expr(kv.msg(2), cols))
                return F.create_map(*flat)
            raise NotImplementedError("empty Nested expression")
        if m.has(11):  # Cast { type=1, input=2, failure_behavior=3 }
            c = m.msg(11)
            to = _decode_type(c.msg(1))
            inp = self.expr(c.msg(2), cols)
            # FAILURE_BEHAVIOR_RETURN_NULL=1 → try_cast; THROW(2)/unset → cast
            return inp.try_cast(to) if c.u64(3) == 1 else inp.cast(to)
        if m.has(12):  # Subquery
            return self.subquery(m.msg(12), cols)
        raise NotImplementedError(f"expression fields {sorted(m.f)} not supported")

    def subquery(self, m: _Msg, cols: list[str]) -> Column:
        """Expression.Subquery { scalar=1, in_predicate=2, set_predicate=3 }
        → Spark 4 subquery-expression API (DataFrame.scalar/.exists with
        Column.outer correlation). Reference consumer: the full rel set in
        engine/substrait/relation_internal.cc; Acero's own consumer does
        not take these shapes, so tests assert Spark semantics and the
        oracle gate cross-checks DuckDB.

        IN is expressed as a correlated EXISTS over an equality — in a
        filter context the two are equivalent (NULL and no-match both drop
        the row); in a projection context SQL IN's three-valued NULL
        result would differ, which run_substrait does not claim.
        """
        self._outer.append(cols)
        depth = len(self._outer)
        old_prefix = self._prefix
        self._prefix = f"_s{depth}f"  # fresh name realm for the sub-plan
        try:
            if m.has(1):  # Scalar { input=1 }
                return self.rel(m.msg(1).msg(1)).scalar()
            if m.has(2):  # InPredicate { needles=1, haystack=2 }
                ip = m.msg(2)
                hay = self.rel(ip.msg(2))
                self._mark_outer += 1
                try:
                    needles = [self.expr(e, cols) for e in ip.msgs(1)]
                finally:
                    self._mark_outer -= 1
                # haystack columns are positional in this subquery's own
                # realm — reference them by name, never via hay.columns
                # (a correlated haystack cannot be analyzed standalone)
                cond = None
                for i, nd in enumerate(needles):
                    eq = F.col(f"{self._prefix}{i}") == nd
                    cond = eq if cond is None else cond & eq
                return hay.where(cond).exists()
            if m.has(3):  # SetPredicate { predicate_op=1, tuples=2 }
                sp = m.msg(3)
                if sp.u64(1, 1) != 1:  # PREDICATE_OP_EXISTS
                    raise NotImplementedError("only EXISTS set predicate supported")
                return self.rel(sp.msg(2)).exists()
            raise NotImplementedError(f"subquery fields {sorted(m.f)} not supported")
        finally:
            self._prefix = old_prefix
            self._outer.pop()

    def field_index(self, ref: _Msg) -> int:
        seg = ref.msg(1)  # direct_reference: ReferenceSegment
        if seg is None or not seg.has(2):
            raise NotImplementedError("only direct struct-field references supported")
        return seg.msg(2).u64(1)  # StructField.field

    def literal(self, m: _Msg) -> Column:
        if m.has(1):
            return F.lit(bool(m.u64(1)))
        for n, cast in ((2, "tinyint"), (3, "smallint"), (5, "int")):
            if m.has(n):
                # protobuf varints sign-extend negatives to 64 bits; decode at
                # 64 (the value already fits the narrower type), not 32.
                return F.lit(_signed(m.u64(n), 64)).cast(cast)
        if m.has(7):
            return F.lit(m.i64(7)).cast("bigint")
        if m.has(10):
            return F.lit(m.fp32(10)).cast("float")
        if m.has(11):
            return F.lit(m.fp64(11))
        if m.has(12):
            return F.lit(m.s(12))
        if m.has(13):
            return F.lit(m.raw(13))
        if m.has(14):  # timestamp: µs since epoch
            return F.timestamp_micros(F.lit(m.i64(14)))
        if m.has(16):  # date: days since epoch (64-bit varint sign extension)
            return F.date_add(F.lit("1970-01-01").cast("date"), _signed(m.u64(16), 64))
        if m.has(29):  # typed null
            return F.lit(None).cast(_decode_type(m.msg(29)))
        raise NotImplementedError(f"literal fields {sorted(m.f)} not supported")

    def fn_name(self, anchor: int) -> str:
        name = self.functions.get(anchor)
        if name is None:
            raise KeyError(f"function anchor {anchor} not declared in plan extensions")
        return name.split(":", 1)[0]  # strip compound signature ("add:i64_i64")

    def scalar_fn(self, m: _Msg, cols: list[str]) -> Column:
        name = self.fn_name(m.u64(1))
        args = [
            self.expr(a.msg(3), cols)
            for a in m.msgs(4)  # FunctionArgument.value
            if a.has(3)
        ] or [self.expr(a, cols) for a in m.msgs(2)]  # deprecated args field
        if name in _BINOPS and len(args) == 2:
            return _BINOPS[name](*args)
        if name in _UNARY and len(args) == 1:
            return _UNARY[name](*args)
        if name in _VARARG:
            return _VARARG[name](*args)
        if name == "substring" and len(args) in (2, 3):
            length = args[2] if len(args) == 3 else F.lit(1 << 30)
            return F.substring(args[0], args[1], length)
        if name == "like" and len(args) == 2:
            return args[0].like(args[1])
        if name == "round" and len(args) == 2:
            # scale must be a literal (F.round takes a Python int); mirror the
            # deprecated-args fallback used for argument extraction above
            scale_msgs = [a.msg(3) for a in m.msgs(4) if a.has(3)] or m.msgs(2)
            return F.round(args[0], self._lit_int(scale_msgs[1]))
        raise NotImplementedError(f"scalar function {name!r}/{len(args)} not supported")

    # -- window functions ----------------------------------------------------

    @staticmethod
    def _lit_int(m: _Msg) -> int:
        """Literal integer argument (ntile n, lead/lag offset)."""
        lit = m.msg(1)
        if lit is not None:
            for n in (2, 3, 5, 7):
                if lit.has(n):
                    return _signed(lit.u64(n))
        raise NotImplementedError("window argument must be an integer literal")

    @staticmethod
    def _bound(m: _Msg | None, default: int) -> int:
        """WindowFunction.Bound { preceding=1{offset=1}, following=2{offset=1},
        current_row=3, unbounded=4 } → Spark frame offset."""
        from pyspark.sql import Window as W

        if m is None:
            return default
        if m.has(1):
            return -m.msg(1).i64(1)
        if m.has(2):
            return m.msg(2).i64(1)
        if m.has(3):
            return W.currentRow
        return default

    def _sorts(self, msgs: list[_Msg], cols: list[str]) -> list[Column]:
        out = []
        for s in msgs:  # SortField { expr=1, direction=2 }
            e = self.expr(s.msg(1), cols)
            d = s.u64(2, 1)
            out.append(
                {1: e.asc_nulls_first(), 2: e.asc_nulls_last(),
                 3: e.desc_nulls_first(), 4: e.desc_nulls_last()}[d]
            )
        return out

    def _window_column(
        self, fm: _Msg, cols: list[str], parts: list[Column], sort_msgs: list[_Msg]
    ) -> Column:
        """Shared decode for Expression.WindowFunction and
        ConsistentPartitionWindowRel.WindowRelFunction — the two messages
        use identical field numbers for function_reference=1,
        upper_bound=4, lower_bound=5, output_type=7, arguments=9,
        bounds_type=12 (algebra.proto; the rel variant just lacks
        partitions/sorts, which arrive per-rel instead)."""
        from pyspark.sql import Window as W

        name = self.fn_name(fm.u64(1))
        arg_msgs = [a.msg(3) for a in fm.msgs(9) if a.has(3)]
        w = W.partitionBy(*parts)
        orders = self._sorts(sort_msgs, cols)
        if orders:
            w = w.orderBy(*orders)
        bt = fm.u64(12)  # BOUNDS_TYPE: 1=ROWS, 2=RANGE; 0 → engine default
        if bt:
            lo = self._bound(fm.msg(5), W.unboundedPreceding)
            hi = self._bound(fm.msg(4), W.unboundedFollowing)
            w = w.rowsBetween(lo, hi) if bt == 1 else w.rangeBetween(lo, hi)
        return self._window_call(name, arg_msgs, cols).over(w)

    def _window_call(self, name: str, arg_msgs: list[_Msg], cols: list[str]) -> Column:
        zero_arg = {
            "row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank,
            "percent_rank": F.percent_rank, "cume_dist": F.cume_dist,
        }
        if name in zero_arg:
            return zero_arg[name]()
        if name == "ntile":
            return F.ntile(self._lit_int(arg_msgs[0]))
        if name in ("lead", "lag"):
            col = self.expr(arg_msgs[0], cols)
            off = self._lit_int(arg_msgs[1]) if len(arg_msgs) > 1 else 1
            return (F.lead if name == "lead" else F.lag)(col, off)
        if name == "first_value":
            return F.first(self.expr(arg_msgs[0], cols))
        if name == "last_value":
            return F.last(self.expr(arg_msgs[0], cols))
        # aggregate-over-window shares the AggregateRel function table
        return self._agg_fn(name, [self.expr(a, cols) for a in arg_msgs], False)

    # -- relations ----------------------------------------------------------

    def rel(self, m: _Msg) -> DataFrame:
        handlers = {
            1: self.read_rel,
            2: self.filter_rel,
            3: self.fetch_rel,
            4: self.aggregate_rel,
            5: self.sort_rel,
            6: self.join_rel,
            7: self.project_rel,
            8: self.set_rel,
            9: self.extension_single_rel,
            10: self.extension_multi_rel,
            11: self.extension_leaf_rel,
            12: self.cross_rel,
            13: self.hash_join_rel,
            14: self.merge_join_rel,
            15: self.exchange_rel,
            16: self.expand_rel,
            17: self.window_rel,
            18: self.nested_loop_join_rel,
            19: self.write_rel,
            20: self.ddl_rel,
            21: self.reference_rel,
        }
        for n, h in handlers.items():
            if m.has(n):
                return h(m.msg(n))
        raise NotImplementedError(f"relation fields {sorted(m.f)} not supported")

    def _positional(self, df: DataFrame) -> DataFrame:
        # self._prefix gives every subquery depth its own name realm, so
        # an outer reference can never accidentally resolve against a
        # like-named column inside the subquery's own frames
        return df.toDF(*[f"{self._prefix}{i}" for i in range(len(df.columns))])

    def _emit(
        self, df: DataFrame, common: _Msg | None, names: list[str] | None = None
    ) -> DataFrame:
        """RelCommon.emit.output_mapping remaps/projects output columns.

        ``names`` is the caller's statically-known output column list.
        Passing it avoids touching ``df.columns`` (which forces eager
        analysis) — essential inside subqueries, where frames holding
        outer references cannot be analyzed until they are embedded in
        the enclosing plan. When the known names are already positional
        the frame passes through untouched (no toDF → no analysis)."""
        if common is None or not common.has(2):
            if names is None:
                return self._positional(df)
            pos = [f"{self._prefix}{i}" for i in range(len(names))]
            return df if names == pos else df.toDF(*pos)
        mapping = common.msg(2).ints(1)
        cols = names if names is not None else df.columns
        return df.select(
            *[F.col(cols[j]).alias(f"{self._prefix}{i}") for i, j in enumerate(mapping)]
        )

    def read_rel(self, m: _Msg) -> DataFrame:
        base = m.msg(2)  # NamedStruct { names=1, struct=2 }
        names = base.strs(1) if base else []
        if m.has(7):  # NamedTable { names=1 }
            df = self.provider(m.msg(7).strs(1))
        else:
            raise NotImplementedError("only named_table reads supported")
        if names:
            missing = [c for c in names if c not in df.columns]
            if missing:
                raise ValueError(f"table lacks base_schema columns {missing}")
            df = df.select(*names)
        df = self._positional(df)
        if m.has(3):  # pushdown filter
            df = df.where(self.expr(m.msg(3), df.columns))
        return self._emit(df, m.msg(1)) if m.msg(1) and m.msg(1).has(2) else df

    def filter_rel(self, m: _Msg) -> DataFrame:
        df = self.rel(m.msg(2))
        cols = df.columns
        out = df.where(self.expr(m.msg(3), cols))
        return self._emit(out, m.msg(1), names=cols)

    def project_rel(self, m: _Msg) -> DataFrame:
        df = self.rel(m.msg(2))
        cols = df.columns
        exprs = [self.expr(e, cols) for e in m.msgs(3)]
        new = [f"{self._prefix}{len(cols) + i}" for i in range(len(exprs))]
        # substrait project output = input fields ++ expressions
        out = df.select(
            *[F.col(c) for c in cols],
            *[e.alias(n) for e, n in zip(exprs, new)],
        )
        return self._emit(out, m.msg(1), names=cols + new)

    def fetch_rel(self, m: _Msg) -> DataFrame:
        df = self.rel(m.msg(2))
        cols = df.columns
        offset, count = m.i64(3), m.i64(4, -1)
        if offset:
            df = df.offset(offset)
        if count >= 0:
            df = df.limit(count)
        return self._emit(df, m.msg(1), names=cols)

    def sort_rel(self, m: _Msg) -> DataFrame:
        df = self.rel(m.msg(2))
        cols = df.columns
        return self._emit(df.orderBy(*self._sorts(m.msgs(3), cols)), m.msg(1), names=cols)

    def window_rel(self, m: _Msg) -> DataFrame:
        """ConsistentPartitionWindowRel { common=1, input=2,
        window_functions=3, partition_expressions=4, sorts=5 }.
        Output = input fields ++ one column per window function
        (algebra.proto; Acero has no counterpart node — SURVEY §2.1 lists
        window functions among Spark-side capability gains)."""
        df = self.rel(m.msg(2))
        cols = df.columns
        parts = [self.expr(e, cols) for e in m.msgs(4)]
        sort_msgs = m.msgs(5)
        new = [f"{self._prefix}{len(cols) + i}" for i in range(len(m.msgs(3)))]
        wcols = [
            self._window_column(fm, cols, parts, sort_msgs).alias(n)
            for fm, n in zip(m.msgs(3), new)
        ]
        out = df.select(*[F.col(c) for c in cols], *wcols)
        return self._emit(out, m.msg(1), names=cols + new)

    def join_rel(self, m: _Msg) -> DataFrame:
        left, right = self.rel(m.msg(2)), self.rel(m.msg(3))
        nl = len(left.columns)
        right_r = right.toDF(*[f"{self._prefix}g{i}" for i in range(len(right.columns))])
        combined = left.columns + right_r.columns
        jtype = {1: "inner", 2: "full_outer", 3: "left_outer", 4: "right_outer",
                 5: "left_semi", 6: "left_anti"}[m.u64(6, 1)]
        cond = self.expr(m.msg(4), combined) if m.has(4) else F.lit(True)
        out = left.join(right_r, cond, jtype)
        if m.has(5):
            out = out.where(self.expr(m.msg(5), combined))
        if jtype in ("left_semi", "left_anti"):
            out = out.select(*left.columns)
        else:
            out = out.toDF(*[f"{self._prefix}{i}" for i in range(nl + len(right_r.columns))])
        return self._emit(out, m.msg(1))

    def cross_rel(self, m: _Msg) -> DataFrame:
        left, right = self.rel(m.msg(2)), self.rel(m.msg(3))
        right_r = right.toDF(*[f"{self._prefix}g{i}" for i in range(len(right.columns))])
        out = self._positional(left.crossJoin(right_r))
        return self._emit(out, m.msg(1))

    def aggregate_rel(self, m: _Msg) -> DataFrame:
        df = self.rel(m.msg(2))
        cols = df.columns
        groupings = m.msgs(3)
        aggs = []
        for i, meas in enumerate(m.msgs(4)):  # Measure { measure=1, filter=2 }
            af = meas.msg(1)  # AggregateFunction
            name = self.fn_name(af.u64(1))
            args = [
                self.expr(a.msg(3), cols) for a in af.msgs(7) if a.has(3)
            ] or [self.expr(a, cols) for a in af.msgs(2)]
            distinct = af.u64(6) == 2  # AGGREGATION_INVOCATION_DISTINCT
            if meas.has(2):
                # FILTER (WHERE cond): null out non-qualifying inputs —
                # every aggregate here skips nulls, so agg(when(cond, x))
                # is exactly SQL's FILTER semantics (count(*) counts a
                # when(cond, 1) instead)
                cond = self.expr(meas.msg(2), cols)
                args = [F.when(cond, a) for a in args] if args else [F.when(cond, F.lit(1))]
                if name == "count" and not af.msgs(7) and not af.msgs(2):
                    col = F.count(args[0])
                else:
                    col = self._agg_fn(name, args, distinct)
            else:
                col = self._agg_fn(name, args, distinct)
            aggs.append(col.alias(f"_m{i}"))
        if len(groupings) > 1:
            return self._grouping_sets(m, df, cols, groupings, aggs)
        keys = [self.expr(e, cols) for e in groupings[0].msgs(1)] if groupings else []
        # alias keys and measures positionally up front so no rename (and
        # therefore no eager analysis) is needed afterwards — measures may
        # hold outer references when this aggregate sits inside a subquery
        nk = len(keys)
        keyed = [k.alias(f"{self._prefix}{i}") for i, k in enumerate(keys)]
        aggs = [a.alias(f"{self._prefix}{nk + i}") for i, a in enumerate(aggs)]
        out = df.groupBy(*keyed).agg(*aggs) if keyed else df.agg(*aggs)
        return self._emit(
            out, m.msg(1), names=[f"{self._prefix}{i}" for i in range(nk + len(aggs))]
        )

    def _grouping_sets(
        self, m: _Msg, df: DataFrame, cols: list[str], groupings: list[_Msg], aggs: list[Column]
    ) -> DataFrame:
        """AggregateRel with >1 Grouping = grouping sets (substrait spec:
        output is the distinct grouping expressions ++ measures ++ a
        trailing i32 grouping-set index). Spark-first: DataFrame
        groupingSets + grouping_id(), with the bitmask (bit set ⇔ key
        aggregated away, leftmost key most significant) mapped back to
        the declaration-order index. Takes both encodings: rel-level
        grouping_expressions (field 5) + per-grouping references, and the
        deprecated per-grouping expression lists (deduped by encoded
        bytes)."""
        if m.has(5):
            pool = [self.expr(e, cols) for e in m.msgs(5)]
            sets = [[int(i) for i in g.ints(2)] for g in groupings]
        else:
            raw_pool: list[bytes] = []
            sets = []
            for g in groupings:
                idxs = []
                for raw in g.raws(1):
                    if raw not in raw_pool:
                        raw_pool.append(raw)
                    idxs.append(raw_pool.index(raw))
                sets.append(idxs)
            pool = [self.expr(_Msg(raw), cols) for raw in raw_pool]
        k = len(pool)
        # temp key names (must not collide with the child's positional
        # columns, which stay visible in `base` for the measures)
        tnames = [f"{self._prefix}k{i}" for i in range(k)]
        mnames = [f"{self._prefix}{k + i}" for i in range(len(aggs))]
        base = df.select(*[F.col(c) for c in cols], *[pool[i].alias(tnames[i]) for i in range(k)])
        masks = []
        for s in sets:
            mask = sum(1 << (k - 1 - i) for i in range(k) if i not in s)
            if mask in masks:
                raise NotImplementedError("duplicate grouping sets not supported")
            masks.append(mask)
        gd = base.groupingSets(
            [[F.col(tnames[i]) for i in s] for s in sets], *[F.col(c) for c in tnames]
        )
        out = gd.agg(
            *[a.alias(n) for a, n in zip(aggs, mnames)], F.grouping_id().alias("_gmask")
        )
        setidx = None
        for i, mask in enumerate(masks):
            cond = F.col("_gmask") == mask
            setidx = F.when(cond, i) if setidx is None else setidx.when(cond, i)
        knames = [f"{self._prefix}{i}" for i in range(k)]
        gname = f"{self._prefix}{k + len(aggs)}"
        out = out.select(
            *[F.col(t).alias(n) for t, n in zip(tnames, knames)],
            *mnames,
            setidx.cast("int").alias(gname),
        )
        return self._emit(out, m.msg(1), names=knames + mnames + [gname])

    @staticmethod
    def _agg_fn(name: str, args: list[Column], distinct: bool) -> Column:
        if name == "count":
            if not args:
                return F.count(F.lit(1))
            return F.count_distinct(args[0]) if distinct else F.count(args[0])
        if distinct:
            if name == "sum":
                return F.sum_distinct(args[0])
            if name in ("min", "max"):  # DISTINCT is a no-op for extrema
                return (F.min if name == "min" else F.max)(args[0])
            raise NotImplementedError(f"distinct {name} not supported")
        fns = {
            "sum": F.sum, "min": F.min, "max": F.max, "avg": F.avg,
            "any_value": F.first, "std_dev": F.stddev_samp, "variance": F.var_samp,
        }
        if name in fns and len(args) == 1:
            return fns[name](args[0])
        raise NotImplementedError(f"aggregate function {name!r} not supported")

    #: HashJoinRel/MergeJoinRel/NestedLoopJoinRel share a JoinType enum
    #: DISTINCT from JoinRel's: LEFT_SEMI=5, RIGHT_SEMI=6, LEFT_ANTI=7,
    #: RIGHT_ANTI=8 (JoinRel has LEFT_SEMI=5, LEFT_ANTI=6). Right-side
    #: semi/anti run as the mirrored left-side join with sides swapped;
    #: output = the right input's fields, per spec.
    _KEYED_JOIN_TYPES = {1: "inner", 2: "full_outer", 3: "left_outer",
                         4: "right_outer", 5: "left_semi", 6: "right_semi",
                         7: "left_anti", 8: "right_anti"}

    def _keyed_join(self, m: _Msg, kind: str) -> DataFrame:
        """Shared body for HashJoinRel (field 13) and MergeJoinRel
        (field 14): { common=1, left=2, right=3, left_keys=4 (bare
        FieldReferences), right_keys=5, post_join_filter=6, type=7 }.
        Both lower to the same logical equi-join — physical strategy
        (broadcast-hash / shuffled-hash / sort-merge) is Catalyst's
        decision, which is the architectural point: the producer's
        algorithm hint doesn't constrain the optimizer."""
        left, right = self.rel(m.msg(2)), self.rel(m.msg(3))
        nl = len(left.columns)
        right_r = right.toDF(*[f"{self._prefix}g{i}" for i in range(len(right.columns))])
        combined = left.columns + right_r.columns
        lkeys = [self.field_index(r) for r in m.msgs(4)]
        rkeys = [self.field_index(r) for r in m.msgs(5)]
        if len(lkeys) != len(rkeys) or not lkeys:
            raise ValueError(f"{kind} join needs matching non-empty key lists")
        cond = None
        for li, ri in zip(lkeys, rkeys):
            c = F.col(left.columns[li]) == F.col(right_r.columns[ri])
            cond = c if cond is None else cond & c
        jtype = self._KEYED_JOIN_TYPES[m.u64(7, 1)]
        filt = self.expr(m.msg(6), combined) if m.has(6) else None
        return self._emit(self._join_output(left, right_r, cond, jtype, filt, nl), m.msg(1))

    def _join_output(
        self,
        left: DataFrame,
        right_r: DataFrame,
        cond: Column,
        jtype: str,
        filt: Column | None,
        nl: int,
    ) -> DataFrame:
        """Execute + positionally rename a keyed/NLJ join, handling the
        right-side semi/anti types by swapping sides (output fields =
        the surviving side only, per the substrait spec)."""
        if jtype in ("right_semi", "right_anti"):
            mirrored = "left_semi" if jtype == "right_semi" else "left_anti"
            out = right_r.join(left, cond, mirrored)
            if filt is not None:
                out = out.where(filt)
            return out.toDF(*[f"{self._prefix}{i}" for i in range(len(right_r.columns))])
        out = left.join(right_r, cond, jtype)
        if filt is not None:
            out = out.where(filt)
        if jtype in ("left_semi", "left_anti"):
            return out.select(*left.columns)
        return out.toDF(*[f"{self._prefix}{i}" for i in range(nl + len(right_r.columns))])

    def hash_join_rel(self, m: _Msg) -> DataFrame:
        return self._keyed_join(m, "hash")

    def merge_join_rel(self, m: _Msg) -> DataFrame:
        return self._keyed_join(m, "merge")

    def _extension(self, m: _Msg, detail_field: int, inputs: list[DataFrame]) -> DataFrame:
        """Route an extension rel's Any detail { type_url=1, value=2 }
        through the session's extension_handler — the Spark analog of
        Acero's ExtensionProvider (engine/substrait/extension_set.h:
        custom rels like Acero's as-of join arrive exactly this way).
        The handler returns a DataFrame; its output is positionalized
        like every relation."""
        if self.extension_handler is None:
            raise NotImplementedError(
                "plan contains an extension relation; pass extension_handler="
            )
        detail = m.msg(detail_field)
        type_url = detail.s(1) if detail else ""
        value = (detail.raw(2) if detail else None) or b""
        out = self.extension_handler(type_url, value, inputs)
        return self._positional(out)

    def extension_single_rel(self, m: _Msg) -> DataFrame:
        # ExtensionSingleRel { common=1, input=2, detail=3 }
        return self._extension(m, 3, [self.rel(m.msg(2))])

    def extension_multi_rel(self, m: _Msg) -> DataFrame:
        # ExtensionMultiRel { common=1, inputs=2, detail=3 }
        return self._extension(m, 3, [self.rel(r) for r in m.msgs(2)])

    def extension_leaf_rel(self, m: _Msg) -> DataFrame:
        # ExtensionLeafRel { common=1, detail=2 }
        return self._extension(m, 2, [])

    def reference_rel(self, m: _Msg) -> DataFrame:
        """ReferenceRel { subtree_ordinal=1 } — algebra.proto field 21:
        reference another PlanRel tree by declaration order (common-
        subplan sharing from producers). Compiled once and cached at the
        logical level; where the physical plan allows, Catalyst further
        collapses the duplicates into a ReusedExchange."""
        k = m.u64(1, 0)
        if k >= len(self.plan_rels):
            raise ValueError(
                f"reference to subtree {k} but plan has {len(self.plan_rels)} relations"
            )
        if k not in self._subtree_cache:
            self._subtree_cache[k] = self.rel(self.plan_rels[k])
        return self._positional(self._subtree_cache[k])

    def nested_loop_join_rel(self, m: _Msg) -> DataFrame:
        """NestedLoopJoinRel { common=1, left=2, right=3, expression=4,
        type=5 } — algebra.proto field 18. The theta condition is
        arbitrary (no equi-keys required); Spark-first this is the same
        DataFrame join — Catalyst picks BroadcastNestedLoopJoin when no
        equi-conjunct exists and the small side fits the broadcast
        threshold, which is the scalable physical shape for theta joins.
        No expression ⇒ always-true (the spec default)."""
        left, right = self.rel(m.msg(2)), self.rel(m.msg(3))
        nl = len(left.columns)
        right_r = right.toDF(*[f"{self._prefix}g{i}" for i in range(len(right.columns))])
        combined = left.columns + right_r.columns
        jtype = self._KEYED_JOIN_TYPES[m.u64(5, 1)]
        cond = self.expr(m.msg(4), combined) if m.has(4) else F.lit(True)
        return self._emit(
            self._join_output(left, right_r, cond, jtype, None, nl), m.msg(1)
        )

    def exchange_rel(self, m: _Msg) -> DataFrame:
        """ExchangeRel { common=1, input=2, partition_count=3,
        targets=4, scatter_by_fields=5 | single_target=6 |
        multi_target=7 | round_robin=8 | broadcast=9 } — algebra.proto
        field 15.

        Spark-first mapping: scatter → hash repartition on the fields
        (an Exchange hashpartitioning), round-robin → repartition(n)
        (RoundRobinPartitioning), broadcast → the broadcast hint
        consumed by the next join. Row content is unchanged — only the
        physical distribution moves, same as Acero's exchange."""
        df = self.rel(m.msg(2))
        cols = df.columns
        n = m.u64(3, 0)
        if m.has(5):  # ScatterFields { fields=1 } — bare FieldReferences
            keys = [F.col(cols[self.field_index(f)]) for f in m.msg(5).msgs(1)]
            out = df.repartition(n, *keys) if n else df.repartition(*keys)
        elif m.has(8):
            out = df.repartition(n) if n else df.repartition()
        elif m.has(9):
            out = F.broadcast(df)
        else:
            raise NotImplementedError(
                f"exchange kinds {sorted(m.f)} not supported (single/multi target)"
            )
        return self._emit(out, m.msg(1), names=cols)

    def ddl_rel(self, m: _Msg) -> DataFrame:
        """DdlRel { named_object=1, table_schema=3, object=5, op=6,
        view_definition=7 } — algebra.proto field 20. Supported surface:
        VIEW CREATE / CREATE_OR_REPLACE (registers the view_definition
        as a session temp view) and TABLE/VIEW DROP / DROP_IF_EXIST.
        Returns the defined view's frame (CREATE) or an empty frame
        (DROP), positionally named like every relation."""
        if not m.has(1):
            raise NotImplementedError("only named_object DDL supported")
        name = "_".join(m.msg(1).strs(1))
        obj, op = m.u64(5, 1), m.u64(6, 1)
        if op in (1, 2):  # CREATE / CREATE_OR_REPLACE
            if obj != 2 or not m.has(7):
                raise NotImplementedError("CREATE supported for VIEW with definition")
            view = self._positional(self.rel(m.msg(7)))
            schema = m.msg(3)
            out_names = schema.strs(1) if schema else []
            registered = (
                view.toDF(*out_names) if len(out_names) == len(view.columns) else view
            )
            registered.createOrReplaceTempView(name)
            return view
        if op in (4, 5):  # DROP / DROP_IF_EXIST
            dropped = self.spark.catalog.dropTempView(name)
            if not dropped and op == 4:
                raise ValueError(f"view {name!r} does not exist")
            return self._positional(self.spark.range(0).select())
        raise NotImplementedError(f"ddl op {op} not supported")

    def expand_rel(self, m: _Msg) -> DataFrame:
        """ExpandRel { common=1, input=2, fields=4 }: emit one copy of
        each input row per switching-duplicate; output = the declared
        fields only. ExpandField is either consistent_field=3 (same
        expression in every copy) or switching_expressions=2 (copy i
        evaluates duplicates[i]) — algebra.proto field 16; reference
        consumer cpp/src/arrow/engine/substrait/relation_internal.cc.

        Spark-first: union-all of one projection per copy. This is the
        same shape Catalyst's own Expand node lowers grouping sets to —
        each branch stays in whole-stage codegen, no shuffle is added,
        and the scan is reused across branches (Catalyst caches the
        shared subplan)."""
        df = self.rel(m.msg(2))
        cols = df.columns
        fields = m.msgs(4)
        if not fields:
            raise NotImplementedError("expand with no fields")
        n_copies = max(
            (len(f.msg(2).msgs(1)) for f in fields if f.has(2)), default=1
        )
        names = [f"{self._prefix}{j}" for j in range(len(fields))]
        out = None
        for i in range(n_copies):
            row = []
            for j, fld in enumerate(fields):
                if fld.has(2):
                    dups = fld.msg(2).msgs(1)
                    if len(dups) != n_copies:
                        raise ValueError(
                            "switching fields must agree on duplicate count"
                        )
                    row.append(self.expr(dups[i], cols).alias(names[j]))
                elif fld.has(3):
                    row.append(self.expr(fld.msg(3), cols).alias(names[j]))
                else:
                    raise NotImplementedError(
                        f"expand field kinds {sorted(fld.f)} not supported"
                    )
            branch = df.select(*row)
            out = branch if out is None else out.union(branch)
        return self._emit(out, m.msg(1), names=names)

    def write_rel(self, m: _Msg) -> DataFrame:
        """WriteRel { named_table=1, table_schema=3, op=4, input=5,
        output=6, common=7 } — algebra.proto field 19; reference consumer
        relation_internal.cc (Acero write node → dataset sink).

        The input frame is renamed to table_schema.names (when present)
        and handed to the session's table_writer callback — the Spark
        analog of Acero's pluggable write node; the default writer in
        ``run_substrait`` appends/overwrites a saveAsTable. Returns the
        written rows (MODIFIED_RECORDS) or an empty frame (NO_OUTPUT),
        per WriteRel.output_mode."""
        if not m.has(1):
            raise NotImplementedError("only named_table writes supported")
        df = self.rel(m.msg(5))
        schema = m.msg(3)
        out_names = schema.strs(1) if schema else []
        named = df.toDF(*out_names) if len(out_names) == len(df.columns) else df
        op = m.u64(4, 1)  # 1=INSERT 2=DELETE 3=UPDATE 4=CTAS
        if op not in (1, 4):
            raise NotImplementedError(f"write op {op} not supported")
        if self.writer is None:
            raise ValueError("plan contains a WriteRel; pass table_writer=")
        self.writer(m.msg(1).strs(1), named, op)
        out = named.limit(0) if m.u64(6, 2) == 1 else named
        return self._positional(out)

    def set_rel(self, m: _Msg) -> DataFrame:
        inputs = [self.rel(r) for r in m.msgs(2)]
        op = m.u64(3)
        out = inputs[0]
        for nxt in inputs[1:]:
            if op == 6:  # UNION_ALL
                out = out.union(nxt)
            elif op == 5:  # UNION_DISTINCT
                out = out.union(nxt).distinct()
            elif op == 3:  # INTERSECTION_PRIMARY
                out = out.intersect(nxt)
            elif op == 1:  # MINUS_PRIMARY
                out = out.subtract(nxt)
            else:
                raise NotImplementedError(f"set op {op} not supported")
        return self._emit(out, m.msg(1))


def _extension_functions(plan: _Msg) -> dict[int, str]:
    """SimpleExtensionDeclaration.ExtensionFunction: anchor -> name."""
    out: dict[int, str] = {}
    for decl in plan.msgs(2):
        fn = decl.msg(3)
        if fn is not None:
            out[fn.u64(2)] = fn.s(3)
    return out


def default_table_writer(
    spark: SparkSession,
) -> Callable[[Sequence[str], DataFrame, int], None]:
    """WriteRel sink: INSERT appends to, CTAS (re)creates, a catalog
    table named by the dotted NamedObjectWrite path — Spark's durable
    equivalent of Acero's dataset-write node."""

    def write(names: Sequence[str], df: DataFrame, op: int) -> None:
        qname = ".".join(names)
        df.write.mode("append" if op == 1 else "overwrite").saveAsTable(qname)

    return write


def run_substrait(
    spark: SparkSession,
    plan_bytes: bytes,
    table_provider: Callable[[Sequence[str]], DataFrame],
    table_writer: Callable[[Sequence[str], DataFrame, int], None] | None = None,
    extension_handler: Callable[[str, bytes, list[DataFrame]], DataFrame] | None = None,
) -> DataFrame:
    """Execute a serialized substrait.Plan against Spark
    (pyarrow.substrait.run_query parity — serde.h:106).

    `table_provider` maps a qualified-name list (NamedTable.names) to a
    DataFrame, exactly like run_query's table_provider. `table_writer`
    receives (names, frame, write_op) for each WriteRel — pass
    ``default_table_writer(spark)`` for saveAsTable semantics.
    `extension_handler(type_url, value, inputs)` consumes
    ExtensionSingle/Multi/Leaf rels (the ExtensionProvider analog).
    The final DataFrame carries RelRoot.names.
    """
    plan = _Msg(bytes(plan_bytes))
    # Collect every PlanRel tree first: non-root entries are subtrees
    # that ReferenceRel addresses by declaration order.
    rel_msgs: list[_Msg] = []
    result_root = None
    for prel in plan.msgs(3):  # PlanRel { rel=1 | root=2 }
        root = prel.msg(2)
        if root is not None:
            rel_msgs.append(root.msg(1))
            if result_root is None:
                result_root = (len(rel_msgs) - 1, root)
        elif prel.has(1):
            rel_msgs.append(prel.msg(1))
    consumer = _Consumer(
        spark, table_provider, _extension_functions(plan), table_writer, rel_msgs,
        extension_handler,
    )
    if result_root is not None:
        idx, root = result_root
        df = consumer.rel(rel_msgs[idx])
        names = root.strs(2)
        return df.toDF(*names) if names else df
    if rel_msgs:
        return consumer.rel(rel_msgs[-1])
    raise ValueError("plan has no relations")
