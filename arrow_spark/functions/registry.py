"""The Arrow compute-function registry, re-expressed as Catalyst Columns.

One entry per documented Arrow compute function (301 names,
docs/source/cpp/compute.rst; registry populated at
cpp/src/arrow/compute/registry.cc:283-297 — full name list reproduced in
SURVEY.md §2.2.11). Each spec carries the PySpark implementation as a
Column-builder so expressions stay inside whole-stage codegen; the few
physical-layout functions (dictionary/REE) are explicit no-ops because
Spark's model is purely logical (SURVEY §1.2).

Statuses:
  mapped     — full semantic equivalent as a Column expression
  aggregate  — aggregate function (use under groupBy/agg); `hash_*`
               variants are the same function in group-by mode, exactly
               Arrow's scalar-vs-hash kernel split
  window     — requires an explicit (partition, order) spec; returns a
               builder taking a WindowSpec (Arrow arrays are implicitly
               ordered; distributed frames are not)
  table      — table-level op on a DataFrame, not a Column (filter/take/
               sort_indices style vector functions)
  physical   — physical-encoding concern; identity in Spark's logical model
  deferred   — genuinely unsupported so far; raises NotImplementedError
"""

from __future__ import annotations

import math
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FunctionSpec:
    name: str
    family: str
    status: str
    impl: Callable | None = None
    notes: str = ""


ARROW_FUNCTIONS: dict[str, FunctionSpec] = {}


def _reg(name: str, family: str, status: str, impl=None, notes: str = "") -> None:
    ARROW_FUNCTIONS[name] = FunctionSpec(name, family, status, impl, notes)


def call(name: str, *args, **kwargs):
    """Invoke an Arrow function by name → Column (pyarrow.compute parity)."""
    spec = ARROW_FUNCTIONS.get(name)
    if spec is None:
        raise KeyError(f"unknown Arrow compute function {name!r}")
    if spec.impl is None:
        raise NotImplementedError(f"{name}: {spec.status} — {spec.notes}")
    return spec.impl(*args, **kwargs)


def list_functions() -> list[str]:
    return sorted(ARROW_FUNCTIONS)


def coverage() -> dict[str, int]:
    out: dict[str, int] = {}
    for s in ARROW_FUNCTIONS.values():
        out[s.status] = out.get(s.status, 0) + 1
    return out


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x) if isinstance(x, str) else F.lit(x)


# --------------------------------------------------------------------------
# Arithmetic (scalar_arithmetic.cc, scalar_round.cc).  `_checked` variants
# are the raise-on-overflow forms: Spark equivalent is ANSI mode; in
# non-ANSI sessions we map them to the same expression (documented delta)
# and the non-checked forms to try_* where Spark has them.
# --------------------------------------------------------------------------

for _n, _f in {
    "add": lambda a, b: _c(a) + _c(b),
    "subtract": lambda a, b: _c(a) - _c(b),
    "multiply": lambda a, b: _c(a) * _c(b),
    "divide": lambda a, b: _c(a) / _c(b),
    "negate": lambda a: -_c(a),
    "power": lambda a, b: F.pow(_c(a), _c(b)),
    "sqrt": lambda a: F.sqrt(_c(a)),
    "exp": lambda a: F.exp(_c(a)),
    "expm1": lambda a: F.expm1(_c(a)),
    "ln": lambda a: F.log(_c(a)),
    "log10": lambda a: F.log10(_c(a)),
    "log2": lambda a: F.log2(_c(a)),
    "log1p": lambda a: F.log1p(_c(a)),
    "logb": lambda a, b: F.log(_c(b)) / F.log(_c(a)) if not isinstance(b, (int, float)) else F.log(float(b), _c(a)),
    "sign": lambda a: F.signum(_c(a)),
    "abs": lambda a: F.abs(_c(a)),
    "bit_wise_and": lambda a, b: _c(a).bitwiseAND(_c(b)),
    "bit_wise_or": lambda a, b: _c(a).bitwiseOR(_c(b)),
    "bit_wise_xor": lambda a, b: _c(a).bitwiseXOR(_c(b)),
    "bit_wise_not": lambda a: F.bitwise_not(_c(a)),
    "shift_left": lambda a, b: F.shiftleft(_c(a), b),
    "shift_right": lambda a, b: F.shiftright(_c(a), b),
    "sin": lambda a: F.sin(_c(a)),
    "cos": lambda a: F.cos(_c(a)),
    "tan": lambda a: F.tan(_c(a)),
    "asin": lambda a: F.asin(_c(a)),
    "acos": lambda a: F.acos(_c(a)),
    "atan": lambda a: F.atan(_c(a)),
    "atan2": lambda a, b: F.atan2(_c(a), _c(b)),
    "sinh": lambda a: F.sinh(_c(a)),
    "cosh": lambda a: F.cosh(_c(a)),
    "tanh": lambda a: F.tanh(_c(a)),
    "asinh": lambda a: F.asinh(_c(a)),
    "acosh": lambda a: F.acosh(_c(a)),
    "atanh": lambda a: F.atanh(_c(a)),
    "hypot": lambda a, b: F.sqrt(_c(a) * _c(a) + _c(b) * _c(b)),
    "floor": lambda a: F.floor(_c(a)).cast("double"),
    "ceil": lambda a: F.ceil(_c(a)).cast("double"),
    "trunc": lambda a: (_c(a) - (_c(a) % 1)).cast("double"),
    "round": lambda a, ndigits=0, round_mode="half_to_even": _round_mode(
        _c(a), ndigits, round_mode
    ),
    "round_to_multiple": lambda a, multiple=1.0, round_mode="half_to_even": _round_mode(
        _c(a) / multiple, 0, round_mode
    )
    * multiple,
    "round_binary": lambda a, s, round_mode="half_to_even": _round_binary(a, s, round_mode),
    "min_element_wise": lambda *cs: F.least(*[_c(x) for x in cs]),
    "max_element_wise": lambda *cs: F.greatest(*[_c(x) for x in cs]),
}.items():
    _reg(_n, "arithmetic", "mapped", _f)

_CHECKED = [
    "abs_checked", "acos_checked", "acosh_checked", "add_checked", "asin_checked",
    "atanh_checked", "cos_checked", "divide_checked", "ln_checked", "log10_checked",
    "log1p_checked", "log2_checked", "logb_checked", "multiply_checked",
    "negate_checked", "power_checked", "shift_left_checked", "shift_right_checked",
    "sin_checked", "sqrt_checked", "subtract_checked", "tan_checked",
    "cumulative_prod_checked", "cumulative_sum_checked", "pairwise_diff_checked",
]
for _n in _CHECKED:
    _base = _n[: -len("_checked")]

    def _mk(base):
        def impl(*a, **k):
            return call(base, *a, **k)

        return impl

    _reg(
        _n,
        "arithmetic",
        "mapped",
        _mk(_base),
        "checked ⇒ ANSI mode raises; non-ANSI sessions overflow silently like the "
        "non-checked kernel (set spark.sql.ansi.enabled for raise-on-overflow)",
    )

def _round_mode(col: Column, ndigits: int, mode: str) -> Column:
    """Arrow's 10 RoundModes (compute/api_scalar.h RoundMode) as Catalyst
    expressions. Spark natively has half_up (round) and half_to_even
    (bround); the rest compose from floor/ceil/sign on the scaled value.
    """
    scale = float(10**ndigits)
    x = col * scale
    ax = F.abs(x)
    sgn = F.when(x < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
    floor_x, ceil_x = F.floor(x).cast("double"), F.ceil(x).cast("double")
    frac_is_half = (ax - F.floor(ax)) == 0.5
    if mode == "down":
        r = floor_x
    elif mode == "up":
        r = ceil_x
    elif mode == "towards_zero":
        r = sgn * F.floor(ax).cast("double")
    elif mode == "towards_infinity":
        r = sgn * F.ceil(ax).cast("double")
    elif mode == "half_down":
        r = F.ceil(x - 0.5).cast("double")
    elif mode == "half_up":
        r = F.floor(x + 0.5).cast("double")
    elif mode == "half_towards_zero":
        r = sgn * F.ceil(ax - 0.5).cast("double")
    elif mode == "half_towards_infinity":
        r = sgn * F.floor(ax + 0.5).cast("double")
    elif mode == "half_to_even":
        r = F.bround(x, 0)
    elif mode == "half_to_odd":
        even = F.bround(x, 0)
        # at exact .5 ties bround picked the even neighbor; the odd one
        # is the other candidate (floor if even==ceil else ceil)
        odd = F.when(even == floor_x, ceil_x).otherwise(floor_x)
        r = F.when(frac_is_half, odd).otherwise(even)
    else:
        raise ValueError(f"unknown round_mode {mode!r}")
    return r / scale


def _round_binary(a, ndigits_col, round_mode="half_to_even"):
    """round_binary: per-row digit counts (second input is a column)."""
    x, d = _c(a), _c(ndigits_col)
    scale = F.pow(F.lit(10.0), d)
    scaled = x * scale
    if round_mode == "half_to_even":
        r = F.bround(scaled, 0)
    elif round_mode == "half_up":
        r = F.floor(scaled + 0.5).cast("double")
    else:
        raise ValueError("round_binary supports half_to_even / half_up")
    return r / scale


# --------------------------------------------------------------------------
# Comparison / boolean / validity (scalar_compare.cc, scalar_boolean.cc,
# scalar_validity.cc). Spark AND/OR are SQL-Kleene natively.
# --------------------------------------------------------------------------

_INF = float("inf")
for _n, _f in {
    "equal": lambda a, b: _c(a) == _c(b),
    "not_equal": lambda a, b: _c(a) != _c(b),
    "less": lambda a, b: _c(a) < _c(b),
    "less_equal": lambda a, b: _c(a) <= _c(b),
    "greater": lambda a, b: _c(a) > _c(b),
    "greater_equal": lambda a, b: _c(a) >= _c(b),
    "and": lambda a, b: _c(a) & _c(b),
    "or": lambda a, b: _c(a) | _c(b),
    "xor": lambda a, b: _c(a) != _c(b),
    "invert": lambda a: ~_c(a),
    "and_kleene": lambda a, b: _c(a) & _c(b),
    "or_kleene": lambda a, b: _c(a) | _c(b),
    "and_not": lambda a, b: _c(a) & ~_c(b),
    "and_not_kleene": lambda a, b: _c(a) & ~_c(b),
    "is_null": lambda a, nan_is_null=False: (
        _c(a).isNull() | F.isnan(_c(a)) if nan_is_null else _c(a).isNull()
    ),
    "is_valid": lambda a: _c(a).isNotNull(),
    "is_nan": lambda a: F.isnan(_c(a)),
    "is_inf": lambda a: F.abs(_c(a)) == F.lit(_INF),
    "is_finite": lambda a: ~(F.isnan(_c(a)) | (F.abs(_c(a)) == F.lit(_INF))),
    "true_unless_null": lambda a: F.when(_c(a).isNotNull(), F.lit(True)),
    "if_else": lambda c, a, b: F.when(_c(c), _c(a)).otherwise(_c(b)),
    "coalesce": lambda *cs: F.coalesce(*[_c(x) for x in cs]),
    "case_when": None,  # registered explicitly below
    "choose": lambda idx, *cs: F.element_at(F.array(*[_c(x) for x in cs]), _c(idx).cast("int") + 1),
    "is_in": lambda a, value_set=(): _c(a).isin(list(value_set)),
    "index_in": lambda a, value_set=(): F.when(
        F.array_position(F.array(*[F.lit(v) for v in value_set]), _c(a)) > 0,
        (F.array_position(F.array(*[F.lit(v) for v in value_set]), _c(a)) - 1).cast("int"),
    ),
    "random": lambda seed=None: F.rand(seed) if seed is not None else F.rand(),
}.items():
    if _f is not None:
        _reg(_n, "boolean/compare", "mapped", _f)


def _case_when(conds_and_values, default=None):
    expr = None
    for cond, value in conds_and_values:
        expr = F.when(_c(cond), _c(value)) if expr is None else expr.when(_c(cond), _c(value))
    return expr.otherwise(_c(default)) if default is not None else expr


_reg("case_when", "boolean/compare", "mapped", _case_when)

# Arrow's non-Kleene and/or propagate null if ANY input is null; note the
# delta (Spark is always Kleene). Emulation when exact parity is needed:
_reg(
    "and_non_kleene",
    "boolean/compare",
    "mapped",
    lambda a, b: F.when(_c(a).isNull() | _c(b).isNull(), F.lit(None)).otherwise(_c(a) & _c(b)),
    "explicit null-propagating variant (Arrow `and` pre-Kleene semantics)",
)

# --------------------------------------------------------------------------
# Aggregates (aggregate_basic.cc etc).  `hash_*` = same fn under groupBy.
# --------------------------------------------------------------------------

_AGGS: dict[str, Callable] = {
    "sum": lambda a: F.sum(_c(a)),
    "product": lambda a: F.product(_c(a)),
    "min": lambda a: F.min(_c(a)),
    "max": lambda a: F.max(_c(a)),
    "min_max": lambda a: F.struct(F.min(_c(a)).alias("min"), F.max(_c(a)).alias("max")),
    "mean": lambda a: F.avg(_c(a)),
    "count": lambda a: F.count(_c(a)),
    "count_all": lambda: F.count(F.lit(1)),
    "count_distinct": lambda a: F.count_distinct(_c(a)),
    "any": lambda a: F.bool_or(_c(a)),
    "all": lambda a: F.bool_and(_c(a)),
    "index": lambda a, value=None: F.min(F.when(_c(a) == value, F.lit(1))),
    "first": lambda a: F.first(_c(a), ignorenulls=True),
    "last": lambda a: F.last(_c(a), ignorenulls=True),
    "first_last": lambda a: F.struct(
        F.first(_c(a), True).alias("first"), F.last(_c(a), True).alias("last")
    ),
    "variance": lambda a, ddof=0: F.var_pop(_c(a)) if ddof == 0 else F.var_samp(_c(a)),
    "stddev": lambda a, ddof=0: F.stddev_pop(_c(a)) if ddof == 0 else F.stddev_samp(_c(a)),
    "skew": lambda a: F.skewness(_c(a)),
    "kurtosis": lambda a: F.kurtosis(_c(a)),
    "quantile": lambda a, q=0.5: F.percentile(_c(a), F.lit(q)),
    "approximate_median": lambda a: F.percentile_approx(_c(a), F.lit(0.5)),
    "tdigest": lambda a, q=0.5: F.percentile_approx(_c(a), F.lit(q)),
    "mode": lambda a: F.mode(_c(a)),
    "winsorize": None,  # vector function; registered below
}
for _n, _f in _AGGS.items():
    if _f is not None:
        _reg(_n, "aggregate", "aggregate", _f)

_HASH_AGG_MAP = {
    "hash_sum": "sum", "hash_product": "product", "hash_min": "min", "hash_max": "max",
    "hash_min_max": "min_max", "hash_mean": "mean", "hash_count": "count",
    "hash_count_all": "count_all", "hash_count_distinct": "count_distinct",
    "hash_any": "any", "hash_all": "all", "hash_first": "first", "hash_last": "last",
    "hash_first_last": "first_last", "hash_variance": "variance", "hash_stddev": "stddev",
    "hash_skew": "skew", "hash_kurtosis": "kurtosis", "hash_tdigest": "tdigest",
    "hash_approximate_median": "approximate_median",
}
for _n, _base in _HASH_AGG_MAP.items():

    def _mk_hash(base):
        def impl(*a, **k):
            return call(base, *a, **k)

        return impl

    _reg(_n, "aggregate", "aggregate", _mk_hash(_base), "group-by mode of the scalar kernel")

_reg("hash_list", "aggregate", "aggregate", lambda a: F.collect_list(_c(a)))
_reg("hash_distinct", "aggregate", "aggregate", lambda a: F.collect_set(_c(a)))
_reg("hash_one", "aggregate", "aggregate", lambda a: F.any_value(_c(a)))
_reg(
    "pivot_wider", "aggregate", "table",
    None, "df.groupBy(...).pivot(key_col, values).agg(...) — see queries/relational.pivot_wider",
)
_reg(
    "hash_pivot_wider", "aggregate", "table",
    None, "group-by mode of pivot_wider — same groupBy().pivot() plan",
)

# --------------------------------------------------------------------------
# Strings (scalar_string_ascii.cc / scalar_string_utf8.cc).  ascii_* and
# utf8_* pairs collapse: Spark strings are unicode; the ascii fast path is
# a physical optimization the JVM makes internally.
# --------------------------------------------------------------------------


def _reg_pair(suffix: str, impl, notes: str = "") -> None:
    _reg(f"ascii_{suffix}", "string", "mapped", impl, notes or "ascii fast path ≡ utf8 in Spark")
    _reg(f"utf8_{suffix}", "string", "mapped", impl, notes)


_reg_pair("upper", lambda a: F.upper(_c(a)))
_reg_pair("lower", lambda a: F.lower(_c(a)))
_reg_pair(
    "capitalize",
    lambda a: F.concat(
        F.upper(F.substring(_c(a), 1, 1)), F.lower(F.substring(_c(a), 2, 1 << 30))
    ),
    "first char upper, rest lower (Arrow semantics; initcap would title-case every word)",
)
_reg_pair("title", lambda a: F.initcap(_c(a)))
_reg_pair("swapcase", lambda a: _swapcase(a))
_reg_pair("reverse", lambda a: F.reverse(_c(a)))
_reg("binary_reverse", "string", "mapped", lambda a: F.reverse(_c(a)))
_reg_pair("trim", lambda a, characters=None: F.trim(_c(a)) if characters is None else F.btrim(_c(a), F.lit(characters)))
_reg_pair("ltrim", lambda a, characters=None: F.ltrim(_c(a)) if characters is None else F.ltrim(_c(a), F.lit(characters)))
_reg_pair("rtrim", lambda a, characters=None: F.rtrim(_c(a)) if characters is None else F.rtrim(_c(a), F.lit(characters)))
_reg_pair("trim_whitespace", lambda a: F.trim(_c(a)))
_reg_pair("ltrim_whitespace", lambda a: F.ltrim(_c(a)))
_reg_pair("rtrim_whitespace", lambda a: F.rtrim(_c(a)))
_reg_pair("center", lambda a, width=0, padding=" ": _center(a, width, padding))
_reg_pair("lpad", lambda a, width=0, padding=" ": F.lpad(_c(a), width, padding))
_reg_pair("rpad", lambda a, width=0, padding=" ": F.rpad(_c(a), width, padding))
_reg("utf8_zero_fill", "string", "mapped", lambda a, width=0: F.lpad(_c(a), width, "0"))


def _swapcase(a):
    ch = _c(a)
    # per-char swap via transform over split characters (JVM, no UDF)
    chars = F.split(ch, "")
    swapped = F.transform(
        chars,
        lambda x: F.when(x == F.upper(x), F.lower(x)).otherwise(F.upper(x)),
    )
    return F.array_join(swapped, "")


def _center(a, width, padding=" "):
    # split the padding evenly: ⌊pad/2⌋ on the left, remainder right
    s = _c(a)
    pad_total = F.greatest(F.lit(width) - F.length(s), F.lit(0))
    left_n = F.floor(pad_total / 2).cast("int")
    right_n = (pad_total - left_n).cast("int")
    return F.concat(F.repeat(F.lit(padding), left_n), s, F.repeat(F.lit(padding), right_n))


_CLASSIFY = {
    "is_alnum": "^[0-9\\p{L}]+$",
    "is_alpha": "^\\p{L}+$",
    "is_decimal": "^[0-9]+$",
    "is_digit": "^[0-9]+$",
    "is_numeric": "^[0-9]+$",
    "is_lower": None,
    "is_upper": None,
    "is_title": None,
    "is_space": "^\\s+$",
    "is_printable": "^\\P{Cc}*$",
}
for _suffix, _pat in _CLASSIFY.items():
    if _pat is not None:

        def _mk_cls(pat):
            return lambda a: _c(a).rlike(pat)

        impl = _mk_cls(_pat)
    elif _suffix == "is_lower":
        impl = lambda a: (_c(a) == F.lower(_c(a))) & _c(a).rlike("\\p{L}")
    elif _suffix == "is_upper":
        impl = lambda a: (_c(a) == F.upper(_c(a))) & _c(a).rlike("\\p{L}")
    else:  # is_title
        impl = lambda a: _c(a) == F.initcap(F.lower(_c(a)))
    if _suffix in ("is_decimal", "is_numeric"):
        _reg(f"utf8_{_suffix}", "string", "mapped", impl)
        if _suffix == "is_decimal":
            _reg(f"ascii_{_suffix}", "string", "mapped", impl)
    else:
        _reg_pair(_suffix, impl)
_reg("utf8_is_digit", "string", "mapped", lambda a: _c(a).rlike("^[0-9]+$"))
_reg("string_is_ascii", "string", "mapped", lambda a: _c(a).rlike("^[\\x00-\\x7F]*$"))

for _n, _f in {
    "binary_length": lambda a: F.octet_length(_c(a)),
    "utf8_length": lambda a: F.length(_c(a)),
    "starts_with": lambda a, pattern="": _c(a).startswith(pattern),
    "ends_with": lambda a, pattern="": _c(a).endswith(pattern),
    "match_substring": lambda a, pattern="": _c(a).contains(pattern),
    "match_substring_regex": lambda a, pattern="": _c(a).rlike(pattern),
    "match_like": lambda a, pattern="": _c(a).like(pattern),
    "find_substring": lambda a, pattern="": F.locate(pattern, _c(a)) - 1,
    "find_substring_regex": lambda a, pattern="": F.when(
        _c(a).rlike(pattern),
        F.length(F.regexp_extract(_c(a), f"^((?s:.)*?)(?:{pattern})", 1)),
    ).otherwise(F.lit(-1)),
    "count_substring": lambda a, pattern="": (
        (F.length(_c(a)) - F.length(F.replace(_c(a), F.lit(pattern), F.lit("")))) / len(pattern)
    ).cast("int"),
    "count_substring_regex": lambda a, pattern="": F.size(
        F.regexp_extract_all(_c(a), F.lit(f"({pattern})"))
    ),
    "replace_substring": lambda a, pattern="", replacement="": F.replace(
        _c(a), F.lit(pattern), F.lit(replacement)
    ),
    "replace_substring_regex": lambda a, pattern="", replacement="": F.regexp_replace(
        _c(a), pattern, replacement
    ),
    "extract_regex": lambda a, pattern="", group=1: F.regexp_extract(_c(a), pattern, group),
    "extract_regex_span": lambda a, pattern="": F.struct(
        (F.locate(F.regexp_extract(_c(a), f"({pattern})", 1), _c(a)) - 1).alias("start"),
        F.length(F.regexp_extract(_c(a), f"({pattern})", 1)).alias("length"),
    ),
    "split_pattern": lambda a, pattern=" ": F.split(_c(a), _re_escape(pattern)),
    "split_pattern_regex": lambda a, pattern="\\s+": F.split(_c(a), pattern),
    "ascii_split_whitespace": lambda a: F.split(_c(a), "\\s+"),
    "utf8_split_whitespace": lambda a: F.split(_c(a), "\\s+"),
    "binary_join": lambda arr, sep="": F.array_join(_c(arr), sep),
    "binary_join_element_wise": lambda *cs: F.concat_ws(None, *cs) if False else _join_ew(*cs),
    "binary_repeat": lambda a, n=1: F.repeat(_c(a), n),
    "binary_slice": lambda a, start=0, stop=None: _slice_str(a, start, stop),
    "utf8_slice_codeunits": lambda a, start=0, stop=None: _slice_str(a, start, stop),
    "binary_replace_slice": lambda a, start=0, stop=0, replacement="": F.overlay(
        _c(a), F.lit(replacement), start + 1, stop - start
    ),
    "utf8_replace_slice": lambda a, start=0, stop=0, replacement="": F.overlay(
        _c(a), F.lit(replacement), start + 1, stop - start
    ),
    "utf8_normalize": lambda a, form="NFC": _utf8_normalize(a, form),
    "strptime": lambda a, format="yyyy-MM-dd HH:mm:ss", **k: F.to_timestamp(_c(a), format),
    "strftime": lambda a, format="yyyy-MM-dd HH:mm:ss", **k: F.date_format(_c(a), format),
}.items():
    if _f is not None:
        _reg(_n, "string", "mapped", _f)


def _utf8_normalize(a, form="NFC"):
    """Unicode NFC/NFD/NFKC/NFKD (utf8_normalize, scalar_string_ascii.cc).

    No JVM builtin exists; Arrow-batched pandas UDF (pandas' .str.normalize
    wraps unicodedata) — the sanctioned slow path, vectorized per batch.
    """
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"invalid normalization form {form!r}")
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _norm(s):
        return s.str.normalize(form)

    return _norm(_c(a))


def _re_escape(s: str) -> str:
    import re

    return re.escape(s)


def _join_ew(*cs):
    sep = cs[-1]
    parts = [_c(x) for x in cs[:-1]]
    return F.concat_ws(sep if isinstance(sep, str) else "", *parts)


def _slice_str(a, start, stop):
    length = (stop - start) if stop is not None else (1 << 30)
    return F.substring(_c(a), start + 1, length)


# --------------------------------------------------------------------------
# Temporal (scalar_temporal_unary.cc / _binary.cc)
# --------------------------------------------------------------------------

_EPOCH = lambda a: _c(a).cast("timestamp").cast("double")  # noqa: E731

for _n, _f in {
    "year": lambda a: F.year(_c(a)),
    "month": lambda a: F.month(_c(a)),
    "day": lambda a: F.dayofmonth(_c(a)),
    "hour": lambda a: F.hour(_c(a)),
    "minute": lambda a: F.minute(_c(a)),
    "second": lambda a: F.second(_c(a)),
    "millisecond": lambda a: (F.floor(_EPOCH(a) * 1000) % 1000).cast("int"),
    "microsecond": lambda a: (F.floor(_EPOCH(a) * 1000000) % 1000).cast("int"),
    "nanosecond": lambda a: F.lit(0),
    "subsecond": lambda a: _EPOCH(a) % 1,
    "quarter": lambda a: F.quarter(_c(a)),
    "week": lambda a: F.weekofyear(_c(a)),
    "iso_week": lambda a: F.weekofyear(_c(a)),
    "us_week": lambda a: F.weekofyear(F.date_add(_c(a).cast("date"), 1)),
    "iso_year": lambda a: F.expr_yearofweek(a) if False else _yearofweek(a),
    "us_year": lambda a: F.year(F.date_add(_c(a).cast("date"), 1)),
    "iso_calendar": lambda a: F.struct(
        _yearofweek(a).alias("iso_year"),
        F.weekofyear(_c(a)).alias("iso_week"),
        _dow_iso(a).alias("iso_day_of_week"),
    ),
    "year_month_day": lambda a: F.struct(
        F.year(_c(a)).alias("year"), F.month(_c(a)).alias("month"), F.dayofmonth(_c(a)).alias("day")
    ),
    "day_of_week": lambda a, count_from_zero=True, week_start=1: _day_of_week(a, count_from_zero, week_start),
    "day_of_year": lambda a: F.dayofyear(_c(a)),
    "is_leap_year": lambda a: ((F.year(_c(a)) % 4 == 0) & ((F.year(_c(a)) % 100 != 0) | (F.year(_c(a)) % 400 == 0))),
    "is_dst": lambda a, timezone="UTC": _is_dst(a, timezone),
    "floor_temporal": lambda a, unit="day": F.date_trunc(unit, _c(a)),
    "ceil_temporal": lambda a, unit="day": _ceil_temporal(a, unit),
    "round_temporal": lambda a, unit="day": _round_temporal(a, unit),
    "assume_timezone": lambda a, timezone="UTC": F.to_utc_timestamp(_c(a), timezone),
    "local_timestamp": lambda a, timezone="UTC": F.from_utc_timestamp(_c(a), timezone),
    "years_between": lambda a, b: F.year(_c(b)) - F.year(_c(a)),
    "quarters_between": lambda a, b: (F.year(_c(b)) - F.year(_c(a))) * 4 + (F.quarter(_c(b)) - F.quarter(_c(a))),
    "months_between": lambda a, b: (F.year(_c(b)) - F.year(_c(a))) * 12 + (F.month(_c(b)) - F.month(_c(a))),
    "month_interval_between": lambda a, b: (F.year(_c(b)) - F.year(_c(a))) * 12 + (F.month(_c(b)) - F.month(_c(a))),
    "weeks_between": lambda a, b: F.floor(F.datediff(_c(b).cast("date"), _c(a).cast("date")) / 7),
    "days_between": lambda a, b: F.datediff(_c(b).cast("date"), _c(a).cast("date")),
    "hours_between": lambda a, b: F.floor((_EPOCH(b) - _EPOCH(a)) / 3600),
    "minutes_between": lambda a, b: F.floor((_EPOCH(b) - _EPOCH(a)) / 60),
    "seconds_between": lambda a, b: F.floor(_EPOCH(b) - _EPOCH(a)),
    "milliseconds_between": lambda a, b: F.floor((_EPOCH(b) - _EPOCH(a)) * 1000),
    "microseconds_between": lambda a, b: F.floor((_EPOCH(b) - _EPOCH(a)) * 1000000),
    "nanoseconds_between": lambda a, b: F.floor((_EPOCH(b) - _EPOCH(a)) * 1000000) * 1000,
    "day_time_interval_between": lambda a, b: (_c(b).cast("timestamp") - _c(a).cast("timestamp")),
    "month_day_nano_interval_between": lambda a, b: _mdn_between(a, b),
}.items():
    if _f is not None:
        _reg(_n, "temporal", "mapped", _f)


def _tz_offset_sec(ts, timezone):
    """UTC offset of `timezone` at instant `ts`, in seconds (JVM-side)."""
    return F.from_utc_timestamp(ts, timezone).cast("double") - ts.cast("double")


def _is_dst(a, timezone="UTC"):
    """DST flag (is_dst, scalar_temporal_unary.cc): a zone observes DST at
    instant t iff its UTC offset at t exceeds its standard offset. The
    standard offset is the smaller of the offsets at Jan 1 / Jul 1 of t's
    year (covers both hemispheres) — all from_utc_timestamp built-ins, no
    Python zone-rules lookup.
    """
    ts = _c(a).cast("timestamp")
    jan1 = F.trunc(ts.cast("date"), "year").cast("timestamp")
    jul1 = F.add_months(jan1.cast("date"), 6).cast("timestamp")
    off = _tz_offset_sec(ts, timezone)
    std = F.least(_tz_offset_sec(jan1, timezone), _tz_offset_sec(jul1, timezone))
    return off > std


def _mdn_between(a, b):
    """month_day_nano_interval_between: struct(months, days, nanoseconds)
    with Arrow's independent-field semantics (each unit measured on its own
    calendar component, no borrowing) — Spark lacks the MonthDayNano
    interval type, so the struct is the engine's representation.
    """
    ta, tb = _c(a).cast("timestamp"), _c(b).cast("timestamp")
    months = (F.year(tb) - F.year(ta)) * 12 + (F.month(tb) - F.month(ta))
    days = F.dayofmonth(tb) - F.dayofmonth(ta)
    day_sec = lambda t: t.cast("double") - F.date_trunc("day", t).cast("double")  # noqa: E731
    nanos = ((day_sec(tb) - day_sec(ta)) * 1e9).cast("long")
    return F.struct(
        months.alias("months"), days.alias("days"), nanos.alias("nanoseconds")
    )


def _yearofweek(a):
    return F.expr(f"extract(YEAROFWEEK FROM {_expr_str(a)})")


def _expr_str(a):
    # helper for expr-built extracts: accept column-name strings only
    if isinstance(a, str):
        return a
    raise TypeError("iso_year/extract helpers take a column name string")


def _day_of_week(a, count_from_zero=True, week_start=1):
    # Arrow default: Monday=0. Spark dayofweek: Sunday=1.
    iso = _dow_iso(a)  # Monday=1..Sunday=7
    base = iso - week_start
    wrapped = ((base % 7) + 7) % 7
    return wrapped if count_from_zero else wrapped + 1


def _dow_iso(a):
    return ((F.dayofweek(_c(a)) + 5) % 7) + 1


def _ceil_temporal(a, unit):
    tr = F.date_trunc(unit, _c(a))
    bump = {
        "year": F.add_months(tr, 12),
        "quarter": F.add_months(tr, 3),
        "month": F.add_months(tr, 1),
        "week": F.date_add(tr.cast("date"), 7).cast("timestamp"),
        "day": F.date_add(tr.cast("date"), 1).cast("timestamp"),
        "hour": tr + F.expr("INTERVAL 1 HOUR"),
        "minute": tr + F.expr("INTERVAL 1 MINUTE"),
        "second": tr + F.expr("INTERVAL 1 SECOND"),
    }[unit]
    return F.when(_c(a).cast("timestamp") == tr, tr).otherwise(bump)


def _round_temporal(a, unit):
    lo = F.date_trunc(unit, _c(a))
    hi = _ceil_temporal(a, unit)
    mid = (lo.cast("double") + hi.cast("double")) / 2
    return F.when(_EPOCH(a) < mid, lo).otherwise(hi)


# --------------------------------------------------------------------------
# Nested (scalar_nested.cc, vector_nested.cc)
# --------------------------------------------------------------------------

for _n, _f in {
    "list_value_length": lambda a: F.size(_c(a)),
    "list_element": lambda a, i=0: F.element_at(_c(a), i + 1),
    "list_slice": lambda a, start=0, stop=None: F.slice(
        _c(a), start + 1, (stop - start) if stop is not None else (1 << 30)
    ),
    "list_flatten": lambda a: F.flatten(_c(a)),
    "list_parent_indices": None,  # table-shaped: posexplode bookkeeping
    "struct_field": lambda a, name="": _c(a).getField(name),
    "make_struct": lambda *cs, field_names=(): F.struct(
        *[
            _c(x).alias(field_names[i]) if i < len(field_names) else _c(x)
            for i, x in enumerate(cs)
        ]
    ),
    "map_lookup": lambda a, query_key=None: F.element_at(_c(a), query_key),
}.items():
    if _f is not None:
        _reg(_n, "nested", "mapped", _f)
_reg(
    "list_parent_indices", "nested", "table", None,
    "df.select(posexplode(col)) carries the parent index as `pos`'s row origin",
)

# --------------------------------------------------------------------------
# Vector functions: selection/reshaping/sort/rank/cumulative
# (vector_*.cc). Table-level ops document their DataFrame recipe; ordered
# ops are window builders (explicit order required — SURVEY §7 hard parts).
# --------------------------------------------------------------------------

_TABLE_OPS = {
    "filter": "df.filter(mask) — filter_node.cc:120",
    "take": "join against an index frame / df.filter(col.isin(indices))",
    "array_filter": "F.filter(array_col, lambda)",
    "array_take": "F.transform(indices, i -> element_at(arr, i+1))",
    "drop_null": "df.na.drop()",
    "indices_nonzero": "df.select(posexplode).filter(value != 0).select(pos)",
    "unique": "df.distinct() — vector_hash.cc:791",
    "value_counts": "df.groupBy(col).count() — vector_hash.cc:807",
    "sort_indices": "df.orderBy(...) (indices are implicit row order)",
    "array_sort_indices": "F.array_sort / sorted row_number window",
    "partition_nth_indices": "df.orderBy().limit(n) — partial sort",
    "select_k_unstable": "df.orderBy(...).limit(k) → TakeOrderedAndProject",
    "inverse_permutation": "join on index column",
    "scatter": "join on target index column",
    "replace_with_mask": "F.when(mask, replacement).otherwise(col)",
}
for _n, _note in _TABLE_OPS.items():
    _reg(_n, "vector", "table", None, _note)

ARROW_FUNCTIONS.pop("array_filter")
_reg("array_filter", "vector", "mapped", lambda a, fn=None: F.filter(_c(a), fn), "F.filter higher-order")
ARROW_FUNCTIONS.pop("array_take")
_reg(
    "array_take", "vector", "mapped",
    lambda a, idx=None: F.transform(_c(idx), lambda i: F.element_at(_c(a), i.cast("int") + 1)),
    "gather by index array",
)
_reg("dictionary_encode", "vector", "physical", lambda a: _c(a), "physical encoding — logical no-op")
_reg("run_end_encode", "vector", "physical", lambda a: _c(a), "physical encoding — logical no-op; relational form: operators/encodings.run_length_encode (oracle-checked)")
_reg("run_end_decode", "vector", "physical", lambda a: _c(a), "physical encoding — logical no-op; relational form: operators/encodings.run_length_decode (round-trip tested)")

# Window-backed ordered ops: impl(col) -> builder(window_spec) -> Column
def _win(fn):
    def impl(a):
        def over(w):
            return fn(_c(a), w)

        return over

    return impl


_reg("cumulative_sum", "vector", "window", _win(lambda c, w: F.sum(c).over(w)))
_reg("cumulative_prod", "vector", "window", _win(lambda c, w: F.product(c).over(w)))
_reg("cumulative_min", "vector", "window", _win(lambda c, w: F.min(c).over(w)))
_reg("cumulative_max", "vector", "window", _win(lambda c, w: F.max(c).over(w)))
_reg("cumulative_mean", "vector", "window", _win(lambda c, w: F.avg(c).over(w)))
_reg("fill_null_forward", "vector", "window", _win(lambda c, w: F.last(c, ignorenulls=True).over(w)))
_reg("fill_null_backward", "vector", "window", _win(lambda c, w: F.first(c, ignorenulls=True).over(w)))
_reg("pairwise_diff", "vector", "window", _win(lambda c, w: c - F.lag(c).over(w)))
_reg("rank", "vector", "window", _win(lambda c, w: F.rank().over(w)))
_reg("rank_quantile", "vector", "window", _win(lambda c, w: (F.rank().over(w) - 0.5 + F.cume_dist().over(w) * 0) / F.count(F.lit(1)).over(w.rowsBetween(-(1 << 31) + 1, (1 << 31) - 1))), "(rank-0.5)/n quantile rank")
_reg(
    "rank_normal", "vector", "window",
    _win(lambda c, w: _probit((F.rank().over(w) - 0.5) / F.count(F.lit(1)).over(w.rowsBetween(-(1 << 31) + 1, (1 << 31) - 1)))),
    "Gaussian quantile transform via Acklam-approx probit expression",
)


def _probit(p):
    """Inverse normal CDF as a Catalyst expression (Peter Acklam's
    rational approximation, |ε|<1.15e-9 — public-domain constants)."""
    a = [-39.69683028665376, 220.9460984245205, -275.9285104469687,
         138.3577518672690, -30.66479806614716, 2.506628277459239]
    b = [-54.47609879822406, 161.5858368580409, -155.6989798598866,
         66.80131188771972, -13.28068155288572]
    c = [-0.007784894002430293, -0.3223964580411365, -2.400758277161838,
         -2.549732539343734, 4.374664141464968, 2.938163982698783]
    d = [0.007784695709041462, 0.3224671290700398, 2.445134137142996,
         3.754408661907416]
    plow, phigh = 0.02425, 1 - 0.02425

    def poly(cs, x):
        expr = F.lit(float(cs[0]))
        for coef in cs[1:]:
            expr = expr * x + F.lit(float(coef))
        return expr

    q_mid = p - 0.5
    r_mid = q_mid * q_mid
    mid = (poly(a, r_mid) * q_mid) / (poly(b, r_mid) * r_mid + 1.0)
    q_low = F.sqrt(-2.0 * F.log(p))
    low = poly(c, q_low) / (poly(d, q_low) * q_low + 1.0)
    q_hi = F.sqrt(-2.0 * F.log(1.0 - p))
    high = -poly(c, q_hi) / (poly(d, q_hi) * q_hi + 1.0)
    return F.when(p < plow, low).when(p > phigh, high).otherwise(mid)


_reg(
    "winsorize", "vector", "table", None,
    "clip at group quantiles: join percentile bounds then least/greatest",
)

# --------------------------------------------------------------------------
# Casts
# --------------------------------------------------------------------------

_reg(
    "cast", "cast", "mapped",
    lambda a, target_type="string", safe=False: F.expr(f"try_cast({a} AS {target_type})")
    if safe and isinstance(a, str)
    else _c(a).cast(target_type),
    "CastOptions allow_* flags ⇒ try_cast (safe) vs ANSI cast (checked)",
)
_reg("null", "cast", "mapped", lambda: F.lit(None), "null literal constructor")
