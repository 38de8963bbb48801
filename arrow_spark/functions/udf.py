"""User-defined function surface, mirroring pyarrow's four registration
entry points (python/pyarrow/_compute.pyx: register_scalar_function
:3109, register_vector_function :3190, register_aggregate_function
:3267, register_tabular_function :3356; C++ python/pyarrow/src/arrow/
python/udf.h:56-71).

Arrow UDFs receive pyarrow Arrays and return Arrays — i.e. vectorized
Arrow-native UDFs. The Spark-first equivalents keep exactly that calling
convention:

  scalar    → pandas_udf (Arrow-batched columns in/out)
  vector    → mapInArrow over a whole partition (pyarrow RecordBatches)
  aggregate → pandas_udf GROUPED_AGG (usable in groupBy, Arrow's
              hash-aggregate mode for registered UDAFs)
  tabular   → zero-arg table-returning function (UDTF-lite): a callable
              producing a DataFrame from pyarrow batches

Registered functions land in the same name registry as the built-in
kernels, so `call(name, ...)` dispatches to them — matching Arrow's
single FunctionRegistry design (compute/registry.cc).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arrow_spark.functions.registry import ARROW_FUNCTIONS, FunctionSpec

_UDF_DOCS: dict[str, dict] = {}


def _register(name: str, family: str, status: str, impl, doc: dict) -> None:
    if name in ARROW_FUNCTIONS:
        raise ValueError(f"function name {name!r} already registered")
    ARROW_FUNCTIONS[name] = FunctionSpec(name, family, status, impl, doc.get("summary", ""))
    _UDF_DOCS[name] = doc


def register_scalar_function(
    func: Callable, function_name: str, function_doc: dict, in_types: dict, out_type
) -> None:
    """Vectorized scalar UDF: ``func(ctx, *pandas.Series) -> pandas.Series``.

    ``ctx`` mirrors Arrow's UdfContext (batch_length, memory_pool slot);
    execution is Arrow-batched via pandas_udf — JVM↔Python transfer is
    columnar, never per-row.
    """
    class _Ctx:
        def __init__(self, n: int):
            self.batch_length = n

    def wrapped(*cols):
        n = len(cols[0]) if len(cols) else 0
        return func(_Ctx(n), *cols)

    # pandas_udf infers its eval type from the signature; build a
    # fixed-arity wrapper matching the declared in_types
    _udf = F.pandas_udf(_fixed_arity(wrapped, len(in_types), "series"), out_type)

    def impl(*args):
        return _udf(*[a if not isinstance(a, str) else F.col(a) for a in args])

    _register(function_name, "udf", "mapped", impl, function_doc)


def _fixed_arity(fn: Callable, n: int, ret: str) -> Callable:
    """Wrap a varargs fn into an n-ary one with pandas type hints
    (Series→Series for scalar, Series→scalar for grouped agg)."""
    import pandas as pd

    args = ", ".join(f"a{i}: pd.Series" for i in range(n)) or "a0: pd.Series"
    retann = "pd.Series" if ret == "series" else "float"
    call_args = ", ".join(f"a{i}" for i in range(max(n, 1)))
    ns: dict = {"pd": pd, "_fn": fn}
    exec(  # noqa: S102 — controlled codegen for signature shaping
        f"def _shaped({args}) -> {retann}:\n    return _fn({call_args})\n", ns
    )
    return ns["_shaped"]


def register_vector_function(
    func: Callable, function_name: str, function_doc: dict, in_types: dict, out_type
) -> None:
    """Vector UDF: sees whole chunks (partition batches), may change
    length — ``func(ctx, batch: pyarrow.RecordBatch) -> RecordBatch``.

    Applied with :func:`apply_vector_function` (table-shaped, like
    Arrow's vector kernels run through CallFunction on a ChunkedArray).
    """

    def runner(df: DataFrame, schema) -> DataFrame:
        import pyarrow as pa

        class _Ctx:
            batch_length = None

        def gen(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
            for b in batches:
                out = func(_Ctx(), b)
                # accept RecordBatch, Table, or a batch list — Arrow vector
                # kernels return any of these shapes
                if isinstance(out, pa.Table):
                    yield from out.combine_chunks().to_batches()
                elif isinstance(out, (list, tuple)):
                    yield from out
                elif out is not None:
                    yield out

        return df.mapInArrow(gen, schema=schema)

    _register(function_name, "udf", "table", runner, function_doc)


def apply_vector_function(name: str, df: DataFrame, schema) -> DataFrame:
    spec = ARROW_FUNCTIONS[name]
    if spec.family != "udf" or spec.status != "table":
        raise TypeError(f"{name!r} is not a registered vector function")
    return spec.impl(df, schema)


def register_aggregate_function(
    func: Callable, function_name: str, function_doc: dict, in_types: dict, out_type
) -> None:
    """Aggregate UDF: ``func(ctx, *pandas.Series) -> scalar``. Usable
    scalar-mode (df.agg) and group-by mode (groupBy().agg) — the same
    dual role as Arrow's registered aggregates (hash_aggregate path)."""
    class _Ctx:
        batch_length = None

    def wrapped(*cols):
        return func(_Ctx(), *cols)

    _udaf = F.pandas_udf(_fixed_arity(wrapped, len(in_types), "scalar"), out_type)

    def impl(*args):
        return _udaf(*[a if not isinstance(a, str) else F.col(a) for a in args])

    _register(function_name, "udf", "aggregate", impl, function_doc)


def register_tabular_function(
    func: Callable, function_name: str, function_doc: dict
) -> None:
    """Zero-arg table-returning function (UDTF-lite): ``func()`` yields a
    pyarrow RecordBatchReader/Table; materialized as a DataFrame."""

    def runner(spark: SparkSession) -> DataFrame:
        import pyarrow as pa

        out = func()
        if isinstance(out, pa.RecordBatchReader):
            out = out.read_all()
        return spark.createDataFrame(out.to_pandas())

    _register(function_name, "udf", "tabular", runner, function_doc)


def call_tabular_function(name: str, spark: SparkSession) -> DataFrame:
    spec = ARROW_FUNCTIONS[name]
    if spec.status != "tabular":
        raise TypeError(f"{name!r} is not a registered tabular function")
    return spec.impl(spark)
