"""L4 facade: pyarrow-style Table/Dataset API backed by DataFrames.

Mirrors the entry points a pyarrow user calls (python/pyarrow/table.pxi
Table methods, acero.py _perform_join/_group_by) so reference users can
switch with minimal edits. Lazy-but-correct: every method builds a
DataFrame plan; materialization happens only at to_pandas()/
to_pydict()/num_rows, mirroring Acero's DeclarationToTable boundary
(cpp/src/arrow/acero/exec_plan.cc:647).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from arrow_spark.functions.registry import call as _call


class Table:
    """pyarrow.Table-shaped wrapper over a Spark DataFrame."""

    def __init__(self, df: DataFrame):
        self._df = df

    # -- construction ------------------------------------------------------
    @classmethod
    def from_spark(cls, df: DataFrame) -> "Table":
        return cls(df)

    @classmethod
    def from_pandas(cls, spark, pdf) -> "Table":
        return cls(spark.createDataFrame(pdf))

    @classmethod
    def from_pydict(cls, spark, mapping: dict) -> "Table":
        import pandas as pd

        return cls(spark.createDataFrame(pd.DataFrame(mapping)))

    # -- introspection -----------------------------------------------------
    @property
    def df(self) -> DataFrame:
        return self._df

    @property
    def schema(self):
        return self._df.schema

    @property
    def column_names(self) -> list[str]:
        return list(self._df.columns)

    @property
    def num_columns(self) -> int:
        return len(self._df.columns)

    @property
    def num_rows(self) -> int:
        return self._df.count()

    # -- relational ops (Table.join → acero._perform_join parity) ----------
    def select(self, columns: Sequence[str]) -> "Table":
        return Table(self._df.select(*columns))

    def column(self, name: str):
        return F.col(name)

    def append_column(self, name: str, col) -> "Table":
        return Table(self._df.withColumn(name, col))

    def set_column(self, name: str, col) -> "Table":
        return Table(self._df.withColumn(name, col))

    def drop_columns(self, columns: Sequence[str]) -> "Table":
        return Table(self._df.drop(*columns))

    def rename_columns(self, names: Sequence[str]) -> "Table":
        old = self._df.columns
        if len(names) != len(old):
            raise ValueError("rename_columns needs one name per column")
        return Table(self._df.select(*[F.col(o).alias(n) for o, n in zip(old, names)]))

    def filter(self, expression) -> "Table":
        return Table(self._df.filter(expression))

    def slice(self, offset: int = 0, length: int | None = None) -> "Table":
        out = self._df.offset(offset)
        return Table(out.limit(length) if length is not None else out)

    def take(self, indices: Sequence[int]):
        # explicit row-id gather; Arrow takes by implicit position —
        # positional semantics need a deterministic order column
        raise NotImplementedError(
            "Table.take needs an explicit order column in a distributed table; "
            "use filter on a key column instead"
        )

    def sort_by(self, sorting) -> "Table":
        if isinstance(sorting, str):
            sorting = [(sorting, "ascending")]
        cols = [
            F.col(name).asc() if order.startswith("asc") else F.col(name).desc()
            for name, order in sorting
        ]
        return Table(self._df.orderBy(*cols))

    def drop_null(self) -> "Table":
        return Table(self._df.na.drop())

    def unique(self) -> "Table":
        return Table(self._df.distinct())

    def join(
        self,
        right: "Table",
        keys: str | Sequence[str],
        right_keys: str | Sequence[str] | None = None,
        join_type: str = "left outer",
        coalesce_keys: bool = True,
    ) -> "Table":
        """Arrow join-type names (acero.py:82-140) → Spark joins."""
        jt = {
            "inner": "inner",
            "left outer": "left",
            "right outer": "right",
            "full outer": "full",
            "left semi": "left_semi",
            "right semi": "right_semi_swap",
            "left anti": "left_anti",
            "right anti": "right_anti_swap",
        }[join_type]
        lk = [keys] if isinstance(keys, str) else list(keys)
        rk = lk if right_keys is None else (
            [right_keys] if isinstance(right_keys, str) else list(right_keys)
        )
        ldf, rdf = self._df, right._df
        if jt.endswith("_swap"):
            base = jt[: -len("_swap")].replace("right", "left")
            cond = _join_cond(rdf, ldf, rk, lk)
            return Table(rdf.join(ldf, cond, base))
        if rk == lk:
            return Table(ldf.join(rdf, lk, jt))
        cond = _join_cond(ldf, rdf, lk, rk)
        out = ldf.join(rdf, cond, jt)
        if coalesce_keys:
            # pyarrow parity (acero.py _perform_join coalesce_keys=True):
            # inner/left fold right keys into the left names; full outer
            # coalesces sides under the left name; right outer keeps the
            # RIGHT key column (populated for unmatched right rows) and the
            # left key vanishes — output order left non-keys, then right
            if jt == "full":
                for a, b in zip(lk, rk):
                    out = out.withColumn(a, F.coalesce(ldf[a], rdf[b]))
                for b in rk:
                    out = out.drop(rdf[b])
            elif jt == "right":
                for a in lk:
                    out = out.drop(ldf[a])
            else:
                for b in rk:
                    out = out.drop(rdf[b])
        return Table(out)

    def join_asof(
        self,
        right: "Table",
        on: str,
        by: str | Sequence[str],
        tolerance,
        right_on: str | None = None,
        right_by: str | Sequence[str] | None = None,
    ) -> "Table":
        """pyarrow Table.join_asof parity (table.pxi; AsofJoinNodeOptions
        options.h:711-724): signed tolerance — matches right.on within
        [on+tolerance, on] for negative tolerance (backward), [on,
        on+tolerance] for positive (forward)."""
        from pyspark.sql import functions as F

        from arrow_spark.operators.asof import asof_join_arrow

        lb = [by] if isinstance(by, str) else list(by)
        rdf = right._df
        if right_on is not None and right_on != on:
            rdf = rdf.withColumnRenamed(right_on, on)
        if right_by is not None:
            rb = [right_by] if isinstance(right_by, str) else list(right_by)
            for a, b in zip(rb, lb):
                if a != b:
                    rdf = rdf.withColumnRenamed(a, b)
        return Table(asof_join_arrow(self._df, rdf, on, by=lb, tolerance=tolerance))

    def group_by(self, keys: str | Sequence[str]) -> "TableGroupBy":
        return TableGroupBy(self._df, [keys] if isinstance(keys, str) else list(keys))

    # -- eager kernel call parity (pc.<fn>(table[col])) ---------------------
    def call_function(self, name: str, *args, **kwargs):
        return _call(name, *args, **kwargs)

    # -- materialization ----------------------------------------------------
    def to_pandas(self):
        return self._df.toPandas()

    def to_pydict(self) -> dict:
        pdf = self._df.toPandas()
        return {c: pdf[c].tolist() for c in pdf.columns}

    def to_spark(self) -> DataFrame:
        return self._df


def _function_options_dict(opts) -> dict:
    """pyarrow FunctionOptions → kwargs dict.

    pyarrow 16.x exposes no attribute access on FunctionOptions; the
    canonical repr ('ScalarAggregateOptions(skip_nulls=false,
    min_count=1)') is the stable introspection surface, so parse it."""
    import re

    out = {}
    rep = repr(opts)
    # strip quoted substrings up front: an '=' INSIDE a string value
    # (e.g. a delimiter option of 'a=b') must neither parse as a scalar
    # field nor mint phantom names in the unparsed-field guard below.
    # The patterns honor backslash escapes (repr of "a'b" is 'a\'b') so
    # an escaped quote can't leave a dangling fragment behind.
    stripped = re.sub(r"'(?:\\.|[^'\\])*'|\"(?:\\.|[^\"\\])*\"", "''", rep)
    for key, val in re.findall(r"(\w+)=([\w.+-]+)", stripped):
        if val in ("true", "false"):
            out[key] = val == "true"
        else:
            try:
                out[key] = int(val)
            except ValueError:
                try:
                    out[key] = float(val)
                except ValueError:
                    out[key] = val
    # the bare-word regex can't see list- or quoted-string-valued fields
    # (e.g. QuantileOptions(q=[0.5, 0.9])); dropping them silently would
    # yield defaults with no error — reject instead of guessing
    unparsed = [k for k in re.findall(r"(\w+)=", stripped) if k not in out]
    if unparsed:
        raise NotImplementedError(
            f"unsupported FunctionOptions fields {unparsed} in {rep}; "
            "only scalar-valued fields (ScalarAggregateOptions-style) "
            "are parsed here"
        )
    return out


def _join_cond(ldf, rdf, lk, rk):
    cond = None
    for a, b in zip(lk, rk):
        c = ldf[a] == rdf[b]
        cond = c if cond is None else (cond & c)
    return cond


class TableGroupBy:
    """TableGroupBy.aggregate parity (pyarrow table.pxi TableGroupBy,
    acero.py:412-418): [(col, fn)] pairs with Arrow function names."""

    def __init__(self, df: DataFrame, keys: list[str]):
        self._df = df
        self._keys = keys

    def aggregate(self, aggregations: Sequence[tuple]) -> Table:
        """[(col, fn)] or [(col, fn, opts)] with Arrow function names.

        ``opts`` may be a dict or a pyarrow FunctionOptions; the two
        hash-aggregate options Acero applies OUTSIDE the kernel
        (api_aggregate.h ScalarAggregateOptions) are honored here the
        same way: ``skip_nulls=False`` emits null when the group saw any
        null input, ``min_count=n`` emits null when fewer than n
        non-null values were observed. Both compose as one extra
        aggregate condition in the same groupBy — no second pass."""
        aggs = []
        for item in aggregations:
            col, fn = item[0], item[1]
            opts = item[2] if len(item) > 2 else {}
            if opts and not isinstance(opts, dict):
                opts = _function_options_dict(opts)
            opts = dict(opts)
            skip_nulls = opts.pop("skip_nulls", True)
            min_count = opts.pop("min_count", 0)
            base = fn[5:] if fn.startswith("hash_") else fn
            out_name = f"{col}_{fn}" if col else fn
            agg_col = (
                _call(base, **opts) if col in (None, "") else _call(base, col, **opts)
            )
            if col not in (None, ""):
                c = F.col(col)
                if not skip_nulls and base != "count":
                    agg_col = F.when(
                        F.max(c.isNull().cast("int")) == 0, agg_col
                    )
                if min_count:
                    agg_col = F.when(F.count(c) >= min_count, agg_col)
            aggs.append(agg_col.alias(out_name))
        return Table(self._df.groupBy(*self._keys).agg(*aggs))
