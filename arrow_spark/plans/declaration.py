"""Acero-style Declaration graphs compiled to DataFrame plans.

Parity surface for the reference's programmatic plan construction
(`struct Declaration` in cpp/src/arrow/acero/exec_plan.h; factory-name
registry exec_plan.cc:1105-1121; python pyarrow.acero.Declaration).
A Declaration is {factory_name, options, inputs}; compile_plan walks the
graph bottom-up and emits the equivalent DataFrame — Catalyst then owns
optimization, which is the whole architectural point: Arrow executes the
declared shape literally, we hand it to an optimizer.

Supported factories (≡ SURVEY §2.1): table_source / named_table / scan,
filter, project, aggregate (scalar + group-by), hashjoin, asofjoin,
union, order_by, fetch, select_k, pivot_longer, pivot_wider,
sorted_merge, tee, write.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class Declaration:
    factory_name: str
    options: dict = field(default_factory=dict)
    inputs: Sequence["Declaration"] = ()

    def to_dataframe(self, spark: SparkSession) -> DataFrame:
        return compile_plan(self, spark)


def compile_plan(decl: Declaration, spark: SparkSession) -> DataFrame:
    ins = [compile_plan(d, spark) for d in decl.inputs]
    fn = _FACTORIES.get(decl.factory_name)
    if fn is None:
        raise KeyError(
            f"unknown factory {decl.factory_name!r}; known: {sorted(_FACTORIES)}"
        )
    return fn(spark, decl.options, ins)


def _table_source(spark, opts, ins):
    if "dataframe" in opts:
        return opts["dataframe"]
    if "pandas" in opts:
        return spark.createDataFrame(opts["pandas"])
    raise ValueError("table_source needs 'dataframe' or 'pandas'")


def _named_table(spark, opts, ins):
    return spark.table(opts["name"])


def _scan(spark, opts, ins):
    from arrow_spark.sources.dataset import read_dataset

    df = read_dataset(
        spark,
        opts["path"],
        fmt=opts.get("format", "parquet"),
        schema=opts.get("schema"),
    )
    # ScanNodeOptions filter/projection pushdown: express them in the plan
    # and Catalyst pushes them into the scan (verified in test_plans).
    if opts.get("filter") is not None:
        df = df.filter(opts["filter"])
    if opts.get("columns"):
        df = df.select(*opts["columns"])
    return df


def _filter(spark, opts, ins):
    return ins[0].filter(opts["filter_expression"])


def _project(spark, opts, ins):
    exprs = opts["expressions"]
    names = opts.get("names")
    cols = [
        e.alias(names[i]) if names else e for i, e in enumerate(exprs)
    ]
    return ins[0].select(*cols)


def _aggregate(spark, opts, ins):
    """AggregateNodeOptions: aggregates=[(target, arrow_fn, out_name)],
    keys=[...] (empty → scalar mode), segment_keys=[...] (options.h:
    304-313 — input treated as segmented on these; grouping is
    (segment_keys ++ keys) with the segment partitioning installed, no
    further Exchange for the aggregate itself)."""
    from arrow_spark.functions.registry import call

    aggs = []
    for item in opts["aggregates"]:
        target, fn_name, out_name = item[0], item[1], item[2]
        opts_i = item[3] if len(item) > 3 else {}
        base = fn_name[5:] if fn_name.startswith("hash_") else fn_name
        col = call(base, **opts_i) if target in (None, "") else call(base, target, **opts_i)
        aggs.append(col.alias(out_name))
    keys = list(opts.get("keys", ()))
    segment_keys = list(opts.get("segment_keys", ()))
    if segment_keys:
        from arrow_spark.operators.segmented import segmented_aggregate

        return segmented_aggregate(
            ins[0], segment_keys, keys, aggs,
            assume_segmented=bool(opts.get("assume_segmented", False)),
        )
    gb = ins[0].groupBy(*keys) if keys else ins[0].groupBy()
    return gb.agg(*aggs)


_JOIN_TYPES = {
    "inner": "inner",
    "left outer": "left",
    "right outer": "right",
    "full outer": "full",
    "left semi": "left_semi",
    "left anti": "left_anti",
}


def _hashjoin(spark, opts, ins):
    left, right = ins
    jt = opts.get("join_type", "inner")
    lk = opts["left_keys"] if isinstance(opts["left_keys"], list) else [opts["left_keys"]]
    rk = opts.get("right_keys", lk)
    rk = rk if isinstance(rk, list) else [rk]
    null_safe = opts.get("key_cmp", ["EQ"] * len(lk))
    swap = jt in ("right semi", "right anti")
    if swap:
        left, right, lk, rk = right, left, rk, lk
        jt = jt.replace("right", "left")
    cond = None
    for a, b, cmpmode in zip(lk, rk, null_safe):
        c = left[a].eqNullSafe(right[b]) if cmpmode == "IS" else left[a] == right[b]
        cond = c if cond is None else cond & c
    if opts.get("filter") is not None:  # residual theta filter
        cond = cond & opts["filter"]
    return left.join(right, cond, _JOIN_TYPES[jt])


def _asofjoin(spark, opts, ins):
    from arrow_spark.operators.asof import asof_join_arrow

    left = ins[0]
    out = left
    for i, right in enumerate(ins[1:]):
        out = asof_join_arrow(
            out,
            right,
            on=opts["on"],
            by=opts.get("by", ()),
            tolerance=opts.get("tolerance"),
            # prune the original left only once: later folds' left side
            # already carries the earlier rights' value columns
            left_cols=opts.get("left_cols") if i == 0 else None,
            right_cols=opts.get("right_cols"),
        )
    return out


def _union(spark, opts, ins):
    out = ins[0]
    for df in ins[1:]:
        out = out.unionByName(df)
    return out


def _order_by(spark, opts, ins):
    cols = []
    for key, order in opts["sort_keys"]:
        c = F.col(key)
        asc = order.startswith("asc")
        nulls_first = opts.get("null_placement", "at_end") == "at_start"
        if asc:
            c = c.asc_nulls_first() if nulls_first else c.asc_nulls_last()
        else:
            c = c.desc_nulls_first() if nulls_first else c.desc_nulls_last()
        cols.append(c)
    return ins[0].orderBy(*cols)


def _fetch(spark, opts, ins):
    out = ins[0].offset(opts.get("offset", 0))
    if opts.get("count") is not None:
        out = out.limit(opts["count"])
    return out


def _select_k(spark, opts, ins):
    return _order_by(spark, opts, ins).limit(opts["k"])


def _pivot_longer(spark, opts, ins):
    return ins[0].unpivot(
        opts["ids"],
        opts["values"],
        opts.get("variable_name", "variable"),
        opts.get("value_name", "value"),
    )


def _pivot_wider(spark, opts, ins):
    """pivot_wider factory (aggregate_pivot.cc PivotWiderOptions:
    key_name column's values spread into one output column per entry of
    ``key_names``, aggregated by ``agg`` over ``values``). The fixed key
    list mirrors Arrow's required PivotWiderOptions.key_names — no
    key-discovery scan, so the plan stays one hash aggregate."""
    from arrow_spark.functions.registry import call

    keys = opts["keys"] if isinstance(opts["keys"], list) else [opts["keys"]]
    agg_col = call(opts.get("agg", "sum"), opts["values"])
    return (
        ins[0]
        .groupBy(*keys)
        .pivot(opts["key_name"], opts["key_names"])
        .agg(agg_col)
    )


def _sorted_merge(spark, opts, ins):
    """sorted_merge factory (exec_plan.cc:1105-1121 registry;
    sorted_merge_node.cc): N pre-sorted inputs → one totally-ordered
    stream. Options mirror OrderByNodeOptions' sort_keys subset: a
    single (key, order) pair."""
    from arrow_spark.operators.asof import sorted_merge

    key, order = opts["sort_keys"][0] if "sort_keys" in opts else (opts["on"], "ascending")
    return sorted_merge(ins, on=key, ascending=order.startswith("asc"))


def _tee(spark, opts, ins):
    """tee factory (exec_plan.cc:1105-1121): write the stream to a
    dataset AND pass it through to the downstream node — Acero's
    TeeNodeOptions is exactly a non-consuming write."""
    from arrow_spark.sources.dataset import write_dataset

    write_dataset(
        ins[0],
        opts["base_dir"],
        fmt=opts.get("format", "parquet"),
        partition_by=opts.get("partitioning", ()),
        max_rows_per_file=opts.get("max_rows_per_file"),
    )
    return ins[0]


def _write(spark, opts, ins):
    from arrow_spark.sources.dataset import write_dataset

    write_dataset(
        ins[0],
        opts["base_dir"],
        fmt=opts.get("format", "parquet"),
        partition_by=opts.get("partitioning", ()),
        max_rows_per_file=opts.get("max_rows_per_file"),
    )
    return ins[0]


_FACTORIES = {
    "table_source": _table_source,
    "record_batch_source": _table_source,
    "named_table": _named_table,
    "scan": _scan,
    "filter": _filter,
    "project": _project,
    "aggregate": _aggregate,
    "hashjoin": _hashjoin,
    "asofjoin": _asofjoin,
    "union": _union,
    "order_by": _order_by,
    "fetch": _fetch,
    "select_k_sink": _select_k,
    "pivot_longer": _pivot_longer,
    "pivot_wider": _pivot_wider,
    "sorted_merge": _sorted_merge,
    "tee": _tee,
    "write": _write,
}
