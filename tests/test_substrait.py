"""Substrait consumer cross-validated against Acero.

Every plan here is hand-encoded with arrow_spark.plans.substrait_builder
and executed BOTH by pyarrow.substrait.run_query (the reference's real
consumer — serde.h:106) and by arrow_spark.plans.substrait.run_substrait
(the Spark consumer). Matching results prove both the wire encoding and
the Spark-side semantics.
"""

from __future__ import annotations

import math

import pyarrow as pa
import pytest

from arrow_spark.plans import substrait_builder as B
from arrow_spark.plans.substrait import run_substrait

ps = pytest.importorskip("pyarrow.substrait")


T1 = pa.table({"k": ["x", "y", "x", "y", "x"], "v": [1, 2, 3, 4, 5]})
T2 = pa.table({"k": ["x", "y", "z"], "w": [100, 200, 300]})
TABLES = {"t": T1, "u": T2}

READ_T = B.read_named(["t"], ["k", "v"], ["string", "i64"])
READ_U = B.read_named(["u"], ["k", "w"], ["string", "i64"])


def _norm(rows):
    def n(v):
        if isinstance(v, float):
            return None if math.isnan(v) else round(v, 9)
        return v

    return sorted(tuple(n(v) for v in r) for r in rows)


def _run_both(spark, plan_bytes, tables=TABLES):
    def acero_provider(names, schema=None):
        return tables[names[0]]

    def spark_provider(names):
        return spark.createDataFrame(tables[names[0]].to_pandas())

    want_tbl = ps.run_query(plan_bytes, table_provider=acero_provider).read_all()
    got_df = run_substrait(spark, plan_bytes, spark_provider)
    assert [c.lower() for c in got_df.columns] == [n.lower() for n in want_tbl.column_names]
    want = _norm([tuple(r.values()) for r in want_tbl.to_pylist()])
    got = _norm([tuple(r) for r in got_df.collect()])
    assert got == want, f"spark={got} acero={want}"
    return got


def test_filter_project_emit(spark):
    gt = B.scalar_fn(1, [B.field_ref(1), B.lit_i64(1)], output=B.typ("bool"))
    add = B.scalar_fn(2, [B.field_ref(1), B.lit_i64(10)], output=B.typ("i64"))
    root = B.project_rel(B.filter_rel(READ_T, gt), [add], emit=[0, 2])
    p = B.plan(root, ["k", "v10"], functions={1: (B.URI_CMP, "gt"), 2: (B.URI_ARITH, "add")})
    rows = _run_both(spark, p)
    assert rows == [("x", 13), ("x", 15), ("y", 12), ("y", 14)]


def test_grouped_aggregate(spark):
    measures = [
        B.agg_fn(1, [B.field_ref(1)], B.typ("i64")),
        B.agg_fn(2, [B.field_ref(1)], B.typ("i64")),
        B.agg_fn(3, [B.field_ref(1)], B.typ("i64")),
        B.agg_fn(4, [B.field_ref(1)], B.typ("i64")),
        B.agg_fn(5, [B.field_ref(1)], B.typ("fp64")),
    ]
    agg = B.aggregate_rel(READ_T, [B.field_ref(0)], measures)
    p = B.plan(
        agg,
        ["k", "s", "c", "mn", "mx", "av"],
        functions={
            1: (B.URI_ARITH, "sum"),
            2: (B.URI_AGG, "count"),
            3: (B.URI_ARITH, "min"),
            4: (B.URI_ARITH, "max"),
            5: (B.URI_ARITH, "avg"),
        },
    )
    rows = _run_both(spark, p)
    assert rows == [("x", 9, 3, 1, 5, 3.0), ("y", 6, 2, 2, 4, 3.0)]


def test_global_aggregate(spark):
    agg = B.aggregate_rel(READ_T, [], [B.agg_fn(1, [B.field_ref(1)], B.typ("i64"))])
    p = B.plan(agg, ["total"], functions={1: (B.URI_ARITH, "sum")})
    assert _run_both(spark, p) == [(15,)]


@pytest.mark.parametrize("jt", [1, 3])  # INNER, LEFT (substrait JoinRel.JoinType)
def test_join_types(spark, jt):
    eq = B.scalar_fn(1, [B.field_ref(0), B.field_ref(2)], output=B.typ("bool"))
    j = B.join_rel(READ_T, READ_U, eq, join_type=jt)
    p = B.plan(j, ["k", "v", "k2", "w"], functions={1: (B.URI_CMP, "equal")})
    rows = _run_both(spark, p)
    assert len(rows) == 5


def test_semi_anti_join_spec_output(spark):
    # substrait spec: SEMI(5)/ANTI(6) emit the left fields only. Acero's
    # consumer deviates (left++right schema), so these assert Spark-side
    # spec semantics rather than cross-validating.
    def spark_provider(names):
        return spark.createDataFrame(TABLES[names[0]].to_pandas())

    eq = B.scalar_fn(1, [B.field_ref(0), B.field_ref(2)], output=B.typ("bool"))
    semi = B.join_rel(READ_T, READ_U, eq, join_type=5)
    p = B.plan(semi, ["k", "v"], functions={1: (B.URI_CMP, "equal")})
    rows = run_substrait(spark, p, spark_provider).collect()
    assert len(rows) == 5 and rows[0].__fields__ == ["k", "v"]
    anti = B.join_rel(READ_T, READ_U, eq, join_type=6)
    p = B.plan(anti, ["k", "v"], functions={1: (B.URI_CMP, "equal")})
    assert run_substrait(spark, p, spark_provider).count() == 0


def test_sort_fetch(spark):
    srt = B.sort_rel(READ_T, [(B.field_ref(1), 4)])  # v desc_nulls_last
    f = B.fetch_rel(srt, offset=1, count=2)
    p = B.plan(f, ["k", "v"])
    assert _run_both(spark, p) == [("x", 3), ("y", 4)]


def test_set_union_all(spark):
    s = B.set_rel([READ_T, READ_T], op=6)
    p = B.plan(s, ["k", "v"])
    rows = _run_both(spark, p)
    assert len(rows) == 10


def test_if_then_cast_literals(spark):
    big = B.scalar_fn(1, [B.field_ref(1), B.lit_i64(3)], output=B.typ("bool"))
    label = B.if_then([(big, B.lit_str("big"))], B.lit_str("small"))
    as_f64 = B.cast(B.field_ref(1), B.typ("fp64"))
    root = B.project_rel(READ_T, [label, as_f64], emit=[0, 2, 3])
    p = B.plan(root, ["k", "size", "vf"], functions={1: (B.URI_CMP, "gte")})
    rows = _run_both(spark, p)
    assert ("x", "big", 3.0) in rows and ("x", "small", 1.0) in rows


def test_spark_only_full_outer_and_minus(spark):
    # shapes Acero's consumer doesn't take; assert Spark semantics directly
    def spark_provider(names):
        return spark.createDataFrame(TABLES[names[0]].to_pandas())

    eq = B.scalar_fn(1, [B.field_ref(0), B.field_ref(2)], output=B.typ("bool"))
    j = B.join_rel(READ_T, READ_U, eq, join_type=2)  # full outer
    p = B.plan(j, ["k", "v", "k2", "w"], functions={1: (B.URI_CMP, "equal")})
    rows = run_substrait(spark, p, spark_provider).collect()
    assert any(r.k is None and r.w == 300 for r in rows)  # z unmatched

    m = B.set_rel([READ_T, READ_T], op=1)  # MINUS_PRIMARY
    rows = run_substrait(spark, B.plan(m, ["k", "v"]), spark_provider).collect()
    assert rows == []


def test_unknown_function_anchor_raises(spark):
    bad = B.scalar_fn(99, [B.field_ref(1)], output=B.typ("bool"))
    p = B.plan(B.filter_rel(READ_T, bad), ["k", "v"])

    def spark_provider(names):
        return spark.createDataFrame(TABLES[names[0]].to_pandas())

    with pytest.raises(KeyError, match="anchor 99"):
        run_substrait(spark, p, spark_provider).collect()


# -- window functions (Spark-side only: Acero has no window node, so these
# are validated against the equivalent native DataFrame query instead of
# run_query — same pattern the reference uses for capability extensions).


def _spark_provider(spark, tables=TABLES):
    return lambda names: spark.createDataFrame(tables[names[0]].to_pandas())


def test_window_rel_rank_and_running_sum(spark):
    fns = [
        B.window_fn(1, [], output=B.typ("i64")),  # row_number
        B.window_fn(
            2,
            [B.field_ref(1)],
            output=B.typ("i64"),
            bounds=(B.bound("unbounded"), B.bound("current")),
            bounds_type=1,  # ROWS
        ),
    ]
    root = B.window_rel(READ_T, fns, [B.field_ref(0)], [(B.field_ref(1), 1)])
    p = B.plan(
        root,
        ["k", "v", "rn", "running"],
        functions={1: (B.URI_ARITH, "row_number"), 2: (B.URI_ARITH, "sum")},
    )
    got = sorted(tuple(r) for r in run_substrait(spark, p, _spark_provider(spark)).collect())
    # t: x→[1,3,5], y→[2,4]; asc order, running sums 1,4,9 / 2,6
    assert got == [
        ("x", 1, 1, 1), ("x", 3, 2, 4), ("x", 5, 3, 9),
        ("y", 2, 1, 2), ("y", 4, 2, 6),
    ]


def test_window_rel_lag_and_sliding_frame(spark):
    fns = [
        B.window_fn(1, [B.field_ref(1), B.lit_i32(1)], output=B.typ("i64")),  # lag 1
        B.window_fn(
            2,
            [B.field_ref(1)],
            output=B.typ("i64"),
            bounds=(B.bound("preceding", 1), B.bound("current")),
            bounds_type=1,
        ),  # sliding 2-row sum
    ]
    root = B.window_rel(READ_T, fns, [B.field_ref(0)], [(B.field_ref(1), 1)])
    p = B.plan(
        root,
        ["k", "v", "prev", "sum2"],
        functions={1: (B.URI_ARITH, "lag"), 2: (B.URI_ARITH, "sum")},
    )
    got = sorted(tuple(r) for r in run_substrait(spark, p, _spark_provider(spark)).collect())
    assert got == [
        ("x", 1, None, 1), ("x", 3, 1, 4), ("x", 5, 3, 8),
        ("y", 2, None, 2), ("y", 4, 2, 6),
    ]


def test_window_expression_in_project(spark):
    # window function as a plain Expression inside ProjectRel (field 5),
    # partitions/sorts carried inside the expression itself.
    wexpr = B.window_expr(
        B.window_fn(1, [], output=B.typ("i64")),
        [B.field_ref(0)],
        [(B.field_ref(1), 4)],  # v desc_nulls_last
    )
    root = B.project_rel(READ_T, [wexpr], emit=[0, 1, 2])
    p = B.plan(root, ["k", "v", "rnk"], functions={1: (B.URI_ARITH, "dense_rank")})
    got = sorted(tuple(r) for r in run_substrait(spark, p, _spark_provider(spark)).collect())
    assert got == [
        ("x", 1, 3), ("x", 3, 2), ("x", 5, 1),
        ("y", 2, 2), ("y", 4, 1),
    ]


def test_timestamp_literal_filter_cross_validated(spark):
    import datetime as dt

    tbl = pa.table(
        {
            "ts": pa.array(
                [dt.datetime(2024, 1, 1), dt.datetime(2024, 6, 1), dt.datetime(2025, 1, 1)],
                type=pa.timestamp("us"),
            ),
            "v": [1, 2, 3],
        }
    )
    cutoff = int(dt.datetime(2024, 3, 1).timestamp() * 1e6)
    gt = B.scalar_fn(1, [B.field_ref(0), B.lit_timestamp(cutoff)], output=B.typ("bool"))
    root = B.filter_rel(B.read_named(["t"], ["ts", "v"], ["timestamp", "i64"]), gt)
    p = B.plan(root, ["ts", "v"], functions={1: (B.URI_CMP, "gt")})
    rows = _run_both(spark, p, tables={"t": tbl})
    assert [r[1] for r in rows] == [2, 3]

def test_negative_literals_cross_validated(spark):
    # ADVICE r1: negative i8/i16/i32/date varint literals sign-extend to 64
    # bits on the wire; the consumer must decode at 64, not the target width.
    root = B.project_rel(READ_T, [B.lit_i32(-5), B.lit_date(-10)], emit=[2, 3])
    p = B.plan(root, ["neg", "d"])
    rows = _run_both(spark, p)
    import datetime

    assert rows == [(-5, datetime.date(1969, 12, 22))] * 5


def test_round_deprecated_args_field(spark):
    # ADVICE r1: round must read its scale via the deprecated `args` field
    # (2) when FunctionArgument (4) is absent, like every other function.
    body = (
        B.f_varint(1, 1)
        + B.f_msg(2, B.field_ref(1))
        + B.f_msg(2, B.lit_i64(0))
        + B.f_msg(3, B.typ("fp64"))
    )
    rnd = B.f_msg(3, body)  # Expression.scalar_function
    root = B.project_rel(READ_T, [rnd], emit=[0, 2])
    p = B.plan(root, ["k", "vr"], functions={1: (B.URI_ARITH, "round")})

    def spark_provider(names):
        return spark.createDataFrame(TABLES[names[0]].to_pandas())

    got = sorted((r.k, float(r.vr)) for r in run_substrait(spark, p, spark_provider).collect())
    assert got == [("x", 1.0), ("x", 3.0), ("x", 5.0), ("y", 2.0), ("y", 4.0)]


def _spark_only(spark):
    def provider(names):
        return spark.createDataFrame(TABLES[names[0]].to_pandas())

    return provider


def test_scalar_subquery_filter(spark):
    # v >= (SELECT max(v) FROM t)  → the single max row
    mx = B.aggregate_rel(READ_T, [], [B.agg_fn(2, [B.field_ref(1)], B.typ("i64"))])
    gte = B.scalar_fn(1, [B.field_ref(1), B.subquery_scalar(mx)], output=B.typ("bool"))
    p = B.plan(B.filter_rel(READ_T, gte), ["k", "v"],
               functions={1: (B.URI_CMP, "gte"), 2: (B.URI_ARITH, "max")})
    rows = run_substrait(spark, p, _spark_only(spark)).collect()
    assert [(r.k, r.v) for r in rows] == [("x", 5)]


def test_in_subquery_filter(spark):
    # k IN (SELECT k FROM u WHERE w >= 200)  → k ∈ {y, z} ∩ t = y rows
    big = B.scalar_fn(1, [B.field_ref(1), B.lit_i64(200)], output=B.typ("bool"))
    hay = B.project_rel(B.filter_rel(READ_U, big), [], emit=[0])
    inq = B.subquery_in([B.field_ref(0)], hay)
    p = B.plan(B.filter_rel(READ_T, inq), ["k", "v"],
               functions={1: (B.URI_CMP, "gte")})
    rows = sorted((r.k, r.v) for r in run_substrait(spark, p, _spark_only(spark)).collect())
    assert rows == [("y", 2), ("y", 4)]


def test_exists_correlated_subquery(spark):
    # EXISTS (SELECT 1 FROM u WHERE u.k = t.k AND u.w > 100)  → k = y rows
    eq = B.scalar_fn(1, [B.field_ref(0), B.outer_field_ref(0)], output=B.typ("bool"))
    gt = B.scalar_fn(2, [B.field_ref(1), B.lit_i64(100)], output=B.typ("bool"))
    both = B.scalar_fn(3, [eq, gt], output=B.typ("bool"))
    ex = B.subquery_exists(B.filter_rel(READ_U, both))
    p = B.plan(B.filter_rel(READ_T, ex), ["k", "v"],
               functions={1: (B.URI_CMP, "equal"), 2: (B.URI_CMP, "gt"),
                          3: (B.URI_BOOL, "and")})
    rows = sorted((r.k, r.v) for r in run_substrait(spark, p, _spark_only(spark)).collect())
    assert rows == [("y", 2), ("y", 4)]


def test_grouping_sets_aggregate(spark):
    # groupings [[k], []] + sum(v): per-key rows (set 0) + grand total (set 1)
    agg = B.aggregate_rel_sets(
        READ_T, [[B.field_ref(0)], []], [B.agg_fn(1, [B.field_ref(1)], B.typ("i64"))]
    )
    p = B.plan(agg, ["k", "s", "gset"], functions={1: (B.URI_ARITH, "sum")})
    rows = sorted(
        (str(r.k), r.s, r.gset)
        for r in run_substrait(spark, p, _spark_only(spark)).collect()
    )
    assert rows == [("None", 15, 1), ("x", 9, 0), ("y", 6, 0)]


def test_measure_filter(spark):
    # sum(v) FILTER (WHERE v > 2) and count(*) FILTER (WHERE v > 2) per key
    gt = B.scalar_fn(2, [B.field_ref(1), B.lit_i64(2)], output=B.typ("bool"))
    agg = B.aggregate_rel(
        READ_T,
        [B.field_ref(0)],
        [B.agg_fn(1, [B.field_ref(1)], B.typ("i64")), B.agg_fn(3, [], B.typ("i64"))],
        measure_filters=[gt, gt],
    )
    p = B.plan(agg, ["k", "s_big", "n_big"],
               functions={1: (B.URI_ARITH, "sum"), 2: (B.URI_CMP, "gt"),
                          3: (B.URI_AGG, "count")})
    rows = sorted((r.k, r.s_big, r.n_big)
                  for r in run_substrait(spark, p, _spark_only(spark)).collect())
    # t: x→[1,3,5], y→[2,4];  v>2: x→3+5 (2 rows), y→4 (1 row)
    assert rows == [("x", 8, 2), ("y", 4, 1)]


def test_expand_rel_switching_and_consistent(spark):
    # Each input row duplicates twice: copy 0 carries (k, v, 'v'), copy 1
    # carries (k, 100, 'c') — consistent field + two switching fields.
    fields = [
        B.expand_field_consistent(B.field_ref(0)),
        B.expand_field_switching([B.field_ref(1), B.lit_i64(100)]),
        B.expand_field_switching([B.lit_str("v"), B.lit_str("c")]),
    ]
    p = B.plan(B.expand_rel(READ_T, fields), ["k", "val", "kind"])
    rows = sorted(
        (r.k, r.val, r.kind)
        for r in run_substrait(spark, p, _spark_only(spark)).collect()
    )
    want = sorted(
        [("x", 1, "v"), ("y", 2, "v"), ("x", 3, "v"), ("y", 4, "v"), ("x", 5, "v")]
        + [("x", 100, "c"), ("y", 100, "c"), ("x", 100, "c"), ("y", 100, "c"), ("x", 100, "c")]
    )
    assert rows == want


def test_expand_rel_mismatched_duplicates_rejected(spark):
    fields = [
        B.expand_field_switching([B.field_ref(1), B.lit_i64(0)]),
        B.expand_field_switching([B.lit_i64(1)]),
    ]
    p = B.plan(B.expand_rel(READ_T, fields), ["a", "b"])
    with pytest.raises(ValueError, match="duplicate count"):
        run_substrait(spark, p, _spark_only(spark)).collect()


def test_write_rel_modified_records_and_writer_callback(spark):
    captured = {}

    def writer(names, df, op):
        captured["names"] = list(names)
        captured["op"] = op
        captured["rows"] = sorted((r.k, r.v) for r in df.collect())

    gt = B.scalar_fn(1, [B.field_ref(1), B.lit_i64(2)], output=B.typ("bool"))
    w = B.write_rel_named(
        B.filter_rel(READ_T, gt), ["out", "t_big"], col_names=["k", "v"], op=4
    )
    p = B.plan(w, ["k", "v"], functions={1: (B.URI_CMP, "gt")})
    rows = sorted(
        (r.k, r.v)
        for r in run_substrait(spark, p, _spark_only(spark), writer).collect()
    )
    assert rows == [("x", 3), ("x", 5), ("y", 4)]
    assert captured["names"] == ["out", "t_big"]
    assert captured["op"] == 4
    assert captured["rows"] == rows


def test_write_rel_no_output_mode(spark):
    calls = []
    w = B.write_rel_named(READ_T, ["sink"], op=1, output_mode=1)
    p = B.plan(w, [])
    out = run_substrait(spark, p, _spark_only(spark), lambda n, df, op: calls.append(op))
    assert out.count() == 0
    assert calls == [1]


def test_write_rel_requires_writer(spark):
    p = B.plan(B.write_rel_named(READ_T, ["sink"]), [])
    with pytest.raises(ValueError, match="table_writer"):
        run_substrait(spark, p, _spark_only(spark)).collect()


def test_nested_loop_join_theta(spark):
    # t.v < u.w/100 — pure theta condition, no equi-keys
    lt = B.scalar_fn(1, [B.field_ref(1), B.field_ref(3)], output=B.typ("bool"))
    nlj = B.nested_loop_join_rel(READ_T, READ_U, expression=lt, join_type=1)
    p = B.plan(nlj, ["k", "v", "k2", "w"], functions={1: (B.URI_CMP, "lt")})
    rows = sorted(
        (r.k, r.v, r.k2, r.w)
        for r in run_substrait(spark, p, _spark_only(spark)).collect()
    )
    want = sorted(
        (k, v, k2, w)
        for k, v in zip(["x", "y", "x", "y", "x"], [1, 2, 3, 4, 5])
        for k2, w in zip(["x", "y", "z"], [100, 200, 300])
        if v < w
    )
    assert rows == want


def test_nested_loop_join_no_expression_is_cross(spark):
    nlj = B.nested_loop_join_rel(READ_T, READ_U)
    p = B.plan(nlj, ["k", "v", "k2", "w"])
    assert run_substrait(spark, p, _spark_only(spark)).count() == 15


def test_exchange_rel_scatter_and_broadcast(spark):
    # scatter by k into 4 partitions: content unchanged, hash exchange in plan
    ex = B.exchange_rel(READ_T, partition_count=4, scatter_fields=[0])
    p = B.plan(ex, ["k", "v"])
    df = run_substrait(spark, p, _spark_only(spark))
    assert sorted((r.k, r.v) for r in df.collect()) == sorted(
        zip(["x", "y", "x", "y", "x"], [1, 2, 3, 4, 5])
    )
    assert df.rdd.getNumPartitions() == 4
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" in physical
    # broadcast: content unchanged, hint survives to the consumer
    bx = B.exchange_rel(READ_T, broadcast=True)
    p2 = B.plan(bx, ["k", "v"])
    assert run_substrait(spark, p2, _spark_only(spark)).count() == 5


def test_ddl_rel_create_and_drop_view(spark):
    big = B.scalar_fn(1, [B.field_ref(1), B.lit_i64(2)], output=B.typ("bool"))
    create = B.ddl_rel(["ddl", "t_big"], obj=2, op=2,
                       view_definition=B.filter_rel(READ_T, big),
                       col_names=["k", "v"], col_kinds=["string", "i64"])
    p = B.plan(create, ["k", "v"], functions={1: (B.URI_CMP, "gt")})
    out = run_substrait(spark, p, _spark_only(spark))
    assert sorted((r.k, r.v) for r in out.collect()) == [("x", 3), ("x", 5), ("y", 4)]
    # the view is now addressable as a named_table by a SECOND plan
    read_view = B.read_named(["ddl_t_big"], ["k", "v"], ["string", "i64"])
    p2 = B.plan(read_view, ["k", "v"])
    got = run_substrait(spark, p2, lambda names: spark.table(names[0]))
    assert got.count() == 3
    # drop, then DROP (strict) on the gone view raises
    drop = B.ddl_rel(["ddl", "t_big"], obj=2, op=4)
    run_substrait(spark, B.plan(drop, []), _spark_only(spark))
    with pytest.raises(ValueError, match="does not exist"):
        run_substrait(spark, B.plan(drop, []), _spark_only(spark))


def test_reference_rel_shared_subtree(spark):
    # subtree 0: t filtered to v > 1; root: subtree JOIN subtree on k —
    # the same tree consumed twice via ReferenceRel ordinals.
    gt = B.scalar_fn(1, [B.field_ref(1), B.lit_i64(1)], output=B.typ("bool"))
    sub = B.filter_rel(READ_T, gt)
    eq = B.scalar_fn(2, [B.field_ref(0), B.field_ref(2)], output=B.typ("bool"))
    root = B.join_rel(B.reference_rel(0), B.reference_rel(0), eq, join_type=1)
    p = B.plan(root, ["k1", "v1", "k2", "v2"], subtrees=[sub],
               functions={1: (B.URI_CMP, "gt"), 2: (B.URI_CMP, "equal")})
    rows = sorted(
        (r.k1, r.v1, r.k2, r.v2)
        for r in run_substrait(spark, p, _spark_only(spark)).collect()
    )
    # filtered t = {x:3, x:5, y:2, y:4}; self-join on k → 4 x-pairs + 4 y-pairs
    want = sorted(
        ("x", a, "x", b) for a in (3, 5) for b in (3, 5)
    ) + sorted(("y", a, "y", b) for a in (2, 4) for b in (2, 4))
    assert rows == sorted(want)


def test_reference_rel_out_of_range(spark):
    p = B.plan(B.reference_rel(5), ["k", "v"])
    with pytest.raises(ValueError, match="subtree 5"):
        run_substrait(spark, p, _spark_only(spark))


@pytest.mark.parametrize("kind", ["hash", "merge"])
def test_keyed_join_rels(spark, kind):
    # t ⋈ u on k, with a post-join filter w >= 200
    gte = B.scalar_fn(1, [B.field_ref(3), B.lit_i64(200)], output=B.typ("bool"))
    j = B.keyed_join_rel(READ_T, READ_U, [0], [0], join_type=1, kind=kind,
                         post_filter=gte)
    p = B.plan(j, ["k", "v", "k2", "w"], functions={1: (B.URI_CMP, "gte")})
    rows = sorted(
        (r.k, r.v, r.k2, r.w)
        for r in run_substrait(spark, p, _spark_only(spark)).collect()
    )
    assert rows == [("y", 2, "y", 200), ("y", 4, "y", 200)]


def test_keyed_join_semi_and_empty_keys(spark):
    semi = B.keyed_join_rel(READ_T, READ_U, [0], [0], join_type=5)
    p = B.plan(semi, ["k", "v"])
    rows = run_substrait(spark, p, _spark_only(spark)).collect()
    assert len(rows) == 5 and rows[0].__fields__ == ["k", "v"]
    bad = B.keyed_join_rel(READ_T, READ_U, [], [], join_type=1)
    with pytest.raises(ValueError, match="key lists"):
        run_substrait(spark, B.plan(bad, ["k", "v"]), _spark_only(spark))


def test_singular_or_list_in_filter(spark):
    # v IN (1, 4, 5)
    inlist = B.or_list(B.field_ref(1), [B.lit_i64(1), B.lit_i64(4), B.lit_i64(5)])
    p = B.plan(B.filter_rel(READ_T, inlist), ["k", "v"])
    rows = sorted((r.k, r.v) for r in run_substrait(spark, p, _spark_only(spark)).collect())
    assert rows == [("x", 1), ("x", 5), ("y", 4)]


def test_multi_or_list_in_filter(spark):
    # (k, v) IN (('x', 3), ('y', 2))
    ml = B.multi_or_list(
        [B.field_ref(0), B.field_ref(1)],
        [[B.lit_str("x"), B.lit_i64(3)], [B.lit_str("y"), B.lit_i64(2)]],
    )
    p = B.plan(B.filter_rel(READ_T, ml), ["k", "v"])
    rows = sorted((r.k, r.v) for r in run_substrait(spark, p, _spark_only(spark)).collect())
    assert rows == [("x", 3), ("y", 2)]


def test_nested_list_struct_map_construction(spark):
    proj = B.project_rel(
        READ_T,
        [
            B.nested_list([B.field_ref(1), B.lit_i64(100)]),
            B.nested_struct([B.field_ref(0), B.field_ref(1)]),
            B.nested_map([(B.lit_str("v"), B.field_ref(1))]),
        ],
        emit=[0, 2, 3, 4],
    )
    p = B.plan(proj, ["k", "arr", "st", "mp"])
    rows = run_substrait(spark, p, _spark_only(spark)).collect()
    first = next(r for r in rows if r.k == "x" and r.arr[0] == 1)
    assert first.arr == [1, 100]
    assert first.st[0] == "x" and first.st[1] == 1
    assert first.mp == {"v": 1}


def test_switch_expression_simple_case(spark):
    # CASE k WHEN 'x' THEN v*10 WHEN 'y' THEN v ELSE 0 END
    mul = B.scalar_fn(1, [B.field_ref(1), B.lit_i64(10)], output=B.typ("i64"))
    sw = B.switch(
        B.field_ref(0),
        [(B.raw_lit_str("x"), mul), (B.raw_lit_str("y"), B.field_ref(1))],
        els=B.lit_i64(0),
    )
    p = B.plan(B.project_rel(READ_T, [sw], emit=[0, 1, 2]), ["k", "v", "cased"],
               functions={1: (B.URI_ARITH, "multiply")})
    rows = sorted(
        (r.k, r.v, r.cased)
        for r in run_substrait(spark, p, _spark_only(spark)).collect()
    )
    assert rows == [("x", 1, 10), ("x", 3, 30), ("x", 5, 50), ("y", 2, 2), ("y", 4, 4)]


def test_extension_rels_route_through_handler(spark):
    """ExtensionSingle/Multi/Leaf route their Any detail through the
    pluggable extension_handler — the Spark analog of Acero's
    ExtensionProvider (custom nodes like as-of join arrive this way)."""
    import json

    def handler(type_url, value, inputs):
        if type_url == "arrow_spark/asof":
            from arrow_spark.operators.asof import asof_join_arrow

            opts = json.loads(value.decode())
            return asof_join_arrow(inputs[0], inputs[1], **opts)
        if type_url == "arrow_spark/range":
            return spark.range(int(value.decode())).withColumnRenamed("id", "n")
        raise NotImplementedError(type_url)

    # leaf: generates rows from the payload
    leaf = B.extension_leaf_rel("arrow_spark/range", b"4")
    p = B.plan(B.fetch_rel(leaf, count=10), ["n"])
    got = sorted(r.n for r in run_substrait(
        spark, p, _spark_only(spark), extension_handler=handler).collect())
    assert got == [0, 1, 2, 3]

    # multi: as-of join of t (as left) with u (as right) on v/w never
    # matches backward within 10 of 100 — use tolerance wide enough
    opts = json.dumps({"on": "_f1", "by": [], "tolerance": -1000}).encode()
    # rename both sides positionally first via project emit (identity)
    multi = B.extension_multi_rel([READ_T, READ_U], "arrow_spark/asof", opts)
    p2 = B.plan(multi, ["k", "v", "k2", "w"])
    rows = run_substrait(spark, p2, _spark_only(spark), extension_handler=handler)
    assert rows.count() == 5  # every left row survives (as-of left outer)

    # missing handler → clear error
    with pytest.raises(NotImplementedError, match="extension_handler"):
        run_substrait(spark, p, _spark_only(spark)).collect()


# -- wire-format spec pins (round 4) ----------------------------------------
# The builder and consumer share one codebase, so internal round-trips
# would pass even if BOTH used wrong field numbers (the r3 bug). These
# pins hold the emitted bytes against a literal copy of the substrait
# v0.44 spec tables, independent of either implementation.

SPEC_REL_FIELDS = {  # substrait/algebra.proto: message Rel oneof
    "read": 1, "filter": 2, "fetch": 3, "aggregate": 4, "sort": 5,
    "join": 6, "project": 7, "set": 8, "extension_single": 9,
    "extension_multi": 10, "extension_leaf": 11, "cross": 12,
    "hash_join": 13, "merge_join": 14, "exchange": 15, "expand": 16,
    "window": 17, "nested_loop_join": 18, "write": 19, "ddl": 20,
    "reference": 21,
}


def _first_tag(b: bytes) -> tuple[int, int]:
    """Decode the leading protobuf tag varint → (field_number, wire_type)."""
    shift = v = i = 0
    while True:
        byte = b[i]
        v |= (byte & 0x7F) << shift
        i += 1
        if not byte & 0x80:
            break
        shift += 7
    return v >> 3, v & 7


@pytest.mark.parametrize("kind,num", sorted(SPEC_REL_FIELDS.items()))
def test_rel_oneof_numbers_match_spec(kind, num):
    field, wire = _first_tag(B.rel(kind, b"\x08\x01"))
    assert (field, wire) == (num, 2), f"{kind} emitted as Rel field {field}"


def test_switch_expression_layout_matches_spec(spark):
    # SwitchExpression: ifs=1, else=2, match=3 (NOT match-first). Build
    # the message by hand from the spec layout and run it through the
    # consumer — a consumer still reading match from field 1 returns
    # the else-branch for every row.
    ifs = B.f_msg(1, B.f_msg(1, B.raw_lit_str("x")) + B.f_msg(2, B.lit_i64(7)))
    els = B.f_msg(2, B.lit_i64(0))
    match = B.f_msg(3, B.field_ref(0))
    sw = B.f_msg(7, ifs + els + match)
    p = B.plan(B.project_rel(READ_T, [sw], emit=[0, 2]), ["k", "cased"])
    rows = sorted((r.k, r.cased) for r in run_substrait(spark, p, _spark_only(spark)).collect())
    assert rows == [("x", 7), ("x", 7), ("x", 7), ("y", 0), ("y", 0)]


def test_exchange_kind_fields_match_spec(spark):
    # scatter_by_fields=5, round_robin=8, broadcast=9 (field 4 is the
    # repeated targets list). Hand-build each kind from spec numbers.
    scatter = B.f_msg(2, READ_T) + B.f_varint(3, 4) + B.f_msg(
        5, B.f_msg(1, B.raw_field_ref(0)))
    p = B.plan(B.rel("exchange", scatter), ["k", "v"])
    df = run_substrait(spark, p, _spark_only(spark))
    assert df.rdd.getNumPartitions() == 4 and df.count() == 5

    rr = B.f_msg(2, READ_T) + B.f_varint(3, 3) + B.f_msg(8, b"")
    df2 = run_substrait(spark, B.plan(B.rel("exchange", rr), ["k", "v"]), _spark_only(spark))
    assert df2.rdd.getNumPartitions() == 3 and df2.count() == 5

    bc = B.f_msg(2, READ_T) + B.f_msg(9, b"")
    df3 = run_substrait(spark, B.plan(B.rel("exchange", bc), ["k", "v"]), _spark_only(spark))
    assert df3.count() == 5


def test_expand_fields_read_from_field_4(spark):
    # A conformant ExpandRel carries fields at 4; a consumer reading 3
    # sees none and raises. Hand-build from spec numbers.
    body = B.f_msg(2, READ_T) + B.f_msg(4, B.expand_field_consistent(B.field_ref(0)))
    p = B.plan(B.rel("expand", body), ["k"])
    assert run_substrait(spark, p, _spark_only(spark)).count() == 5


def test_keyed_join_right_semi_and_anti(spark):
    # keyed-join enum: 6=RIGHT_SEMI (rows of u with a match in t),
    # 7=LEFT_ANTI, 8=RIGHT_ANTI — distinct from JoinRel's enum.
    rsemi = B.keyed_join_rel(READ_T, READ_U, [0], [0], join_type=6)
    rows = run_substrait(spark, B.plan(rsemi, ["k2", "w"]), _spark_only(spark)).collect()
    assert sorted((r.k2, r.w) for r in rows) == [("x", 100), ("y", 200)]
    assert rows[0].__fields__ == ["k2", "w"]

    lanti = B.keyed_join_rel(READ_T, READ_U, [0], [0], join_type=7)
    assert run_substrait(spark, B.plan(lanti, ["k", "v"]), _spark_only(spark)).count() == 0

    ranti = B.keyed_join_rel(READ_T, READ_U, [0], [0], join_type=8)
    rows = run_substrait(spark, B.plan(ranti, ["k2", "w"]), _spark_only(spark)).collect()
    assert [(r.k2, r.w) for r in rows] == [("z", 300)]


def test_nlj_right_semi_uses_keyed_enum(spark):
    # NestedLoopJoinRel shares the keyed-join enum: 6 is RIGHT_SEMI,
    # not left_anti — u rows where some t row satisfies v < w.
    lt = B.scalar_fn(1, [B.field_ref(1), B.field_ref(3)], output=B.typ("bool"))
    nlj = B.nested_loop_join_rel(READ_T, READ_U, expression=lt, join_type=6)
    p = B.plan(nlj, ["k2", "w"], functions={1: (B.URI_CMP, "lt")})
    rows = sorted((r.k2, r.w) for r in run_substrait(spark, p, _spark_only(spark)).collect())
    assert rows == [("x", 100), ("y", 200), ("z", 300)]


def test_shipped_extension_provider_asof(spark):
    """plans/extensions.py is a REAL in-repo ExtensionProvider: the
    builder helper encodes an as-of join as an ExtensionMultiRel and
    engine_extension_handler resolves it — result must equal the native
    operator called directly."""
    import pandas as pd

    from arrow_spark.operators.asof import asof_join
    from arrow_spark.plans.extensions import (
        asof_join_rel,
        engine_extension_handler,
    )

    rel = asof_join_rel(
        READ_T, READ_U, on="_f1", by=[], tolerance=-1000, right_tiebreak=["_f0"]
    )
    p = B.plan(rel, ["k", "v", "k2", "w"])
    got = run_substrait(
        spark, p, _spark_only(spark), extension_handler=engine_extension_handler
    )
    # native twin over the same positional frames
    t = _spark_only(spark)(["t"]).toDF("_f0", "_f1")
    u = _spark_only(spark)(["u"]).toDF("_f0", "_f1")
    want = asof_join(
        t, u, on="_f1", tolerance=1000, direction="backward", right_tiebreak=["_f0"]
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    # unknown extension urls still fail loudly through the shipped provider
    bad = B.extension_leaf_rel("someone_else/op", b"")
    with pytest.raises(NotImplementedError, match="someone_else/op"):
        run_substrait(
            spark,
            B.plan(bad, ["x"]),
            _spark_only(spark),
            extension_handler=engine_extension_handler,
        ).collect()
