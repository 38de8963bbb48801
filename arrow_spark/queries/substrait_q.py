"""Substrait-plan-driven query: the serialized protobuf path end-to-end
over real testdata (SURVEY §3.3 — engine/substrait/serde.h:106 parity).

The plan bytes are hand-encoded by substrait_builder (validated against
pyarrow.substrait.run_query in tests/test_substrait.py), consumed by
run_substrait into a Catalyst plan, and oracle-checked like any other
query. Aggregates avoid order-dependent float accumulation (sum over
whole-number quantities, count, max) so the DuckDB value-hash matches
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from arrow_spark.catalog import table
from arrow_spark.plans import substrait_builder as B
from arrow_spark.plans.substrait import run_substrait
from arrow_spark.queries.base import query

SUBSTRAIT_AGG_ORACLE = """
SELECT l_returnflag,
       SUM(l_quantity) AS sum_qty,
       COUNT(l_quantity) AS cnt,
       MAX(l_extendedprice) AS max_price
FROM lineitem
WHERE l_quantity < 24
GROUP BY l_returnflag
"""


def _plan_bytes() -> bytes:
    read = B.read_named(
        ["lineitem"],
        ["l_returnflag", "l_quantity", "l_extendedprice"],
        ["string", "fp64", "fp64"],
    )
    lt = B.scalar_fn(1, [B.field_ref(1), B.lit_fp64(24.0)], output=B.typ("bool"))
    agg = B.aggregate_rel(
        B.filter_rel(read, lt),
        [B.field_ref(0)],
        [
            B.agg_fn(2, [B.field_ref(1)], B.typ("fp64")),
            B.agg_fn(3, [B.field_ref(1)], B.typ("i64")),
            B.agg_fn(4, [B.field_ref(2)], B.typ("fp64")),
        ],
    )
    return B.plan(
        agg,
        ["l_returnflag", "sum_qty", "cnt", "max_price"],
        functions={
            1: (B.URI_CMP, "lt"),
            2: (B.URI_ARITH, "sum"),
            3: (B.URI_AGG, "count"),
            4: (B.URI_ARITH, "max"),
        },
    )


@query("substrait_filter_agg", oracle=SUBSTRAIT_AGG_ORACLE)
def substrait_filter_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filter + grouped aggregate arriving as a serialized substrait.Plan,
    executed by the wire-format consumer (pyarrow run_query parity)."""
    return run_substrait(
        spark, _plan_bytes(), lambda names: table(spark, sf_dir, names[0])
    )


SUBSTRAIT_WINDOW_ORACLE = """
SELECT o_orderkey, o_orderstatus, o_totalprice,
       row_number() OVER w AS rn,
       rank()       OVER w AS rnk,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_orderstatus
         ORDER BY o_totalprice DESC, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running,
       lag(o_totalprice, 1) OVER w AS prev_price
FROM orders
WHERE o_totalprice > 150000.0
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
"""


def _window_plan_bytes() -> bytes:
    read = B.read_named(
        ["orders"],
        ["o_orderkey", "o_orderstatus", "o_totalprice"],
        ["i64", "string", "fp64"],
    )
    gt = B.scalar_fn(1, [B.field_ref(2), B.lit_fp64(150000.0)], output=B.typ("bool"))
    sorts = [(B.field_ref(2), 4), (B.field_ref(0), 1)]  # price desc_nl, key asc
    fns = [
        B.window_fn(2, [], output=B.typ("i64")),  # row_number
        B.window_fn(3, [], output=B.typ("i64")),  # rank
        B.window_fn(
            4,
            [B.field_ref(2)],
            output=B.typ("fp64"),
            bounds=(B.bound("unbounded"), B.bound("current")),
            bounds_type=1,  # ROWS: prefix sum, accumulation order pinned by
        ),  # the total sort order → bit-identical across engines
        B.window_fn(5, [B.field_ref(2), B.lit_i32(1)], output=B.typ("fp64")),  # lag
    ]
    win = B.window_rel(B.filter_rel(read, gt), fns, [B.field_ref(1)], sorts)
    # round(running, 2): 2-decimal inputs ⇒ round(prefix_sum, 2) is an exact
    # decimal reconstruction on both engines (see relational.py).
    rnd = B.scalar_fn(6, [B.field_ref(5), B.lit_i32(2)], output=B.typ("fp64"))
    proj = B.project_rel(win, [rnd], emit=[0, 1, 2, 3, 4, 7, 6])
    return B.plan(
        proj,
        ["o_orderkey", "o_orderstatus", "o_totalprice", "rn", "rnk", "running", "prev_price"],
        functions={
            1: (B.URI_CMP, "gt"),
            2: (B.URI_ARITH, "row_number"),
            3: (B.URI_ARITH, "rank"),
            4: (B.URI_ARITH, "sum"),
            5: (B.URI_ARITH, "lag"),
            6: (B.URI_ARITH, "round"),
        },
    )


@query("substrait_window", oracle=SUBSTRAIT_WINDOW_ORACLE)
def substrait_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ConsistentPartitionWindowRel arriving as serialized plan bytes:
    rank family + frame-bounded running sum + lag, consumed into native
    Catalyst window plans (one shuffle on the partition key)."""
    return run_substrait(
        spark, _window_plan_bytes(), lambda names: table(spark, sf_dir, names[0])
    )


DECLARATION_ORACLE = """
SELECT o_orderpriority,
       round(sum(l_extendedprice), 2) AS sum_price,
       count(*) AS n
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_quantity > 45
GROUP BY o_orderpriority
"""


@query("declaration_pipeline", oracle=DECLARATION_ORACLE)
def declaration_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acero-style Declaration graph (exec_plan.h struct Declaration:
    {factory_name, options, inputs}) compiled to a Catalyst plan and
    oracle-checked end-to-end: scan(filter+projection pushdown) →
    hashjoin → grouped aggregate → project."""
    from pyspark.sql import functions as F

    from arrow_spark.plans.declaration import Declaration

    lineitem = Declaration(
        "scan",
        {
            "path": f"{sf_dir}/lineitem.parquet",
            "filter": F.col("l_quantity") > 45,
            "columns": ["l_orderkey", "l_extendedprice"],
        },
    )
    orders = Declaration(
        "scan",
        {"path": f"{sf_dir}/orders.parquet", "columns": ["o_orderkey", "o_orderpriority"]},
    )
    joined = Declaration(
        "hashjoin",
        {"left_keys": ["l_orderkey"], "right_keys": ["o_orderkey"], "join_type": "inner"},
        inputs=[lineitem, orders],
    )
    agg = Declaration(
        "aggregate",
        {
            "aggregates": [
                ("l_extendedprice", "hash_sum", "sum_raw"),
                ("", "hash_count_all", "n"),
            ],
            "keys": ["o_orderpriority"],
        },
        inputs=[joined],
    )
    out = Declaration(
        "project",
        {
            "expressions": [
                F.col("o_orderpriority"),
                F.round(F.col("sum_raw"), 2),
                F.col("n"),
            ],
            "names": ["o_orderpriority", "sum_price", "n"],
        },
        inputs=[agg],
    )
    return out.to_dataframe(spark)


SUBSTRAIT_SUBQUERY_ORACLE = """
SELECT o_orderpriority, count(*) AS n
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity > 48)
  AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0)
GROUP BY o_orderpriority
"""


def _subquery_plan_bytes() -> bytes:
    read_o = B.read_named(
        ["orders"], ["o_orderkey", "o_custkey", "o_orderpriority"], ["i64", "i64", "string"]
    )
    read_l = B.read_named(["lineitem"], ["l_orderkey", "l_quantity"], ["i64", "fp64"])
    read_c = B.read_named(["customer"], ["c_custkey", "c_acctbal"], ["i64", "fp64"])
    # EXISTS (… WHERE l_orderkey = outer.o_orderkey AND l_quantity > 48)
    eq = B.scalar_fn(1, [B.field_ref(0), B.outer_field_ref(0)], output=B.typ("bool"))
    gt = B.scalar_fn(2, [B.field_ref(1), B.lit_fp64(48.0)], output=B.typ("bool"))
    ex = B.subquery_exists(B.filter_rel(read_l, B.scalar_fn(3, [eq, gt], output=B.typ("bool"))))
    # o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
    rich = B.scalar_fn(2, [B.field_ref(1), B.lit_fp64(9000.0)], output=B.typ("bool"))
    hay = B.project_rel(B.filter_rel(read_c, rich), [], emit=[0])
    inq = B.subquery_in([B.field_ref(1)], hay)
    cond = B.scalar_fn(3, [ex, inq], output=B.typ("bool"))
    agg = B.aggregate_rel(
        B.filter_rel(read_o, cond),
        [B.field_ref(2)],
        [B.agg_fn(4, [], B.typ("i64"))],
    )
    return B.plan(
        agg,
        ["o_orderpriority", "n"],
        functions={
            1: (B.URI_CMP, "equal"),
            2: (B.URI_CMP, "gt"),
            3: (B.URI_BOOL, "and"),
            4: (B.URI_AGG, "count"),
        },
    )


@query("substrait_subquery", oracle=SUBSTRAIT_SUBQUERY_ORACLE)
def substrait_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """correlated EXISTS + uncorrelated IN subquery expressions arriving
    as serialized substrait plan bytes (Expression.Subquery — consumed
    via Spark 4's DataFrame.exists()/Column.outer(); Catalyst
    decorrelates both into semi joins)."""
    return run_substrait(
        spark, _subquery_plan_bytes(), lambda names: table(spark, sf_dir, names[0])
    )


SUBSTRAIT_GROUPING_SETS_ORACLE = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty, count(*) AS n,
       CASE grouping(l_returnflag, l_linestatus)
            WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 3 THEN 2 END AS gset
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


def _grouping_sets_plan_bytes() -> bytes:
    read = B.read_named(
        ["lineitem"], ["l_returnflag", "l_linestatus", "l_quantity"],
        ["string", "string", "fp64"],
    )
    agg = B.aggregate_rel_sets(
        read,
        [[B.field_ref(0), B.field_ref(1)], [B.field_ref(0)], []],
        [
            B.agg_fn(1, [B.field_ref(2)], B.typ("fp64")),
            B.agg_fn(2, [], B.typ("i64")),
        ],
    )
    return B.plan(
        agg,
        ["l_returnflag", "l_linestatus", "sum_qty", "n", "gset"],
        functions={1: (B.URI_ARITH, "sum"), 2: (B.URI_AGG, "count")},
    )


@query("substrait_grouping_sets", oracle=SUBSTRAIT_GROUPING_SETS_ORACLE)
def substrait_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AggregateRel with three Groupings = grouping sets, consumed into
    Spark's native groupingSets with the grouping_id() bitmask mapped to
    the substrait declaration-order set index (trailing i32 column).
    Whole-number quantity sums keep the value hash order-independent."""
    return run_substrait(
        spark, _grouping_sets_plan_bytes(), lambda names: table(spark, sf_dir, names[0])
    )


SUBSTRAIT_EXPAND_ORACLE = """
SELECT l_returnflag, kind, SUM(v) AS val, COUNT(*) AS n FROM (
  SELECT l_returnflag, l_quantity AS v, 'qty' AS kind FROM lineitem
  UNION ALL
  SELECT l_returnflag, 1.0 AS v, 'rows' AS kind FROM lineitem
) GROUP BY l_returnflag, kind
"""


def _expand_plan_bytes() -> bytes:
    read = B.read_named(["lineitem"], ["l_returnflag", "l_quantity"], ["string", "fp64"])
    ex = B.expand_rel(
        read,
        [
            B.expand_field_consistent(B.field_ref(0)),
            B.expand_field_switching([B.field_ref(1), B.lit_fp64(1.0)]),
            B.expand_field_switching([B.lit_str("qty"), B.lit_str("rows")]),
        ],
    )
    agg = B.aggregate_rel(
        ex,
        [B.field_ref(0), B.field_ref(2)],
        [B.agg_fn(1, [B.field_ref(1)], B.typ("fp64")), B.agg_fn(2, [], B.typ("i64"))],
    )
    return B.plan(
        agg,
        ["l_returnflag", "kind", "val", "n"],
        functions={1: (B.URI_ARITH, "sum"), 2: (B.URI_AGG, "count")},
    )


@query("substrait_expand", oracle=SUBSTRAIT_EXPAND_ORACLE)
def substrait_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExpandRel (row duplication with switching fields — the grouping-
    sets building block, algebra.proto field 20) consumed as a union-all
    of codegen'd projections, then aggregated. Whole-number sums keep the
    value hash order-independent (reference consumer:
    cpp/src/arrow/engine/substrait/relation_internal.cc)."""
    return run_substrait(
        spark, _expand_plan_bytes(), lambda names: table(spark, sf_dir, names[0])
    )


SUBSTRAIT_WRITE_ORACLE = """
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM orders WHERE o_totalprice > 400000.0
"""


def _write_plan_bytes() -> bytes:
    read = B.read_named(
        ["orders"], ["o_orderkey", "o_orderstatus", "o_totalprice"],
        ["i64", "string", "fp64"],
    )
    gt = B.scalar_fn(1, [B.field_ref(2), B.lit_fp64(400000.0)], output=B.typ("bool"))
    w = B.write_rel_named(
        B.filter_rel(read, gt),
        ["substrait_write_out"],
        col_names=["o_orderkey", "o_orderstatus", "o_totalprice"],
        op=4,  # CTAS
        output_mode=2,  # MODIFIED_RECORDS
    )
    return B.plan(
        w, ["o_orderkey", "o_orderstatus", "o_totalprice"],
        functions={1: (B.URI_CMP, "gt")},
    )


@query("substrait_write", oracle=SUBSTRAIT_WRITE_ORACLE)
def substrait_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WriteRel (CTAS to a named table, algebra.proto field 13) consumed
    through the pluggable table_writer sink; MODIFIED_RECORDS returns the
    written rows so the write path is oracle-checkable. The writer here
    lands the frame as a temp view (a durable saveAsTable writer is
    provided as default_table_writer)."""
    from arrow_spark.plans.substrait import run_substrait as _run

    def writer(names, df, op):
        df.createOrReplaceTempView("__".join(names))

    return _run(
        spark, _write_plan_bytes(), lambda names: table(spark, sf_dir, names[0]), writer
    )


SUBSTRAIT_NLJ_ORACLE = """
SELECT n_name, r_name
FROM nation, region
WHERE nation.n_regionkey <> region.r_regionkey
"""


def _nlj_plan_bytes() -> bytes:
    nation = B.read_named(["nation"], ["n_name", "n_regionkey"], ["string", "i64"])
    region = B.read_named(["region"], ["r_regionkey", "r_name"], ["i64", "string"])
    neq = B.scalar_fn(1, [B.field_ref(1), B.field_ref(2)], output=B.typ("bool"))
    nlj = B.nested_loop_join_rel(nation, region, expression=neq, join_type=1)
    # exchange the result by n_name (ExchangeRel scatter) before emitting:
    # exercises the repartition mapping inside a consumed plan
    ex = B.exchange_rel(B.project_rel(nlj, [], emit=[0, 3]), partition_count=8,
                        scatter_fields=[0])
    return B.plan(
        ex, ["n_name", "r_name"], functions={1: (B.URI_CMP, "not_equal")}
    )


@query("substrait_nested_loop_join", oracle=SUBSTRAIT_NLJ_ORACLE)
def substrait_nested_loop_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NestedLoopJoinRel (pure theta condition, algebra.proto field 18)
    + ExchangeRel scatter (field 19) consumed into a DataFrame join —
    Catalyst lowers the no-equi-conjunct condition to
    BroadcastNestedLoopJoin with the 5-row region side broadcast, the
    scalable physical shape for theta joins."""
    return run_substrait(
        spark, _nlj_plan_bytes(), lambda names: table(spark, sf_dir, names[0])
    )


SUBSTRAIT_REFERENCE_ORACLE = """
SELECT l_returnflag, 2*COUNT(*) AS n, 2*SUM(l_quantity) AS sum_qty
FROM lineitem WHERE l_quantity < 3.0 GROUP BY l_returnflag
"""


def _reference_plan_bytes() -> bytes:
    read = B.read_named(["lineitem"], ["l_returnflag", "l_quantity"], ["string", "fp64"])
    lt = B.scalar_fn(1, [B.field_ref(1), B.lit_fp64(3.0)], output=B.typ("bool"))
    sub = B.filter_rel(read, lt)
    # the same subtree consumed twice through ReferenceRel ordinals
    union = B.set_rel([B.reference_rel(0), B.reference_rel(0)], op=6)
    agg = B.aggregate_rel(
        union,
        [B.field_ref(0)],
        [B.agg_fn(2, [], B.typ("i64")), B.agg_fn(3, [B.field_ref(1)], B.typ("fp64"))],
    )
    return B.plan(
        agg, ["l_returnflag", "n", "sum_qty"], subtrees=[sub],
        functions={1: (B.URI_CMP, "lt"), 2: (B.URI_AGG, "count"),
                   3: (B.URI_ARITH, "sum")},
    )


@query("substrait_reference", oracle=SUBSTRAIT_REFERENCE_ORACLE)
def substrait_reference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ReferenceRel (common-subplan sharing, algebra.proto field 21): a
    filtered-scan subtree declared once as a non-root PlanRel is consumed
    twice by ordinal (union-all of itself), then aggregated. The oracle
    doubles count/sum to mirror the sharing. Whole-number quantity sums
    keep the value hash order-independent."""
    return run_substrait(
        spark, _reference_plan_bytes(), lambda names: table(spark, sf_dir, names[0])
    )


SUBSTRAIT_CASE_INLIST_ORACLE = """
SELECT l_returnflag,
       CASE l_returnflag WHEN 'A' THEN 1 WHEN 'R' THEN 2 ELSE 0 END AS flag_code,
       COUNT(*) AS n
FROM lineitem
WHERE l_linenumber IN (1, 2)
GROUP BY l_returnflag, flag_code
"""


def _case_inlist_plan_bytes() -> bytes:
    read = B.read_named(
        ["lineitem"], ["l_returnflag", "l_quantity", "l_linenumber"],
        ["string", "fp64", "i64"],
    )
    inlist = B.or_list(B.field_ref(2), [B.lit_i64(1), B.lit_i64(2)])
    sw = B.switch(
        B.field_ref(0),
        [(B.raw_lit_str("A"), B.lit_i64(1)), (B.raw_lit_str("R"), B.lit_i64(2))],
        els=B.lit_i64(0),
    )
    proj = B.project_rel(B.filter_rel(read, inlist), [sw], emit=[0, 3])
    agg = B.aggregate_rel(
        proj, [B.field_ref(0), B.field_ref(1)], [B.agg_fn(1, [], B.typ("i64"))]
    )
    return B.plan(
        agg, ["l_returnflag", "flag_code", "n"], functions={1: (B.URI_AGG, "count")}
    )


@query("substrait_case_inlist", oracle=SUBSTRAIT_CASE_INLIST_ORACLE)
def substrait_case_inlist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SingularOrList (IN-list) filter + SwitchExpression (simple CASE)
    arriving as substrait bytes, then grouped-count — the expression
    oneofs beyond functions/literals, oracle-checked end to end."""
    return run_substrait(
        spark, _case_inlist_plan_bytes(), lambda names: table(spark, sf_dir, names[0])
    )


SUBSTRAIT_EXT_ASOF_ORACLE = """
WITH l AS (SELECT * FROM events WHERE event_type = 'click'),
     r AS (SELECT * FROM events WHERE event_type = 'purchase')
SELECT event_id, user_id, r_event_id, r_value
FROM (
  SELECT l.event_id, l.user_id, r.event_id AS r_event_id, r.value AS r_value,
         row_number() OVER (PARTITION BY l.event_id
                            ORDER BY r.ts DESC, r.event_id DESC) AS rn
  FROM l LEFT JOIN r
    ON l.user_id = r.user_id
   AND r.ts <= l.ts
   AND r.ts >= l.ts - INTERVAL 12 HOUR
)
WHERE rn = 1
"""


def _extension_asof_plan_bytes() -> bytes:
    from arrow_spark.plans.extensions import asof_join_rel

    cols = ["event_id", "user_id", "ts", "value", "event_type"]
    kinds = ["i64", "i64", "timestamp", "fp64", "string"]

    def typed_read(etype: str) -> bytes:
        eq = B.scalar_fn(
            1, [B.field_ref(4), B.lit_str(etype)], output=B.typ("bool")
        )
        return B.filter_rel(B.read_named(["events"], cols, kinds), eq)

    left = typed_read("click")  # _f0..4 = event_id,user_id,ts,value,event_type
    right = B.project_rel(typed_read("purchase"), [], emit=[0, 1, 2, 3])
    asof = asof_join_rel(
        left,
        right,
        on="_f2",
        by=["_f1"],
        tolerance="-12h",  # negative ⇒ backward (options.h:711-724)
        right_tiebreak=["_f0"],
    )
    # asof output: left _f0..4 ++ right's non-BY cols suffixed
    # (_f0_r, _f2_r, _f3_r — the on column is kept), re-positionalized
    # by the consumer to _f0.._f7; keep (event_id, user_id, event_id_r,
    # value_r)
    final = B.project_rel(asof, [], emit=[0, 1, 5, 7])
    return B.plan(
        final,
        ["event_id", "user_id", "r_event_id", "r_value"],
        functions={1: (B.URI_CMP, "equal")},
    )


@query("substrait_extension_asof", oracle=SUBSTRAIT_EXT_ASOF_ORACLE)
def substrait_extension_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """as-of join arriving as an ExtensionMultiRel, resolved by the
    SHIPPED extension provider (plans/extensions.py — the Acero
    ExtensionProvider analog, extension_set.h): backward 12 h tolerance,
    by=user_id, deterministic tiebreak. Proves the pluggable hook end to
    end with in-repo producer + provider, oracle-checked like any other
    query."""
    from arrow_spark.plans.extensions import engine_extension_handler

    return run_substrait(
        spark,
        _extension_asof_plan_bytes(),
        lambda names: table(spark, sf_dir, names[0]),
        extension_handler=engine_extension_handler,
    )


# identical semantics to ewma_smooth ⇒ identical oracle
from arrow_spark.queries.timeseries import EWMA_ORACLE as EXT_EWMA_ORACLE


def _extension_ewma_plan_bytes() -> bytes:
    from arrow_spark.plans.extensions import ewma_rel

    cols = ["event_id", "user_id", "ts", "value"]
    kinds = ["i64", "i64", "timestamp", "fp64"]
    read = B.read_named(["events"], cols, kinds)
    # cents = cast(round(value * 100, 0) as i64) appended as _f4, then
    # emit (event_id, user_id, ts, cents)
    cents = B.cast(
        B.scalar_fn(
            2,
            [
                B.scalar_fn(1, [B.field_ref(3), B.lit_fp64(100.0)],
                            output=B.typ("fp64")),
                B.lit_i32(0),
            ],
            output=B.typ("fp64"),
        ),
        B.typ("i64"),
    )
    snapped = B.project_rel(read, [cents], emit=[0, 1, 2, 4])
    sm = ewma_rel(
        snapped,
        keys=["_f1"],
        order_by=["_f2", "_f0"],
        value_col="_f3",
        out_col="ewma_cents",
    )
    # ext output re-positionalized _f0..(cents) ++ _f4 (ewma_cents)
    final = B.project_rel(sm, [], emit=[1, 0, 3, 4])
    return B.plan(
        final,
        ["user_id", "event_id", "cents", "ewma_cents"],
        functions={1: (B.URI_ARITH, "multiply"), 2: (B.URI_ARITH, "round")},
    )


@query("substrait_extension_ewma", oracle=EXT_EWMA_ORACLE)
def substrait_extension_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """span-32 dyadic-exact EWMA arriving as an ExtensionSingleRel — the
    second shipped extension (after the as-of ExtensionMultiRel),
    proving the provider hook over a SINGLE-input rel with arithmetic
    (multiply/round anchors) composed below it. Identical semantics to
    ewma_smooth, so the oracle is the same bounded self-join replay —
    bit-exact."""
    from arrow_spark.plans.extensions import engine_extension_handler

    return run_substrait(
        spark,
        _extension_ewma_plan_bytes(),
        lambda names: table(spark, sf_dir, names[0]),
        extension_handler=engine_extension_handler,
    )


EXT_SKYLINE_ORACLE = """
WITH o AS (
  SELECT l_returnflag AS returnflag,
         l_orderkey AS orderkey, CAST(l_linenumber AS BIGINT) AS linenumber,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cost_cents,
         CAST(round(l_quantity) AS BIGINT) AS qty
  FROM lineitem WHERE l_orderkey < 2000
)
SELECT returnflag, orderkey, linenumber, cost_cents, qty
FROM o a
WHERE NOT EXISTS (
  SELECT 1 FROM o b
  WHERE b.returnflag = a.returnflag
    AND b.cost_cents <= a.cost_cents AND b.qty >= a.qty
    AND (b.cost_cents < a.cost_cents OR b.qty > a.qty)
)
"""


def _extension_skyline_plan_bytes() -> bytes:
    from arrow_spark.plans.extensions import skyline_rel

    cols = ["l_orderkey", "l_linenumber", "l_returnflag", "l_quantity",
            "l_extendedprice"]
    kinds = ["i64", "i32", "string", "fp64", "fp64"]
    read = B.read_named(["lineitem"], cols, kinds)
    flt = B.filter_rel(
        read,
        B.scalar_fn(1, [B.field_ref(0), B.lit_i64(2000)], output=B.typ("bool")),
    )
    cents = B.cast(
        B.scalar_fn(
            2,
            [
                B.scalar_fn(3, [B.field_ref(4), B.lit_fp64(100.0)],
                            output=B.typ("fp64")),
                B.lit_i32(0),
            ],
            output=B.typ("fp64"),
        ),
        B.typ("i64"),
    )
    qty = B.cast(
        B.scalar_fn(2, [B.field_ref(3), B.lit_i32(0)], output=B.typ("fp64")),
        B.typ("i64"),
    )
    lnum = B.cast(B.field_ref(1), B.typ("i64"))
    # emit (returnflag, orderkey, linenumber_i64, cost_cents, qty)
    proj = B.project_rel(flt, [cents, qty, lnum], emit=[2, 0, 7, 5, 6])
    sky = skyline_rel(proj, groups=["_f0"], minimize="_f3", maximize="_f4")
    return B.plan(
        sky,
        ["returnflag", "orderkey", "linenumber", "cost_cents", "qty"],
        functions={
            1: (B.URI_CMP, "lt"),
            2: (B.URI_ARITH, "round"),
            3: (B.URI_ARITH, "multiply"),
        },
    )


@query("substrait_extension_skyline", oracle=EXT_SKYLINE_ORACLE)
def substrait_extension_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto front arriving as an ExtensionSingleRel — the THIRD
    shipped extension (after the as-of ExtensionMultiRel and the EWMA
    single rel), with a filter + arithmetic projection composed below
    it in the plan. The oracle is the naive NOT EXISTS dominance test,
    so the substrait route is held to the same different-algebra proof
    as the native skyline query."""
    from arrow_spark.plans.extensions import engine_extension_handler

    return run_substrait(
        spark,
        _extension_skyline_plan_bytes(),
        lambda names: table(spark, sf_dir, names[0]),
        extension_handler=engine_extension_handler,
    )
