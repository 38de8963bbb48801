"""Randomized hashjoin + group-by differential parity vs pyarrow Acero.

The reference's core join-test methodology is randomized inputs checked
against an independent implementation
(cpp/src/arrow/acero/hash_join_node_test.cc:252-506 — RandomDataType /
GenRandomRecords vs a naive reference join). Here the independent
implementation IS the reference binary: the same random tables run
through pyarrow's own acero hashjoin / group_by node and through the
Spark engine, and the result multisets must match cell-exactly.

Coverage: all 8 Arrow join types × null densities × heavy duplicate
keys (small key domains force within-key cross products) × composite
keys, and grouped aggregates over null-bearing keys/values.

Python-binding limits (pyarrow 16.1): HashJoinNodeOptions does not
expose key_cmp (null-safe IS) or filter_expression (residual theta).
TestSubstraitResidualNullSafeParity (bottom of this file) closes that
gap at the Substrait layer instead: randomized JoinRel plans with
post_join_filter / is_not_distinct_from keys through OUR consumer vs
the strongest Acero-executable equivalents through run_query, plus
pins on the two upstream 16.1 gaps so a pyarrow upgrade promotes both
to same-bytes parity. The DuckDB oracles (`join_nullsafe`,
`join_residual_filter` — driver-green r01) remain standing.
"""

from __future__ import annotations

import random

import pyarrow as pa
import pyarrow.acero as acero
import pytest

from arrow_spark.table import Table

JOIN_TYPES = [
    "inner",
    "left outer",
    "right outer",
    "full outer",
    "left semi",
    "right semi",
    "left anti",
    "right anti",
]


def _rand_table(rng: random.Random, n: int, prefix: str, n_keys: int,
                null_density: float, key_domain: int) -> pa.Table:
    """Random mixed-type table: int64 key column(s) with nulls drawn
    from a small domain (forcing duplicate keys), plus int64 / exact
    double / string payloads with independent nulls."""
    def key_col():
        return [
            None if rng.random() < null_density else rng.randrange(key_domain)
            for _ in range(n)
        ]

    def maybe(v):
        return None if rng.random() < null_density else v

    cols = {f"{prefix}k{i}": pa.array(key_col(), pa.int64()) for i in range(n_keys)}
    cols[f"{prefix}i"] = pa.array(
        [maybe(rng.randrange(-1000, 1000)) for _ in range(n)], pa.int64()
    )
    cols[f"{prefix}f"] = pa.array(
        [maybe(rng.randrange(-1000, 1000) / 4.0) for _ in range(n)], pa.float64()
    )
    cols[f"{prefix}s"] = pa.array(
        [maybe(rng.choice(["aa", "bb", "cc", "dd", ""])) for _ in range(n)],
        pa.string(),
    )
    return pa.table(cols)


def _canon(tbl: pa.Table):
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    return cols, sorted(
        zip(*data), key=lambda t: tuple((x is None, x) for x in t)
    )


def _acero_hashjoin(lt: pa.Table, rt: pa.Table, jt: str,
                    lk: list[str], rk: list[str]) -> pa.Table:
    decl = acero.Declaration(
        "hashjoin",
        acero.HashJoinNodeOptions(jt, left_keys=lk, right_keys=rk),
        inputs=[
            acero.Declaration("table_source", acero.TableSourceNodeOptions(lt)),
            acero.Declaration("table_source", acero.TableSourceNodeOptions(rt)),
        ],
    )
    return decl.to_table(use_threads=True)


def _to_spark(spark, tbl: pa.Table) -> Table:
    fields = {
        pa.int64(): "long", pa.float64(): "double", pa.string(): "string",
    }
    schema = ", ".join(f"{f.name} {fields[f.type]}" for f in tbl.schema)
    return Table(spark.createDataFrame(tbl.to_pylist(), schema))


@pytest.mark.parametrize("join_type", JOIN_TYPES)
def test_hashjoin_randomized_parity_all_types(spark, join_type):
    """Every Arrow join type, random null-bearing duplicate-heavy keys:
    the Spark join's result multiset equals acero's own hashjoin node."""
    rng = random.Random(hash(join_type) & 0xFFFF)
    for null_density, key_domain, nl, nr in [
        (0.0, 7, 120, 90),    # dense duplicates, no nulls
        (0.25, 10, 150, 100), # null keys must not match each other
        (0.5, 4, 60, 80),     # null-heavy, tiny domain
    ]:
        lt = _rand_table(rng, nl, "l_", 1, null_density, key_domain)
        rt = _rand_table(rng, nr, "r_", 1, null_density, key_domain)
        want = _acero_hashjoin(lt, rt, join_type, ["l_k0"], ["r_k0"])
        got = (
            _to_spark(spark, lt)
            .join(
                _to_spark(spark, rt),
                keys="l_k0",
                right_keys="r_k0",
                join_type=join_type,
                coalesce_keys=False,
            )
            ._df.toArrow()
        )
        assert _canon(want) == _canon(got), (join_type, null_density, key_domain)


def test_hashjoin_randomized_parity_composite_keys(spark):
    """Composite 2-column keys across the 4 outer-ish types — a null in
    EITHER key column must make the row unmatched on both engines."""
    rng = random.Random(99)
    lt = _rand_table(rng, 130, "l_", 2, 0.2, 5)
    rt = _rand_table(rng, 110, "r_", 2, 0.2, 5)
    for join_type in ("inner", "left outer", "right outer", "full outer"):
        want = _acero_hashjoin(
            lt, rt, join_type, ["l_k0", "l_k1"], ["r_k0", "r_k1"]
        )
        got = (
            _to_spark(spark, lt)
            .join(
                _to_spark(spark, rt),
                keys=["l_k0", "l_k1"],
                right_keys=["r_k0", "r_k1"],
                join_type=join_type,
                coalesce_keys=False,
            )
            ._df.toArrow()
        )
        assert _canon(want) == _canon(got), join_type


def test_groupby_randomized_parity_vs_pyarrow(spark):
    """Grouped aggregates over random null-bearing keys and values:
    sum/mean/min/max/count/count_distinct/stddev/variance through the
    TableGroupBy facade vs pyarrow's own group_by. Exact compare for
    integer outputs; 1-ULP-class rel tolerance for float accumulations
    (summation order differs across engines)."""
    rng = random.Random(4242)
    aggs = [
        ("v", "sum"), ("v", "mean"), ("v", "min"), ("v", "max"),
        ("v", "count"), ("v", "count_distinct"),
        ("v", "stddev"), ("v", "variance"), ("s", "count"),
    ]
    for null_density, key_domain, n in [(0.0, 6, 300), (0.3, 9, 400)]:
        tbl = pa.table({
            "k": pa.array(
                [None if rng.random() < null_density else rng.randrange(key_domain)
                 for _ in range(n)], pa.int64()),
            "v": pa.array(
                [None if rng.random() < null_density
                 else rng.randrange(-100, 100) / 4.0 for _ in range(n)],
                pa.float64()),
            "s": pa.array(
                [None if rng.random() < null_density else rng.choice("abcde")
                 for _ in range(n)], pa.string()),
        })
        want = tbl.group_by("k", use_threads=False).aggregate(aggs)
        got = (
            _to_spark(spark, tbl)
            .group_by("k")
            .aggregate(aggs)
            ._df.toArrow()
        )
        wc, wrows = _canon(want)
        gc, grows = _canon(got)
        assert wc == gc and len(wrows) == len(grows)
        for wr, gr in zip(wrows, grows):
            for c, wv, gv in zip(wc, wr, gr):
                if wv is None or gv is None:
                    assert wv == gv, (c, wv, gv)
                elif isinstance(wv, float):
                    assert gv == pytest.approx(wv, rel=1e-9, abs=1e-12), (c, wv, gv)
                else:
                    assert wv == gv, (c, wv, gv)


def test_groupby_options_parity_vs_pyarrow(spark):
    """ScalarAggregateOptions parity: skip_nulls=False (any null in the
    group nulls the aggregate) and min_count (fewer than n non-null
    values nulls it) — randomized groups checked against pyarrow's own
    group_by with the same options objects."""
    import pyarrow.compute as pc

    rng = random.Random(777)
    n = 300
    tbl = pa.table({
        "k": pa.array([rng.randrange(8) for _ in range(n)], pa.int64()),
        "v": pa.array(
            [None if rng.random() < 0.25 else rng.randrange(-40, 40) / 4.0
             for _ in range(n)], pa.float64()),
    })
    # NOTE: pyarrow's hash_min_max IGNORES min_count (probed live: a
    # 1-non-null group with min_count=2 still emits the value), so
    # min/max are exercised with skip_nulls only; sum/mean honor both
    # options as documented (api_aggregate.h ScalarAggregateOptions).
    cases = [
        ("sum", pc.ScalarAggregateOptions(skip_nulls=False)),
        ("mean", pc.ScalarAggregateOptions(skip_nulls=False)),
        ("min", pc.ScalarAggregateOptions(skip_nulls=False)),
        ("mean", pc.ScalarAggregateOptions(min_count=25)),
        ("sum", pc.ScalarAggregateOptions(min_count=60)),  # > every group
    ]
    aggs = [("v", fn, o) for fn, o in cases]
    want = tbl.group_by("k", use_threads=False).aggregate(aggs)
    got = _to_spark(spark, tbl).group_by("k").aggregate(aggs)._df.toArrow()

    # both engines emit duplicate output names ('v_sum' twice) in the
    # same positional order — compare positionally, rows sorted
    def rows(t):
        data = [c.to_pylist() for c in t.columns]
        return sorted(
            zip(*data), key=lambda r: tuple((x is None, x) for x in r)
        )

    assert want.column_names == got.column_names
    wrows, grows = rows(want), rows(got)
    assert len(wrows) == len(grows)
    for wr, gr in zip(wrows, grows):
        for wv, gv in zip(wr, gr):
            if isinstance(wv, float) and gv is not None and wv is not None:
                assert gv == pytest.approx(wv, rel=1e-9, abs=1e-12)
            else:
                assert wv == gv


# ---------------------------------------------------------------------------
# Substrait-layer residual + null-safe key parity (r9 ask #5 / r10 ask #6).
#
# pyarrow 16.1 upstream limits, PINNED below so a pyarrow upgrade flips the
# pins and we promote these to same-bytes parity:
#   - JoinRel.post_join_filter (field 5) is never read by Acero's consumer
#     (relation_internal.cc contains no post_join_filter handling), so the
#     exact bytes can't drive Acero's residual. Acero instead executes the
#     spec-equivalent decomposition FilterRel(residual) over JoinRel, while
#     OUR consumer executes the single JoinRel WITH field 5 set.
#   - is_not_distinct_from is registered arrow→substrait only
#     (extension_set.cc:1198); the substrait→arrow registry maps just
#     equal/not_equal (extension_set.cc:1109), so run_query rejects the IS
#     key-compare JoinRel (the very shape relation_internal.cc:726 handles)
#     before reaching the join. Acero instead executes the sentinel-coalesce
#     rewrite — project coalesce(k, S) on both sides, equal-join the
#     projected keys — which is IS semantics whenever S is outside the key
#     domain. Both run on identical randomized null-bearing inputs and must
#     match cell-exactly.
# ---------------------------------------------------------------------------

from arrow_spark.plans import substrait_builder as B
from arrow_spark.plans.substrait import run_substrait

ps = pytest.importorskip("pyarrow.substrait")

_SENTINEL = -987654321  # outside the key_domain=[0, 6) used below


def _sub_rand_pair(seed: int, n: int = 60):
    rng = random.Random(seed)
    lt = _rand_table(rng, n, "l", 1, 0.25, 6)
    rt = _rand_table(rng, n, "r", 1, 0.25, 6)
    # guarantee null-key rows on both sides so IS vs EQ actually differ
    lt = pa.concat_tables([lt, lt.slice(0, 1).set_column(
        0, "lk0", pa.array([None], pa.int64()))])
    rt = pa.concat_tables([rt, rt.slice(0, 1).set_column(
        0, "rk0", pa.array([None], pa.int64()))])
    return lt, rt


def _sub_reads():
    kinds = ["i64", "i64", "fp64", "string"]
    read_l = B.read_named(["l"], ["lk0", "li", "lf", "ls"], kinds)
    read_r = B.read_named(["r"], ["rk0", "ri", "rf", "rs"], kinds)
    return read_l, read_r


def _sub_run_acero(plan_bytes, tables):
    def prov(names, schema=None):
        return tables[names[0]]

    return ps.run_query(plan_bytes, table_provider=prov).read_all()


def _sub_run_spark(spark, plan_bytes, tables):
    fields = {pa.int64(): "long", pa.float64(): "double", pa.string(): "string"}

    def prov(names):
        tbl = tables[names[0]]
        schema = ", ".join(f"{f.name} {fields[f.type]}" for f in tbl.schema)
        return spark.createDataFrame(tbl.to_pylist(), schema)

    return run_substrait(spark, plan_bytes, prov)


def _sub_canon_rows(names, rows):
    order = sorted(range(len(names)), key=lambda i: names[i])
    out = [tuple(r[i] for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(type(x)), x) for x in t))


OUT8 = ["lk0", "li", "lf", "ls", "rk0", "ri", "rf", "rs"]
_FNS = {1: (B.URI_CMP, "equal"), 2: (B.URI_CMP, "gt"),
        3: (B.URI_CMP, "is_not_distinct_from")}


class TestSubstraitResidualNullSafeParity:
    @pytest.mark.parametrize("jt", [1, 3, 4, 2])  # INNER, LEFT, RIGHT, OUTER
    @pytest.mark.parametrize("seed", [11, 12])
    def test_post_join_filter_parity_vs_decomposed_acero(self, spark, jt, seed):
        lt, rt = _sub_rand_pair(seed)
        tables = {"l": lt, "r": rt}
        read_l, read_r = _sub_reads()
        eq = B.scalar_fn(1, [B.field_ref(0), B.field_ref(4)], output=B.typ("bool"))
        resid = B.scalar_fn(2, [B.field_ref(1), B.field_ref(5)], output=B.typ("bool"))
        ours = B.plan(B.join_rel(read_l, read_r, eq, join_type=jt,
                                 post_filter=resid), OUT8, functions=_FNS)
        theirs = B.plan(B.filter_rel(B.join_rel(read_l, read_r, eq, join_type=jt),
                                     resid), OUT8, functions=_FNS)
        want_tbl = _sub_run_acero(theirs, tables)
        got_df = _sub_run_spark(spark, ours, tables)
        want = _sub_canon_rows(want_tbl.column_names,
                               [tuple(r.values()) for r in want_tbl.to_pylist()])
        got = _sub_canon_rows(got_df.columns, [tuple(r) for r in got_df.collect()])
        assert len(want) > 0 and got == want

    @pytest.mark.parametrize("seed", [21, 22, 23])
    def test_nullsafe_key_parity_vs_sentinel_acero(self, spark, seed):
        lt, rt = _sub_rand_pair(seed)
        tables = {"l": lt, "r": rt}
        read_l, read_r = _sub_reads()
        isnd = B.scalar_fn(3, [B.field_ref(0), B.field_ref(4)], output=B.typ("bool"))
        ours = B.plan(B.join_rel(read_l, read_r, isnd, join_type=1),
                      OUT8, functions=_FNS)
        # Acero-executable twin: coalesce each key to the sentinel, equal-join
        coal_l = B.scalar_fn(4, [B.field_ref(0), B.lit_i64(_SENTINEL)],
                             output=B.typ("i64"))
        coal_r = B.scalar_fn(4, [B.field_ref(0), B.lit_i64(_SENTINEL)],
                             output=B.typ("i64"))
        proj_l = B.project_rel(read_l, [coal_l])   # 5 cols: lk0 li lf ls lck
        proj_r = B.project_rel(read_r, [coal_r])   # 5 cols: rk0 ri rf rs rck
        eq = B.scalar_fn(1, [B.field_ref(4), B.field_ref(9)], output=B.typ("bool"))
        joined = B.join_rel(proj_l, proj_r, eq, join_type=1)
        emit8 = B.project_rel(joined, [], emit=[0, 1, 2, 3, 5, 6, 7, 8])
        fns = dict(_FNS)
        fns[4] = (B.URI_CMP, "coalesce")
        theirs = B.plan(emit8, OUT8, functions=fns)
        want_tbl = _sub_run_acero(theirs, tables)
        got_df = _sub_run_spark(spark, ours, tables)
        want = _sub_canon_rows(want_tbl.column_names,
                               [tuple(r.values()) for r in want_tbl.to_pylist()])
        got = _sub_canon_rows(got_df.columns, [tuple(r) for r in got_df.collect()])
        # null keys exist on both sides, so IS must produce null-null matches
        assert any(t[0] is None for t in got)
        assert len(want) > 0 and got == want

    def test_pin_upstream_ignores_post_join_filter(self, spark):
        """pyarrow 16.1 run_query drops JoinRel field 5 on the floor; when
        this pin fails, upstream consumes it — switch the residual test
        above to same-bytes parity."""
        lt, rt = _sub_rand_pair(31)
        tables = {"l": lt, "r": rt}
        read_l, read_r = _sub_reads()
        eq = B.scalar_fn(1, [B.field_ref(0), B.field_ref(4)], output=B.typ("bool"))
        resid = B.scalar_fn(2, [B.field_ref(1), B.field_ref(5)], output=B.typ("bool"))
        with_f = B.plan(B.join_rel(read_l, read_r, eq, join_type=1,
                                   post_filter=resid), OUT8, functions=_FNS)
        without = B.plan(B.join_rel(read_l, read_r, eq, join_type=1),
                         OUT8, functions=_FNS)
        a = _sub_run_acero(with_f, tables)
        b = _sub_run_acero(without, tables)
        assert a.num_rows == b.num_rows  # field 5 ignored (residual not applied)
        # and the residual is non-trivial: our consumer's output is smaller
        ours = _sub_run_spark(spark, with_f, tables)
        assert ours.count() < a.num_rows

    def test_pin_upstream_rejects_is_not_distinct_from(self):
        """extension_set.cc:1109 maps only equal/not_equal substrait→arrow;
        the IS key-compare JoinRel (relation_internal.cc:726's own branch)
        is unreachable through run_query. When this pin fails, promote the
        null-safe test above to same-bytes parity."""
        lt, rt = _sub_rand_pair(41)
        read_l, read_r = _sub_reads()
        isnd = B.scalar_fn(3, [B.field_ref(0), B.field_ref(4)], output=B.typ("bool"))
        p = B.plan(B.join_rel(read_l, read_r, isnd, join_type=1),
                   OUT8, functions=_FNS)
        with pytest.raises(Exception, match="is_not_distinct_from"):
            _sub_run_acero(p, {"l": lt, "r": rt})
