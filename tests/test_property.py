"""Hypothesis property tests mirroring the reference's randomized
strategy (python/pyarrow/tests/strategies.py + the naive-reference
comparisons in acero/hash_join_node_test.cc:252-506): random typed
frames through engine operators, DuckDB as the naive oracle."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

finite_doubles = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e6, max_value=1e6
)
small_ints = st.integers(min_value=-(2**31), max_value=2**31 - 1)

frames = st.lists(
    st.tuples(small_ints, st.one_of(st.none(), finite_doubles), st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=8
    )),
    min_size=1,
    max_size=40,
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _both(spark, rows):
    pdf = pd.DataFrame(rows, columns=["k", "v", "s"])
    sdf = spark.createDataFrame(pdf.astype({"k": "int64"}))
    con = duckdb.connect()
    con.register("t", pdf)
    return sdf, con


@given(rows=frames)
@SETTINGS
def test_groupby_agg_matches_duckdb(spark, rows):
    sdf, con = _both(spark, rows)
    got = {
        (r.g, r.n, r.mn): True
        for r in sdf.groupBy((F.col("k") % 4).alias("g"))
        .agg(F.count("v").alias("n"), F.min("v").alias("mn"))
        .collect()
    }
    want = {
        (g, n, mn): True
        for g, n, mn in con.sql(
            "SELECT k % 4 AS g, count(v) AS n, min(v) AS mn FROM t GROUP BY 1"
        ).fetchall()
    }

    def norm(keys):
        return {
            (g, n, None if mn is None or (isinstance(mn, float) and math.isnan(mn)) else round(mn, 9))
            for (g, n, mn) in keys
        }

    assert norm(got) == norm(want)


@given(rows=frames)
@SETTINGS
def test_filter_sort_limit_matches_duckdb(spark, rows):
    sdf, con = _both(spark, rows)
    got = [
        (r.k, r.s)
        for r in sdf.where(F.col("v").isNotNull() & (F.col("v") > 0))
        .orderBy(F.col("k").asc(), F.col("s").asc())
        .limit(10)
        .select("k", "s")
        .collect()
    ]
    want = con.sql(
        "SELECT k, s FROM t WHERE v IS NOT NULL AND v > 0 "
        "ORDER BY k ASC, s ASC LIMIT 10"
    ).fetchall()
    assert got == [tuple(w) for w in want]


@given(rows=frames)
@SETTINGS
def test_distinct_union_matches_duckdb(spark, rows):
    sdf, con = _both(spark, rows)
    got = sdf.select("k").union(sdf.select("k")).distinct().count()
    want = con.sql("SELECT count(*) FROM (SELECT DISTINCT k FROM (SELECT k FROM t UNION ALL SELECT k FROM t))").fetchone()[0]
    assert got == want


@given(rows=frames)
@SETTINGS
def test_rle_round_trip_property(spark, rows):
    # RLE(decode(encode(x))) preserves multiset per key; run lengths sum
    # to group sizes; adjacent runs never share a value (null-safe)
    from arrow_spark.operators.encodings import run_length_decode, run_length_encode

    pdf = pd.DataFrame(rows, columns=["k", "v", "s"])
    pdf["i"] = range(len(pdf))
    sdf = spark.createDataFrame(pdf.astype({"k": "int64"}))
    runs = run_length_encode(sdf, "s", order_by=["i"], partition_by=["k"]).collect()
    by_key = {}
    for r in runs:
        by_key.setdefault(r.k, []).append((r.run_seq, r.value, r.run_length))
    for k, rs in by_key.items():
        rs.sort()
        assert sum(n for _, _, n in rs) == (pdf["k"] == k).sum()
        for (_, v1, _), (_, v2, _) in zip(rs, rs[1:]):
            assert v1 != v2 or (v1 is None) != (v2 is None) or not (v1 == v2)
    total = sum(r.run_length for r in runs)
    assert total == len(pdf)


@given(rows=frames)
@SETTINGS
def test_dictionary_encode_round_trip_property(spark, rows):
    from arrow_spark.operators.encodings import dictionary_decode, dictionary_encode

    pdf = pd.DataFrame(rows, columns=["k", "v", "s"]).drop(columns=["v"])
    pdf["i"] = range(len(pdf))
    sdf = spark.createDataFrame(pdf.astype({"k": "int64"}))
    encoded, dictionary = dictionary_encode(sdf, "s")
    d = dictionary.collect()
    # codes are dense 0..card-1 in sort order
    assert sorted(r.code for r in d) == list(range(len(d)))
    assert [r.s for r in sorted(d, key=lambda r: r.code)] == sorted(r.s for r in d)
    back = dictionary_decode(encoded, dictionary)
    assert {(r.i, r.s) for r in back.collect()} == set(zip(pdf["i"], pdf["s"]))


@given(rows=frames)
@SETTINGS
def test_stratified_sample_subset_and_deterministic(spark, rows):
    from arrow_spark.llm.corpus import stratified_sample

    pdf = pd.DataFrame(rows, columns=["doc_id", "v", "lang"]).drop(columns=["v"])
    pdf = pdf.drop_duplicates("doc_id")
    sdf = spark.createDataFrame(pdf.astype({"doc_id": "int64"}))
    kept = stratified_sample(sdf, {}, default_pct=50, strata_col="lang")
    ids = {r.doc_id for r in kept.collect()}
    assert ids <= set(pdf["doc_id"])  # sample ⊆ population
    again = {r.doc_id for r in stratified_sample(sdf, {}, default_pct=50, strata_col="lang").collect()}
    assert ids == again
    none_kept = stratified_sample(sdf, {}, default_pct=0, strata_col="lang").count()
    all_kept = stratified_sample(sdf, {}, default_pct=100, strata_col="lang").count()
    assert none_kept == 0 and all_kept == len(pdf)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FA1), max_size=24
        ),
        min_size=1,
        max_size=40,
        unique=True,
    ),
    st.integers(min_value=0, max_value=7),
)
def test_portable_hash_cross_engine_equality(spark, strings, seed):
    """functions/portable_hash.portable_hash64 must agree byte-for-byte
    with its DuckDB SQL twin on arbitrary unicode, including the sliced
    multi-slot scheme the sketches use."""
    from arrow_spark.functions.portable_hash import (
        portable_hash64,
        portable_hash64_sql,
    )

    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got = {
        r.s: (r.h, r.slot)
        for r in df.select(
            "s",
            portable_hash64(F.col("s"), seed).alias("h"),
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit("0:"), F.col("s"))), 9, 8
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(4096),
            ).alias("slot"),
        ).collect()
    }
    con = duckdb.connect()
    for s in strings:
        h, slot = con.execute(
            f"SELECT {portable_hash64_sql('?', seed)},"
            "('0x' || substr(md5('0:' || ?), 9, 8))::BIGINT % 4096",
            [s, s],
        ).fetchone()
        assert got[s] == (h, slot), s


int_groups = st.lists(
    st.tuples(st.integers(min_value=0, max_value=3),
              st.integers(min_value=-(2**20), max_value=2**20)),
    min_size=2, max_size=50,
)


@given(rows=int_groups)
@SETTINGS
def test_mad_outliers_match_numpy(spark, rows):
    import numpy as np

    from arrow_spark.operators.outliers import mad_outliers

    df = spark.createDataFrame(
        [(k, i, v) for i, (k, v) in enumerate(rows)], "k long, i long, x long"
    )
    got = {(r["k"], r["i"]): r for r in mad_outliers(df, ["k"], "x").collect()}
    by_k: dict = {}
    for i, (k, v) in enumerate(rows):
        by_k.setdefault(k, []).append((i, v))
    for k, items in by_k.items():
        vals = np.array([v for _, v in items], dtype=float)
        med = float(np.median(vals))
        mad = float(np.median(np.abs(vals - med)))
        for i, v in items:
            r = got[(k, i)]
            assert r["median"] == med and r["mad"] == mad
            assert r["is_outlier"] == (abs(v - med) > 3.0 * 1.4826 * mad)


@given(
    pred=st.sets(st.tuples(st.integers(0, 20), st.integers(0, 20)), max_size=30),
    truth=st.sets(st.tuples(st.integers(0, 20), st.integers(0, 20)), max_size=30),
)
@SETTINGS
def test_pair_set_metrics_match_python_sets(spark, pred, truth):
    from arrow_spark.llm.dedup import pair_set_metrics

    def canon(pairs):
        return {(min(a, b), max(a, b)) for a, b in pairs}

    def df_of(pairs):
        rows = list(pairs) or [(None, None)]
        d = spark.createDataFrame(rows, "id_a int, id_b int")
        return d.where(F.col("id_a").isNotNull()) if not pairs else d

    r = pair_set_metrics(df_of(pred), df_of(truth)).collect()[0]
    p, t = canon(pred), canon(truth)
    assert (r["tp"], r["fp"], r["fn"]) == (len(p & t), len(p - t), len(t - p))


@given(rows=int_groups)
@SETTINGS
def test_quantile_transform_matches_pandas_pct_rank(spark, rows):
    from arrow_spark.operators.quantile_transform import quantile_transform

    df = spark.createDataFrame(
        [(i, v) for i, (_, v) in enumerate(rows)], "id long, a long"
    )
    got = {
        r["id"]: r["q"]
        for r in quantile_transform(df, ["id"], ["a"]).collect()
    }
    vals = pd.Series([v for _, v in rows], dtype="float64")
    # SQL percent_rank = (min_rank - 1) / (n - 1); ties share the rank
    want = ((vals.rank(method="min") - 1) / (len(vals) - 1)) if len(vals) > 1 \
        else pd.Series([0.0] * len(vals))
    for i in range(len(rows)):
        assert got[i] == want.iloc[i]


@given(
    events=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 40)),  # (user, day)
        min_size=1, max_size=60,
    )
)
@SETTINGS
def test_cohort_retention_matches_python(spark, events):
    from datetime import datetime, timedelta

    from arrow_spark.operators.cohorts import cohort_retention

    base_dt = datetime(2024, 1, 1)
    rows = [(u, base_dt + timedelta(days=d)) for u, d in events]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {(r["cohort_p"], r["offset"]): (r["n_active"], r["cohort_size"])
           for r in cohort_retention(df).collect()}
    # python reference on integer week buckets
    epoch = datetime(1970, 1, 1)
    pa = {(u, int((base_dt + timedelta(days=d) - epoch).total_seconds() // 604800))
          for u, d in events}
    cohort = {}
    for u, p in pa:
        cohort[u] = min(p, cohort.get(u, p))
    want: dict = {}
    for u, p in pa:
        key = (cohort[u], p - cohort[u])
        want.setdefault(key, set()).add(u)
    sizes: dict = {}
    for u, c in cohort.items():
        sizes[c] = sizes.get(c, 0) + 1
    want2 = {k: (len(v), sizes[k[0]]) for k, v in want.items()}
    assert got == want2


pair_frames = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1),   # group
        st.integers(min_value=0, max_value=6),   # x (small domain, ties)
        st.integers(min_value=0, max_value=6),   # y
    ),
    min_size=2,
    max_size=60,
)


def _avg_ranks(vals):
    # tie-average ranks, 1-based
    s = sorted(range(len(vals)), key=lambda i: vals[i])
    ranks = [0.0] * len(vals)
    i = 0
    while i < len(s):
        j = i
        while j + 1 < len(s) and vals[s[j + 1]] == vals[s[i]]:
            j += 1
        r = (i + j) / 2 + 1
        for k in range(i, j + 1):
            ranks[s[k]] = r
        i = j + 1
    return ranks


@given(rows=pair_frames)
@SETTINGS
def test_spearman_matches_brute_force_property(spark, rows):
    from arrow_spark.operators.stats_tests import spearman_corr

    sdf = spark.createDataFrame(rows, "g long, x long, y long")
    got = {r["g"]: r for r in spearman_corr(sdf, "g", "x", "y").collect()}
    by_g = {}
    for g, x, y in rows:
        by_g.setdefault(g, []).append((x, y))
    for g, pairs in by_g.items():
        rx = _avg_ranks([p[0] for p in pairs])
        ry = _avg_ranks([p[1] for p in pairs])
        n = len(pairs)
        mx, my = sum(rx) / n, sum(ry) / n
        cov = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
        vx = sum((a - mx) ** 2 for a in rx)
        vy = sum((b - my) ** 2 for b in ry)
        assert got[g]["n_pairs"] == n
        if vx == 0 or vy == 0:
            assert got[g]["rho"] is None
        else:
            want = cov / math.sqrt(vx * vy)
            assert got[g]["rho"] == pytest.approx(want, abs=1e-9)


gq_frames = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),
        st.integers(min_value=-50, max_value=50),
    ),
    min_size=1,
    max_size=80,
)


@given(rows=gq_frames)
@SETTINGS
def test_grouped_quantiles_match_brute_force_property(spark, rows):
    from arrow_spark.operators.quantiles import exact_quantiles_grouped

    sdf = spark.createDataFrame(rows, "g long, v long")
    qs = [1, 250, 500, 999, 1000]
    out = exact_quantiles_grouped(sdf, "g", "v", qs, n_buckets=8)
    got = {(r["g"], r["q_mille"]): (r["rank"], r["value"]) for r in out.collect()}
    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vals in by_g.items():
        s = sorted(vals)
        for q in qs:
            k = math.ceil(q * len(s) / 1000)
            assert got[(g, q)] == (k, s[k - 1]), (g, q)
    assert len(got) == len(by_g) * len(qs)
