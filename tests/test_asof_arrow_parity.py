"""Cross-validate the as-of join against the REFERENCE ENGINE itself:
pyarrow's Acero asofjoin (`Table.join_asof`, python/pyarrow/acero.py —
the binding over cpp/src/arrow/acero/asof_join_node.cc) runs in-process
on the same randomized inputs as `operators/asof.py::asof_join_arrow`,
and every cell must match exactly.

This is the strongest parity check available in-container: not our
reading of the reference semantics (signed tolerance, by-keys,
left-outer survival, exact-match admission) but the reference binary's
own answer. Right-side (by, on) pairs are generated UNIQUE so the
matched VALUE is uniquely defined and no tie-break contract leaks into
the comparison; left rows may duplicate freely.
"""

from __future__ import annotations

import random

import pyarrow as pa
import pytest

from arrow_spark.operators.asof import asof_join, asof_join_arrow, asof_join_multi
from arrow_spark.operators.asof import _signed_to_direction


def _gen(seed: int, two_by: bool):
    rng = random.Random(seed)
    keys = ["a", "b", "c", "left_only", "right_only"]
    subs = [1, 2] if two_by else [0]
    left_rows, right_seen = [], {}
    for _ in range(120):
        k = rng.choice(keys[:4])  # left never sees right_only
        s = rng.choice(subs)
        left_rows.append((k, s, rng.randint(0, 100), rng.randint(0, 999)))
    for _ in range(200):
        k = rng.choice(keys[1:])  # right never sees 'a' sometimes
        s = rng.choice(subs)
        on = rng.randint(0, 100)
        right_seen.setdefault((k, s, on), rng.randint(0, 999))
    right_rows = [(k, s, on, w) for (k, s, on), w in right_seen.items()]
    return left_rows, right_rows


def _arrow_tables(left_rows, right_rows, two_by: bool, wname: str = "w"):
    def cols(rows, vname):
        out = {
            "k": [r[0] for r in rows],
            "on": pa.array([r[2] for r in rows], pa.int64()),
            vname: pa.array([r[3] for r in rows], pa.int64()),
        }
        if two_by:
            out["s"] = pa.array([r[1] for r in rows], pa.int64())
        return pa.table(out)

    lt = cols(left_rows, "v").sort_by("on")
    rt = cols(right_rows, wname).sort_by("on")
    return lt, rt


def _spark_frames(spark, left_rows, right_rows, two_by: bool, wname: str = "w"):
    if two_by:
        l = spark.createDataFrame(left_rows, "k string, s long, on long, v long")
        r = spark.createDataFrame(
            right_rows, f"k string, s long, on long, {wname} long"
        )
    else:
        l = spark.createDataFrame(
            [(k, on, v) for k, _, on, v in left_rows], "k string, on long, v long"
        )
        r = spark.createDataFrame(
            [(k, on, w) for k, _, on, w in right_rows],
            f"k string, on long, {wname} long",
        )
    return l, r


def _normalize_engine(df, cols):
    rows = [tuple(row[c] for c in cols) for row in df.collect()]
    return sorted(rows, key=lambda t: tuple((x is None, x) for x in t))


def _normalize_arrow(tbl, cols):
    rows = [tuple(d.get(c) for c in cols) for d in tbl.to_pylist()]
    return sorted(rows, key=lambda t: tuple((x is None, x) for x in t))


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("tolerance", [-7, 0, 3])
@pytest.mark.parametrize("two_by", [False, True])
def test_asof_join_matches_pyarrow_acero(spark, seed, tolerance, two_by):
    left_rows, right_rows = _gen(seed, two_by)
    lt, rt = _arrow_tables(left_rows, right_rows, two_by)
    by = ["k", "s"] if two_by else ["k"]
    expected_tbl = lt.join_asof(rt, on="on", by=by, tolerance=tolerance)
    cols = (["k", "s"] if two_by else ["k"]) + ["on", "v", "w"]
    expected = _normalize_arrow(expected_tbl, cols)
    assert any(x[-1] is not None for x in expected), "fixture must produce matches"
    assert len(expected) == len(left_rows), "left-outer: every left row survives"

    l, r = _spark_frames(spark, left_rows, right_rows, two_by)
    # range strategy (the tolerance-bounded fast path, default)
    got_range = _normalize_engine(
        asof_join_arrow(l, r, on="on", by=by, tolerance=tolerance), cols
    )
    assert got_range == expected
    # merge strategy (cogrouped vectorized pandas path)
    direction, tol = _signed_to_direction(tolerance)
    got_merge = _normalize_engine(
        asof_join(
            l, r, on="on", by=by, tolerance=tol, direction=direction,
            strategy="merge",
        ),
        cols,
    )
    assert got_merge == expected


def test_asof_join_multi_matches_pyarrow_acero_fold(spark):
    """Multi-right parity: Arrow's asofjoin takes one left + a vector of
    rights with one shared tolerance, every right matching the LEFT's on
    key independently — equivalent to folding pairwise joins on the left
    spine, which is how both sides are evaluated here."""
    left_rows, right1 = _gen(7, False)
    _, right2 = _gen(8, False)
    lt, rt1 = _arrow_tables(left_rows, right1, False, "w")
    _, rt2 = _arrow_tables(left_rows, right2, False, "z")
    tolerance = -5
    expected_tbl = lt.join_asof(rt1, on="on", by=["k"], tolerance=tolerance).join_asof(
        rt2, on="on", by=["k"], tolerance=tolerance
    )
    cols = ["k", "on", "v", "w", "z"]
    expected = _normalize_arrow(expected_tbl, cols)

    l, r1 = _spark_frames(spark, left_rows, right1, False, "w")
    _, r2 = _spark_frames(spark, left_rows, right2, False, "z")
    direction, tol = _signed_to_direction(tolerance)
    got = _normalize_engine(
        asof_join_multi(
            l, [r1, r2], on="on", by=["k"], tolerance=tol, direction=direction
        ),
        cols,
    )
    assert got == expected
