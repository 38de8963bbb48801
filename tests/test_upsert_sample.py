"""merge_upsert CDC semantics + weighted_sample determinism."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from arrow_spark.llm.corpus import weighted_sample
from arrow_spark.operators.upsert import merge_upsert


@pytest.fixture(scope="module")
def snapshot(spark):
    base = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "b", "c"],
                "seq": [1, 1, 1],
                "v": [10, 20, 30],
                "deleted": [False, False, False],
            }
        )
    )
    updates = spark.createDataFrame(
        pd.DataFrame(
            {
                # a: newer version; b: tombstone; c: STALE update (older seq);
                # d: brand-new key; e: insert-then-delete within the feed
                "k": ["a", "b", "c", "d", "e", "e"],
                "seq": [2, 2, 0, 2, 2, 3],
                "v": [11, 0, 99, 40, 50, 0],
                "deleted": [False, True, False, False, False, True],
            }
        )
    )
    out = merge_upsert(base, updates, ["k"], "seq", "deleted")
    return {r["k"]: r for r in out.collect()}


def test_latest_version_wins(snapshot):
    assert snapshot["a"]["v"] == 11


def test_tombstone_removes_key(snapshot):
    assert "b" not in snapshot and "e" not in snapshot


def test_stale_update_ignored(snapshot):
    assert snapshot["c"]["v"] == 30


def test_new_key_inserted(snapshot):
    assert snapshot["d"]["v"] == 40


def test_seq_tie_prefers_update_side(spark):
    base = spark.createDataFrame(pd.DataFrame({"k": ["a"], "seq": [1], "v": [1]}))
    upd = spark.createDataFrame(pd.DataFrame({"k": ["a"], "seq": [1], "v": [2]}))
    (row,) = merge_upsert(base, upd, ["k"], "seq").collect()
    assert row["v"] == 2


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(200), "w": [1 + (i % 7) for i in range(200)]})
    )


def test_weighted_sample_is_deterministic(docs):
    a = [r["doc_id"] for r in weighted_sample(docs, "w", 20).collect()]
    b = [r["doc_id"] for r in weighted_sample(docs, "w", 20).collect()]
    assert a == b and len(a) == 20 and len(set(a)) == 20


def test_weighted_sample_matches_formula(docs):
    # recompute the winner set driver-side from the same md5 uniforms
    import hashlib

    def prio(doc_id, w):
        x = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:6], 16)
        return math.log((x + 0.5) / (1 << 24)) / w

    want = sorted(
        ((prio(i, 1 + (i % 7)), -i) for i in range(200)), reverse=True
    )[:20]
    want_ids = sorted(-neg for _, neg in want)
    got = sorted(r["doc_id"] for r in weighted_sample(docs, "w", 20).collect())
    assert got == want_ids


def test_heavier_weight_raises_priority(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 1], "w": [1, 10], "tag": [0, 1]})
    )
    out = weighted_sample(df.select("doc_id", "w"), "w", 2).collect()
    by_w = {r["w"]: r["priority"] for r in out}
    assert by_w[10] > by_w[1]  # same uniform, larger weight → larger ln(u)/w


def test_scd2_intervals_folds_and_orders(spark):
    from arrow_spark.operators.upsert import scd2_intervals
    import datetime as dt

    t = lambda h: dt.datetime(2024, 1, 1, h)
    changes = spark.createDataFrame(
        [
            (1, t(1), "bronze"),
            (1, t(2), "bronze"),   # no-op repeat: must extend, not split
            (1, t(3), "gold"),
            (1, t(4), "bronze"),   # back to a previous value: NEW interval
            (2, t(5), "silver"),
        ],
        "user_id long, ts timestamp, state string",
    )
    rows = sorted(
        (r.user_id, r.state, r.valid_from.hour,
         r.valid_to.hour if r.valid_to else None, r.is_current)
        for r in scd2_intervals(changes, "user_id", "ts", ["state"]).collect()
    )
    assert rows == [
        (1, "bronze", 1, 3, False),
        (1, "bronze", 4, None, True),
        (1, "gold", 3, 4, False),
        (2, "silver", 5, None, True),
    ]
