"""take / row-index / inverse_permutation under explicit order."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from arrow_spark.operators.ordered import (
    inverse_permutation,
    take,
    with_partitioned_row_index,
    with_row_index,
)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        pd.DataFrame({"k": [10, 30, 20, 50, 40], "s": list("abcde")})
    )


def test_row_index_follows_order(df):
    out = with_row_index(df, [F.col("k").asc()]).orderBy("__row_index__").collect()
    assert [r.k for r in out] == [10, 20, 30, 40, 50]
    assert [r["__row_index__"] for r in out] == [0, 1, 2, 3, 4]


def test_take_gathers_by_position(df):
    out = take(df, [3, 0, 3], order_by=[F.col("k").asc()]).collect()
    assert [r.k for r in out] == [40, 10, 40]  # repeats preserved, order kept


def test_partitioned_row_index_is_dense(spark):
    df = spark.range(0, 1000).repartition(7)
    out = with_partitioned_row_index(df)
    idx = sorted(r["__row_index__"] for r in out.collect())
    assert idx == list(range(1000))


def test_inverse_permutation(spark):
    perm = spark.createDataFrame(
        pd.DataFrame({"i": [0, 1, 2, 3], "p": [2, 0, 3, 1]})
    )
    inv = inverse_permutation(perm, "p", "i")
    got = {r.i: r.p for r in inv.collect()}
    assert got == {2: 0, 0: 1, 3: 2, 1: 3}


def test_rle_round_trip(spark):
    import pandas as pd

    from arrow_spark.operators.encodings import run_length_decode, run_length_encode

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a"] * 6 + ["b"] * 3,
                "i": list(range(6)) + list(range(3)),
                "v": ["x", "x", None, None, "x", "y", "z", "z", "z"],
            }
        )
    )
    runs = run_length_encode(df, "v", order_by=["i"], partition_by=["k"])
    got = {(r.k, r.run_seq): (r.value, r.run_start, r.run_length) for r in runs.collect()}
    assert got == {
        ("a", 1): ("x", 0, 2),
        ("a", 2): (None, 2, 2),
        ("a", 3): ("x", 4, 1),
        ("a", 4): ("y", 5, 1),
        ("b", 1): ("z", 0, 3),
    }
    back = run_length_decode(runs, partition_by=["k"])
    assert back.count() == df.count()
    per_key = {r.k: r.n for r in back.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per_key == {"a": 6, "b": 3}


def test_dictionary_round_trip(spark):
    import pandas as pd

    from arrow_spark.operators.encodings import dictionary_decode, dictionary_encode

    df = spark.createDataFrame(
        pd.DataFrame({"i": range(6), "v": ["b", "a", "b", "c", "a", "b"]})
    )
    encoded, dictionary = dictionary_encode(df, "v")
    codes = {r.v: r.code for r in dictionary.collect()}
    assert codes == {"a": 0, "b": 1, "c": 2}  # sort-order assignment
    back = dictionary_decode(encoded, dictionary)
    assert {(r.i, r.v) for r in back.collect()} == {
        (i, v) for i, v in zip(range(6), ["b", "a", "b", "c", "a", "b"])
    }


def test_top_paths_hand_truth(spark):
    from arrow_spark.operators.sessions import top_paths

    # session 1: a b a b a -> paths a>b>a (x2), b>a>b; session 2: a b a
    rows = (
        [(1, i, v) for i, v in enumerate(["a", "b", "a", "b", "a"])]
        + [(2, i, v) for i, v in enumerate(["a", "b", "a"])]
    )
    df = spark.createDataFrame(rows, "s long, o long, v string")
    got = {
        r["path"]: (r["rank"], r["n_paths"])
        for r in top_paths(df, "s", "o", "v", path_len=3, k=10).collect()
    }
    assert got["a>b>a"] == (1, 3)
    assert got["b>a>b"] == (2, 1)


def test_top_paths_short_sessions_emit_nothing(spark):
    from arrow_spark.operators.sessions import top_paths

    df = spark.createDataFrame([(1, 0, "a"), (1, 1, "b")], "s long, o long, v string")
    assert top_paths(df, "s", "o", "v", path_len=3).count() == 0


def test_top_paths_tie_breaks_lexicographic(spark):
    from arrow_spark.operators.sessions import top_paths

    rows = [(1, i, v) for i, v in enumerate(["z", "y", "x"])] + [
        (2, i, v) for i, v in enumerate(["a", "b", "c"])
    ]
    df = spark.createDataFrame(rows, "s long, o long, v string")
    got = [
        (r["rank"], r["path"])
        for r in top_paths(df, "s", "o", "v", path_len=3, k=2).collect()
    ]
    assert got == [(1, "a>b>c"), (2, "z>y>x")]
