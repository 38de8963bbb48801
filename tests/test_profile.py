"""profile_table: nulls, distincts, ranges, means, timestamp formatting,
and the approx_distinct scale path."""

from __future__ import annotations

import datetime

from arrow_spark.operators.profile import profile_table


def _rows(spark):
    ts = datetime.datetime
    return spark.createDataFrame(
        [
            (1, "a", 10.50, ts(2024, 1, 1, 12, 0, 0)),
            (2, "b", None, ts(2024, 6, 1, 0, 30, 0)),
            (3, None, 2.25, ts(2023, 12, 31, 23, 59, 59)),
            (4, "a", 7.25, None),
        ],
        "id long, s string, x double, t timestamp",
    )


def test_profile_counts_ranges_means(spark):
    p = {r["column"]: r for r in profile_table(_rows(spark)).collect()}
    assert set(p) == {"id", "s", "x", "t"}
    assert all(p[c]["n_rows"] == 4 for c in p)

    assert p["id"]["n_nulls"] == 0 and p["id"]["n_distinct"] == 4
    assert p["id"]["min_num"] == 1.0 and p["id"]["max_num"] == 4.0
    assert p["id"]["mean"] == 2.5 and p["id"]["dtype"] == "bigint"

    assert p["s"]["n_nulls"] == 1 and p["s"]["n_distinct"] == 2
    assert p["s"]["min_str"] == "a" and p["s"]["max_str"] == "b"
    assert p["s"]["min_num"] is None and p["s"]["mean"] is None

    assert p["x"]["n_nulls"] == 1
    assert p["x"]["mean"] == round((10.5 + 2.25 + 7.25) / 3, 6)

    assert p["t"]["n_nulls"] == 1
    assert p["t"]["min_str"] == "2023-12-31 23:59:59"
    assert p["t"]["max_str"] == "2024-06-01 00:30:00"


def test_profile_approx_distinct_path(spark):
    p = {
        r["column"]: r
        for r in profile_table(_rows(spark), approx_distinct=True).collect()
    }
    # HLL at this cardinality is exact
    assert p["id"]["n_distinct"] == 4 and p["s"]["n_distinct"] == 2


def test_profile_column_subset(spark):
    out = profile_table(_rows(spark), columns=["id", "x"]).collect()
    assert [r["column"] for r in out] == ["id", "x"]


def test_corr_matrix_known_values(spark):
    from arrow_spark.operators.profile import corr_matrix

    df = spark.createDataFrame(
        [(1, 2, 5, None), (2, 4, 4, None), (3, 6, 3, None), (4, 8, 2, None)],
        "a long, b long, c long, d long",
    )
    got = {
        (r.col_x, r.col_y): (r.n_pairs, r.corr)
        for r in corr_matrix(df, ["a", "b", "c", "d"], round_to=6).collect()
    }
    assert got[("a", "b")] == (4, 1.0)       # perfect positive
    assert got[("a", "c")] == (4, -1.0)      # perfect negative
    assert got[("a", "d")] == (0, None)      # all-null column → no pairs
    assert len(got) == 6
