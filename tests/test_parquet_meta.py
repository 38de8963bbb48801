"""parquet_metadata relation: cross-checked against DuckDB's
parquet_metadata() on the same file, plus multi-file distribution."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from arrow_spark.sources.parquet_meta import parquet_metadata

COMPARE_COLS = [
    "row_group_id",
    "path_in_schema",
    "num_values",
    "null_count",
    "min_value",
    "max_value",
    "total_compressed_size",
    "total_uncompressed_size",
]


def test_matches_duckdb_parquet_metadata(spark, sf_dir):
    path = f"{sf_dir}/orders.parquet"
    got = {
        (r["row_group_id"], r["path_in_schema"]): r
        for r in parquet_metadata(spark, path).collect()
    }
    con = duckdb.connect()
    want = con.execute(
        """SELECT row_group_id, path_in_schema, num_values,
                  stats_null_count, stats_min_value, stats_max_value,
                  total_compressed_size, total_uncompressed_size
           FROM parquet_metadata(?)""",
        [path],
    ).fetchall()
    assert len(want) == len(got) > 0
    for rg, col, nv, nulls, mn, mx, csize, usize in want:
        r = got[(rg, col)]
        assert r["num_values"] == nv
        assert r["null_count"] == nulls
        assert r["total_compressed_size"] == csize
        assert r["total_uncompressed_size"] == usize
        # duckdb renders timestamp stats with its own format; compare
        # verbatim only where both engines give plain strings/ints
        if mn is not None and not col.endswith("date"):
            assert r["min_value"] == str(mn)
            assert r["max_value"] == str(mx)


def test_multi_file_dataset_and_aggregates(spark, tmp_path):
    root = str(tmp_path / "m")
    spark.range(1000).select(
        F.col("id"), (F.col("id") % 3).alias("p")
    ).repartition(4).write.mode("overwrite").parquet(root)
    meta = parquet_metadata(spark, root)
    files = {r["file_name"] for r in meta.select("file_name").distinct().collect()}
    assert len(files) == 4
    # footer row counts reproduce the data row count without a data scan
    total = (
        meta.where(F.col("column_id") == 0)
        .agg(F.sum("row_group_num_rows"))
        .collect()[0][0]
    )
    assert total == 1000


def test_footer_stats_agree_with_data(spark, sf_dir):
    path = f"{sf_dir}/orders.parquet"
    meta = parquet_metadata(spark, path).where(
        F.col("path_in_schema") == "o_orderkey"
    )
    row = meta.agg(
        F.sum("num_values").alias("n"),
        F.min(F.col("min_value").cast("long")).alias("mn"),
        F.max(F.col("max_value").cast("long")).alias("mx"),
        F.sum("null_count").alias("nulls"),
    ).collect()[0]
    data = spark.read.parquet(path).agg(
        F.count(F.lit(1)), F.min("o_orderkey"), F.max("o_orderkey")
    ).collect()[0]
    assert (row["n"], row["mn"], row["mx"]) == tuple(data)
    assert row["nulls"] == 0
