"""Dataset/Scanner/Fragment object facade: discovery, projection +
filter pushdown, positional take under file order, fragment reads."""

from __future__ import annotations

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from arrow_spark.sources.dataset_facade import dataset


@pytest.fixture(scope="module")
def ds_dir(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("facade_ds"))
    df = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).alias("part"),
        (F.col("id") * 2).cast("double").alias("v"),
    )
    df.write.mode("overwrite").partitionBy("part").parquet(root)
    return root


def test_dataset_schema_and_files(spark, ds_dir):
    ds = dataset(spark, ds_dir)
    assert set(ds.schema.names) == {"k", "v", "part"}
    files = ds.files
    assert len(files) >= 4 and all(f.endswith(".parquet") for f in files)


def test_to_table_projection_and_filter(spark, ds_dir):
    ds = dataset(spark, ds_dir)
    tbl = ds.to_table(columns=["k", "v"], filter="part = 2 AND k < 50")
    assert tbl.column_names == ["k", "v"]
    ks = sorted(tbl.column("k").to_pylist())
    assert ks == [i for i in range(50) if i % 4 == 2]


def test_filter_prunes_partitions(spark, ds_dir):
    ds = dataset(spark, ds_dir)
    pruned = ds.to_df(filter="part = 1")
    # partition pruning: the plan carries the partition filter and only
    # part=1 files contribute scanned rows
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "part" in plan
    touched = {
        r[0]
        for r in pruned.select(F.col("_metadata.file_path")).distinct().collect()
    }
    assert touched and all("part=1" in f for f in touched)


def test_count_rows_and_head(spark, ds_dir):
    ds = dataset(spark, ds_dir)
    assert ds.count_rows() == 100
    assert ds.count_rows(filter="k >= 90") == 10
    h = ds.head(7, columns=["k"])
    assert h.num_rows == 7


def test_take_positional_file_order(spark, ds_dir):
    ds = dataset(spark, ds_dir)
    # dataset order = (file path, row index): position 0 is the first
    # row of the lexicographically-first file
    whole = ds.take(list(range(ds.count_rows())))
    ks = whole.column("k").to_pylist()
    some = ds.take([0, 5, 17])
    assert some.column("k").to_pylist() == [ks[0], ks[5], ks[17]]
    assert some.num_rows == 3


def test_scanner_batches_and_schema(spark, ds_dir):
    ds = dataset(spark, ds_dir)
    sc = ds.scanner(columns=["k"], batch_size=16)
    assert sc.projected_schema.names == ["k"]
    batches = list(sc.to_batches())
    assert sum(b.num_rows for b in batches) == 100
    assert all(b.num_rows <= 16 for b in batches)
    assert sc.count_rows() == 100


def test_fragments_cover_dataset(spark, ds_dir):
    ds = dataset(spark, ds_dir)
    frags = ds.get_fragments()
    assert [f.path for f in frags] == ds.files
    total = sum(f.count_rows() for f in frags)
    assert total == 100
    # a fragment read keeps the hive partition column via basePath
    t = frags[0].to_table()
    assert "part" in t.column_names
    # per-fragment filter
    assert frags[0].count_rows("k < 0") == 0


def test_non_parquet_take_raises(spark, tmp_path):
    p = str(tmp_path / "csvds")
    spark.range(5).toDF("a").write.mode("overwrite").csv(p, header=True)
    ds = dataset(spark, p, fmt="csv")
    with pytest.raises(NotImplementedError):
        ds.take([0])
    assert ds.count_rows() == 5


def test_scanner_to_table_matches_spark(spark, ds_dir):
    ds = dataset(spark, ds_dir)
    tbl = ds.scanner(filter="part = 3").to_table()
    want = spark.read.parquet(ds_dir).where("part = 3").count()
    assert tbl.num_rows == want
    assert isinstance(tbl, pa.Table)


def test_existing_data_behavior_delete_matching(spark, tmp_path):
    """delete_matching replaces ONLY partitions receiving new data
    (FileSystemDatasetWriteOptions::existing_data_behavior,
    dataset/file_base.h kDeleteMatchingPartitions)."""
    from arrow_spark.sources.dataset import write_dataset

    p = str(tmp_path / "edb")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, part string")
    write_dataset(base, p, partition_by=["part"])
    patch = spark.createDataFrame([(9, "b")], "k long, part string")
    write_dataset(
        patch, p, partition_by=["part"], existing_data_behavior="delete_matching"
    )
    got = {(r.k, r.part) for r in spark.read.parquet(p).collect()}
    assert got == {(1, "a"), (9, "b")}
    # the conf is restored after the write
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static").lower()
        != "dynamic"
    )


def test_existing_data_behavior_error_and_append(spark, tmp_path):
    from arrow_spark.sources.dataset import write_dataset

    p = str(tmp_path / "edb2")
    df = spark.range(3).toDF("a")
    write_dataset(df, p, existing_data_behavior="overwrite_or_ignore")
    write_dataset(df, p, existing_data_behavior="overwrite_or_ignore")
    assert spark.read.parquet(p).count() == 6
    with pytest.raises(Exception):
        write_dataset(df, p, existing_data_behavior="error")
    with pytest.raises(ValueError):
        write_dataset(df, p, existing_data_behavior="bogus")
