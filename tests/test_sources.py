"""Source/sink layer tests: Arrow IPC round-trip, partitioned dataset
write + Hive-partition read/pruning (SURVEY §2.3)."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from arrow_spark.catalog import table
from arrow_spark.sources import read_dataset, read_ipc, write_dataset, write_ipc


def test_ipc_round_trip(spark, sf_dir, tmp_path):
    src = table(spark, sf_dir, "nation")
    out = str(tmp_path / "nation_ipc")
    write_ipc(src, out)
    files = os.listdir(out)
    assert files and all(f.endswith(".arrow") for f in files)
    back = read_ipc(spark, out)
    assert back.count() == src.count()
    assert set(back.columns) == set(src.columns)
    a = {r.n_nationkey: r.n_name for r in src.collect()}
    b = {r.n_nationkey: r.n_name for r in back.collect()}
    assert a == b


def test_ipc_round_trip_preserves_types(spark, sf_dir, tmp_path):
    src = table(spark, sf_dir, "lineitem").limit(100)
    out = str(tmp_path / "lineitem_ipc")
    write_ipc(src, out, compression=None)
    back = read_ipc(spark, out)
    assert dict(back.dtypes) == dict(src.dtypes)
    assert back.count() == 100


def test_partitioned_dataset_write_and_prune(spark, sf_dir, tmp_path):
    src = table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_by_status")
    write_dataset(src, out, partition_by=["o_orderstatus"])
    statuses = [
        d.split("=")[1] for d in os.listdir(out) if d.startswith("o_orderstatus=")
    ]
    assert len(statuses) >= 2  # Hive layout materialized

    back = read_dataset(spark, out)
    assert back.count() == src.count()
    one = back.filter(F.col("o_orderstatus") == statuses[0])
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan  # partition pruning reached the scan
    expected = src.filter(F.col("o_orderstatus") == statuses[0]).count()
    assert one.count() == expected


def test_csv_json_round_trip(spark, sf_dir, tmp_path):
    src = table(spark, sf_dir, "region")
    csv_out = str(tmp_path / "region_csv")
    write_dataset(src, csv_out, fmt="csv", header="true")
    back = read_dataset(spark, csv_out, fmt="csv")
    assert back.count() == src.count()
    json_out = str(tmp_path / "region_json")
    write_dataset(src, json_out, fmt="json")
    backj = read_dataset(spark, json_out, fmt="json")
    assert backj.count() == src.count()


def test_orc_round_trip(spark, sf_dir, tmp_path):
    src = table(spark, sf_dir, "supplier")
    out = str(tmp_path / "supplier_orc")
    write_dataset(src, out, fmt="orc")
    back = read_dataset(spark, out, fmt="orc")
    assert back.count() == src.count()
    assert dict(back.dtypes) == dict(src.dtypes)


def test_parquet_pushdown_reaches_scan(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    q = l.filter(F.col("l_quantity") > 45).select("l_orderkey", "l_quantity")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "GreaterThan(l_quantity" in plan
    assert "ReadSchema" in plan and "l_extendedprice" not in plan.split("ReadSchema")[1][:200]


def test_ipc_intra_file_split_plan(spark, sf_dir, tmp_path):
    import pyarrow as pa
    import pyarrow.ipc as ipc

    from arrow_spark.sources.ipc import _plan_splits

    src = table(spark, sf_dir, "orders").limit(400).toPandas()
    t = pa.Table.from_pandas(src, preserve_index=False)
    p = str(tmp_path / "one_big.arrow")
    with ipc.new_file(p, t.schema) as w:
        for b in t.to_batches(max_chunksize=25):  # 16 record batches
            w.write_batch(b)
    units = _plan_splits([p], target_tasks=8)
    assert len(units) == 8  # one big file fans out, not one task
    assert sorted(units) == units and units[0][1] == 0 and units[-1][2] == 16
    covered = sum(e - s for _, s, e in units)
    assert covered == 16
    back = read_ipc(spark, p)
    assert back.count() == 400
    assert back.rdd.getNumPartitions() > 1


def test_ipc_partitioned_write_read(spark, sf_dir, tmp_path):
    import os

    src = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    out = str(tmp_path / "orders_part")
    write_ipc(src, out, partition_by=["o_orderpriority"])
    dirs = sorted(d for d in os.listdir(out) if "=" in d)
    assert all(d.startswith("o_orderpriority=") for d in dirs) and len(dirs) >= 2
    back = read_ipc(spark, out)
    assert set(back.columns) == {"o_orderkey", "o_totalprice", "o_orderpriority"}
    assert back.count() == src.count()
    # partition column survives as the hive dir value (string-typed)
    want = {r.o_orderpriority for r in src.select("o_orderpriority").distinct().collect()}
    got = {r.o_orderpriority for r in back.select("o_orderpriority").distinct().collect()}
    assert got == want


def test_partitioned_arrow_ipc_via_dataset_facade(spark, sf_dir, tmp_path):
    # VERDICT r1 wiring gap: write_dataset(fmt="arrow", partition_by=...)
    # now routes through ipc.write_ipc's hive-partitioned writer.
    src = table(spark, sf_dir, "orders").limit(500)
    out = str(tmp_path / "orders_ipc_by_status")
    write_dataset(src, out, fmt="arrow", partition_by=["o_orderstatus"])
    statuses = [
        d.split("=")[1] for d in os.listdir(out) if d.startswith("o_orderstatus=")
    ]
    assert len(statuses) >= 2  # Hive layout materialized
    back = read_dataset(spark, out, fmt="arrow")
    assert back.count() == 500
    one = back.filter(F.col("o_orderstatus") == statuses[0]).count()
    assert one == src.filter(F.col("o_orderstatus") == statuses[0]).count()


def test_ipc_schema_evolution_unifies_fragments(spark, tmp_path):
    """late files add a column; early batches pad it with nulls (Arrow
    dataset-style fragment schema unification)."""
    import pyarrow as pa
    import pyarrow.ipc as ipc

    from arrow_spark.sources.ipc import read_ipc

    d = tmp_path / "evolved"
    d.mkdir()
    old = pa.table({"id": pa.array([1, 2], pa.int64())})
    new = pa.table(
        {"id": pa.array([3], pa.int64()), "score": pa.array([9.5], pa.float64())}
    )
    for name, t in (("a.arrow", old), ("b.arrow", new)):
        with ipc.new_file(str(d / name), t.schema) as w:
            w.write_table(t)
    df = read_ipc(spark, str(d))
    rows = {r["id"]: r["score"] for r in df.collect()}
    assert rows == {1: None, 2: None, 3: 9.5}
    assert dict(df.dtypes)["score"] == "double"


def test_ipc_dictionary_encoded_write_round_trip(spark, tmp_path):
    """dict_encode columns hit the wire as DICTIONARY (footer-visible)
    and decode back transparently on read."""
    import pyarrow as pa
    import pyarrow.ipc as ipc

    from arrow_spark.sources.ipc import read_ipc, write_ipc

    df = spark.range(1000).selectExpr(
        "id", "CASE WHEN id % 3 = 0 THEN 'red' WHEN id % 3 = 1 THEN 'green' ELSE 'blue' END AS color"
    )
    out = str(tmp_path / "dictenc")
    write_ipc(df.coalesce(1), out, dict_encode=["color"])
    import glob

    (f,) = glob.glob(out + "/*.arrow")
    with ipc.open_file(f) as r:
        assert pa.types.is_dictionary(r.schema.field("color").type)
    got = read_ipc(spark, out)
    assert dict(got.dtypes)["color"] == "string"
    assert got.count() == 1000
    assert got.where("color = 'red'").count() == 334


def test_filesystem_scheme_uris_pass_through(spark, sf_dir, tmp_path):
    """Filesystem support is inherited from Hadoop's FileSystem registry
    (s3a/gs/abfss/hdfs resolve by URI scheme at runtime); the only
    scheme testable in-container is file://, which pins the mechanism:
    scheme-qualified URIs flow through read_dataset/write_dataset
    untouched."""
    from arrow_spark.sources.dataset import read_dataset, write_dataset

    src = read_dataset(spark, f"file://{sf_dir}/region.parquet")
    out_uri = f"file://{tmp_path}/region_out"
    write_dataset(src, out_uri, fmt="parquet")
    back = read_dataset(spark, out_uri)
    assert sorted(r.r_name for r in back.collect()) == sorted(
        r.r_name for r in src.collect()
    )
