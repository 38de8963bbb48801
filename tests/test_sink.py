"""Idempotent epoch sink: replay safety, uncommitted invisibility, and
end-to-end exactly-once over a live multi-epoch stream."""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_spark.catalog import table
from arrow_spark.streaming.sink import (
    committed_epochs,
    idempotent_sink,
    read_committed,
    write_epoch,
)


def test_replayed_epoch_does_not_duplicate(spark, tmp_path):
    base = str(tmp_path / "sink")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    write_epoch(df, base, 0)
    write_epoch(df, base, 0)  # replay after simulated failure
    write_epoch(spark.createDataFrame([(3, "c")], "k long, v string"), base, 1)
    out = read_committed(spark, base)
    assert sorted(map(tuple, out.collect())) == [(1, "a"), (2, "b"), (3, "c")]
    assert committed_epochs(spark, base) == [0, 1]


def test_uncommitted_epoch_invisible(spark, tmp_path):
    base = str(tmp_path / "sink2")
    write_epoch(spark.createDataFrame([(1,)], "k long"), base, 0)
    # crashed write: data present, marker absent
    spark.createDataFrame([(99,)], "k long").write.parquet(f"{base}/epoch=1")
    assert committed_epochs(spark, base) == [0]
    assert [r["k"] for r in read_committed(spark, base).collect()] == [1]


def test_stream_foreach_batch_exactly_once(spark, sf_dir, tmp_path):
    events = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    src = str(tmp_path / "src")
    events.write.mode("overwrite").parquet(src)
    static = spark.read.parquet(src)

    base = str(tmp_path / "out")
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(idempotent_sink(base))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    assert len(committed_epochs(spark, base)) >= 1
    got = read_committed(spark, base)
    assert got.count() == static.count()
    assert got.agg(F.sum("event_id")).collect() == static.agg(F.sum("event_id")).collect()


def test_read_as_of_time_travel(spark, tmp_path):
    from arrow_spark.streaming.sink import read_as_of, write_epoch

    base = str(tmp_path / "tt_sink")
    for epoch, vals in ((0, [1, 2]), (1, [3]), (2, [4, 5])):
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        write_epoch(df, base, epoch)
    as_of_0 = sorted(r["v"] for r in read_as_of(spark, base, 0).collect())
    as_of_1 = sorted(r["v"] for r in read_as_of(spark, base, 1).collect())
    as_of_9 = sorted(r["v"] for r in read_as_of(spark, base, 9).collect())
    assert as_of_0 == [1, 2]
    assert as_of_1 == [1, 2, 3]
    assert as_of_9 == [1, 2, 3, 4, 5]


def test_read_as_of_ignores_uncommitted_and_prehistory(spark, tmp_path):
    import os

    import pytest

    from arrow_spark.streaming.sink import read_as_of, write_epoch

    base = str(tmp_path / "tt_sink2")
    write_epoch(spark.createDataFrame([(1,)], "v long"), base, 5)
    # a crashed (marker-less) later epoch must stay invisible
    os.makedirs(f"{base}/epoch=6", exist_ok=True)
    spark.createDataFrame([(99,)], "v long").write.mode("overwrite").parquet(
        f"{base}/epoch=6"
    )
    crashed = f"{base}/epoch=6/_COMMITTED"
    assert not os.path.exists(crashed)
    got = [r["v"] for r in read_as_of(spark, base, 7).collect()]
    assert got == [1]
    with pytest.raises(FileNotFoundError):
        read_as_of(spark, base, 4)  # before the first commit
