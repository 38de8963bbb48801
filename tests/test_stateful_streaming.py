"""Custom stateful streaming operator: state accumulates across
micro-batches and converges to the batch aggregate."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from arrow_spark.catalog import table
from arrow_spark.streaming.stateful import running_stats_batch, running_stats_stream


def test_stateful_stream_converges_to_batch(spark, sf_dir, tmp_path):
    src = str(tmp_path / "stateful_src")
    # two files + maxFilesPerTrigger=1 → a micro-batch boundary exercises
    # state carry-over between batches
    full = table(spark, sf_dir, "events")
    full.where(F.col("event_id") % 2 == 0).select("user_id", "ts", "value").coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    full.where(F.col("event_id") % 2 == 1).select("user_id", "ts", "value").coalesce(1).write.mode(
        "append"
    ).parquet(src)

    static = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = running_stats_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("stateful_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(180)
    # last emitted row per key = converged state
    got_df = spark.sql(
        """
        SELECT key, n, total, max_v FROM (
          SELECT *, row_number() OVER (PARTITION BY key ORDER BY n DESC) AS rn
          FROM stateful_test
        ) WHERE rn = 1
        """
    )
    got = {r.key: (r.n, r.total, r.max_v) for r in got_df.collect()}
    want = {
        r.key: (r.n, r.total, r.max_v) for r in running_stats_batch(static).collect()
    }
    assert got == want and len(want) > 0


def test_cusum_stream_equals_batch_operator(spark, sf_dir, tmp_path):
    """The stateful streaming CUSUM must emit the identical per-row
    statistics as the batch window-extrema operator when given the same
    rows with the same fixed target — recursion ≡ closed form, across
    the micro-batch boundary."""
    from arrow_spark.operators.changepoint import cusum_changepoints
    from arrow_spark.streaming.stateful import cusum_stream

    events = (
        table(spark, sf_dir, "events")
        .select(
            "user_id", "event_id",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .where(F.col("user_id") < 6)
    )
    src = str(tmp_path / "cusum_src")
    # one ordered file: the stream then delivers rows in event order, the
    # premise under which stream ≡ batch holds exactly (out-of-order
    # arrival changes WHICH prefix each s_t sees — a semantic difference,
    # not a bug)
    events.coalesce(1).sortWithinPartitions("event_id").write.mode(
        "overwrite"
    ).parquet(src)
    static = spark.read.parquet(src)

    target, threshold = 10000.0, 25000.0
    batch = cusum_changepoints(
        static.withColumn("__t__", F.lit(target)),
        ["user_id"], "event_id", "cents",
        threshold=threshold, target_col="__t__",
    )
    want = {
        (r.user_id, r.event_id): (r.cusum_hi, r.cusum_lo, r.drift_flag)
        for r in batch.collect()
    }

    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = cusum_stream(
        stream, target=target, threshold=threshold,
        key_col="user_id", order_col="event_id", value_col="cents",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("cusum_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_cusum"))
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.key, r.event_id): (r.cusum_hi, r.cusum_lo, r.drift_flag)
        for r in spark.sql("SELECT * FROM cusum_stream_test").collect()
    }
    assert len(got) == len(want) > 0
    assert got == want
