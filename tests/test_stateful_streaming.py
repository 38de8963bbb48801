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
