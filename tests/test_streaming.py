"""Structured Streaming: the same windowed-agg helpers run as a real
stream (file source, availableNow trigger, memory sink) and must equal
the batch result — Spark's unified-model guarantee, verified."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from arrow_spark.catalog import table
from arrow_spark.streaming import stream_from_directory, tumbling_window_agg


def test_stream_tumbling_equals_batch(spark, sf_dir, tmp_path):
    events = table(spark, sf_dir, "events")
    src_dir = str(tmp_path / "events_stream_src")
    events.write.mode("overwrite").parquet(src_dir)
    static = spark.read.parquet(src_dir)

    aggs = [F.round(F.sum("value"), 2).alias("sum_value"), F.count(F.lit(1)).alias("n")]
    batch = tumbling_window_agg(static, "ts", "1 hour", keys=["event_type"], aggs=aggs)
    expected = {
        (r.event_type, r.window_start): (r.sum_value, r.n) for r in batch.collect()
    }

    stream = stream_from_directory(spark, src_dir, static.schema)
    out = tumbling_window_agg(
        stream, "ts", "1 hour", keys=["event_type"], aggs=aggs, watermark="2 hours"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.event_type, r.window_start): (r.sum_value, r.n)
        for r in spark.sql("SELECT * FROM tumbling_test").collect()
    }
    assert got == expected


def test_stream_interval_join_equals_batch(spark, sf_dir, tmp_path):
    from arrow_spark.streaming import interval_join, stream_from_directory

    events = table(spark, sf_dir, "events")
    src_dir = str(tmp_path / "events_ij_src")
    events.write.mode("overwrite").parquet(src_dir)
    static = spark.read.parquet(src_dir)

    def split(df):
        clicks = df.where(F.col("event_type") == "click").select(
            F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
        )
        purchases = df.where(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("purchase_ts")
        )
        return clicks, purchases

    bc, bp = split(static)
    expected = {
        (r.click_id, r.purchase_id)
        for r in interval_join(
            bc, bp, "click_ts", "purchase_ts", on=["user_id"], upper="4 hours"
        ).collect()
    }
    assert expected  # non-trivial join

    stream = stream_from_directory(spark, src_dir, static.schema)
    sc, sp = split(stream)
    out = interval_join(
        sc, sp, "click_ts", "purchase_ts", on=["user_id"], upper="4 hours",
        left_watermark="1 hour", right_watermark="1 hour",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ij_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ij_ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.click_id, r.purchase_id)
        for r in spark.sql("SELECT * FROM ij_test").collect()
    }
    assert got == expected


def test_cascade_rollup_levels_exact(spark, sf_dir):
    from arrow_spark.operators.rollup import cascade_rollup

    events = table(spark, sf_dir, "events")
    levels = cascade_rollup(events, "ts", "value", keys=["event_type"],
                            levels=["hour", "day", "month"])
    direct = (
        events.groupBy(F.date_trunc("month", F.col("ts")).alias("bucket"), "event_type")
        .agg(
            F.round(F.sum("value"), 2).alias("sum_v"),
            F.count("value").alias("n_v"),
        )
    )
    got = {
        (r.event_type, r.bucket): (round(r.sum_v, 2), r.n_v)
        for r in levels["month"].collect()
    }
    want = {(r.event_type, r.bucket): (r.sum_v, r.n_v) for r in direct.collect()}
    assert got == want and len(want) > 0


def test_cascade_rollup_week_does_not_feed_month(spark, sf_dir):
    # ADVICE r1: weeks straddle month boundaries; month totals must come from
    # the finest sub-week level, not date_trunc('month', week_bucket).
    from arrow_spark.operators.rollup import cascade_rollup

    events = table(spark, sf_dir, "events")
    levels = cascade_rollup(events, "ts", "value", keys=["event_type"],
                            levels=["day", "week", "month"])
    direct = (
        events.groupBy(F.date_trunc("month", F.col("ts")).alias("bucket"), "event_type")
        .agg(F.count("value").alias("n_v"))
    )
    got = {(r.event_type, r.bucket): r.n_v for r in levels["month"].collect()}
    want = {(r.event_type, r.bucket): r.n_v for r in direct.collect()}
    assert got == want and len(want) > 0


def test_cascade_rollup_rejects_week_to_month_without_subweek(spark, sf_dir):
    from arrow_spark.operators.rollup import cascade_rollup

    events = table(spark, sf_dir, "events")
    with pytest.raises(ValueError, match="straddle"):
        cascade_rollup(events, "ts", "value", levels=["week", "month"])


def test_stream_dedup_within_watermark_equals_batch(spark, sf_dir, tmp_path):
    # real stream with planted duplicates: dropDuplicatesWithinWatermark
    # must leave exactly the batch-distinct fingerprint set
    from arrow_spark.streaming.dedup import stream_dedup_content
    from arrow_spark.streaming import stream_from_directory

    docs = table(spark, sf_dir, "documents").limit(200).select(
        "doc_id", "text", F.current_timestamp().alias("ts")
    )
    dup = docs.union(docs)  # every doc arrives twice
    src = str(tmp_path / "dedup_src")
    dup.write.mode("overwrite").parquet(src)
    static = spark.read.parquet(src)

    stream = stream_from_directory(spark, src, static.schema)
    out = stream_dedup_content(stream, ts_col="ts", watermark="10 minutes")
    q = (
        out.select("fp")
        .writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.fp for r in spark.sql("SELECT * FROM dedup_test").collect()}
    want = {r.fp for r in stream_dedup_content(static).select("fp").collect()}
    assert got == want and len(want) > 0


def test_sessionize_gap_semantics(spark):
    from arrow_spark.operators.sessions import sessionize

    df = spark.createDataFrame(
        [
            (1, "u1", "2024-01-01 10:00:00"),
            (2, "u1", "2024-01-01 10:10:00"),  # 600s gap → same session
            (3, "u1", "2024-01-01 11:00:00"),  # 3000s gap → new session
            (4, "u2", "2024-01-01 10:00:00"),
        ],
        "event_id long, user_id string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.event_id: r.session_seq for r in
           sessionize(df, "user_id", "ts", 1800, tiebreak=["event_id"]).collect()}
    assert out == {1: 1, 2: 1, 3: 2, 4: 1}


def test_stream_cdc_upsert_folds_into_snapshot(spark, tmp_path):
    """foreachBatch CDC apply: two change waves land in the snapshot as
    latest-version-wins with tombstones removed."""
    import pyspark.sql.types as T

    from arrow_spark.streaming import stream_from_directory
    from arrow_spark.streaming.upsert import apply_cdc_stream

    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("seq", T.LongType()),
            T.StructField("v", T.LongType()),
            T.StructField("deleted", T.BooleanType()),
        ]
    )
    src = str(tmp_path / "changes")
    snap = str(tmp_path / "snapshot")
    import pandas as pd

    wave1 = pd.DataFrame(
        {"k": ["a", "b"], "seq": [1, 1], "v": [10, 20], "deleted": [False, False]}
    )
    wave2 = pd.DataFrame(
        {"k": ["a", "b", "c"], "seq": [2, 2, 2], "v": [11, 0, 30],
         "deleted": [False, True, False]}
    )
    spark.createDataFrame(wave1, schema).write.parquet(src)
    spark.createDataFrame(wave2, schema).write.mode("append").parquet(src)

    changes = stream_from_directory(spark, src, schema)
    q = apply_cdc_stream(
        changes, snap, ["k"], "seq", "deleted",
        checkpoint=str(tmp_path / "ckpt_cdc"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r["k"]: r["v"] for r in spark.read.parquet(snap).collect()}
    assert got == {"a": 11, "c": 30}


def test_stream_interval_join_left_outer_equals_batch_when_closed(spark, sf_dir, tmp_path):
    """LEFT OUTER stream-stream interval join: matched rows must equal
    the batch join exactly; null (abandoned-click) rows may be HELD by
    the final watermark for clicks near the end of input, so the stream
    nulls must be a subset of the batch nulls and must include every
    click the watermark provably closed."""
    import datetime as dt

    from arrow_spark.streaming import interval_join, stream_from_directory

    events = table(spark, sf_dir, "events")
    src_dir = str(tmp_path / "events_ijl_src")
    events.write.mode("overwrite").parquet(src_dir)
    static = spark.read.parquet(src_dir)

    def split(df):
        clicks = df.where(F.col("event_type") == "click").select(
            F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
        )
        purchases = df.where(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("purchase_ts")
        )
        return clicks, purchases

    bc, bp = split(static)
    batch = interval_join(
        bc, bp, "click_ts", "purchase_ts", on=["user_id"], upper="4 hours", how="left"
    ).collect()
    batch_matched = {(r.click_id, r.purchase_id) for r in batch if r.purchase_id is not None}
    batch_nulls = {r.click_id: r.click_ts for r in batch if r.purchase_id is None}
    assert batch_matched and batch_nulls  # fixture exercises both shapes

    sc, sp = split(stream_from_directory(spark, src_dir, static.schema))
    out = interval_join(
        sc, sp, "click_ts", "purchase_ts", on=["user_id"], upper="4 hours", how="left",
        left_watermark="1 hour", right_watermark="1 hour",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ijl_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ijl_ckpt"))
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM ijl_test").collect()
    got_matched = {(r.click_id, r.purchase_id) for r in rows if r.purchase_id is not None}
    got_nulls = {r.click_id for r in rows if r.purchase_id is None}
    assert got_matched == batch_matched
    assert got_nulls <= set(batch_nulls)
    # every batch-null click older than max(ts) - (watermark + interval +
    # slack) is provably closed and MUST have been emitted with nulls
    maxts = max(r.click_ts for r in batch)
    closed = {
        cid
        for cid, ts in batch_nulls.items()
        if ts < maxts - dt.timedelta(hours=6)
    }
    assert closed <= got_nulls


def test_stream_static_enrich_equals_batch_and_broadcasts(spark, sf_dir, tmp_path):
    from arrow_spark.streaming import stream_from_directory
    from arrow_spark.streaming.joins import enrich_with_static

    events = table(spark, sf_dir, "events")
    src_dir = str(tmp_path / "events_sse_src")
    events.write.mode("overwrite").parquet(src_dir)
    static = spark.read.parquet(src_dir)

    dim = static.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("user_events"),
        F.round(F.avg("value"), 4).alias("user_avg"),
    )

    def purchases(df):
        return df.where(F.col("event_type") == "purchase").select(
            "event_id", "user_id", F.round("value", 2).alias("value")
        )

    batch = enrich_with_static(purchases(static), dim, ["user_id"])
    expected = {(r.event_id, r.user_events, r.user_avg) for r in batch.collect()}
    assert expected
    # the static dim must broadcast: the only hash exchange in the final
    # plan is the dim's own aggregation — the stream side never shuffles
    # (split off AQE's echoed Initial Plan so exchanges aren't counted twice)
    p = batch._jdf.queryExecution().executedPlan().toString()
    final = p.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final
    assert final.count("Exchange hashpartitioning") == 1

    stream = purchases(stream_from_directory(spark, src_dir, static.schema))
    out = enrich_with_static(stream, dim, ["user_id"])
    q = (
        out.writeStream.format("memory")
        .queryName("sse_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "sse_ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.event_id, r.user_events, r.user_avg)
        for r in spark.sql("SELECT * FROM sse_test").collect()
    }
    assert got == expected


def test_stream_windowed_topk_equals_batch(spark, sf_dir, tmp_path):
    """complete-mode windowed counts ranked per micro-batch via
    foreachBatch — the streaming trending-keys idiom — must land on the
    batch plan's answer once the availableNow stream drains."""
    from arrow_spark.streaming import rank_topk, stream_from_directory, windowed_topk

    events = table(spark, sf_dir, "events")
    src_dir = str(tmp_path / "events_topk_src")
    events.write.mode("overwrite").parquet(src_dir)
    static = spark.read.parquet(src_dir)

    batch = windowed_topk(static, "ts", "1 hour", "event_type", k=3)
    expected = {
        (r.window_start, r.rank): (r.event_type, r.n) for r in batch.collect()
    }

    sink: dict = {}

    def rank_into_sink(bdf, epoch_id):
        for r in rank_topk(bdf, 3, "event_type").collect():
            sink[(r.window_start, r.rank)] = (r.event_type, r.n)

    stream = stream_from_directory(spark, src_dir, static.schema)
    counts = windowed_topk(
        stream, "ts", "1 hour", "event_type", k=3, watermark="2 hours"
    )
    q = (
        counts.writeStream.foreachBatch(rank_into_sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_topk"))
        .start()
    )
    q.awaitTermination(120)
    assert sink == expected


def test_stream_drift_monitor_equals_batch(spark, sf_dir, tmp_path):
    """windowed mix counts reduced to per-window TV in foreachBatch —
    the streaming drift monitor — must land on the batch plan's answer
    once the availableNow stream drains (reference = the static full
    distribution, broadcast into every micro-batch)."""
    from pyspark.sql import functions as F

    from arrow_spark.streaming import (
        mix_tv_from_counts,
        stream_from_directory,
        windowed_drift,
    )

    events = table(spark, sf_dir, "events")
    src_dir = str(tmp_path / "events_drift_src")
    events.write.mode("overwrite").parquet(src_dir)
    static = spark.read.parquet(src_dir)
    ref = static.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("r")
    )

    batch = windowed_drift(static, "ts", "1 hour", "event_type", ref)
    expected = {r.window_start: (r.n_events, r.tv) for r in batch.collect()}

    sink: dict = {}

    def reduce_into_sink(bdf, epoch_id):
        for r in mix_tv_from_counts(bdf, ref, "event_type").collect():
            sink[r.window_start] = (r.n_events, r.tv)

    stream = stream_from_directory(spark, src_dir, static.schema)
    counts = windowed_drift(
        stream, "ts", "1 hour", "event_type", ref, watermark="2 hours"
    )
    q = (
        counts.writeStream.foreachBatch(reduce_into_sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_drift"))
        .start()
    )
    q.awaitTermination(120)
    assert sink == expected  # exact equality incl. the TV doubles


def test_stream_interval_join_full_outer_equals_batch_when_closed(
    spark, sf_dir, tmp_path
):
    """FULL OUTER stream-stream interval join: matched rows must equal
    the batch join exactly; both null shapes (abandoned clicks AND
    orphan purchases) may be held near end-of-input by the final
    watermark, so each stream null set must be a subset of its batch
    counterpart."""
    from arrow_spark.streaming import interval_join, stream_from_directory

    events = table(spark, sf_dir, "events")
    src_dir = str(tmp_path / "events_ijf_src")
    events.write.mode("overwrite").parquet(src_dir)
    static = spark.read.parquet(src_dir)

    def split(df):
        clicks = df.where(F.col("event_type") == "click").select(
            F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
        )
        purchases = df.where(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("purchase_ts")
        )
        return clicks, purchases

    bc, bp = split(static)
    batch = interval_join(
        bc, bp, "click_ts", "purchase_ts", on=["user_id"], upper="4 hours",
        how="full_outer",
    ).collect()
    batch_matched = {
        (r.click_id, r.purchase_id) for r in batch
        if r.click_id is not None and r.purchase_id is not None
    }
    batch_click_nulls = {r.click_id for r in batch if r.purchase_id is None}
    batch_orphans = {r.purchase_id for r in batch if r.click_id is None}
    assert batch_matched and batch_click_nulls and batch_orphans
    # every orphan row must still carry its key (the coalesce contract)
    assert all(r.user_id is not None for r in batch)

    sc, sp = split(stream_from_directory(spark, src_dir, static.schema))
    out = interval_join(
        sc, sp, "click_ts", "purchase_ts", on=["user_id"], upper="4 hours",
        how="full_outer", left_watermark="1 hour", right_watermark="1 hour",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ijf_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ijf_ckpt"))
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM ijf_test").collect()
    got_matched = {
        (r.click_id, r.purchase_id) for r in rows
        if r.click_id is not None and r.purchase_id is not None
    }
    got_click_nulls = {r.click_id for r in rows if r.purchase_id is None}
    got_orphans = {r.purchase_id for r in rows if r.click_id is None}
    assert got_matched == batch_matched
    assert got_click_nulls <= batch_click_nulls
    assert got_orphans <= batch_orphans
