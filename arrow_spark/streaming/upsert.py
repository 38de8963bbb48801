"""Streaming CDC apply: fold a change stream into a materialized
snapshot with foreachBatch + merge_upsert (the streaming MERGE pattern —
micro-batch atomicity from the sink, merge semantics from the batch
operator, exactly the composition Structured Streaming prescribes for
sinks Spark has no native upsert writer for).

Scale: each micro-batch merges only (snapshot ∪ delta) on the merge
keys; with the snapshot bucketed on those keys the per-batch shuffle is
delta-sized. State lives in the snapshot files, not executor memory —
restarts resume from the last committed snapshot + checkpointed offsets.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from arrow_spark.operators.upsert import merge_upsert


def apply_cdc_stream(
    changes: DataFrame,
    snapshot_path: str,
    keys: Sequence[str],
    seq_col: str,
    delete_col: str | None = None,
    checkpoint: str | None = None,
):
    """Start a foreachBatch query folding ``changes`` (a streaming
    DataFrame) into the parquet snapshot at ``snapshot_path``. Returns
    the StreamingQuery; callers own its lifecycle."""
    spark = changes.sparkSession

    def _merge(batch: DataFrame, batch_id: int) -> None:
        base = _read_or_empty(spark, snapshot_path, batch)
        merged = merge_upsert(base, batch, keys, seq_col, delete_col)
        # localCheckpoint materializes the merge BEFORE the overwrite
        # truncates the input it was derived from (classic
        # read-modify-overwrite hazard)
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(
            snapshot_path
        )

    writer = changes.writeStream.foreachBatch(_merge).outputMode("update")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def _read_or_empty(spark: SparkSession, path: str, like: DataFrame) -> DataFrame:
    try:
        return spark.read.schema(like.schema).parquet(path)
    except Exception:  # first batch: no snapshot yet
        return spark.createDataFrame([], like.schema)
