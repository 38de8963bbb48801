"""Arrow IPC (Feather V2 / stream) DataSource.

Spark has no builtin `format("arrow")` (SURVEY §2.3); this implements
one Spark-first: file paths are distributed as a DataFrame, each
partition reads its files with pyarrow inside mapInArrow (zero-copy
RecordBatch passthrough), so the read scales with files × partitions
exactly like the parquet scanner. Writes go one IPC file per partition
via the same boundary.

Reference: cpp/src/arrow/ipc/reader.h:74,109 (stream/file readers),
ipc/writer.h:143-180 (writers, LZ4/ZSTD compression).
"""

from __future__ import annotations

import glob as _glob
import os
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def _expand_paths(path: str | list[str]) -> list[str]:
    paths = [path] if isinstance(path, str) else list(path)
    out: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            out.extend(sorted(_glob.glob(os.path.join(p, "*.arrow")))
                       or sorted(_glob.glob(os.path.join(p, "*.feather")))
                       or sorted(_glob.glob(os.path.join(p, "*"))))
        elif any(ch in p for ch in "*?["):
            out.extend(sorted(_glob.glob(p)))
        else:
            out.append(p)
    if not out:
        raise FileNotFoundError(f"no IPC files under {path!r}")
    return out


def _ipc_schema(sample_path: str):
    import pyarrow as pa
    import pyarrow.ipc as ipc

    try:
        with ipc.open_file(sample_path) as r:
            return r.schema
    except pa.ArrowInvalid:
        with ipc.open_stream(sample_path) as r:
            return r.schema


def read_ipc(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """Read Arrow IPC file(s) into a DataFrame, one task per file.

    Schema comes from the first file's IPC footer (dataset-discovery
    style); partitions stream RecordBatches through mapInArrow without
    row materialization.
    """
    import pyarrow as pa

    from arrow_spark.types import normalize_arrow_schema, normalize_batch

    files = _expand_paths(path)
    raw_schema = _ipc_schema(files[0])
    schema, needs_normalize = normalize_arrow_schema(raw_schema)
    try:
        from pyspark.sql.pandas.types import from_arrow_schema

        try:
            # tz-less Arrow timestamps are NTZ semantically — keep fidelity
            spark_schema = from_arrow_schema(schema, prefer_timestamp_ntz=True)
        except TypeError:
            spark_schema = from_arrow_schema(schema)
    except ImportError:  # pandas bridge fallback: 1-row sample infers types
        with pa.ipc.open_file(files[0]) as r:
            sample = r.get_batch(0).slice(0, 1)
        spark_schema = spark.createDataFrame(sample.to_pandas()).schema

    paths_df = spark.createDataFrame(
        [(f,) for f in files], T.StructType([T.StructField("path", T.StringType(), False)])
    ).repartition(min(len(files), 64))

    def read_files(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.ipc as ipc

        def emit(raw: pa.RecordBatch) -> pa.RecordBatch:
            # normalize Arrow-only types (unsigned, time, half, views,
            # dictionary) to the Spark-representable schema — SURVEY §1.2
            return normalize_batch(raw, schema) if needs_normalize else raw

        for b in batches:
            for p in b.column("path").to_pylist():
                # guard only the open: batch/cast errors must surface,
                # not get misread as "try the stream format instead"
                try:
                    reader = ipc.open_file(p)
                except pa.ArrowInvalid:
                    reader = None
                if reader is not None:
                    for i in range(reader.num_record_batches):
                        yield emit(reader.get_batch(i))
                else:
                    with ipc.open_stream(p) as sr:
                        for raw in sr:
                            yield emit(raw)

    return paths_df.mapInArrow(read_files, schema=spark_schema)


def write_ipc(df: DataFrame, path: str, compression: str | None = "zstd") -> None:
    """Write a DataFrame as Arrow IPC, one file per partition
    (the distributed analog of ipc::MakeFileWriter)."""
    os.makedirs(path, exist_ok=True)

    import pyarrow as pa

    def write_partition(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import os as _os
        import uuid

        import pyarrow.ipc as ipc

        writer = None
        out_path = _os.path.join(path, f"part-{uuid.uuid4().hex}.arrow")
        try:
            for b in batches:
                if writer is None:
                    opts = ipc.IpcWriteOptions(compression=compression)
                    writer = ipc.new_file(out_path, b.schema, options=opts)
                writer.write_batch(b)
        finally:
            if writer is not None:
                writer.close()
        count_schema = pa.schema([pa.field("written", pa.int64())])
        yield pa.RecordBatch.from_pylist([{"written": 1}], schema=count_schema)

    sink_schema = T.StructType([T.StructField("written", T.LongType(), True)])
    df.mapInArrow(write_partition, schema=sink_schema).count()
