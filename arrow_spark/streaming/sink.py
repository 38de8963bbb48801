"""Idempotent epoch-committed sink for foreachBatch — exactly-once
file output over an at-least-once stream.

Structured Streaming guarantees foreachBatch is called with a stable
``epoch_id`` per micro-batch, but a failed batch is REPLAYED with the
same id — a naive append sink duplicates its rows. The standard fix is
the transactional directory protocol implemented here:

    base/epoch=N/          ← overwritten atomically per replay
    base/epoch=N/_COMMITTED ← zero-byte marker, written LAST

A replayed epoch overwrites its own directory and re-drops the marker
(idempotent); a crashed write leaves no marker, so readers — which
union ONLY marked epochs — never observe partial output. This is the
minimal form of the commit protocols Delta/Iceberg formalize, on plain
parquet, using the Hadoop FileSystem API so it works on any scheme
(file://, hdfs://, s3a://) the session can reach.

Reference anchor: the reference's dataset writer commits per-fragment
files then exposes them atomically (cpp/src/arrow/dataset/file_base.cc
FileSystemDataset::Write); the epoch marker is the streaming analog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

MARKER = "_COMMITTED"


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jvm, jpath


def _touch(spark: SparkSession, path: str) -> None:
    fs, jvm, jpath = _fs(spark, path)
    fs.create(jpath, True).close()


def write_epoch(df: DataFrame, base_path: str, epoch_id: int) -> None:
    """Write one micro-batch's rows under ``base/epoch=<id>`` and mark
    it committed. Safe to call again with the same epoch (replay):
    overwrite-then-mark, marker last."""
    epoch_dir = f"{base_path}/epoch={epoch_id}"
    df.write.mode("overwrite").parquet(epoch_dir)
    _touch(df.sparkSession, f"{epoch_dir}/{MARKER}")


def idempotent_sink(base_path: str):
    """foreachBatch callable: ``.writeStream.foreachBatch(idempotent_sink(p))``."""

    def _sink(df: DataFrame, epoch_id: int) -> None:
        write_epoch(df, base_path, epoch_id)

    return _sink


def committed_epochs(spark: SparkSession, base_path: str) -> list[int]:
    """Epoch ids whose marker exists (sorted)."""
    fs, jvm, jbase = _fs(spark, base_path)
    if not fs.exists(jbase):
        return []
    out = []
    for st in fs.listStatus(jbase):
        name = st.getPath().getName()
        if not name.startswith("epoch="):
            continue
        eid = int(name.split("=", 1)[1])
        if fs.exists(jvm.org.apache.hadoop.fs.Path(st.getPath(), MARKER)):
            out.append(eid)
    return sorted(out)


def read_committed(spark: SparkSession, base_path: str) -> DataFrame:
    """Union of all COMMITTED epochs only — uncommitted (crashed)
    directories are invisible. Raises if nothing is committed yet."""
    epochs = committed_epochs(spark, base_path)
    if not epochs:
        raise FileNotFoundError(f"no committed epochs under {base_path}")
    paths = [f"{base_path}/epoch={e}" for e in epochs]
    return spark.read.option("basePath", base_path).parquet(*paths).drop("epoch")


def read_as_of(
    spark: SparkSession, base_path: str, epoch_id: int
) -> DataFrame:
    """TIME TRAVEL over the epoch-committed sink: the table exactly as
    it stood after ``epoch_id`` committed — only committed epochs ≤ the
    requested one are read, later writes are invisible (the lakehouse
    snapshot-read contract, expressed with nothing but the directory
    protocol: the commit markers ARE the snapshot log). Raises if no
    epoch ≤ ``epoch_id`` is committed — asking for history that never
    existed is an error, not an empty frame."""
    epochs = [e for e in committed_epochs(spark, base_path) if e <= epoch_id]
    if not epochs:
        raise FileNotFoundError(
            f"no committed epoch <= {epoch_id} under {base_path}"
        )
    paths = [f"{base_path}/epoch={e}" for e in epochs]
    return spark.read.option("basePath", base_path).parquet(*paths).drop("epoch")
