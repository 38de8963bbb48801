"""Dataset layer: multi-format, partition-aware read/write.

Maps Arrow's dataset abstractions (dataset/dataset.h:361 Dataset,
discovery.h:85 FileSystemDatasetFactory, partition.h:227 Hive
partitioning, scanner.h:205 ScanNodeOptions) onto Spark's datasource
framework, which already provides file discovery, Hive-style partition
inference + pruning, predicate/projection pushdown, and partitioned
writes — the point of this module is the option translation, not a
re-implementation.

CSV option mapping (csv/options.h ParseOptions:42 / ConvertOptions:72 /
ReadOptions:142): delimiter→sep, quote_char→quote, escape_char→escape,
null_values→nullValue, column_types→schema, skip_rows→skipRows(ish),
autogenerate_column_names→header.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

_FORMATS = {"parquet", "csv", "json", "orc", "text"}


def read_dataset(
    spark: SparkSession,
    path: str | list[str],
    fmt: str = "parquet",
    schema=None,
    partition_base_dir: str | None = None,
    **options,
) -> DataFrame:
    """Discover + scan a dataset directory.

    Hive-style `key=value` partition directories are inferred (and pruned
    on filter) natively; ``partition_base_dir`` maps Arrow's
    PartitioningFactoryOptions base dir to Spark's basePath.
    """
    if fmt == "arrow":
        from arrow_spark.sources.ipc import read_ipc

        return read_ipc(spark, path)
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        options.setdefault("inferSchema", "true")
    if fmt == "csv":
        options.setdefault("header", "true")
    if partition_base_dir:
        options["basePath"] = partition_base_dir
    return reader.options(**options).format(fmt).load(path)


#: FileSystemDatasetWriteOptions::existing_data_behavior
#: (dataset/file_base.h ExistingDataBehavior) → the closest honest
#: Spark semantics. Spark task filenames are always unique, so the
#: reference's basename-collision nuance of kOverwriteOrIgnore cannot
#: arise — "write alongside whatever is there" is `append`.
#: kDeleteMatchingPartitions maps to dynamic partition overwrite:
#: ONLY the partitions receiving new data are replaced.
_EXISTING_DATA = {
    "error": "errorifexists",
    "overwrite_or_ignore": "append",
    "delete_matching": "overwrite",
}


def write_dataset(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: Sequence[str] = (),
    mode: str = "overwrite",
    max_rows_per_file: int | None = None,
    existing_data_behavior: str | None = None,
    **options,
) -> None:
    """Partitioned dataset write (FileSystemDatasetWriteOptions,
    dataset/file_base.cc:482-486): Hive layout via partitionBy,
    max_rows_per_file via maxRecordsPerFile, existing_data_behavior
    per the _EXISTING_DATA mapping (delete_matching uses dynamic
    partition overwrite so untouched partitions survive)."""
    if fmt == "arrow":
        from arrow_spark.sources.ipc import write_ipc

        write_ipc(df, path, partition_by=partition_by)
        return
    if existing_data_behavior is not None:
        try:
            mode = _EXISTING_DATA[existing_data_behavior]
        except KeyError:
            raise ValueError(
                f"unknown existing_data_behavior {existing_data_behavior!r}; "
                f"one of {sorted(_EXISTING_DATA)}"
            ) from None
    writer = df.write.mode(mode)
    if existing_data_behavior == "delete_matching" and partition_by:
        # Per-write DataFrameWriter option (Spark 2.4+), NOT the session
        # conf: a concurrent write on the same SparkSession must never
        # inherit dynamic-overwrite semantics from this call's window.
        writer = writer.option("partitionOverwriteMode", "dynamic")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_rows_per_file:
        writer = writer.option("maxRecordsPerFile", max_rows_per_file)
    writer.options(**options).format(fmt).save(path)
