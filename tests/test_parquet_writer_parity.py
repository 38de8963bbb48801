"""Parquet writer-properties parity vs the reference's WriterProperties
(cpp/src/parquet/properties.h:230 — compression, dictionary_enabled,
statistics_enabled, max_row_group_length, version), pinned through the
dataset facade the way test_source_option_parity.py pins CSV/JSON/ORC:
each case asserts the MAPPED Spark option reproduces the
reference-documented semantics on a concrete file, verified by reading
the footer back with pyarrow.

Documented gaps are asserted as gaps: the reference sizes row groups
in ROWS (max_row_group_length) while Spark's parquet.block.size is
BYTES; the reference's per-column bloom options map to Spark's
parquet.bloom.filter.enabled#col but the footer offsets aren't exposed
by this pyarrow build, so bloom parity is carried by the functional
sidecar-index tests in test_bloom_index.py instead.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest

from arrow_spark.sources.dataset import write_dataset


def _one_file(path: str) -> str:
    files = glob.glob(f"{path}/*.parquet")
    assert files, f"no parquet written under {path}"
    return files[0]


@pytest.mark.parametrize(
    "codec, expect",
    [
        ("none", "UNCOMPRESSED"),
        ("snappy", "SNAPPY"),
        ("gzip", "GZIP"),
        ("zstd", "ZSTD"),
    ],
)
def test_compression_mapping(spark, tmp_path, codec, expect):
    """WriterProperties::set_compression (properties.h:243) →
    Spark's `compression` writer option; verified per column chunk."""
    p = str(tmp_path / f"c_{codec}")
    write_dataset(spark.range(1000).toDF("a"), p, compression=codec)
    md = pq.ParquetFile(_one_file(p)).metadata
    assert md.row_group(0).column(0).compression == expect


def test_dictionary_enabled_toggle(spark, tmp_path):
    """set_dictionary_enabled (properties.h:245) →
    parquet.enable.dictionary: a low-cardinality string column gets a
    dictionary page when on, none when off."""
    df = spark.range(2000).selectExpr("CAST(id % 3 AS STRING) AS s")
    on, off = str(tmp_path / "on"), str(tmp_path / "off")
    write_dataset(df, on)
    write_dataset(df, off, **{"parquet.enable.dictionary": "false"})
    col_on = pq.ParquetFile(_one_file(on)).metadata.row_group(0).column(0)
    col_off = pq.ParquetFile(_one_file(off)).metadata.row_group(0).column(0)
    assert col_on.has_dictionary_page
    assert not col_off.has_dictionary_page


def test_statistics_written_by_default(spark, tmp_path):
    """DEFAULT_ARE_STATISTICS_ENABLED is true in the reference
    (properties.h:231) and in parquet-mr: min/max land in the footer."""
    p = str(tmp_path / "stats")
    write_dataset(spark.range(100).toDF("a").coalesce(1), p)
    col = pq.ParquetFile(_one_file(p)).metadata.row_group(0).column(0)
    assert col.is_stats_set
    assert col.statistics.min == 0 and col.statistics.max == 99


def test_row_group_sizing_is_bytes_not_rows(spark, tmp_path):
    """max_row_group_length (properties.h, ROWS) has no direct Spark
    analog — parquet.block.size is BYTES. Pin the mapping AND the gap:
    a tiny byte budget still splits into multiple row groups."""
    df = spark.range(200_000).toDF("a").coalesce(1)
    p = str(tmp_path / "rg")
    write_dataset(df, p, **{"parquet.block.size": str(64 * 1024)})
    md = pq.ParquetFile(_one_file(p)).metadata
    assert md.num_row_groups >= 2
    total = sum(md.row_group(i).num_rows for i in range(md.num_row_groups))
    assert total == 200_000


def test_max_rows_per_file_maps_to_file_splits(spark, tmp_path):
    """FileSystemDatasetWriteOptions::max_rows_per_file
    (dataset/file_base.h:431) → maxRecordsPerFile: the dataset facade
    splits FILES by row count (the reference's semantics exactly)."""
    p = str(tmp_path / "mrf")
    write_dataset(spark.range(1000).toDF("a").coalesce(1), p, max_rows_per_file=300)
    files = glob.glob(f"{p}/*.parquet")
    assert len(files) == 4  # 300+300+300+100
    counts = sorted(pq.ParquetFile(f).metadata.num_rows for f in files)
    assert counts == [100, 300, 300, 300]


def test_writer_version_toggle(spark, tmp_path):
    """WriterProperties::version (ParquetVersion) →
    parquet.writer.version: v1 footers read back as format 1.0, the
    default parquet-mr build as >= 1.0 with v2 data pages available."""
    df = spark.range(100).toDF("a").coalesce(1)
    v1 = str(tmp_path / "v1")
    write_dataset(df, v1, **{"parquet.writer.version": "v1"})
    assert pq.ParquetFile(_one_file(v1)).metadata.format_version == "1.0"
    v2 = str(tmp_path / "v2")
    write_dataset(df, v2, **{"parquet.writer.version": "v2"})
    # parquet-mr stamps format 1.0 in the footer even for v2 data pages
    # (version marks page format, not footer schema) — pin readability
    assert pq.ParquetFile(_one_file(v2)).metadata.num_rows == 100
