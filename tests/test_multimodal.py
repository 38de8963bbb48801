"""Multimodal plumbing: binary columns + metadata + mapInPandas feature
extraction with the stubbed decoder (codecs unavailable in-container;
the Spark-side schema/batching/partitioning is what's under test)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from arrow_spark.catalog import table
from arrow_spark.llm.multimodal import (
    DEFAULT_REGISTRY,
    attach_binary_meta,
    extract_features,
    fake_image_decode,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(50)
    payloads = docs.select(F.encode("text", "utf-8").alias("payload"))
    return attach_binary_meta(payloads, "payload", mime="image/fake")


def test_media_contract_schema(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "payload", "meta"]
    meta_fields = [f.name for f in media.schema["meta"].dataType.fields]
    assert meta_fields == ["mime", "width", "height", "n_bytes"]


def test_feature_extraction_runs_distributed(media):
    out = extract_features(media.repartition(4))
    rows = out.collect()
    assert len(rows) == 50
    assert all(len(r.features) == 8 for r in rows)
    assert all(r.n_bytes > 0 for r in rows)
    # deterministic fake decode: features derived from payload bytes
    assert all(0.0 <= v <= 1.0 for r in rows for v in r.features)


def test_unregistered_mime_raises(spark, media):
    bad = media.withColumn(
        "meta",
        F.struct(
            F.lit("video/mp4").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(1).cast("long").alias("n_bytes"),
        ),
    )
    import pyspark.errors

    with pytest.raises(Exception) as exc_info:
        extract_features(bad).collect()
    assert "NotImplementedError" in str(exc_info.value) or "codecs" in str(exc_info.value)


def test_fake_decoder_deterministic():
    assert fake_image_decode(b"abc") == fake_image_decode(b"abc")
    assert fake_image_decode(b"") == [0.0] * 8


def test_resize_updates_meta_and_payload(spark):
    from arrow_spark.llm.multimodal import attach_binary_meta, resize_media

    df = spark.createDataFrame(
        [(1, b"abcdef"), (2, b"x")], "doc_id long, payload binary"
    )
    media = attach_binary_meta(df, "payload", mime="image/fake", id_col="doc_id")
    out = {r.media_id: r for r in resize_media(media, 4, 2).collect()}
    assert len(out[1].payload) == 8 and len(out[2].payload) == 8
    assert out[1].meta.width == 4 and out[1].meta.height == 2
    assert out[1].meta.n_bytes == 8
    assert bytes(out[2].payload) == b"x" * 8  # cycle-padded stub


def test_sample_frames_fanout_and_reassembly(spark):
    from arrow_spark.llm.multimodal import attach_binary_meta, sample_frames

    df = spark.createDataFrame([(7, bytes(range(10)))], "doc_id long, payload binary")
    media = attach_binary_meta(df, "payload", mime="video/fake", id_col="doc_id")
    rows = sorted(sample_frames(media, max_frames=4).collect(), key=lambda r: r.frame_index)
    assert [r.frame_index for r in rows] == [0, 1, 2, 3]
    # frames partition the payload exactly (last frame takes the remainder)
    assert b"".join(bytes(r.frame) for r in rows) == bytes(range(10))
    assert all(r.media_id == 7 for r in rows)
