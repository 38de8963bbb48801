"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas
iterators (mapInPandas) so decode work distributes with the data.

Decode kernels resolve through ``DecoderRegistry``. PNG and WAV are REAL
pure-stdlib decoders (``llm/codecs.py``: zlib scanline unfiltering /
wave PCM) registered by default; other mimes stay behind a
clearly-marked NotImplementedError or a deterministic fake (for tests)
because the container ships no external codec library (PIL/cv2/imageio
probe negative — SCALE.md). The plumbing — schema contract, batch
iteration, partition-parallel execution, metadata propagation — is the
same for all of them.

At 100 TB: binary payloads stay in executor memory one Arrow batch at a
time (maxRecordsPerBatch bounds peak), feature outputs are columnar, and
no payload ever reaches the driver.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)


def fake_image_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real image decoder: 8 'pixels' from
    the byte content. Real deployments register an actual codec."""
    if payload is None:
        return []
    n = len(payload)
    return [float(payload[i % n]) / 255.0 if n else 0.0 for i in range(8)]


def unavailable_decode(payload: bytes) -> list[float]:
    raise NotImplementedError(
        "media codecs are not installed in this environment; register a "
        "real decoder via DecoderRegistry.register('mime', fn)"
    )


class DecoderRegistry:
    """mime-prefix → decode callable; mirrors Arrow's extension-type
    registration posture (cpp/src/arrow/extension_type.h)."""

    def __init__(self) -> None:
        self._decoders: dict[str, Callable[[bytes], list[float]]] = {}

    def register(self, mime_prefix: str, fn: Callable[[bytes], list[float]]) -> None:
        self._decoders[mime_prefix] = fn

    def resolve(self, mime: str | None) -> Callable[[bytes], list[float]]:
        if mime:
            for prefix, fn in self._decoders.items():
                if mime.startswith(prefix):
                    return fn
        return unavailable_decode


DEFAULT_REGISTRY = DecoderRegistry()
DEFAULT_REGISTRY.register("image/fake", fake_image_decode)

# Real stdlib-backed codecs (llm/codecs.py). Imported lazily-safe: the
# module itself is stdlib-only, so this cannot fail in this container.
from arrow_spark.llm.codecs import png_features, wav_features  # noqa: E402

DEFAULT_REGISTRY.register("image/png", png_features)
DEFAULT_REGISTRY.register("audio/wav", wav_features)
DEFAULT_REGISTRY.register("audio/x-wav", wav_features)


def attach_binary_meta(
    df: DataFrame, payload_col: str, mime: str, id_col: str | None = None
) -> DataFrame:
    """Wrap a binary column into the engine's media contract.

    Pass ``id_col`` to carry a stable upstream id; otherwise a
    partition-local synthetic id is generated (fine for pipelines,
    non-deterministic across runs).
    """
    return df.select(
        (F.col(id_col) if id_col else F.monotonically_increasing_id()).alias("media_id"),
        F.col(payload_col).alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def extract_features(
    media: DataFrame, registry: DecoderRegistry = DEFAULT_REGISTRY, feature_len: int = 8
) -> DataFrame:
    """Decode → feature-extract via mapInPandas (Arrow batch iterator).

    The iterator shape keeps one batch of payloads in memory at a time;
    the decoder runs executor-side, per partition, vectorized over the
    batch.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("n_bytes", T.LongType(), True),
            T.StructField("features", T.ArrayType(T.DoubleType()), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mimes = pdf["meta"].map(lambda m: m.get("mime") if m is not None else None)
            feats = [
                registry.resolve(mime)(payload)
                for mime, payload in zip(mimes, pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["meta"].map(
                        lambda m: m.get("n_bytes") if m is not None else None
                    ),
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema=out_schema)


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for an image resize kernel: truncates or
    cycle-pads the byte content to width*height bytes. Real deployments
    register a codec-backed kernel."""
    if payload is None:
        return None
    target = max(1, width * height)
    if not payload:
        return bytes(target)
    reps = (target + len(payload) - 1) // len(payload)
    return (payload * reps)[:target]


def resize_media(
    media: DataFrame, width: int, height: int,
    kernel: Callable[[bytes, int, int], bytes] = fake_resize,
) -> DataFrame:
    """Resize every payload to (width, height), updating meta in place.

    Output keeps MEDIA_SCHEMA so resize composes with extract_features /
    sample_frames. mapInPandas: one Arrow batch of payloads in executor
    memory at a time, nothing on the driver.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [kernel(p, width, height) for p in pdf["payload"]]
            meta = [
                None
                if m is None
                else {
                    "mime": m.get("mime"),
                    "width": width,
                    "height": height,
                    "n_bytes": len(r) if r is not None else None,
                }
                for m, r in zip(pdf["meta"], resized)
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": resized, "meta": meta}
            )

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)


def sample_frames(media: DataFrame, max_frames: int = 4) -> DataFrame:
    """Video frame sampling plumbing: one media row fans out to up to
    max_frames (media_id, frame_index, frame) rows.

    The frame extractor is the stub (equal byte slices of the payload —
    a real deployment slices decoded frames); the row-explosion shape is
    the real contract: mapInPandas yields more rows than it consumes,
    frames stay executor-side and columnar, and downstream per-frame ops
    (resize, feature-extract) compose by treating each frame as a
    payload.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames, sizes = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None or len(payload) == 0:
                    continue
                n = min(max_frames, len(payload))
                step = len(payload) // n
                for i in range(n):
                    chunk = payload[i * step: (i + 1) * step if i < n - 1 else len(payload)]
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(chunk)
                    sizes.append(len(chunk))
            yield pd.DataFrame(
                {"media_id": ids, "frame_index": idxs, "frame": frames, "n_bytes": sizes}
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)
