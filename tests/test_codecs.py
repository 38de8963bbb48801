"""Pure-stdlib PNG/WAV codecs: round-trips, spec filter coverage, and
the end-to-end Spark decode path with real bytes through the registry."""

from __future__ import annotations

import struct
import zlib

import pytest

from arrow_spark.llm.codecs import (
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    png_features,
    wav_features,
)

PIX_RGB = bytes(
    (x * 37 + y * 11 + c * 5) % 256 for y in range(5) for x in range(4) for c in range(3)
)


def test_png_roundtrip_rgb():
    png = encode_png(4, 5, 3, PIX_RGB)
    w, h, ch, px = decode_png(png)
    assert (w, h, ch) == (4, 5, 3)
    assert px == PIX_RGB


def test_png_roundtrip_grayscale_and_rgba():
    for ch in (1, 2, 4):
        pix = bytes((i * 29) % 256 for i in range(6 * 3 * ch))
        w, h, c, px = decode_png(encode_png(6, 3, ch, pix))
        assert (w, h, c) == (6, 3, ch)
        assert px == pix


def _filter_line(f, line, prev, ch):
    """Apply PNG filter f to a raw scanline (the encoder side of the
    decoder's unfilter loop) — used to hand-craft filtered PNGs."""
    out = bytearray()
    for x in range(len(line)):
        a = line[x - ch] if x >= ch else 0
        b = prev[x]
        c = prev[x - ch] if x >= ch else 0
        if f == 0:
            v = line[x]
        elif f == 1:
            v = line[x] - a
        elif f == 2:
            v = line[x] - b
        elif f == 3:
            v = line[x] - ((a + b) >> 1)
        else:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            v = line[x] - pr
        out.append(v & 0xFF)
    return bytes(out)


def _chunk(typ, data):
    return len(data).to_bytes(4, "big") + typ + data + zlib.crc32(typ + data).to_bytes(4, "big")


@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_png_decode_every_spec_filter(filt):
    # 4x4 RGB image, every scanline encoded with the same filter type
    w = h = 4
    ch = 3
    pix = bytes((x * 53 + y * 17 + c * 7) % 256 for y in range(h) for x in range(w) for c in range(ch))
    stride = w * ch
    prev = bytes(stride)
    raw = bytearray()
    for y in range(h):
        line = pix[y * stride : (y + 1) * stride]
        raw += bytes([filt]) + _filter_line(filt, line, prev, ch)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    got = decode_png(png)
    assert got == (w, h, ch, pix)


def test_png_rejects_non_png_and_palette():
    with pytest.raises(ValueError):
        decode_png(b"JFIF not a png")
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)  # color type 3 = palette
    png = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError):
        decode_png(png)


def test_png_features_constant_image():
    png = encode_png(8, 8, 1, bytes([100] * 64))
    f = png_features(png)
    assert f[0:3] == [8.0, 8.0, 1.0]
    assert f[3] == pytest.approx(100 / 255)
    assert f[4:7] == [-1.0, -1.0, -1.0]
    assert f[7] == pytest.approx(100 / 255)


def test_wav_roundtrip_and_features():
    samples = [0.0, 0.5, -0.5, 1.0, -1.0, 0.25] * 3
    wav = encode_wav(samples, framerate=16000)
    nch, fr, sw, vals = decode_wav(wav)
    assert (nch, fr, sw) == (1, 16000, 2)
    assert vals == pytest.approx(samples, abs=2 / 32768)
    f = wav_features(wav)
    assert f[0:4] == [1.0, 16000.0, 18.0, 2.0]
    assert f[7] == pytest.approx(1.0, abs=2 / 32768)


def test_registry_resolves_real_codecs():
    from arrow_spark.llm.multimodal import DEFAULT_REGISTRY

    png = encode_png(2, 2, 3, bytes(range(12)))
    assert DEFAULT_REGISTRY.resolve("image/png")(png)[0:3] == [2.0, 2.0, 3.0]
    wav = encode_wav([0.1, -0.1])
    assert DEFAULT_REGISTRY.resolve("audio/wav")(wav)[2] == 2.0


def test_real_png_decode_distributed(spark):
    """End-to-end: PNG bytes synthesized executor-side, decoded through
    the registry by mapInPandas, features verified against analytic
    values — no fake decoder anywhere in the path."""
    from pyspark.sql import functions as F

    from arrow_spark.llm.multimodal import attach_binary_meta, extract_features

    ids = list(range(1, 21))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id: long")
    enc = F.udf(
        lambda d: encode_png(8, 8, 1, bytes(((d + k) % 256) for k in range(64))),
        "binary",
    )
    media = attach_binary_meta(
        df.select("doc_id", enc("doc_id").alias("payload")),
        "payload",
        mime="image/png",
        id_col="doc_id",
    )
    rows = extract_features(media).select("media_id", "features").collect()
    assert len(rows) == len(ids)
    for r in rows:
        d = r.media_id % 256
        want_mean = (64 * d + 2016 - 256 * max(0, d - 192)) / 64 / 255
        assert r.features[0] == 8.0 and r.features[2] == 1.0
        assert r.features[7] == pytest.approx(want_mean)


# -- property-based round-trips (hypothesis) ---------------------------------

try:
    from hypothesis import given, settings, strategies as st

    @given(
        w=st.integers(1, 12),
        h=st.integers(1, 12),
        ch=st.sampled_from([1, 2, 3, 4]),
        data=st.data(),
    )
    @settings(max_examples=40, deadline=None)
    def test_png_roundtrip_property(w, h, ch, data):
        pix = bytes(
            data.draw(
                st.lists(
                    st.integers(0, 255), min_size=w * h * ch, max_size=w * h * ch
                )
            )
        )
        assert decode_png(encode_png(w, h, ch, pix)) == (w, h, ch, pix)

    @given(
        samples=st.lists(
            st.floats(min_value=-1.0, max_value=1.0, allow_nan=False), max_size=64
        )
    )
    @settings(max_examples=40, deadline=None)
    def test_wav_roundtrip_property(samples):
        if not samples:
            return
        _, _, _, vals = decode_wav(encode_wav(samples))
        assert vals == pytest.approx(samples, abs=2 / 32768)

except ImportError:  # pragma: no cover
    pass
