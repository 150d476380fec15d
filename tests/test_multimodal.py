from __future__ import annotations

import io
import wave

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from crgp_spark.operators.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    attach_fake_payload,
    decode_media,
    decode_ppm,
    decode_wav,
    extract_features,
    sample_frames,
)


def _ppm_p6(w: int, h: int) -> bytes:
    px = bytes((i * 7) % 256 for i in range(w * h * 3))
    return b"P6\n# a comment\n%d %d\n255\n" % (w, h) + px


def _ppm_p3(w: int, h: int) -> bytes:
    vals = [(i * 11) % 256 for i in range(w * h * 3)]
    return (
        f"P3\n{w} {h}\n255\n" + " ".join(str(v) for v in vals)
    ).encode()


def _wav_pcm16(n: int) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(8000)
        samples = np.round(
            np.sin(np.linspace(0, 6.28, n)) * 30000
        ).astype("<i2")
        wv.writeframes(samples.tobytes())
    return buf.getvalue()


@pytest.fixture(scope="module")
def media(spark):
    pdf = pd.DataFrame(
        {"doc_id": range(20), "text": [f"document body {i} " * (i + 1) for i in range(20)]}
    )
    return attach_fake_payload(spark.createDataFrame(pdf)).persist()


def test_payload_schema(media):
    assert dict(media.dtypes)["payload"] == "binary"
    row = media.first()
    assert row.meta.format in ("png", "jpeg", "wav")
    assert row.meta.width >= 4


def test_feature_extraction_shapes(spark, media):
    feats = extract_features(media, fake=True)
    rows = feats.collect()
    assert len(rows) == 20
    assert all(len(r.features) == FEATURE_DIM for r in rows)
    assert all(r.n_bytes > 0 for r in rows)
    # deterministic
    again = extract_features(media, fake=True).collect()
    assert {r.media_id: tuple(r.features) for r in rows} == {
        r.media_id: tuple(r.features) for r in again
    }


def test_real_decode_is_stubbed(spark, media):
    with pytest.raises(Exception) as ei:
        extract_features(media, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or "not available" in str(ei.value)


def test_decode_ppm_exact():
    raw = _ppm_p6(4, 2)
    px = decode_ppm(raw)
    assert px.shape == (24,)
    assert np.array_equal(px, np.array([(i * 7) % 256 for i in range(24)]) / 255.0)
    # P3 ascii agrees with its own values (incl. a comment-free header)
    px3 = decode_ppm(_ppm_p3(3, 3))
    assert np.array_equal(
        px3, np.array([(i * 11) % 256 for i in range(27)]) / 255.0
    )


def test_decode_wav_exact():
    raw = _wav_pcm16(100)
    s = decode_wav(raw)
    assert s.shape == (100,)
    assert np.abs(s).max() <= 1.0
    assert np.allclose(
        s, np.round(np.sin(np.linspace(0, 6.28, 100)) * 30000) / 32768.0
    )


def test_real_decode_end_to_end(spark):
    payloads = [_ppm_p6(8, 6), _ppm_p3(5, 4), _wav_pcm16(333)]
    rows = [
        (i, p, {"format": "unknown", "width": 0, "height": 0, "n_frames": 1})
        for i, p in enumerate(payloads)
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in extract_features(media, fake=False).collect()}
    assert [out[i].format for i in range(3)] == ["ppm", "ppm", "wav"]
    for i, p in enumerate(payloads):
        fmt, samples = decode_media(p)
        if len(samples) % FEATURE_DIM:
            samples = samples[: len(samples) - len(samples) % FEATURE_DIM]
        expected = samples.reshape(FEATURE_DIM, -1).mean(axis=1)
        assert np.allclose(out[i].features, expected)
        assert out[i].n_bytes == len(p)


def test_frame_sampling(spark, media):
    frames = sample_frames(media, every=2)
    pdf = frames.toPandas()
    assert (pdf.frame_idx % 2 == 0).all()
    n_frames = {r.media_id: r.meta.n_frames for r in media.collect()}
    got = pdf.groupby("media_id").size().to_dict()
    for mid, n in n_frames.items():
        expected = len(range(0, max(n, 1), 2))
        assert got[mid] == expected


def _png(pixels, channels, filters):
    """Minimal PNG encoder for tests: applies the given per-row filter
    types (cycled), zlib-compresses, fake CRCs (decoder skips them)."""
    import struct
    import zlib

    import numpy as np

    h, stride = pixels.shape
    w = stride // channels
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    bpp = channels
    prev = np.zeros(stride, dtype=np.int32)
    raw = bytearray()
    for y in range(h):
        f = filters[y % len(filters)]
        line = pixels[y].astype(np.int32)
        out = line.copy()
        if f == 1:
            for i in range(bpp, stride):
                out[i] = (line[i] - line[i - bpp]) % 256
        elif f == 2:
            out = (line - prev) % 256
        elif f == 3:
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                out[i] = (line[i] - ((a + prev[i]) >> 1)) % 256
        elif f == 4:
            for i in range(stride):
                a = int(line[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[i] = (line[i] - pred) % 256
        raw.append(f)
        raw.extend(out.astype(np.uint8).tobytes())
        prev = line

    def chunk(typ, payload):
        return struct.pack(">I", len(payload)) + typ + payload + b"\0\0\0\0"

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_decode_png_all_filters():
    import numpy as np

    from crgp_spark.operators.multimodal import decode_media, decode_png

    rng = np.random.RandomState(3)
    for channels in (1, 3, 4):
        px = rng.randint(0, 256, size=(7, 5 * channels)).astype(np.uint8)
        data = _png(px, channels, filters=[0, 1, 2, 3, 4])
        got = decode_png(data)
        want = px.reshape(-1).astype(np.float64) / 255.0
        assert np.array_equal(got, want)
    fmt, _ = decode_media(_png(px, 4, [2]))
    assert fmt == "png"


def test_decode_png_rejects_unsupported():
    import struct
    import zlib

    import pytest as _pytest

    from crgp_spark.operators.multimodal import decode_png

    # 16-bit depth IHDR
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + b"\0\0\0\0"
        + struct.pack(">I", 0) + b"IEND" + b"\0\0\0\0"
    )
    with _pytest.raises(ValueError):
        decode_png(data)
    with _pytest.raises(ValueError):
        decode_png(b"nonsense")
    _ = zlib  # imported for parity with the encoder helper
