"""The real WAV/PCM codec path: stdlib-generated fixtures decoded
through the same Arrow/mapInPandas plumbing as the stub extractor."""

from __future__ import annotations

import io
import struct
import wave

import pytest

from map_reduce_framework_spark.operators import multimodal


def _make_wav(n_channels: int, sample_rate: int, bits: int, n_samples: int) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(bits // 8)
        w.setframerate(sample_rate)
        # deterministic ramp payload
        frame = b"".join(
            (i % 251).to_bytes(1, "little") * (bits // 8)
            for i in range(n_channels)
        )
        w.writeframes(frame * n_samples)
    return buf.getvalue()


FIXTURES = [
    # (doc_id, channels, rate, bits, samples)
    (1, 1, 8000, 8, 800),
    (2, 2, 16000, 16, 1600),
    (3, 1, 44100, 16, 441),
]


def test_decode_wav_parses_pcm_geometry():
    for _, ch, rate, bits, n in FIXTURES:
        feats = multimodal.decode_wav(_make_wav(ch, rate, bits, n))
        assert feats == {
            "n_channels": ch,
            "sample_rate": rate,
            "bits_per_sample": bits,
            "n_samples": n,
            "duration_ms": pytest.approx(1000.0 * n / rate),
        }


def test_decode_wav_rejects_non_wav_and_non_pcm():
    with pytest.raises(ValueError, match="RIFF/WAVE"):
        multimodal.decode_wav(b"not a wav at all")
    # hand-build a float-format (wFormatTag=3) header → fail loudly
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 8000, 1, 8)
    payload = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(NotImplementedError, match="wFormatTag"):
        multimodal.decode_wav(payload)


def test_decode_real_routes_wav_audio():
    wav = _make_wav(1, 8000, 8, 80)
    assert multimodal.decode_real(wav, "audio")["n_samples"] == 80
    with pytest.raises(NotImplementedError):
        multimodal.decode_real(b"\x89PNG\r\n", "image")


def test_wav_features_through_mapinpandas(spark):
    rows = [
        (doc_id, bytearray(_make_wav(ch, rate, bits, n)))
        for doc_id, ch, rate, bits, n in FIXTURES
    ]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r.doc_id: r.asDict()
        for r in multimodal.wav_features(media).collect()
    }
    assert len(got) == len(FIXTURES)
    for doc_id, ch, rate, bits, n in FIXTURES:
        r = got[doc_id]
        assert (r["n_channels"], r["sample_rate"], r["bits_per_sample"]) == (
            ch,
            rate,
            bits,
        )
        assert r["n_samples"] == n
        assert r["duration_ms"] == pytest.approx(1000.0 * n / rate)


def _make_bmp(
    width: int, height: int, bpp: int = 24, top_down: bool = False
) -> bytes:
    """Hand-built uncompressed BMP: BITMAPFILEHEADER + BITMAPINFOHEADER +
    deterministic pixel rows padded to 4 bytes (the spec's layout)."""
    row_stride = ((bpp * width + 31) // 32) * 4
    pixels = bytes(
        (r * 31 + i) % 251 for r in range(height) for i in range(row_stride)
    )
    dib = struct.pack(
        "<IiiHHIIiiII",
        40,
        width,
        -height if top_down else height,
        1,
        bpp,
        0,  # BI_RGB
        len(pixels),
        2835,
        2835,
        0,
        0,
    )
    offset = 14 + len(dib)
    header = b"BM" + struct.pack("<IHHI", offset + len(pixels), 0, 0, offset)
    return header + dib + pixels


BMP_FIXTURES = [
    # (doc_id, width, height, bpp, top_down)
    (1, 4, 4, 24, False),
    (2, 5, 3, 24, False),  # width 5 → 15 data bytes, stride pads to 16
    (3, 7, 2, 8, True),
    (4, 2, 2, 32, False),
]


def test_decode_bmp_parses_geometry():
    for _, w, h, bpp, td in BMP_FIXTURES:
        feats = multimodal.decode_bmp(_make_bmp(w, h, bpp, td))
        assert feats == {
            "width": w,
            "height": h,
            "bits_per_pixel": bpp,
            "row_stride": ((bpp * w + 31) // 32) * 4,
            "n_pixels": w * h,
            "top_down": td,
        }


def test_decode_bmp_rejects_non_bmp_compressed_and_truncated():
    with pytest.raises(ValueError, match="not a BMP"):
        multimodal.decode_bmp(b"PNG nope")
    # RLE8-compressed → fail loudly
    rle = bytearray(_make_bmp(4, 4, 8))
    struct.pack_into("<I", rle, 30, 1)  # biCompression = BI_RLE8
    with pytest.raises(NotImplementedError, match="compression"):
        multimodal.decode_bmp(bytes(rle))
    # pixel array cut short → fail loudly, never clamp
    whole = _make_bmp(4, 4, 24)
    with pytest.raises(ValueError, match="truncated"):
        multimodal.decode_bmp(whole[:-5])
    with pytest.raises(ValueError, match="DIB header"):
        multimodal.decode_bmp(b"BM" + bytes(12) + struct.pack("<I", 16) + bytes(8))


def test_decode_real_routes_bmp_image():
    bmp = _make_bmp(6, 2, 24)
    assert multimodal.decode_real(bmp, "image")["n_pixels"] == 12


def test_bmp_features_through_mapinpandas(spark):
    rows = [
        (doc_id, bytearray(_make_bmp(w, h, bpp, td)))
        for doc_id, w, h, bpp, td in BMP_FIXTURES
    ]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r.doc_id: r.asDict() for r in multimodal.bmp_features(media).collect()
    }
    assert len(got) == len(BMP_FIXTURES)
    for doc_id, w, h, bpp, td in BMP_FIXTURES:
        r = got[doc_id]
        assert (r["width"], r["height"], r["bits_per_pixel"]) == (w, h, bpp)
        assert r["n_pixels"] == w * h
        assert r["top_down"] == td


def test_decode_wav_rejects_truncated_data_chunk():
    """A data chunk whose declared length overruns the payload is a
    corrupt file — fail loudly (round-6 ADVICE), never silently clamp
    n_samples/duration to the truncated byte count."""
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    payload = (
        b"RIFF" + struct.pack("<I", 0) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 100) + bytes(10)  # declares 100, has 10
    )
    with pytest.raises(ValueError, match="truncated"):
        multimodal.decode_wav(payload)


def test_decode_wav_skips_unknown_and_odd_chunks():
    """RIFF chunk walking: unknown chunks (LIST metadata) are skipped and
    odd-length chunks pad to even per spec — fmt/data still found."""
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    odd_meta = b"xyz"  # 3 bytes -> 1 pad byte
    data = bytes(range(10))
    payload = (
        b"RIFF" + struct.pack("<I", 0) + b"WAVE"
        + b"LIST" + struct.pack("<I", len(odd_meta)) + odd_meta + b"\x00"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    feats = multimodal.decode_wav(payload)
    assert feats["n_samples"] == 10 and feats["sample_rate"] == 8000
