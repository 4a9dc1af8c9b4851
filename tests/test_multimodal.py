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
