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


# ---------------------------------------------------------------------------
# PNG codec (full pixel decode)
# ---------------------------------------------------------------------------


def _filter_rows(flat, filters, bpp):
    """Apply per-row PNG filter types to a (rows, stride) int16 matrix;
    returns the filtered byte stream (1 filter byte + stride bytes per
    row).  Shared by the plain and Adam7 encoders below."""
    import numpy as np

    stream = bytearray()
    for y, f in enumerate(filters):
        row = flat[y]
        prior = flat[y - 1] if y else np.zeros_like(row)
        enc = row.copy()
        for x in range(len(row)):
            a = int(row[x - bpp]) if x >= bpp else 0
            b, c = int(prior[x]), (int(prior[x - bpp]) if x >= bpp else 0)
            if f == 1:
                enc[x] = (row[x] - a) & 0xFF
            elif f == 2:
                enc[x] = (row[x] - b) & 0xFF
            elif f == 3:
                enc[x] = (row[x] - ((a + b) >> 1)) & 0xFF
            elif f == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[x] = (row[x] - pred) & 0xFF
        stream.append(f)
        stream += bytes(int(v) & 0xFF for v in enc)
    return stream


def _make_png(pixels, filters=None, color_type=None, interlace=0,
              lie_about_interlace=False):
    """Minimal PNG encoder for tests: numpy (h, w, ch) uint8 -> bytes,
    applying the given per-row filter types (default all 0/None).
    ``interlace=1`` encodes a REAL Adam7 stream (per-pass filtering,
    ``filters`` cycled within each pass); ``lie_about_interlace`` flags
    the header interlaced while writing a sequential stream — the
    malformed case the decoder must reject."""
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    if color_type is None:
        color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    bpp = ch
    if interlace == 1 and not lie_about_interlace:
        stream = bytearray()
        for xoff, yoff, xstep, ystep in multimodal._ADAM7_PASSES:
            sub = px[yoff::ystep, xoff::xstep, :]
            ph, pw = sub.shape[0], sub.shape[1]
            if ph == 0 or pw == 0:
                continue
            fl = (filters or [0])
            pass_filters = [fl[i % len(fl)] for i in range(ph)]
            stream += _filter_rows(
                sub.reshape(ph, pw * ch).astype(np.int16), pass_filters, bpp
            )
    else:
        fl = filters or [0]
        row_filters = [fl[i % len(fl)] for i in range(h)]
        stream = _filter_rows(
            px.reshape(h, w * ch).astype(np.int16), row_filters, bpp
        )

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    ihdr = struct.pack(
        ">IIBBBBB", w, h, 8, color_type, 0, 0,
        1 if lie_about_interlace else interlace,
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(stream)))
        + chunk(b"IEND", b"")
    )


def test_decode_png_roundtrips_every_filter_type():
    """Pixel-exact recovery through all five scanline filters on a
    gradient RGB image (each row encoded with a different filter)."""
    import numpy as np

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 9, 3), dtype=np.uint8)
    payload = _make_png(px, filters=[0, 1, 2, 3, 4])
    out, w, h, depth, ch = multimodal._png_pixels(payload)
    assert (w, h, depth, ch) == (9, 5, 8, 3)
    assert (out == px.reshape(5, 27)).all()
    feats = multimodal.decode_png(payload)
    assert feats["n_pixels"] == 45
    assert feats["mean_sample"] == round(float(px.mean()), 4)


def test_decode_png_color_types():
    import numpy as np

    for ch in (1, 2, 3, 4):
        px = np.arange(4 * 3 * ch, dtype=np.uint8).reshape(4, 3, ch)
        feats = multimodal.decode_png(_make_png(px, filters=[4, 3, 2, 1]))
        assert feats["channels"] == ch
        assert feats["mean_sample"] == round(float(px.mean()), 4)


def test_decode_png_adam7_roundtrips_pixel_exact():
    """Round-10: Adam7-interlaced decode must recover the EXACT pixels
    a sequential encode of the same image yields — across sizes that
    exercise empty passes (dims < 8), ragged pass widths, and all five
    filters cycling within each pass."""
    import numpy as np

    rng = np.random.default_rng(13)
    for h, w, ch in [(16, 16, 3), (9, 13, 4), (5, 3, 1), (1, 1, 2), (2, 10, 3), (8, 1, 1)]:
        px = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        seq = multimodal._png_pixels(_make_png(px, filters=[0, 1, 2, 3, 4]))
        lac = multimodal._png_pixels(
            _make_png(px, filters=[0, 1, 2, 3, 4], interlace=1)
        )
        assert (lac[0] == seq[0]).all(), (h, w, ch)
        assert lac[1:] == seq[1:] == (w, h, 8, ch)
        feats = multimodal.decode_png(
            _make_png(px, filters=[4, 3, 2, 1], interlace=1)
        )
        assert feats["mean_sample"] == round(float(px.mean()), 4)


def test_decode_png_adam7_truncated_pass_fails_loudly():
    import numpy as np
    import zlib

    px = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
    good = _make_png(px, interlace=1)
    # rebuild with the last 40 inflated bytes cut: mid-pass truncation
    idat_at = good.index(b"IDAT") - 4
    (n,) = struct.unpack_from(">I", good, idat_at)
    raw = zlib.decompress(good[idat_at + 8 : idat_at + 8 + n])
    body = zlib.compress(raw[:-40])
    tail = good[idat_at + 8 + n + 4 :]
    rebuilt = (
        good[:idat_at]
        + struct.pack(">I", len(body)) + b"IDAT" + body
        + struct.pack(">I", zlib.crc32(b"IDAT" + body)) + tail
    )
    with pytest.raises(ValueError, match="Adam7"):
        multimodal.decode_png(rebuilt)


def test_decode_png_rejects_corrupt_and_unsupported():
    import numpy as np
    import zlib

    px = np.zeros((2, 2, 3), dtype=np.uint8)
    good = _make_png(px)
    with pytest.raises(ValueError, match="not a PNG"):
        multimodal.decode_png(b"BM" + good)
    bad_crc = bytearray(good)
    bad_crc[-5] ^= 0xFF  # corrupt IEND CRC
    with pytest.raises(ValueError, match="CRC mismatch"):
        multimodal.decode_png(bytes(bad_crc))
    with pytest.raises(ValueError, match="truncated"):
        multimodal.decode_png(good[:-20])  # cuts into the IDAT chunk
    with pytest.raises(ValueError, match="truncated"):
        # complete IEND body but truncated CRC — must be the documented
        # fail-loud ValueError, not a raw struct.error
        multimodal.decode_png(good[:-2])
    with pytest.raises(ValueError, match="missing"):
        multimodal.decode_png(good[:-12])  # clean cut at the IEND boundary
    with pytest.raises(ValueError, match="Adam7"):
        # header claims Adam7 but the stream is sequential — the pass
        # walk must detect the byte-count mismatch, not decode garbage
        multimodal.decode_png(
            _make_png(np.zeros((16, 16, 3), np.uint8), lie_about_interlace=True)
        )
    with pytest.raises(NotImplementedError, match="only 8-bit"):
        multimodal.decode_png(_make_png(px, color_type=3))  # palette
    # declared geometry disagreeing with the inflated stream fails loudly
    short = _make_png(px)
    idat_at = short.index(b"IDAT") - 4
    (n,) = struct.unpack_from(">I", short, idat_at)
    tail = short[idat_at + 8 + n + 4:]
    body = zlib.compress(bytes(5))  # too few bytes for 2x2 RGB
    rebuilt = (
        short[:idat_at]
        + struct.pack(">I", len(body)) + b"IDAT" + body
        + struct.pack(">I", zlib.crc32(b"IDAT" + body)) + tail
    )
    with pytest.raises(ValueError, match="length mismatch"):
        multimodal.decode_png(rebuilt)


def test_decode_real_routes_png_image():
    import numpy as np

    png = _make_png(np.full((2, 3, 3), 128, dtype=np.uint8))
    assert multimodal.decode_real(png, "image")["mean_sample"] == 128.0


def test_png_features_through_mapinpandas(spark):
    import numpy as np

    rows = [
        (doc_id, bytearray(_make_png(
            np.full((h, w, ch), doc_id * 10, dtype=np.uint8),
            filters=[f % 5 for f in range(h)])))
        for doc_id, (w, h, ch) in enumerate([(3, 2, 3), (5, 4, 1), (2, 6, 4)])
    ]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    feats = {
        r.doc_id: r.asDict() for r in multimodal.png_features(media).collect()
    }
    for doc_id, (w, h, ch) in enumerate([(3, 2, 3), (5, 4, 1), (2, 6, 4)]):
        assert feats[doc_id]["width"] == w and feats[doc_id]["height"] == h
        assert feats[doc_id]["channels"] == ch
        assert feats[doc_id]["mean_sample"] == float(doc_id * 10)


# ---------------------------------------------------------------------------
# GIF codec (container walk: frames + duration, no LZW decode)
# ---------------------------------------------------------------------------


def _make_gif(w, h, n_frames, delays_cs=None, local_palette=False):
    """Minimal animated-GIF encoder for tests: real block structure with
    arbitrary (unparsed) LZW payload bytes."""
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80, 0, 0)  # 2-entry global palette
    out += bytes(6)  # the palette
    for i in range(n_frames):
        if delays_cs is not None:
            out += b"\x21\xf9\x04\x00" + struct.pack("<H", delays_cs[i]) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
        if local_palette:
            out += b"\x80" + bytes(6)  # local 2-entry palette
        else:
            out += b"\x00"
        out += b"\x02"  # LZW min code size
        out += b"\x03\x01\x02\x03" + b"\x00"  # one 3-byte sub-block + end
    out += b"\x3b"
    return bytes(out)


def _lzw_clear_per_literal(indices, min_code_size):
    """Valid (wasteful) GIF LZW stream: CLEAR before every literal, so
    the code width never grows — the 'uncompressed GIF' trick real
    encoders use to sidestep width bookkeeping.  Exercises the decoder's
    reset path on every pixel."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    codes = [clear]
    for p in indices:
        codes += [p, clear]
    codes[-1] = end  # trailing clear -> end-of-information
    bitbuf = nbits = 0
    out = bytearray()
    for c in codes:
        bitbuf |= c << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _make_pixel_gif(w, h, indices, palette, min_code_size=2, lzw=None):
    """GIF with one frame of REAL LZW-encoded pixel data."""
    n_entries = len(palette) // 3
    pal_bits = max(1, (n_entries - 1).bit_length())
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (pal_bits - 1), 0, 0)
    out += palette + bytes(3 * ((2 << (pal_bits - 1)) - n_entries))
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out.append(min_code_size)
    data = lzw if lzw is not None else _lzw_clear_per_literal(
        indices, min_code_size
    )
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def test_gif_lzw_roundtrip_and_pixel_means():
    """Full pixel decode (round 8): a planted 4x2 image roundtrips
    through real LZW sub-blocks and the per-channel means match the
    palette-mapped pixels exactly."""
    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])
    indices = [0, 1, 2, 3, 3, 2, 1, 0]
    gif = _make_pixel_gif(4, 2, indices, palette)
    feats = multimodal.decode_gif(gif, decode_pixels=True)
    assert feats["n_frames"] == 1 and feats["n_pixels"] == 8
    px = [palette[3 * i : 3 * i + 3] for i in indices]
    assert feats["mean_r"] == round(sum(p[0] for p in px) / 8, 4)
    assert feats["mean_g"] == round(sum(p[1] for p in px) / 8, 4)
    assert feats["mean_b"] == round(sum(p[2] for p in px) / 8, 4)
    # container-only walk unchanged by the pixel dial
    assert "n_pixels" not in multimodal.decode_gif(gif)


def test_gif_lzw_kwkwk_and_width_growth():
    """The two classic LZW decoder paths, hand-packed bit-exact:
    (a) the KwKwK case — code == next_code refers to the entry being
    built ([clear,1,6] at min=2 decodes to indices 1,1,1);
    (b) table growth crossing a width boundary — after three adds
    next_code hits 2^3, so the 4th literal and END are read at 4 bits
    ([clear,0,1,2,3,end] packs to 0x44 0x34 0x05)."""
    assert multimodal._gif_lzw_decode(bytes([0x8C, 0x0B]), 2, 3) == bytes(
        [1, 1, 1]
    )
    assert multimodal._gif_lzw_decode(
        bytes([0x44, 0x34, 0x05]), 2, 4
    ) == bytes([0, 1, 2, 3])


def test_gif_lzw_fails_loudly():
    palette = bytes([0, 0, 0, 255, 255, 255])
    gif_trunc = _make_pixel_gif(4, 4, [0, 1] * 4, palette)  # 8 px for 16
    with pytest.raises(ValueError, match="short|truncated"):
        multimodal.decode_gif(gif_trunc, decode_pixels=True)
    # an invalid code beyond the table: width-3 code 7 right after clear
    bad = _make_pixel_gif(1, 1, [0], palette, lzw=bytes([0b111_100]))
    with pytest.raises(ValueError, match="invalid GIF LZW code"):
        multimodal.decode_gif(bad, decode_pixels=True)
    with pytest.raises(ValueError, match="min code size"):
        multimodal._gif_lzw_decode(b"\x00", 1, 1)


def test_decode_gif_counts_frames_and_duration():
    feats = multimodal.decode_gif(_make_gif(12, 7, 3, delays_cs=[10, 20, 30]))
    assert (feats["width"], feats["height"]) == (12, 7)
    assert feats["n_frames"] == 3 and feats["duration_ms"] == 600
    assert feats["has_global_palette"]

    still = multimodal.decode_gif(_make_gif(4, 4, 1))
    assert still["n_frames"] == 1 and still["duration_ms"] == 0

    local = multimodal.decode_gif(_make_gif(4, 4, 2, local_palette=True))
    assert local["n_frames"] == 2


def test_decode_gif_rejects_corrupt():
    good = _make_gif(4, 4, 2, delays_cs=[5, 5])
    with pytest.raises(ValueError, match="not a GIF"):
        multimodal.decode_gif(b"PNG" + good)
    with pytest.raises(ValueError, match="truncated|trailer"):
        multimodal.decode_gif(good[:-6])
    with pytest.raises(ValueError, match="no image frames"):
        multimodal.decode_gif(good[:13] + bytes(6) + b"\x3b")
    mangled = bytearray(good)
    mangled[19] = 0x7F  # first block byte -> unknown type
    with pytest.raises(ValueError, match="unknown GIF block"):
        multimodal.decode_gif(bytes(mangled))


def test_decode_real_routes_gif_video_and_image():
    gif = _make_gif(6, 3, 4, delays_cs=[25, 25, 25, 25])
    assert multimodal.decode_real(gif, "video")["n_frames"] == 4
    assert multimodal.decode_real(gif, "image")["duration_ms"] == 1000


def test_gif_features_through_mapinpandas(spark):
    rows = [
        (doc_id, bytearray(_make_gif(w, h, nf, delays_cs=[7] * nf)))
        for doc_id, (w, h, nf) in enumerate([(3, 2, 1), (5, 4, 3), (2, 6, 8)])
    ]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    feats = {
        r.doc_id: r.asDict() for r in multimodal.gif_features(media).collect()
    }
    for doc_id, (w, h, nf) in enumerate([(3, 2, 1), (5, 4, 3), (2, 6, 8)]):
        assert feats[doc_id]["n_frames"] == nf
        assert feats[doc_id]["duration_ms"] == 70 * nf
        assert (feats[doc_id]["width"], feats[doc_id]["height"]) == (w, h)


# --------------------------------------------------------------------------
# JPEG marker walk (codec #5)
# --------------------------------------------------------------------------


def _make_jpeg(
    width=17,
    height=9,
    n_components=3,
    progressive=False,
    jfif=True,
    entropy=b"\x12\x34\xff\x00\x56\xff\xd3\x78",
    include_sof=True,
    include_eoi=True,
):
    """Minimal structurally-valid JPEG: SOI, optional JFIF APP0, one DQT,
    SOF0/SOF2, one DHT, SOS + entropy bytes (with a stuffed FF00 and a
    restart marker to exercise the scan loop), EOI.  Entropy content is
    arbitrary — the marker walk never Huffman-decodes."""
    import struct

    parts = [b"\xff\xd8"]
    if jfif:
        body = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
        parts.append(b"\xff\xe0" + struct.pack(">H", 2 + len(body)) + body)
    dqt = b"\x00" + bytes(64)
    parts.append(b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt)
    if include_sof:
        comps = b"".join(
            bytes([i + 1, 0x11, 0]) for i in range(n_components)
        )
        sof = b"\x08" + struct.pack(">HH", height, width) + bytes(
            [n_components]
        ) + comps
        marker = b"\xff\xc2" if progressive else b"\xff\xc0"
        parts.append(marker + struct.pack(">H", 2 + len(sof)) + sof)
    dht = b"\x00" + bytes(16) + b""
    parts.append(b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht)
    sos = bytes([n_components]) + b"".join(
        bytes([i + 1, 0]) for i in range(n_components)
    ) + b"\x00\x3f\x00"
    parts.append(b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos)
    parts.append(entropy)
    if include_eoi:
        parts.append(b"\xff\xd9")
    return b"".join(parts)


def test_jpeg_header_roundtrip():
    from map_reduce_framework_spark.operators.multimodal import decode_jpeg

    out = decode_jpeg(_make_jpeg(width=640, height=480, n_components=3))
    assert out["width"] == 640 and out["height"] == 480
    assert out["n_components"] == 3 and out["precision"] == 8
    assert out["progressive"] is False
    assert out["n_quant_tables"] == 1 and out["n_huff_tables"] == 1
    assert out["has_jfif"] is True


def test_jpeg_progressive_flag_and_gray():
    from map_reduce_framework_spark.operators.multimodal import decode_jpeg

    out = decode_jpeg(
        _make_jpeg(n_components=1, progressive=True, jfif=False)
    )
    assert out["progressive"] is True
    assert out["n_components"] == 1 and out["has_jfif"] is False


def test_jpeg_fail_loud():
    import pytest as _pytest

    from map_reduce_framework_spark.operators.multimodal import decode_jpeg

    with _pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01\x02\x03")
    with _pytest.raises(ValueError, match="no EOI"):
        decode_jpeg(_make_jpeg(include_eoi=False))
    with _pytest.raises(ValueError, match="SOS before SOF"):
        decode_jpeg(_make_jpeg(include_sof=False))
    # a bare marker inside entropy data now legally ENDS the scan
    # (progressive files do exactly this) — but the resumed walk still
    # fails loudly when that marker's segment is garbage
    with _pytest.raises(ValueError, match="extends past payload"):
        decode_jpeg(_make_jpeg(entropy=b"\x11\xff\xc0\x22"))


def _make_progressive_two_scan():
    """Real progressive shape: SOF2, then TWO SOS scans separated by a
    second DHT, with legal 0xFF fill bytes padding before that DHT —
    the file the round-9 single-scan walk rejected (round-10 ADVICE)."""
    import struct

    parts = [b"\xff\xd8"]
    dqt = b"\x00" + bytes(64)
    parts.append(b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt)
    sof = b"\x08" + struct.pack(">HH", 40, 60) + bytes([1, 1, 0x11, 0])
    parts.append(b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof)
    dht = b"\x00" + bytes(16)
    sos = b"\x01\x01\x00\x00\x05\x00"  # 1 component, Ss=0 Se=5 (scan 1)
    parts.append(b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht)
    parts.append(b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos)
    parts.append(b"\x12\xff\x00\x34")  # scan-1 entropy (stuffed FF)
    parts.append(b"\xff\xff\xff")  # legal fill-byte run before marker
    parts.append(b"\xc4" + struct.pack(">H", 2 + len(dht)) + dht)
    sos2 = b"\x01\x01\x10\x06\x3f\x00"  # scan 2: Ss=6 Se=63
    parts.append(b"\xff\xda" + struct.pack(">H", 2 + len(sos2)) + sos2)
    parts.append(b"\x56\xff\xd0\x78")  # scan-2 entropy (restart marker)
    parts.append(b"\xff\xd9")
    return b"".join(parts)


def test_jpeg_progressive_two_scans_with_fill_bytes():
    from map_reduce_framework_spark.operators.multimodal import decode_jpeg

    out = decode_jpeg(_make_progressive_two_scan())
    assert out["progressive"] is True
    assert out["width"] == 60 and out["height"] == 40
    assert out["n_huff_tables"] == 2  # the inter-scan DHT was parsed


def test_jpeg_features_through_mapinpandas(spark):
    from map_reduce_framework_spark.operators.multimodal import jpeg_features

    payloads = [
        (1, _make_jpeg(width=32, height=16)),
        (2, _make_jpeg(width=100, height=50, progressive=True)),
    ]
    media = spark.createDataFrame(payloads, "doc_id long, payload binary")
    rows = {r["doc_id"]: r for r in jpeg_features(media).collect()}
    assert rows[1]["width"] == 32 and rows[1]["progressive"] is False
    assert rows[2]["height"] == 50 and rows[2]["progressive"] is True


def test_decode_real_dispatches_jpeg():
    from map_reduce_framework_spark.operators.multimodal import decode_real

    out = decode_real(_make_jpeg(width=24, height=12), "image")
    assert out["width"] == 24 and out["height"] == 12


# --------------------------------------------------------------------------
# dedup_image_phash (round 13)
# --------------------------------------------------------------------------


def test_png_encode_gray_roundtrips_through_real_decoder():
    from map_reduce_framework_spark.operators.multimodal import (
        _png_encode_gray,
        _png_pixels,
    )

    px = bytes((i * 7 + 13) % 256 for i in range(256))
    payload = _png_encode_gray(px, 16, 16)
    out, w, h, depth, ch = _png_pixels(payload)
    assert (w, h, depth, ch) == (16, 16, 8, 1)
    assert bytes(out.reshape(-1).tolist()) == px


def test_image_ahash_exposure_invariance_and_discrimination(spark):
    """The aHash CONTRACT on engineered images: a uniformly re-exposed
    copy (all pixels +2 — different bytes, same structure) hashes
    IDENTICALLY (mean-relative thresholding), while an unrelated image
    lands far away in Hamming space."""
    import numpy as np

    from map_reduce_framework_spark.operators.multimodal import (
        PHASH_BANDS,
        _png_encode_gray,
        image_ahash_bands,
    )

    rng = np.random.RandomState(7)
    base = rng.randint(0, 240, size=256).astype("uint8").tobytes()
    brightened = bytes(v + 2 for v in base)
    other = rng.randint(0, 240, size=256).astype("uint8").tobytes()
    media = spark.createDataFrame(
        [
            (0, bytearray(_png_encode_gray(base, 16, 16))),
            (1, bytearray(_png_encode_gray(brightened, 16, 16))),
            (2, bytearray(_png_encode_gray(other, 16, 16))),
        ],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in image_ahash_bands(media).collect()}
    bands = lambda d: [rows[d][f"b{k}"] for k in range(PHASH_BANDS)]  # noqa: E731
    assert bands(0) == bands(1), "re-exposure must not change the aHash"
    ham = sum(
        bin(x ^ y).count("1") for x, y in zip(bands(0), bands(2))
    )
    assert ham > 10, f"unrelated images should be far apart, got {ham}"


def test_dedup_image_phash_finds_exactly_the_planted_pairs(spark):
    from map_reduce_framework_spark.operators.multimodal import (
        PHASH_MAX_HAMMING,
        PHASH_PLANT_MOD,
        dedup_image_phash,
    )

    from .conftest import SF_DIR

    import duckdb

    n_docs = duckdb.connect().execute(
        f"SELECT count(*) FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchone()[0]
    planted = {
        (d - 3, d)
        for d in range(0, n_docs, 3)
        if (d // 3) % PHASH_PLANT_MOD == 1
    }
    rows = dedup_image_phash(spark, SF_DIR).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in rows}
    assert got == planted and len(planted) > 0
    for r in rows:
        assert 0 <= r["hamming"] <= PHASH_MAX_HAMMING


def test_dedup_image_phash_matches_oracle(spark, duck):
    from map_reduce_framework_spark.operators.multimodal import (
        ORACLES,
        dedup_image_phash,
    )

    from .conftest import assert_matches_oracle

    assert_matches_oracle(
        spark,
        duck,
        dedup_image_phash,
        ORACLES["dedup_image_phash"],
        "dedup_image_phash",
    )


# --------------------------------------------------------------------------
# dedup_audio_fingerprint (round 13)
# --------------------------------------------------------------------------


def test_wav_pcm8_roundtrips_through_real_chunk_walk():
    import numpy as np

    from map_reduce_framework_spark.operators.multimodal import (
        _wav_encode_pcm8,
        _wav_pcm8_samples,
        decode_wav,
    )

    u = bytes((i * 11 + 5) % 200 for i in range(260))
    payload = _wav_encode_pcm8(u)
    geo = decode_wav(payload)
    assert geo["n_samples"] == 260 and geo["bits_per_sample"] == 8
    assert geo["n_channels"] == 1
    assert bytes(_wav_pcm8_samples(payload).tolist()) == u
    assert np.frombuffer(u, dtype=np.uint8).shape == (260,)


def test_audio_fingerprint_dc_offset_invariance_and_discrimination(spark):
    """The delta-sign CONTRACT on engineered clips: a +5 DC offset
    shifts every frame energy by the same amount, so the fingerprint is
    IDENTICAL (exactly — no strict inequality can flip); an unrelated
    clip lands far away in Hamming space."""
    import numpy as np

    from map_reduce_framework_spark.operators.multimodal import (
        AUDIO_N_SAMPLES,
        PHASH_BANDS,
        _wav_encode_pcm8,
        audio_delta_bands,
    )

    rng = np.random.RandomState(11)
    base = rng.randint(0, 200, size=AUDIO_N_SAMPLES).astype("uint8").tobytes()
    offset = bytes(v + 5 for v in base)
    other = rng.randint(0, 200, size=AUDIO_N_SAMPLES).astype("uint8").tobytes()
    media = spark.createDataFrame(
        [
            (0, bytearray(_wav_encode_pcm8(base))),
            (1, bytearray(_wav_encode_pcm8(offset))),
            (2, bytearray(_wav_encode_pcm8(other))),
        ],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in audio_delta_bands(media).collect()}
    bands = lambda d: [rows[d][f"b{k}"] for k in range(PHASH_BANDS)]  # noqa: E731
    assert bands(0) == bands(1), "DC offset must not change the fingerprint"
    ham = sum(bin(x ^ y).count("1") for x, y in zip(bands(0), bands(2)))
    assert ham > 10, f"unrelated clips should be far apart, got {ham}"


def test_dedup_audio_fingerprint_finds_exactly_the_planted_pairs(spark):
    import duckdb

    from map_reduce_framework_spark.operators.multimodal import (
        PHASH_MAX_HAMMING,
        PHASH_PLANT_MOD,
        dedup_audio_fingerprint,
    )

    from .conftest import SF_DIR

    n_docs = duckdb.connect().execute(
        f"SELECT count(*) FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchone()[0]
    planted = {
        (d - 3, d)
        for d in range(1, n_docs, 3)
        if ((d - 1) // 3) % PHASH_PLANT_MOD == 1
    }
    rows = dedup_audio_fingerprint(spark, SF_DIR).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in rows}
    assert got == planted and len(planted) > 0
    for r in rows:
        assert 0 <= r["hamming"] <= PHASH_MAX_HAMMING


def test_dedup_audio_fingerprint_matches_oracle(spark, duck):
    from map_reduce_framework_spark.operators.multimodal import (
        ORACLES,
        dedup_audio_fingerprint,
    )

    from .conftest import assert_matches_oracle

    assert_matches_oracle(
        spark,
        duck,
        dedup_audio_fingerprint,
        ORACLES["dedup_audio_fingerprint"],
        "dedup_audio_fingerprint",
    )


def test_media_dedup_clusters_resolves_planted_pairs(spark):
    """Every planted pair becomes a 2-doc cluster whose canonical is the
    lower doc_id; modalities never mix (populations are disjoint)."""
    from map_reduce_framework_spark.operators.multimodal import (
        dedup_audio_fingerprint,
        dedup_image_phash,
        media_dedup_clusters,
    )

    from .conftest import SF_DIR

    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup_image_phash(spark, SF_DIR).collect()
    } | {
        (r["doc_a"], r["doc_b"])
        for r in dedup_audio_fingerprint(spark, SF_DIR).collect()
    }
    rows = {r["doc_id"]: r for r in media_dedup_clusters(spark, SF_DIR).collect()}
    assert set(rows) == {d for p in pairs for d in p}
    for a, b in pairs:
        assert rows[a]["cluster_id"] == rows[b]["cluster_id"] == a
        assert rows[a]["is_canonical"] and not rows[b]["is_canonical"]
        assert rows[a]["modality"] == rows[b]["modality"]
        assert rows[a]["modality"] == ("image" if a % 3 == 0 else "audio")


def test_media_dedup_clusters_matches_oracle(spark, duck):
    from map_reduce_framework_spark.operators.multimodal import (
        ORACLES,
        media_dedup_clusters,
    )

    from .conftest import assert_matches_oracle

    assert_matches_oracle(
        spark,
        duck,
        media_dedup_clusters,
        ORACLES["media_dedup_clusters"],
        "media_dedup_clusters",
    )


def test_dedup_media_incremental_flags_exactly_the_straddling_plants(spark):
    """The ingest screen must flag exactly the NEW docs whose planted
    partner is OLD (a new doc whose near-dup partner is also in the
    batch is intra-batch work, out of this screen's scope — same
    contract as dedup_incremental's new×old join)."""
    import duckdb

    from map_reduce_framework_spark.operators.dedup import (
        INCR_BATCH_MOD,
        hash60,
    )
    from map_reduce_framework_spark.operators.multimodal import (
        PHASH_PLANT_MOD,
        dedup_media_incremental,
    )

    from .conftest import SF_DIR

    con = duckdb.connect()
    n_docs = con.execute(
        f"SELECT count(*) FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchone()[0]

    def is_new(d):
        return (
            con.execute(
                "SELECT CAST(concat('0x', substr(md5(?),1,15)) AS BIGINT) % ?",
                [f"batch:{d}", INCR_BATCH_MOD],
            ).fetchone()[0]
            == 0
        )

    expect = {"image": {"n_new": 0, "n_dup": 0}, "audio": {"n_new": 0, "n_dup": 0}}
    for d in range(n_docs):
        mod = {0: "image", 1: "audio"}.get(d % 3)
        if mod is None:
            continue
        if is_new(d):
            expect[mod]["n_new"] += 1
        # planted pair (base, d): flag whichever member is new while the
        # other is old
        idx = (d - (0 if mod == "image" else 1)) // 3
        if idx % PHASH_PLANT_MOD == 1:
            a, b = d - 3, d
            for new_side, old_side in ((a, b), (b, a)):
                if is_new(new_side) and not is_new(old_side):
                    expect[mod]["n_dup"] += 1
    rows = {r["modality"]: r for r in dedup_media_incremental(spark, SF_DIR).collect()}
    for mod in ("image", "audio"):
        assert rows[mod]["n_new"] == expect[mod]["n_new"], mod
        assert rows[mod]["n_dup"] == expect[mod]["n_dup"], mod
        assert rows[mod]["n_kept"] == expect[mod]["n_new"] - expect[mod]["n_dup"]
    assert sum(v["n_dup"] for v in expect.values()) > 0, "vacuous fixture"


def test_dedup_media_incremental_matches_oracle(spark, duck):
    from map_reduce_framework_spark.operators.multimodal import (
        ORACLES,
        dedup_media_incremental,
    )

    from .conftest import assert_matches_oracle

    assert_matches_oracle(
        spark,
        duck,
        dedup_media_incremental,
        ORACLES["dedup_media_incremental"],
        "dedup_media_incremental",
    )


def test_dedup_media_incremental_empty_new_batch_emits_zeros(spark, tmp_path):
    """A modality whose hash split selects NO new docs must report
    n_new = n_dup = n_kept = 0, not NULL (round-13 advice: the bare
    sums over an empty new batch were NULL while the oracle emits 0)."""
    import hashlib

    import pandas as pd

    from map_reduce_framework_spark.operators.dedup import INCR_BATCH_MOD
    from map_reduce_framework_spark.operators.multimodal import (
        dedup_media_incremental,
    )

    def is_new(d):
        h = hashlib.md5(f"batch:{d}".encode()).hexdigest()
        return int(h[:15], 16) % INCR_BATCH_MOD == 0

    # image docs (d % 3 == 0) that the split marks OLD, plus audio docs
    # (d % 3 == 1) containing at least one NEW one — the image side's
    # new batch is then empty by construction
    imgs = [d for d in range(0, 600, 3) if not is_new(d)][:4]
    auds_new = [d for d in range(1, 3000, 3) if is_new(d)][:1]
    auds_old = [d for d in range(1, 600, 3) if not is_new(d)][:3]
    ids = sorted(imgs + auds_new + auds_old)
    assert auds_new, "no new audio doc found in range"
    d = tmp_path / "sf"
    d.mkdir()
    pd.DataFrame(
        {
            "doc_id": ids,
            "text": [f"doc {i}" for i in ids],
            "lang": ["en"] * len(ids),
            "source": ["src0"] * len(ids),
            "n_chars": [len(f"doc {i}") for i in ids],
        }
    ).to_parquet(d / "documents.parquet")
    rows = {
        r["modality"]: r
        for r in dedup_media_incremental(spark, str(d)).collect()
    }
    img = rows["image"]
    assert (img["n_new"], img["n_dup"], img["n_kept"]) == (0, 0, 0)
    assert rows["audio"]["n_new"] == len(auds_new)
