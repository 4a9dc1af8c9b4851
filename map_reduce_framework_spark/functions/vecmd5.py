"""Vectorized single-block MD5 (RFC 1321) over numpy — the batch twin
of ``hashlib.md5`` for SHORT messages (≤ 55 bytes, i.e. one 64-byte
block after padding).

Why this exists: several self-plant kernels derive deterministic values
as ``int(md5(f"{prefix}:{i}").hexdigest()[:15], 16)`` — the repo's
shared 60-bit hash, replayed bit-identically by the DuckDB oracle's SQL
``md5``.  The perceptual-fingerprint corpus builders
(:mod:`..operators.multimodal`) need ~256 such hashes PER ITEM, and a
``hashlib`` call per hash costs ~1.2 µs of interpreter overhead — the
measured decade-3 wall of the fingerprint family (round-13 verdict
item 4).  Hashing the whole Arrow batch's message grid through ~400
numpy vector ops instead amortizes that overhead away (~5× on the hash
portion at batch sizes ≥ 64k).

Only the one-block case is implemented — every plant message here is
``<tag>:<doc_id>:<index>`` (< 40 bytes even at int64-max doc_ids); the
public entry raises for longer input rather than silently truncating.

Algorithm constants and round structure follow RFC 1321 (public
domain reference: Rivest 1992); the implementation is an independent
numpy translation, tested byte-for-byte against ``hashlib.md5``.
"""

from __future__ import annotations

import math

import numpy as np

#: per-round left-rotate amounts (RFC 1321 §3.4)
_S = np.array(
    [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4
    + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4,
    dtype=np.uint32,
)
#: K[i] = floor(|sin(i+1)| · 2³²)
_K = np.array(
    [int(abs(math.sin(i + 1)) * (1 << 32)) & 0xFFFFFFFF for i in range(64)],
    dtype=np.uint32,
)
#: message-word index g per round
_G = np.array(
    [i for i in range(16)]
    + [(5 * i + 1) % 16 for i in range(16, 32)]
    + [(3 * i + 5) % 16 for i in range(32, 48)]
    + [(7 * i) % 16 for i in range(48, 64)],
    dtype=np.int64,
)

_INIT = (
    np.uint32(0x67452301),
    np.uint32(0xEFCDAB89),
    np.uint32(0x98BADCFE),
    np.uint32(0x10325476),
)


_S_INT = [int(s) for s in _S]
_G_INT = [int(g) for g in _G]
#: cache-blocking width for the round loop (swept: 32k beats 16k/64k)
_CHUNK = 32768


def _digest_words(blocks: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Run the 64 MD5 rounds over ``blocks`` (N×64 uint8, already
    padded) and return the first two digest words (A, B) as uint32
    arrays — all the 60-bit prefix needs.

    Hot path: message words transposed to (16, N) so the per-round
    gather is a contiguous row VIEW, and every round runs in three
    preallocated temporaries via ``out=`` — no per-round allocation,
    so throughput sits at memory bandwidth (~0.2 µs/hash at 256k)."""
    n = len(blocks)
    if n > _CHUNK:
        # cache-block: per-chunk working set (3 temps + 4 state + 16
        # message rows ≈ 23 × 4·_CHUNK bytes ≈ 3 MB) stays L2/L3-hot
        # across the 64 rounds instead of streaming 64 × ~10 full-size
        # arrays through DRAM
        outs = [
            _digest_words(blocks[i : i + _CHUNK])
            for i in range(0, n, _CHUNK)
        ]
        return (
            np.concatenate([o[0] for o in outs]),
            np.concatenate([o[1] for o in outs]),
        )
    mt = np.ascontiguousarray(
        np.ascontiguousarray(blocks).view("<u4").reshape(n, 16).T
    )
    a, b, c, d = (np.full(n, w, dtype=np.uint32) for w in _INIT)
    t1 = np.empty(n, dtype=np.uint32)
    t2 = np.empty(n, dtype=np.uint32)
    t3 = np.empty(n, dtype=np.uint32)
    for i in range(64):
        if i < 16:
            np.bitwise_not(b, out=t1)
            np.bitwise_and(t1, d, out=t1)
            np.bitwise_and(b, c, out=t2)
            np.bitwise_or(t1, t2, out=t1)
        elif i < 32:
            np.bitwise_not(d, out=t1)
            np.bitwise_and(t1, c, out=t1)
            np.bitwise_and(d, b, out=t2)
            np.bitwise_or(t1, t2, out=t1)
        elif i < 48:
            np.bitwise_xor(b, c, out=t1)
            np.bitwise_xor(t1, d, out=t1)
        else:
            np.bitwise_not(d, out=t1)
            np.bitwise_or(t1, b, out=t1)
            np.bitwise_xor(t1, c, out=t1)
        t1 += a
        t1 += _K[i]
        t1 += mt[_G_INT[i]]
        s = _S_INT[i]
        np.left_shift(t1, s, out=t2)
        np.right_shift(t1, 32 - s, out=t3)
        np.bitwise_or(t2, t3, out=t2)
        newb = a  # a's buffer is dead after t1 += a — reuse it
        np.add(b, t2, out=newb)
        a, d, c, b = d, c, b, newb
    return _INIT[0] + a, _INIT[1] + b


def _u60_from_words(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """``int(hexdigest[:15], 16)`` from digest words A, B: the first 8
    digest BYTES are little-endian A then little-endian B, and 15 hex
    chars = those 8 bytes as a big-endian int shifted right one
    nibble."""
    hi = a.byteswap().astype(np.uint64)
    lo = b.byteswap().astype(np.uint64)
    return (((hi << np.uint64(32)) | lo) >> np.uint64(4)).astype(np.int64)


def _pad_blocks(msgs: list[bytes]) -> np.ndarray:
    """One padded 64-byte block per message (RFC 1321 §3.1–3.2:
    0x80 terminator, zero fill, 8-byte little-endian BIT length)."""
    n = len(msgs)
    blocks = np.zeros((n, 64), dtype=np.uint8)
    lens = np.empty(n, dtype=np.uint64)
    for idx, msg in enumerate(msgs):
        ln = len(msg)
        if ln > 55:
            raise ValueError(f"vecmd5 is single-block only (len {ln} > 55)")
        blocks[idx, :ln] = np.frombuffer(msg, dtype=np.uint8)
        blocks[idx, ln] = 0x80
        lens[idx] = ln
    bitlen = lens * np.uint64(8)
    for byte in range(8):
        blocks[:, 56 + byte] = ((bitlen >> np.uint64(8 * byte)) & np.uint64(0xFF)).astype(np.uint8)
    return blocks


def md5_u60(msgs: list[bytes]) -> np.ndarray:
    """Batch ``int(md5(msg).hexdigest()[:15], 16)`` — int64 array."""
    if not msgs:
        return np.empty(0, dtype=np.int64)
    a, b = _digest_words(_pad_blocks(msgs))
    return _u60_from_words(a, b)


#: per-suffix digit bytes + lengths for :func:`md5_u60_grid`, cached by n
_DIGIT_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def _digits(n: int) -> tuple[np.ndarray, np.ndarray]:
    if n not in _DIGIT_CACHE:
        strs = [str(i).encode() for i in range(n)]
        dlen = np.array([len(s) for s in strs], dtype=np.int64)
        width = int(dlen.max())
        arr = np.zeros((n, width), dtype=np.uint8)
        for i, s in enumerate(strs):
            arr[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
        _DIGIT_CACHE[n] = (arr, dlen)
    return _DIGIT_CACHE[n]


def md5_u60_grid(prefixes: list[bytes], n: int) -> np.ndarray:
    """The plant-kernel grid: ``u60(md5(prefix + str(i)))`` for every
    prefix × every ``i in range(n)`` — returns shape ``(len(prefixes),
    n)`` int64.

    The message layout per prefix is fixed (prefix bytes, then 1–3
    digit bytes, terminator, bit length), so the padded blocks are
    assembled with a handful of numpy writes per prefix and the 64 MD5
    rounds run ONCE over the whole grid."""
    if not prefixes:
        return np.empty((0, n), dtype=np.int64)
    digits, dlen = _digits(n)
    width = digits.shape[1]
    pcount = len(prefixes)
    lps = np.array([len(p) for p in prefixes], dtype=np.int64)
    if int(lps.max()) + width > 55:
        raise ValueError("prefix too long for single block")
    pm = np.zeros((pcount, int(lps.max())), dtype=np.uint8)
    for p, prefix in enumerate(prefixes):
        pm[p, : len(prefix)] = np.frombuffer(prefix, dtype=np.uint8)
    blocks = np.zeros((pcount, n, 64), dtype=np.uint8)
    rows = np.arange(n)
    # group by prefix length so every write is one broadcast assignment
    # (digit columns need no masking: _digits zero-pads short suffixes)
    for lp in np.unique(lps):
        lp = int(lp)
        idx = np.nonzero(lps == lp)[0]
        blocks[idx, :, :lp] = pm[idx, None, :lp]
        blocks[idx, :, lp : lp + width] = digits[None]
        blocks[idx[:, None], rows[None, :], (lp + dlen)[None, :]] = 0x80
    flat = blocks.reshape(-1, 64)
    bitlen = ((lps[:, None] + dlen[None, :]).reshape(-1) * 8).astype(
        np.uint64
    )
    for byte in range(8):
        flat[:, 56 + byte] = (
            (bitlen >> np.uint64(8 * byte)) & np.uint64(0xFF)
        ).astype(np.uint8)
    a, b = _digest_words(flat)
    return _u60_from_words(a, b).reshape(pcount, n)
