"""vecmd5 — the batch twin of ``int(md5(...).hexdigest()[:15], 16)``
must be BIT-identical to hashlib (the DuckDB oracles replay the same
hash via SQL ``md5``, so any drift here is an oracle mismatch)."""

import hashlib

import numpy as np
import pytest

from map_reduce_framework_spark.functions.vecmd5 import md5_u60, md5_u60_grid


def _ref(msg: bytes) -> int:
    return int(hashlib.md5(msg).hexdigest()[:15], 16)


def test_md5_u60_matches_hashlib_all_lengths():
    # every admissible length 0..55, plus the real plant-message shapes
    msgs = [b"z" * n for n in range(56)]
    msgs += [
        f"imgpx:{b}:{i}".encode()
        for b in (0, 1, 12345, 2**62)
        for i in (0, 9, 10, 99, 100, 4095)
    ]
    got = md5_u60(msgs)
    exp = np.array([_ref(m) for m in msgs], dtype=np.int64)
    assert (got == exp).all()


def test_md5_u60_rejects_multiblock():
    with pytest.raises(ValueError):
        md5_u60([b"z" * 56])


def test_md5_u60_empty():
    assert md5_u60([]).shape == (0,)


def test_grid_matches_hashlib():
    prefixes = [f"wavpx:{b}:".encode() for b in (0, 7, 99999999)]
    n = 1024
    grid = md5_u60_grid(prefixes, n)
    assert grid.shape == (3, n)
    for pi, p in enumerate(prefixes):
        for i in (0, 1, 9, 10, 99, 100, 999, 1023):
            assert grid[pi, i] == _ref(p + str(i).encode())


def test_grid_mixed_prefix_lengths():
    # the assembly path groups writes by prefix length — mix them
    prefixes = [b"a:", b"longprefix:123456:", b"m:7:"]
    grid = md5_u60_grid(prefixes, 64)
    for pi, p in enumerate(prefixes):
        for i in range(0, 64, 13):
            assert grid[pi, i] == _ref(p + str(i).encode())


def test_grid_crosses_chunk_boundary():
    # > _CHUNK total messages exercises the cache-blocked recursion
    from map_reduce_framework_spark.functions.vecmd5 import _CHUNK

    n = _CHUNK // 4 + 17
    prefixes = [f"p{k}:".encode() for k in range(8)]  # 8 * n > _CHUNK
    grid = md5_u60_grid(prefixes, n)
    for pi in (0, 7):
        for i in (0, n - 1):
            assert grid[pi, i] == _ref(prefixes[pi] + str(i).encode())
