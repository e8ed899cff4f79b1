"""Vectorized XXH64 — the hash family Apache DataSketches' BloomFilter
uses (org.apache.datasketches.memory.XxHash; bit-compatible with the
public xxHash spec, verified against the bundled datasketches-memory
jar over the full length matrix in tests/test_bloomfilter_wire.py).

Two entry points mirror the two update paths the java BloomFilter
takes: ``xxh64_long`` (one 8-byte little-endian lane — java
``hashLong`` / ``hashLongArr`` of one element) and ``xxh64_bytes``
(arbitrary-length rows of a flat buffer — java ``hashByteArr``, the
String/byte[] path).  Rows are bucketed by 32-byte-stripe count so
work is O(total bytes), the same scheme as murmur.murmur3_bytes.
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)
_M = (1 << 64) - 1


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _avalanche(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(33))
    h = h * _P2
    h = h ^ (h >> np.uint64(29))
    h = h * _P3
    return h ^ (h >> np.uint64(32))


def _round(acc, inp):
    acc = acc + inp * _P2
    return _rotl(acc, 31) * _P1


def _seed_arr(seed):
    """Scalar or per-row seed (the BloomFilter h1 chain re-seeds each
    row with its own h0)."""
    if isinstance(seed, np.ndarray):
        return seed.astype(np.uint64, copy=False)
    return np.uint64(seed & _M)


def xxh64_long(v: np.ndarray, seed) -> np.ndarray:
    """XXH64 of each uint64 as its 8 LE bytes (java XxHash.hashLong)."""
    v = np.ascontiguousarray(v, dtype=np.uint64)
    s = _seed_arr(seed)
    with np.errstate(over="ignore"):
        h = s + _P5 + np.uint64(8)
        h = h ^ _round(np.uint64(0), v)
        h = _rotl(h, 27) * _P1 + _P4
        return _avalanche(h)


def xxh64_bytes(data: np.ndarray, offsets: np.ndarray, seed) -> np.ndarray:
    """XXH64 over variable-length rows of a flat uint8 buffer.

    ``offsets`` is the (n+1)-long Arrow-style boundary array; row i is
    ``data[offsets[i]:offsets[i+1]]``."""
    offsets = np.asarray(offsets, dtype=np.int64)
    n = offsets.size - 1
    lens = np.diff(offsets)
    starts = offsets[:-1]
    out = np.empty(n, dtype=np.uint64)
    s_all = _seed_arr(seed)
    n32 = lens >> 5
    with np.errstate(over="ignore"):
        for nb in np.unique(n32):
            sel = np.flatnonzero(n32 == nb)
            st = starts[sel]
            ln = lens[sel].astype(np.uint64)
            m = sel.size
            s = s_all[sel] if s_all.ndim else s_all
            if nb:
                idx = st[:, None] + np.arange(nb * 32, dtype=np.int64)[None, :]
                body = (
                    np.ascontiguousarray(data[idx]).view("<u8").reshape(m, int(nb) * 4)
                )
                v1 = np.broadcast_to(s + _P1 + _P2, (m,))
                v2 = np.broadcast_to(s + _P2, (m,))
                v3 = np.broadcast_to(np.asarray(s, dtype=np.uint64), (m,))
                v4 = np.broadcast_to(s - _P1, (m,))
                for j in range(int(nb)):
                    v1 = _round(v1, body[:, 4 * j])
                    v2 = _round(v2, body[:, 4 * j + 1])
                    v3 = _round(v3, body[:, 4 * j + 2])
                    v4 = _round(v4, body[:, 4 * j + 3])
                h = _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
                for v in (v1, v2, v3, v4):
                    h = (h ^ _round(np.uint64(0), v)) * _P1 + _P4
            else:
                h = np.broadcast_to(s + _P5, (m,))
            h = h + ln
            # ---- tail: the 0..31 bytes after the last 32-byte stripe,
            # gathered zero-padded; every step is masked by whether the
            # row actually has those bytes (unlike murmur's zero-block
            # identity, XXH64's empty steps are NOT identities)
            tail_len = (lens[sel] - nb * 32).astype(np.int64)  # 0..31
            tpos = np.arange(32, dtype=np.int64)[None, :]
            tidx = st[:, None] + nb * 32 + tpos
            valid = tpos < tail_len[:, None]
            tail = np.zeros((m, 32), dtype=np.uint8)
            if data.size:
                np.copyto(tail, data[np.minimum(tidx, data.size - 1)], where=valid)
            lanes = tail.view("<u8")  # (m, 4)
            t8 = tail_len >> 3  # 0..3 full 8-byte lanes
            for j in range(3):
                mask = t8 > j
                if not mask.any():
                    break
                hh = (h ^ _round(np.uint64(0), lanes[:, j]))
                hh = _rotl(hh, 27) * _P1 + _P4
                h = np.where(mask, hh, h)
            # optional 4-byte lane at offset t8*8
            has4 = (tail_len & 4).astype(bool)
            if has4.any():
                off4 = (t8 << 3)[:, None] + np.arange(4, dtype=np.int64)[None, :]
                b4 = np.take_along_axis(tail, off4, axis=1).astype(np.uint64)
                u32 = (
                    b4[:, 0]
                    | (b4[:, 1] << np.uint64(8))
                    | (b4[:, 2] << np.uint64(16))
                    | (b4[:, 3] << np.uint64(24))
                )
                hh = h ^ (u32 * _P1)
                hh = _rotl(hh, 23) * _P2 + _P3
                h = np.where(has4, hh, h)
            # trailing 0..3 single bytes
            nb1 = tail_len & 3
            if nb1.any():
                base = (t8 << 3) + np.where(has4, 4, 0)
                for j in range(3):
                    mask = nb1 > j
                    if not mask.any():
                        break
                    bj = np.take_along_axis(
                        tail, np.minimum(base + j, 31)[:, None], axis=1
                    )[:, 0].astype(np.uint64)
                    hh = h ^ (bj * _P5)
                    hh = _rotl(hh, 11) * _P1
                    h = np.where(mask, hh, h)
            out[sel] = _avalanche(h)
    return out


def xxh64_one(b: bytes, seed: int) -> int:
    """Scalar reference XXH64 (cross-checked vs the vectorized path
    and the live jar in tests)."""
    seed &= _M
    n = len(b)
    i = 0

    def rotl(x, r):
        return ((x << r) | (x >> (64 - r))) & _M

    def rnd(acc, inp):
        acc = (acc + inp * int(_P2)) & _M
        return (rotl(acc, 31) * int(_P1)) & _M

    if n >= 32:
        v1 = (seed + int(_P1) + int(_P2)) & _M
        v2 = (seed + int(_P2)) & _M
        v3 = seed
        v4 = (seed - int(_P1)) & _M
        while i + 32 <= n:
            v1 = rnd(v1, int.from_bytes(b[i : i + 8], "little"))
            v2 = rnd(v2, int.from_bytes(b[i + 8 : i + 16], "little"))
            v3 = rnd(v3, int.from_bytes(b[i + 16 : i + 24], "little"))
            v4 = rnd(v4, int.from_bytes(b[i + 24 : i + 32], "little"))
            i += 32
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = ((h ^ rnd(0, v)) * int(_P1) + int(_P4)) & _M
    else:
        h = (seed + int(_P5)) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h = ((rotl(h ^ rnd(0, int.from_bytes(b[i : i + 8], "little")), 27)) * int(_P1) + int(_P4)) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(b[i : i + 4], "little") * int(_P1)) & _M
        h = (rotl(h, 23) * int(_P2) + int(_P3)) & _M
        i += 4
    while i < n:
        h ^= (b[i] * int(_P5)) & _M
        h = (rotl(h, 11) * int(_P1)) & _M
        i += 1
    h ^= h >> 33
    h = (h * int(_P2)) & _M
    h ^= h >> 29
    h = (h * int(_P3)) & _M
    return h ^ (h >> 32)
