"""Apache DataSketches CPC wire format (serial version 1, family 16).

The reference's CPC blobs are this format (its Finalize serializes
datasketches-cpp CPC sketches, reference src/generated.cpp:6691-6956),
so implementing it makes `datasketch_cpc` state cross between this
engine and DuckDB/Druid/Hive/datasketches-java — the last interop gap
after the round-4 theta/KLL/FI/tdigest/HLL work.

The format is a compressed encoding of the CPC coupon bit matrix,
which is exactly our ``CpcSketch`` dense state, so the mapping is
lossless in both directions:

- flavor and window offset are pure functions of (lgK, numCoupons):
  EMPTY C==0; SPARSE 32C<3K; HYBRID 2C<K; PINNED 8C<27K (offset 0);
  SLIDING otherwise with offset = (8C - 19K) >> (lgK + 3);
- SPARSE/HYBRID serialize every coupon as a sorted (row<<6|col) pair
  stream; PINNED serializes an 8-bit-per-row window (columns 0-7)
  plus pairs with col-8; SLIDING serializes the window at the offset
  plus "surprising" bits (zeros below the window, ones above) with
  columns rotated by (col+56-offset)&63 and then remapped through a
  per-phase column permutation;
- pairs are delta-coded: column deltas through a 65-symbol
  length-limited unary code, row deltas Golomb-coded (plain unary
  high bits + b raw low bits, b = floor(log2((K+P-P)/P)) style choice
  golombChooseNumberOfBaseBits(K+P, P)), with max(0, 10-b) zero-bit
  padding at the end;
- the window bytes go through one of 22 canonical length-limited
  Huffman tables selected by a (lgK, C) "pseudo phase";
- bit streams are LSB-first into little-endian uint32 words; byte
  streams pad 11 zero bits before the final flush.

The entropy-code tables are static data extracted from the Apache-2.0
datasketches-java jar bundled with pyspark (scripts/gen_cpc_tables.py
regenerates ``_cpc_tables.py``).  The stream grammar above was
recovered from the same library's behavior and validated live against
it in tests/test_cpc_wire.py — both directions plus byte parity.

We always emit the MERGED (no-HIP) formats — our estimator is ICON,
the same one datasketches-java uses for merged sketches — and read
all eight formats, skipping the HIP accumulators on import.
"""

from __future__ import annotations

import struct

import numpy as np

from ..murmur import DEFAULT_SEED_HASH
from ._cpc_tables import (
    DEC_BYTE,
    DEC_UNARY65,
    ENC_BYTE,
    ENC_UNARY65,
    PERM_DEC,
    PERM_ENC,
)
from .base import SketchDeserializeError

_SER_VER = 1
_FAMILY = 16

# Format ordinals (flags byte = ordinal << 2 | 2)
_EMPTY_MERGED = 0
_EMPTY_HIP = 1
_SPARSE_HYBRID_MERGED = 2
_SPARSE_HYBRID_HIP = 3
_PINNED_SLIDING_MERGED_NOSV = 4
_PINNED_SLIDING_HIP_NOSV = 5
_PINNED_SLIDING_MERGED = 6
_PINNED_SLIDING_HIP = 7

_HAS_HIP = {_EMPTY_HIP, _SPARSE_HYBRID_HIP, _PINNED_SLIDING_HIP_NOSV, _PINNED_SLIDING_HIP}


def determine_flavor(lg_k: int, c: int) -> str:
    k = 1 << lg_k
    if c == 0:
        return "EMPTY"
    if (c << 5) < 3 * k:
        return "SPARSE"
    if (c << 1) < k:
        return "HYBRID"
    if (c << 3) < 27 * k:
        return "PINNED"
    return "SLIDING"


def determine_correct_offset(lg_k: int, c: int) -> int:
    tmp = (c << 3) - 19 * (1 << lg_k)
    if tmp < 0:
        return 0
    return tmp >> (lg_k + 3)


def determine_pseudo_phase(lg_k: int, c: int) -> int:
    k = 1 << lg_k
    if 1000 * c < 2375 * k:
        if 4 * c < 3 * k:
            return 16
        if 10 * c < 11 * k:
            return 17
        if 100 * c < 132 * k:
            return 18
        if 3 * c < 5 * k:
            return 19
        if 1000 * c < 1965 * k:
            return 20
        if 1000 * c < 2275 * k:
            return 21
        return 6  # steady-state table used just before its phase
    return (c >> (lg_k - 4)) & 15


def golomb_base_bits(k: int, count: int) -> int:
    quotient = (k - count) // count
    if quotient == 0:
        return 0
    return int(quotient).bit_length() - 1  # floor(log2)


# ---------------------------------------------------------------------------
# bit-stream writers (vectorized set-bit scatter) and readers


def _pack_words(bitarr: np.ndarray) -> np.ndarray:
    """LSB-first bit array -> little-endian uint32 word stream."""
    by = np.packbits(bitarr, bitorder="little")
    pad = (-by.size) % 4
    if pad:
        by = np.concatenate([by, np.zeros(pad, dtype=np.uint8)])
    return by.view("<u4")


def compress_bytes(syms: np.ndarray, table: np.ndarray) -> np.ndarray:
    """lowLevelCompressBytes: per-byte Huffman codes + 11 pad bits."""
    codes = table[syms].astype(np.uint32)
    vals = codes & np.uint32(0xFFF)
    lens = (codes >> np.uint32(12)).astype(np.int64)
    offs = np.concatenate([[0], np.cumsum(lens)])
    total = int(offs[-1]) + 11  # java pads 11 zero bits before flushing
    bitarr = np.zeros(total, dtype=np.uint8)
    starts = offs[:-1]
    for b in range(12):
        sel = (((vals >> np.uint32(b)) & np.uint32(1)) == 1) & (b < lens)
        bitarr[starts[sel] + b] = 1
    return _pack_words(bitarr)


def compress_pairs(pairs: np.ndarray, base_bits: int) -> np.ndarray:
    """lowLevelCompressPairs over a SORTED uint32 (row<<6|col) array."""
    pairs = pairs.astype(np.int64)
    rows = pairs >> 6
    cols = pairs & 63
    prev_rows = np.concatenate([[rows[0] if pairs.size else 0], rows[:-1]])
    prev_cols1 = np.concatenate([[0], cols[:-1] + 1])
    pred_col = np.where(rows == prev_rows, prev_cols1, 0)
    if pairs.size:
        pred_col[0] = 0 if rows[0] != 0 else 0  # predictedRow starts at 0
    col_delta = cols - pred_col
    row_delta = rows - np.concatenate([[0], rows[:-1]])
    # field 1: column delta through the 65-symbol length-limited unary code
    ccodes = ENC_UNARY65[col_delta].astype(np.uint32)
    cvals = ccodes & np.uint32(0xFFF)
    clens = (ccodes >> np.uint32(12)).astype(np.int64)
    # field 2: row delta golomb: q zeros + a 1, then base_bits raw low bits
    q = row_delta >> base_bits
    lo = row_delta & ((1 << base_bits) - 1)
    flens = clens + (q + 1) + base_bits
    ends = np.cumsum(flens)
    starts = ends - flens
    total = int(ends[-1]) if pairs.size else 0
    pad = max(0, 10 - base_bits)
    bitarr = np.zeros(total + pad, dtype=np.uint8)
    for b in range(12):
        sel = (((cvals >> np.uint32(b)) & np.uint32(1)) == 1) & (b < clens)
        bitarr[starts[sel] + b] = 1
    bitarr[starts + clens + q] = 1  # the unary terminator bit
    lo_starts = starts + clens + q + 1
    for b in range(base_bits):
        sel = ((lo >> b) & 1) == 1
        bitarr[lo_starts[sel] + b] = 1
    return _pack_words(bitarr)


class _BitReader:
    """LSB-first reader over a uint32 word stream."""

    __slots__ = ("words", "pos", "nbits")

    def __init__(self, words: np.ndarray):
        self.words = words.astype(np.uint64)
        self.pos = 0
        self.nbits = words.size * 32

    def _peek(self, n: int) -> int:
        i, b = self.pos >> 5, self.pos & 31
        w = self.words
        v = int(w[i]) >> b if i < w.size else 0
        if b + n > 32 and i + 1 < w.size:
            v |= int(w[i + 1]) << (32 - b)
        if b + n > 64 and i + 2 < w.size:  # unreachable for n <= 32
            v |= int(w[i + 2]) << (64 - b)
        return v & ((1 << n) - 1)

    def read_sym(self, table: np.ndarray) -> int:
        entry = int(table[self._peek(12)])
        self.pos += entry >> 8
        return entry & 0xFF

    def read_bits(self, n: int) -> int:
        v = self._peek(n)
        self.pos += n
        return v

    def read_unary(self) -> int:
        q = 0
        while True:
            chunk = self._peek(16)
            if chunk == 0:
                if self.pos + 16 > self.nbits:
                    raise SketchDeserializeError(
                        "Failed to deserialize CPC sketch"
                    )
                q += 16
                self.pos += 16
                continue
            tz = (chunk & -chunk).bit_length() - 1
            self.pos += tz + 1
            return q + tz


def uncompress_bytes(words: np.ndarray, count: int, table: np.ndarray) -> np.ndarray:
    """Sequential Huffman decode of the window: k symbols, one
    table lookup each.  Variable-length codes force the sequential
    walk; a plain-list table + local-variable loop keeps it ~1 µs per
    symbol (lg_k 16 ≈ 60 ms per blob — import-path cost only; the
    engine-local DSKS frame, not this, is the shuffle format)."""
    tbl = table.tolist()  # python-int lookups beat np scalar indexing ~3x
    w = words.astype(np.uint64).tolist()
    nw = len(w)
    out = np.empty(count, dtype=np.uint8)
    pos = 0
    for i in range(count):
        wi, b = pos >> 5, pos & 31
        v = (w[wi] >> b) if wi < nw else 0
        if b > 20 and wi + 1 < nw:
            v |= w[wi + 1] << (32 - b)
        entry = tbl[v & 0xFFF]
        pos += entry >> 8
        out[i] = entry & 0xFF
    return out


def uncompress_pairs(words: np.ndarray, count: int, base_bits: int) -> np.ndarray:
    r = _BitReader(words)
    out = np.empty(count, dtype=np.int64)
    pred_row, pred_col = 0, 0
    for i in range(count):
        col_delta = r.read_sym(DEC_UNARY65)
        q = r.read_unary()
        lo = r.read_bits(base_bits) if base_bits else 0
        row_delta = (q << base_bits) | lo
        row = pred_row + row_delta
        if row_delta:
            pred_col = 0
        col = pred_col + col_delta
        out[i] = (row << 6) | col
        pred_row, pred_col = row, col + 1
    return out


# ---------------------------------------------------------------------------
# bitmap <-> (window, pairs) state


def _pairs_from_bitmap(bitmap: np.ndarray) -> np.ndarray:
    """All set bits as sorted (row<<6|col) pairs."""
    u8 = np.unpackbits(
        bitmap.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
    )
    rows, cols = np.nonzero(u8)
    return (rows.astype(np.int64) << 6) | cols.astype(np.int64)


def bitmap_to_wire(lg_k: int, bitmap: np.ndarray) -> bytes:
    """Serialize a coupon bit matrix as an Apache CPC blob (MERGED)."""
    k = 1 << lg_k
    c = int(np.unpackbits(bitmap.view(np.uint8)).sum())
    head = bytearray(8)
    head[1] = _SER_VER
    head[2] = _FAMILY
    head[3] = lg_k
    # head[4] (fiCol) stays 0 except SLIDING, where merged sketches
    # carry fiCol == windowOffset (set below)
    head[6:8] = struct.pack("<H", DEFAULT_SEED_HASH)
    flavor = determine_flavor(lg_k, c)
    if flavor == "EMPTY":
        head[0] = 2
        head[5] = (_EMPTY_MERGED << 2) | 2
        return bytes(head)
    if flavor in ("SPARSE", "HYBRID"):
        pairs = _pairs_from_bitmap(bitmap)
        base = golomb_base_bits(k + pairs.size, pairs.size)
        csv = compress_pairs(pairs, base)
        head[0] = 4
        head[5] = (_SPARSE_HYBRID_MERGED << 2) | 2
        return (
            bytes(head)
            + struct.pack("<II", c, csv.size)
            + csv.tobytes()
        )
    offset = determine_correct_offset(lg_k, c) if flavor == "SLIDING" else 0
    phase = determine_pseudo_phase(lg_k, c)
    window = ((bitmap >> np.uint64(offset)) & np.uint64(0xFF)).astype(np.uint8)
    cw = compress_bytes(window, ENC_BYTE[phase])
    # surprising values: ones above the window, and (sliding) zeros below
    high = bitmap >> np.uint64(offset + 8)
    hrows, hcols = np.nonzero(
        np.unpackbits(high.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
    )
    if offset == 0:  # PINNED: cols stored minus 8
        pairs = (hrows.astype(np.int64) << 6) | hcols.astype(np.int64)
    else:  # SLIDING: plus surprising zeros below the window
        ones = (hrows.astype(np.int64) << 6) | (hcols.astype(np.int64) + offset + 8)
        low_mask = np.uint64((1 << offset) - 1)
        low_miss = (~bitmap) & low_mask
        zrows, zcols = np.nonzero(
            np.unpackbits(
                low_miss.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
            )
        )
        zeros = (zrows.astype(np.int64) << 6) | zcols.astype(np.int64)
        # fiCol = min(offset, lowest surprising column) when sliding
        head[4] = int(min(offset, zcols.min())) if zcols.size else offset
        raw = np.concatenate([zeros, ones])
        rcols = (raw & 63) + 56 - offset
        rcols &= 63
        pairs = (raw & ~np.int64(63)) | PERM_ENC[phase][rcols].astype(np.int64)
        pairs = np.sort(pairs)
    if offset == 0:
        pairs = np.sort(pairs)
    num_sv = int(pairs.size)
    if num_sv == 0:
        head[0] = 4
        head[5] = (_PINNED_SLIDING_MERGED_NOSV << 2) | 2
        return bytes(head) + struct.pack("<II", c, cw.size) + cw.tobytes()
    base = golomb_base_bits(k + num_sv, num_sv)
    csv = compress_pairs(pairs, base)
    head[0] = 6
    head[5] = (_PINNED_SLIDING_MERGED << 2) | 2
    # stream order: window first (at preInts*4), sv stream after it
    return (
        bytes(head)
        + struct.pack("<IIII", c, num_sv, csv.size, cw.size)
        + cw.tobytes()
        + csv.tobytes()
    )


def wire_to_bitmap(blob: bytes) -> tuple[int, np.ndarray, int]:
    """Parse any of the eight Apache CPC formats.

    Returns (lg_k, bitmap, num_coupons)."""
    err = SketchDeserializeError("Failed to deserialize CPC sketch")
    if not isinstance(blob, (bytes, bytearray)) or len(blob) < 8:
        raise err
    blob = bytes(blob)
    pre_ints, ser_ver, family, lg_k, _fi_col, flags = struct.unpack_from(
        "<BBBBBB", blob, 0
    )
    (seed_hash,) = struct.unpack_from("<H", blob, 6)
    if ser_ver != _SER_VER or family != _FAMILY:
        raise err
    if not (4 <= lg_k <= 26):
        raise err
    if (flags & 2) == 0:  # uncompressed CPC blobs do not exist in the wild
        raise err
    fmt = (flags >> 2) & 7
    if seed_hash != DEFAULT_SEED_HASH and fmt not in (_EMPTY_MERGED, _EMPTY_HIP):
        raise SketchDeserializeError(
            "Failed to deserialize CPC sketch: seed hash mismatch"
        )
    k = 1 << lg_k
    bitmap = np.zeros(k, dtype=np.uint64)
    if fmt in (_EMPTY_MERGED, _EMPTY_HIP):
        if pre_ints != 2:
            raise err
        return lg_k, bitmap, 0
    if len(blob) < 4 * pre_ints:
        raise err

    def check_c(c: int) -> None:
        # the matrix holds at most 64*k coupons; a corrupt count would
        # otherwise drive absurd offsets/allocations downstream
        if not (0 < c <= 64 * k):
            raise err

    def words_at(off_ints: int, n_ints: int) -> np.ndarray:
        start = 4 * off_ints
        if len(blob) < start + 4 * n_ints:
            raise err
        return np.frombuffer(blob, dtype="<u4", count=n_ints, offset=start)

    if fmt in (_SPARSE_HYBRID_MERGED, _SPARSE_HYBRID_HIP):
        want = 4 if fmt == _SPARSE_HYBRID_MERGED else 8
        if pre_ints != want:
            raise err
        c, csv_len = struct.unpack_from("<II", blob, 8)
        check_c(c)
        csv = words_at(pre_ints, csv_len)
        base = golomb_base_bits(k + c, c)
        pairs = uncompress_pairs(csv, c, base)
        _scatter_pairs(bitmap, pairs, err)
        return lg_k, bitmap, c
    # pinned/sliding
    nosv = fmt in (_PINNED_SLIDING_MERGED_NOSV, _PINNED_SLIDING_HIP_NOSV)
    if nosv:
        want = 4 if fmt == _PINNED_SLIDING_MERGED_NOSV else 8
        if pre_ints != want:
            raise err
        c, cw_len = struct.unpack_from("<II", blob, 8)
        check_c(c)
        num_sv, csv_len = 0, 0
        sv_off = pre_ints
        cw_off = pre_ints
    elif fmt == _PINNED_SLIDING_MERGED:
        if pre_ints != 6:
            raise err
        c, num_sv, csv_len, cw_len = struct.unpack_from("<IIII", blob, 8)
        check_c(c)
        if num_sv > 64 * k:
            raise err
        cw_off = pre_ints  # window stream first, sv stream after it
        sv_off = pre_ints + cw_len
    else:  # PINNED_SLIDING_HIP: kxp/hipAccum sit between numSV and lengths
        if pre_ints != 10:
            raise err
        c, num_sv = struct.unpack_from("<II", blob, 8)
        check_c(c)
        if num_sv > 64 * k:
            raise err
        csv_len, cw_len = struct.unpack_from("<II", blob, 32)
        cw_off = pre_ints
        sv_off = pre_ints + cw_len
    offset = determine_correct_offset(lg_k, c)
    phase = determine_pseudo_phase(lg_k, c)
    cw = words_at(cw_off, cw_len)
    window = uncompress_bytes(cw, k, DEC_BYTE[phase])
    if offset == 0:
        bitmap |= window.astype(np.uint64)
    else:
        bitmap |= (window.astype(np.uint64) << np.uint64(offset)) | np.uint64(
            (1 << offset) - 1
        )
    if num_sv:
        base = golomb_base_bits(k + num_sv, num_sv)
        pairs = uncompress_pairs(words_at(sv_off, csv_len), num_sv, base)
        rows = pairs >> 6
        if int(rows.max(initial=0)) >= k:
            raise err
        if offset == 0:  # PINNED: stored col is col - 8
            cols = (pairs & 63) + 8
            if int(cols.max(initial=0)) > 63:
                raise err
            # bitwise_or.at, NOT fancy-index |=: several pairs can
            # share a row, and `bitmap[rows] |= x` silently drops all
            # but one duplicate-row update
            np.bitwise_or.at(
                bitmap, rows, np.uint64(1) << cols.astype(np.uint64)
            )
        else:  # SLIDING: inverse permutation then rotation
            stored = (pairs & 63).astype(np.int64)
            if stored.size and int(stored.max()) >= 56:
                raise err  # writers only emit rotated columns 0..55
            cols = (PERM_DEC[phase][stored].astype(np.int64) + offset + 8) & 63
            low = cols < offset
            # below-window pairs are surprising ZEROS: clear the bit
            for r_, c_ in zip(rows[low], cols[low]):
                bitmap[r_] &= ~(np.uint64(1) << np.uint64(c_))
            hi = ~low
            np.bitwise_or.at(
                bitmap, rows[hi], np.uint64(1) << cols[hi].astype(np.uint64)
            )
    got = int(np.unpackbits(bitmap.view(np.uint8)).sum())
    if got != c:
        raise err
    return lg_k, bitmap, c


def _scatter_pairs(bitmap: np.ndarray, pairs: np.ndarray, err) -> None:
    rows = pairs >> 6
    if pairs.size and int(rows.max()) >= bitmap.size:
        raise err
    np.bitwise_or.at(
        bitmap, rows, np.uint64(1) << (pairs & 63).astype(np.uint64)
    )
