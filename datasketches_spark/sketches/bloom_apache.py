"""Apache DataSketches BloomFilter — the cross-system membership
filter (org.apache.datasketches.filters.bloomfilter, bundled jar =
live oracle).  This is a SEPARATE construction from the Spark-parity
``BloomFilterSketch`` (bloom.py): the two use different hash schemes,
so their bit states cannot be converted — this one exists so filter
state can cross systems (the same pitch as the other wire families,
reference docs/README.md:9): a filter built here probes identically
in datasketches-{java,cpp,py}, and vice versa.

Semantics recovered from the bundled datasketches-java 6.2.0 bytecode
(BloomFilter.update/updateInternal/toByteArray, HeapBitArray.
writeToBuffer) and differentially tested against the live jar in
tests/test_bloomfilter_wire.py:

- hashing: XXH64 (xxhash.py, verified bit-compatible with java's
  XxHash).  h0 = xxh64(item, seed); h1 = xxh64(item, h0); probe i
  (1-based, i = 1..num_hashes) sets/checks bit
  ``((h0 + i*h1) >>> 1) % capacity``.
- item canonicalization: longs hash their 8 LE bytes; doubles hash
  ``Double.doubleToLongBits`` (NaNs canonicalized to the quiet NaN,
  -0.0 NOT folded — unlike the theta families); strings hash UTF-8
  bytes, null/empty skipped.
- capacity rounds up to a multiple of 64 (HeapBitArray).

Wire (serVer 1, Family.BLOOMFILTER id 21)::

    @0  u8  preamble longs (3 empty / 4 otherwise)
    @1  u8  serial version (1)
    @2  u8  family id (21)
    @3  u8  flags (bit2 EMPTY)
    @4  u16 num_hashes
    @6  u16 pad
    @8  u64 seed
    @16 i32 num_longs (capacity / 64)
    @20 i32 pad
    [not empty:]
    @24 i64 num_bits_set (-1 legal: "dirty", reader recounts)
    @32 u64[num_longs] bit data
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

from ..xxhash import xxh64_bytes, xxh64_long
from .base import SketchDeserializeError

DEFAULT_SEED = 9001  # deterministic cross-run default (java's builder
# draws a random seed; reproducible pipelines must pin one anyway)
DEFAULT_NUM_HASHES = 6

_WIRE_SERVER = 1
_WIRE_FAMILY = 21
_FLAG_EMPTY = 1 << 2
_MAX_LG_M = 36  # 64 Gbit ceiling mirrors java MAX_SIZE_BITS guardrail


def suggest_num_hashes(max_distinct: int, num_bits: int) -> int:
    """java BloomFilterBuilder.suggestNumHashes(maxDistinct, numBits)."""
    if max_distinct < 1 or num_bits < 1:
        raise ValueError("maxDistinct and numFilterBits must be strictly positive")
    return max(1, int(np.ceil(num_bits / max_distinct * np.log(2.0))))


def suggest_num_filter_bits(max_distinct: int, fpp: float) -> int:
    """java BloomFilterBuilder.suggestNumFilterBits."""
    if max_distinct < 1 or not (0.0 < fpp <= 1.0):
        raise ValueError("invalid accuracy inputs")
    return int(np.ceil(-max_distinct * np.log(fpp) / (np.log(2.0) ** 2)))


def _hash_pair(values, seed: int) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """(h0, h1, kept_positions, n_input) with java BloomFilter
    canonicalization; null / empty-string rows are excluded from the
    hash arrays (java update() no-ops and query() returns false for
    them) and ``kept_positions`` maps each hash back to its input row.

    NaN doubles are ALSO excluded — a deliberate, documented
    deviation: java hashes Double.doubleToLongBits(NaN), but Spark's
    Arrow float transfer conflates NULL and NaN, so a NaN row here is
    indistinguishable from a NULL.  -0.0 keeps its sign bit (java
    doubleToLongBits canonicalizes only NaN), so 0.0 and -0.0 probe
    DIFFERENT bits — unlike the theta families."""
    ser = values if isinstance(values, pd.Series) else pd.Series(values)
    n = len(ser)
    kept = np.flatnonzero(ser.notna().to_numpy())
    z = np.empty(0, dtype=np.uint64)
    if kept.size == 0:
        return z, z, kept, n
    sub = ser.iloc[kept]
    if ser.dtype != object and not pd.api.types.is_string_dtype(ser.dtype):
        arr = sub.to_numpy()
        if arr.dtype.kind in "iub":
            lanes = arr.astype(np.int64).view(np.uint64)
        elif arr.dtype.kind == "f":
            lanes = arr.astype(np.float64).view(np.uint64)
        else:
            raise TypeError(f"unsupported dtype for bloom filter: {arr.dtype}")
        h0 = xxh64_long(lanes, seed)
        return h0, xxh64_long(lanes, h0), kept, n
    first = next((v for v in sub if v is not None), None)
    if isinstance(first, (int, np.integer)):
        lanes = sub.astype(np.int64).to_numpy().view(np.uint64)
        h0 = xxh64_long(lanes, seed)
        return h0, xxh64_long(lanes, h0), kept, n
    if isinstance(first, float):
        lanes = sub.astype(np.float64).to_numpy().view(np.uint64)
        nz = ~np.isnan(lanes.view(np.float64))
        lanes, kept = lanes[nz], kept[nz]
        h0 = xxh64_long(lanes, seed)
        return h0, xxh64_long(lanes, h0), kept, n
    import pyarrow as pa

    from ..murmur import arrow_byte_buffers

    typ = (
        pa.large_binary()
        if isinstance(first, (bytes, bytearray))
        else pa.large_utf8()
    )
    pa_arr = pa.array(sub, type=typ, from_pandas=True)
    data, off = arrow_byte_buffers(pa_arr)
    lens = np.diff(off)
    if (lens == 0).any():  # java skips empty strings/bytes
        keep = np.flatnonzero(lens > 0)
        kept = kept[keep]
        if keep.size == 0:
            return z, z, kept, n
        pa_arr = pa_arr.take(pa.array(keep))
        data, off = arrow_byte_buffers(pa_arr)
    h0 = xxh64_bytes(data, off, seed)
    return h0, xxh64_bytes(data, off, h0), kept, n


class ApacheBloomFilter:
    """Heap BloomFilter with java-parity bits and wire."""

    __slots__ = ("num_hashes", "seed", "data", "_count", "_dirty")

    def __init__(
        self,
        num_bits: int,
        num_hashes: int = DEFAULT_NUM_HASHES,
        seed: int = DEFAULT_SEED,
    ):
        if not (1 <= num_bits <= (1 << _MAX_LG_M)):
            raise ValueError(f"Invalid num_bits for bloom filter: {num_bits}")
        if not (1 <= num_hashes <= 0x7FFF):
            raise ValueError(f"Invalid num_hashes for bloom filter: {num_hashes}")
        self.num_hashes = int(num_hashes)
        self.seed = int(seed) & ((1 << 64) - 1)
        self.data = np.zeros((num_bits + 63) >> 6, dtype=np.uint64)
        self._count = 0
        self._dirty = False

    # ---- geometry ----
    @property
    def capacity(self) -> int:
        return int(self.data.size) << 6

    @property
    def num_bits_set(self) -> int:
        """Lazily recounted (java keeps the same dirty-flag scheme:
        updates mark the count dirty instead of paying an O(capacity)
        popcount per batch)."""
        if self._dirty:
            self._count = int(np.unpackbits(self.data.view(np.uint8)).sum())
            self._dirty = False
        return self._count

    @property
    def is_empty(self) -> bool:
        if self._dirty:
            return not self.data.any()
        return self._count == 0

    def fill_percentage(self) -> float:
        return self.num_bits_set / self.capacity

    # ---- probes ----
    def _positions(self, h0: np.ndarray, h1: np.ndarray) -> np.ndarray:
        """(n, num_hashes) bit indices — java updateInternal."""
        i = np.arange(1, self.num_hashes + 1, dtype=np.uint64)[None, :]
        with np.errstate(over="ignore"):
            return ((h0[:, None] + i * h1[:, None]) >> np.uint64(1)) % np.uint64(
                self.capacity
            )

    def update_series(self, values) -> None:
        h0, h1, _, _ = _hash_pair(values, self.seed)
        if h0.size == 0:
            return
        pos = self._positions(h0, h1).ravel()
        np.bitwise_or.at(
            self.data, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )
        self._dirty = True

    def query_series(self, values) -> np.ndarray:
        """One boolean PER INPUT ROW: null / empty-string / NaN rows
        answer False (java query() parity — it returns false for
        null/empty without probing)."""
        h0, h1, kept, n = _hash_pair(values, self.seed)
        out = np.zeros(n, dtype=bool)
        if h0.size == 0:
            return out
        pos = self._positions(h0, h1)
        bits = (
            self.data[(pos >> np.uint64(6)).astype(np.int64)]
            >> (pos & np.uint64(63))
        ) & np.uint64(1)
        out[kept] = bits.all(axis=1)
        return out

    # ---- set ops (java union/intersect compatibility checks) ----
    def _check_compatible(self, other: "ApacheBloomFilter") -> None:
        if (
            self.seed != other.seed
            or self.num_hashes != other.num_hashes
            or self.data.size != other.data.size
        ):
            raise ValueError(
                "Cannot merge incompatible bloom filters: seed, number of"
                " hashes, and number of bits must all match"
            )

    def union(self, other: "ApacheBloomFilter") -> None:
        if self.is_empty and (
            self.seed != other.seed
            or self.num_hashes != other.num_hashes
            or self.data.size != other.data.size
        ):
            # a fresh accumulator adopts the first input's geometry
            # (the generic blob-merge path can't know it up front)
            self.seed = other.seed
            self.num_hashes = other.num_hashes
            self.data = other.data.copy()
            self._count = other._count
            self._dirty = other._dirty
            return
        self._check_compatible(other)
        self.data |= other.data
        self._dirty = True

    # the generic merge-path alias (families.update_sketch blob loop)
    merge = union

    def intersect(self, other: "ApacheBloomFilter") -> None:
        self._check_compatible(other)
        self.data &= other.data
        self._dirty = True

    def describe(self) -> str:
        return (
            "### Apache BloomFilter summary:\n"
            f"   num hashes           : {self.num_hashes}\n"
            f"   seed                 : {self.seed}\n"
            f"   capacity (bits)      : {self.capacity}\n"
            f"   bits used            : {self.num_bits_set}\n"
            f"   fill percentage      : {self.fill_percentage():.6f}\n"
            f"   empty?               : {self.is_empty}\n"
        )

    # ---- wire (this class is wire-native: serialize IS the Apache
    # format — the blob is fully self-describing) ----
    def to_wire(self) -> bytes:
        head = struct.pack(
            "<BBBBHHQ",
            3 if self.is_empty else 4,
            _WIRE_SERVER,
            _WIRE_FAMILY,
            _FLAG_EMPTY if self.is_empty else 0,
            self.num_hashes,
            0,
            self.seed,
        )
        head += struct.pack("<ii", self.data.size, 0)
        if self.is_empty:
            return head
        return (
            head
            + struct.pack("<q", self.num_bits_set)
            + np.ascontiguousarray(self.data).tobytes()
        )

    serialize = to_wire

    @staticmethod
    def sniff_wire(blob) -> bool:
        """True iff the bytes carry the Apache BloomFilter preamble
        (this family has no DSKS frame — the blob IS the wire)."""
        return (
            isinstance(blob, (bytes, bytearray))
            and len(blob) >= 8
            and blob[0] in (3, 4)
            and blob[1] == _WIRE_SERVER
            and blob[2] == _WIRE_FAMILY
        )

    @classmethod
    def from_wire(cls, blob: bytes, validate: bool = False) -> "ApacheBloomFilter":
        err = SketchDeserializeError("Failed to deserialize Bloom filter sketch")
        if not isinstance(blob, (bytes, bytearray)) or len(blob) < 24:
            raise err
        blob = bytes(blob)
        pre, ser_ver, family, flags = blob[0], blob[1], blob[2], blob[3]
        if ser_ver != _WIRE_SERVER or family != _WIRE_FAMILY or pre not in (3, 4):
            raise err
        (num_hashes,) = struct.unpack_from("<H", blob, 4)
        (seed,) = struct.unpack_from("<Q", blob, 8)
        (num_longs,) = struct.unpack_from("<i", blob, 16)
        if num_hashes < 1 or num_longs < 1 or num_longs > (1 << 30):
            raise err
        sk = cls(1, num_hashes, seed)
        sk.data = np.zeros(num_longs, dtype=np.uint64)
        if flags & _FLAG_EMPTY:
            return sk
        if len(blob) < 32 + 8 * num_longs:
            raise err
        (bits_set,) = struct.unpack_from("<q", blob, 24)
        sk.data = np.frombuffer(
            blob, dtype=np.uint64, count=num_longs, offset=32
        ).copy()
        # java readers trust a non-negative stored count as-is and only
        # recount on the -1 dirty marker; match that (no eager popcount
        # on the deserialize hot path — a stale count behaves exactly as
        # it would in java until the next mutation marks it dirty).
        # ``validate=True`` opts untrusted blobs into an eager recount
        # so a corrupted stored count can't propagate via num_bits_set.
        if bits_set >= 0 and not validate:
            sk._count = int(bits_set)
            sk._dirty = False
        else:  # java "dirty" marker (or caller-requested validation)
            sk._dirty = True
        return sk

    deserialize = from_wire


def bloomfilter_union(a: ApacheBloomFilter, b: ApacheBloomFilter) -> ApacheBloomFilter:
    out = ApacheBloomFilter(a.capacity, a.num_hashes, a.seed)
    out.union(a)
    out.union(b)
    return out


def bloomfilter_intersect(
    a: ApacheBloomFilter, b: ApacheBloomFilter
) -> ApacheBloomFilter:
    out = ApacheBloomFilter(a.capacity, a.num_hashes, a.seed)
    out.union(a)
    out.intersect(b)
    return out
