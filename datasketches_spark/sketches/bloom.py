"""Bloom filter sketch (pure-Python core, numpy-vectorized).

Beyond-reference family: the reference extension has no Bloom filter
(its membership story is Theta set algebra), but approximate membership
is the canonical runtime-filter / semi-join-pruning structure for a
100 TB pipeline, so this engine carries it as a first-class mergeable
sketch alongside the eight reference families.  The aggregate /
scalar / union surface mirrors the reference's family idiom
(build-or-merge aggregate + scalar queries over stored blobs,
/root/reference/codegen/generated.cpp.j2:731-788) and the semantics of
Spark's own ``BloomFilterAggregate``/``might_contain`` (not exposed to
the public SQL registry in this build — verified).

Design:
- m = 2^lg_m bits, packed uint8; power-of-two so index masking is a
  single AND.  lg_m in [6, 30] (8 B .. 128 MiB of state).
- Kirsch-Mitzenmacher double hashing: index_i = (h1 + i*h2) mod m from
  two independent splitmix64 streams — no false negatives, classic
  FPP ~= (1 - e^(-h*n/m))^h.
- merge = bitwise OR (same shape required); intersect = bitwise AND
  (upper-bounds the true intersection; standard caveat documented).
- Cardinality estimate: Swamidass & Baldi (2007),
  n ~= -(m/h) * ln(1 - X/m) with X = set bit count.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

from ..hashing import hash_values
from .base import FAMILY_BLOOM, SketchDeserializeError, frame, unframe

_SEED_H2 = 0xA076_1D64_78BD_642F  # second hash stream (splitmix64 seed)


class BloomFilterSketch:
    FAMILY = FAMILY_BLOOM
    NAME = "Bloom Filter"
    LG_M_MIN, LG_M_MAX = 6, 30
    NUM_HASHES_MIN, NUM_HASHES_MAX = 1, 16

    __slots__ = ("lg_m", "num_hashes", "bits")

    def __init__(self, lg_m: int = 20, num_hashes: int = 6):
        if not (self.LG_M_MIN <= lg_m <= self.LG_M_MAX):
            raise ValueError(
                f"Invalid lg_m for {self.NAME} sketch: {lg_m} (must be in "
                f"[{self.LG_M_MIN}, {self.LG_M_MAX}])"
            )
        if not (self.NUM_HASHES_MIN <= num_hashes <= self.NUM_HASHES_MAX):
            raise ValueError(
                f"Invalid num_hashes for {self.NAME} sketch: {num_hashes} "
                f"(must be in [{self.NUM_HASHES_MIN}, {self.NUM_HASHES_MAX}])"
            )
        self.lg_m = int(lg_m)
        self.num_hashes = int(num_hashes)
        self.bits = np.zeros(self._m >> 3, dtype=np.uint8)

    @property
    def _m(self) -> int:
        return 1 << self.lg_m

    def _indices(self, values) -> np.ndarray:
        """(num_hashes, n) bit indices via double hashing."""
        h1 = hash_values(values)
        h2 = hash_values(values, seed=_SEED_H2) | np.uint64(1)  # odd => full cycle
        i = np.arange(self.num_hashes, dtype=np.uint64)[:, None]
        with np.errstate(over="ignore"):
            return (h1[None, :] + i * h2[None, :]) & np.uint64(self._m - 1)

    # -- building -------------------------------------------------------
    def update_values(self, values) -> None:
        s = values.dropna() if isinstance(values, pd.Series) else pd.Series(values).dropna()
        if s.empty:
            return
        idx = self._indices(s).ravel()
        if self.lg_m <= 26:
            # dense path: a bool scatter + packbits is ~100x faster than
            # the unbuffered ufunc.at scatter (bit layout identical:
            # LSB-first within each byte)
            hit = np.zeros(self._m, dtype=bool)
            hit[idx.astype(np.int64)] = True
            np.bitwise_or(self.bits, np.packbits(hit, bitorder="little"), out=self.bits)
        else:
            # huge-m path: avoid the 2^lg_m-byte temp; dedup first so the
            # slow scatter touches each bit once
            idx = np.unique(idx)
            np.bitwise_or.at(
                self.bits,
                (idx >> 3).astype(np.int64),
                np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8),
            )

    def merge(self, other: "BloomFilterSketch") -> None:
        # an untouched filter adopts the incoming shape, so phase-2 merge
        # states built with default params can union any blob stream
        if self.is_empty and (
            self.lg_m != other.lg_m or self.num_hashes != other.num_hashes
        ):
            self.lg_m, self.num_hashes = other.lg_m, other.num_hashes
            self.bits = other.bits.copy()
            return
        self._check_shape(other, "union")
        np.bitwise_or(self.bits, other.bits, out=self.bits)

    def intersect(self, other: "BloomFilterSketch") -> None:
        self._check_shape(other, "intersection")
        np.bitwise_and(self.bits, other.bits, out=self.bits)

    def _check_shape(self, other: "BloomFilterSketch", op: str) -> None:
        if self.lg_m != other.lg_m or self.num_hashes != other.num_hashes:
            raise ValueError(
                f"Bloom filter {op} requires identical shape: "
                f"(lg_m={self.lg_m}, h={self.num_hashes}) vs "
                f"(lg_m={other.lg_m}, h={other.num_hashes})"
            )

    # -- queries --------------------------------------------------------
    def contains_values(self, values) -> np.ndarray:
        """Vectorized membership probe; True may be a false positive,
        False is definitive."""
        s = values if isinstance(values, pd.Series) else pd.Series(values)
        idx = self._indices(s)
        byte = self.bits[(idx >> 3).astype(np.int64)]
        hit = (byte >> (idx & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
        return hit.all(axis=0).astype(bool)

    @property
    def is_empty(self) -> bool:
        return not self.bits.any()

    @property
    def num_bits(self) -> int:
        return self._m

    def bits_set(self) -> int:
        return int(np.unpackbits(self.bits).sum())

    def current_fpp(self) -> float:
        """Probability a random absent key probes all-set bits."""
        return float((self.bits_set() / self._m) ** self.num_hashes)

    def get_estimate(self) -> float:
        """Swamidass-Baldi cardinality estimate from the fill ratio."""
        x = self.bits_set()
        if x == 0:
            return 0.0
        if x >= self._m:  # saturated
            return float("inf")
        return float(-(self._m / self.num_hashes) * np.log1p(-x / self._m))

    def describe(self, summary: bool = True, detail: bool = False) -> str:
        lines = [
            f"### {self.NAME} sketch summary:",
            f"   num bits      : {self._m}",
            f"   num hashes    : {self.num_hashes}",
            f"   bits set      : {self.bits_set()}",
            f"   current fpp   : {self.current_fpp():.6f}",
            f"   empty?        : {self.is_empty}",
            f"   estimate      : {self.get_estimate():.3f}",
        ]
        return "\n".join(lines) + "\n"

    # -- serialization --------------------------------------------------
    def serialize(self) -> bytes:
        return frame(
            self.FAMILY,
            struct.pack("<BB", self.lg_m, self.num_hashes) + self.bits.tobytes(),
        )

    @classmethod
    def deserialize(cls, blob: bytes) -> "BloomFilterSketch":
        payload = unframe(blob, cls.FAMILY)
        try:
            lg_m, num_hashes = struct.unpack_from("<BB", payload, 0)
            sk = cls(lg_m, num_hashes)
            raw = np.frombuffer(payload, dtype=np.uint8, count=(1 << lg_m) >> 3, offset=2)
            sk.bits = raw.copy()
            return sk
        except (struct.error, ValueError) as exc:
            raise SketchDeserializeError(f"Failed to deserialize {cls.NAME} sketch") from exc


def bloom_union(a: BloomFilterSketch, b: BloomFilterSketch) -> BloomFilterSketch:
    out = BloomFilterSketch(a.lg_m, a.num_hashes)
    out.bits = a.bits.copy()
    out.merge(b)
    return out


def bloom_intersect(a: BloomFilterSketch, b: BloomFilterSketch) -> BloomFilterSketch:
    out = BloomFilterSketch(a.lg_m, a.num_hashes)
    out.bits = a.bits.copy()
    out.intersect(b)
    return out
