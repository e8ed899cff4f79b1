"""HyperLogLog and CPC distinct-count sketches (pure-Python core).

Reference surface: ``datasketch_hll`` / ``datasketch_cpc`` aggregates +
scalars (/root/reference/src/generated.cpp:866-1138, 5948-6956).  Note
the primary Spark-side HLL path in this engine is Spark 4's *native*
Apache DataSketches HLL (``hll_sketch_agg`` etc., JVM-side and
wire-compatible with the reference); this module provides (a) the
Python-format HLL used by the SQL-registered ``datasketch_hll`` UDAF
and (b) the CPC family, for which no native Spark support exists.

Design:
- SPARSE mode keeps the exact set of unique 63-bit hashes until it
  exceeds 2^lg_k / 2 entries -> estimates are EXACT (the reference's
  small-N tests, e.g. test/sql/datasketch_hll.test:90-109, rely on
  exact small-range behavior).
- DENSE mode: classic HLL registers (index = low lg_k bits, rho =
  leading-zero rank of the remaining 63-lg_k bits), harmonic-mean
  estimator with linear-counting small-range correction
  (Flajolet et al., 2007).
- CPC reuses the core but zlib-compresses the serialized registers --
  honoring the reference's "~40% smaller than HLL" storage contract
  (docs/README.md:49-56) without re-implementing the full CPC paper;
  documented approximation.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from ..hashing import hash_values
from .base import FAMILY_CPC, FAMILY_HLL, SketchDeserializeError, frame, unframe

_MODE_SPARSE = 0
_MODE_DENSE = 1


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


class HllSketch:
    FAMILY = FAMILY_HLL
    NAME = "HLL"
    LG_K_MIN, LG_K_MAX = 4, 21  # codegen/generated.cpp.j2:80-84
    RSE_COEFF = 1.04  # classic HLL relative standard error coefficient

    __slots__ = ("lg_k", "mode", "sparse", "registers")

    def __init__(self, lg_k: int = 12):
        if not (self.LG_K_MIN <= lg_k <= self.LG_K_MAX):
            # text mirrors the reference (codegen/generated.cpp.j2:80-89)
            raise ValueError(
                f"{self.NAME} K (lg_k) value must be between "
                f"{self.LG_K_MIN} and {self.LG_K_MAX}, got: {lg_k}"
            )
        self.lg_k = int(lg_k)
        self.mode = _MODE_SPARSE
        self.sparse = np.empty(0, dtype=np.uint64)
        self.registers = None  # np.uint8[m] in dense mode

    # -- building -------------------------------------------------------
    @property
    def _m(self) -> int:
        return 1 << self.lg_k

    @property
    def _sparse_limit(self) -> int:
        return max(16, self._m // 2)

    def update_hashes(self, h: np.ndarray) -> None:
        if h.size == 0:
            return
        if self.mode == _MODE_SPARSE:
            self.sparse = np.unique(np.concatenate([self.sparse, h]))
            if self.sparse.size > self._sparse_limit:
                self._promote()
        else:
            self._dense_update(h)

    def update_values(self, values) -> None:
        self.update_hashes(hash_values(values))

    def _promote(self) -> None:
        self.registers = np.zeros(self._m, dtype=np.uint8)
        self.mode = _MODE_DENSE
        if self.sparse.size:
            self._dense_update(self.sparse)
        self.sparse = np.empty(0, dtype=np.uint64)

    def _dense_update(self, h: np.ndarray) -> None:
        m_mask = np.uint64(self._m - 1)
        idx = (h & m_mask).astype(np.int64)
        v = h >> np.uint64(self.lg_k)  # 63 - lg_k significant bits
        nbits = 63 - self.lg_k
        # exact bit length via 32-bit halves (a single float64 frexp is
        # off by one for values within half a ULP below a power of two
        # — they round UP to it; see cpc._bit_length_u64)
        hi = (v >> np.uint64(32)).astype(np.float64)
        lo = (v & np.uint64(0xFFFFFFFF)).astype(np.float64)
        _, ehi = np.frexp(hi)
        _, elo = np.frexp(lo)
        blen = np.where(hi > 0, 32 + ehi, elo)
        rho = (nbits - blen + 1).astype(np.uint8)  # v==0 → nbits+1
        np.maximum.at(self.registers, idx, rho)

    def merge(self, other: "HllSketch") -> None:
        if other.lg_k < self.lg_k:
            # mixed-K union degrades to the coarser resolution
            # (reference test/sql/datasketch_hll.test:224-234) -- even
            # when the other side is still sparse (raw hashes are
            # resolution-free, but the RESULT's configured K must be
            # the min so later promotion lands at the coarser size)
            self._fold_to(other.lg_k)
        if other.mode == _MODE_SPARSE:
            self.update_hashes(other.sparse)
            return
        if self.mode == _MODE_SPARSE:
            sp = self.sparse
            self.lg_k = min(self.lg_k, other.lg_k)
            self.registers = np.zeros(self._m, dtype=np.uint8)
            self.mode = _MODE_DENSE
            self.sparse = np.empty(0, dtype=np.uint64)
            if sp.size:
                self._dense_update(sp)
        if other.lg_k > self.lg_k:
            other = other._folded_copy(self.lg_k)
        np.maximum(self.registers, other.registers, out=self.registers)

    def _fold_to(self, lg_k: int) -> None:
        """Degrade resolution to a smaller lg_k (union of mixed-K sketches,
        reference test/sql/datasketch_hll.test:224-234)."""
        if self.mode == _MODE_SPARSE:
            self.lg_k = lg_k
            if self.sparse.size > self._sparse_limit:
                self._promote()
            return
        folded = self._folded_copy(lg_k)
        self.lg_k = folded.lg_k
        self.registers = folded.registers

    def _folded_copy(self, lg_k: int) -> "HllSketch":
        # EXACT register downsampling (no raw hashes needed).  With
        # index = low lg_k bits and rho taken from the remaining top
        # window, an item's rho is INVARIANT under index narrowing
        # whenever its value word v = h >> lg_k is nonzero: the bits
        # that move from index to value extend v at the BOTTOM, so the
        # leading-zero rank from the top is unchanged.  Only saturated
        # registers (rho = nbits+1, meaning v == 0) re-derive their
        # coarse rho from the fine index's top bits t = j >> lg_k':
        # the coarse value word is exactly t, so rho' = nbits' -
        # bitlen(t) + 1 (or nbits'+1 when t == 0).  Fine buckets fold
        # into coarse bucket j mod 2^lg_k' (the low index bits).
        out = HllSketch.__new__(type(self))
        out.lg_k = lg_k
        out.mode = _MODE_DENSE
        out.sparse = np.empty(0, dtype=np.uint64)
        m2 = 1 << lg_k
        nbits = 63 - self.lg_k
        nbits2 = 63 - lg_k
        r = self.registers.astype(np.int64)
        j = np.arange(self._m, dtype=np.int64)
        t = j >> lg_k
        tb = np.zeros_like(t)
        nz = t > 0
        _, exp = np.frexp(t[nz].astype(np.float64))
        tb[nz] = exp  # bit length of t
        saturated_rho = np.where(t == 0, nbits2 + 1, nbits2 + 1 - tb)
        contrib = np.where(
            r == 0, 0, np.where(r <= nbits, r, saturated_rho)
        )
        coarse = np.zeros(m2, dtype=np.int64)
        np.maximum.at(coarse, j & (m2 - 1), contrib)
        out.registers = coarse.astype(np.uint8)
        return out

    # -- queries --------------------------------------------------------
    @property
    def is_empty(self) -> bool:
        return self.mode == _MODE_SPARSE and self.sparse.size == 0

    @property
    def lg_config_k(self) -> int:
        return self.lg_k

    @property
    def is_compact(self) -> bool:
        return True  # our blobs are always the compact representation

    def get_estimate(self) -> float:
        if self.mode == _MODE_SPARSE:
            return float(self.sparse.size)
        m = self._m
        regs = self.registers.astype(np.float64)
        raw = _alpha(m) * m * m / np.sum(np.exp2(-regs))
        zeros = int(np.count_nonzero(self.registers == 0))
        if raw <= 2.5 * m and zeros > 0:
            return float(m * np.log(m / zeros))
        return float(raw)

    def get_bound(self, num_std_devs: int, upper: bool) -> float:
        if not (1 <= num_std_devs <= 3):
            raise ValueError("number of standard deviations must be 1..3")
        est = self.get_estimate()
        if self.mode == _MODE_SPARSE:
            return est
        rse = self.RSE_COEFF / np.sqrt(self._m)
        return est * (1.0 + num_std_devs * rse) if upper else est / (1.0 + num_std_devs * rse)

    def describe(self, summary: bool = True, detail: bool = False) -> str:
        lines = [
            f"### {self.NAME} sketch summary:",
            f"   lg config k   : {self.lg_k}",
            f"   mode          : {'SPARSE' if self.mode == _MODE_SPARSE else 'DENSE'}",
            f"   empty?        : {self.is_empty}",
            f"   estimate      : {self.get_estimate():.3f}",
        ]
        if detail and self.mode == _MODE_DENSE:
            lines.append(f"   nonzero regs  : {int(np.count_nonzero(self.registers))}")
        return "\n".join(lines) + "\n"

    # -- serialization --------------------------------------------------
    def _payload(self) -> bytes:
        if self.mode == _MODE_SPARSE:
            return (
                struct.pack("<BBI", self.lg_k, _MODE_SPARSE, self.sparse.size)
                + self.sparse.tobytes()
            )
        return struct.pack("<BBI", self.lg_k, _MODE_DENSE, 0) + self.registers.tobytes()

    def serialize(self) -> bytes:
        return frame(self.FAMILY, self._payload())

    @classmethod
    def _from_payload(cls, payload: bytes) -> "HllSketch":
        try:
            lg_k, mode, count = struct.unpack_from("<BBI", payload, 0)
            sk = cls(lg_k)
            if mode == _MODE_SPARSE:
                sk.sparse = np.frombuffer(payload, dtype=np.uint64, count=count, offset=6).copy()
            else:
                sk.mode = _MODE_DENSE
                regs = np.frombuffer(payload, dtype=np.uint8, count=1 << lg_k, offset=6)
                sk.registers = regs.copy()
            return sk
        except (struct.error, ValueError) as exc:
            raise SketchDeserializeError(f"Failed to deserialize {cls.NAME} sketch") from exc

    @classmethod
    def deserialize(cls, blob: bytes) -> "HllSketch":
        return cls._from_payload(unframe(blob, cls.FAMILY))


# CPC moved to sketches/cpc.py: a real coupon-collector core with the
# ICON estimator (it no longer shares HLL's register estimator).
