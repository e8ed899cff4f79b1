"""Mergeable uniform reservoir-sample sketch (bottom-k random tags).

Beyond-reference family: the reference extension has no sampling
sketch, but "give me a uniform k-sample per group, merged across
partitions/days" is a workhorse of training-data curation at 100 TB
(sample documents per language/source, audit slices, eval splits).
The wider Apache DataSketches ecosystem ships reservoir/VarOpt
sampling for exactly this reason; this is the same capability with a
simpler, exactly-mergeable construction:

- every incoming item gets an independent random exponential tag
  t ~ Exp(w) = -ln(U)/w where w is the item's weight (1 when
  unweighted) — the Efraimidis-Spirakis (2006) A-ES keys;
- the sketch keeps the k items with the SMALLEST tags (bottom-k),
  which samples WITHOUT replacement with inclusion probability
  proportional to weight (uniform when all w=1);
- union of two sketches = bottom-k of the tag-union — associative,
  commutative, and distributionally identical to sampling the
  concatenated stream (order statistics of independent exponentials
  don't care how the stream was split).  Weighted and unweighted
  blobs are therefore mutually mergeable.

So the two-phase pattern (partition-local sample -> merge) yields an
exact uniform sample without replacement over the whole input, while
only (k items + tags) per partition ever crosses the shuffle.

Exact mode: with n <= k the sketch holds ALL items, so queries are
deterministic and oracle-checkable (the same small-N trick the
reference's tests lean on, SURVEY.md §5).

Items are canonicalized to strings exactly like the Frequent Items
family (reference src/frequent_items_sketch.cpp:88-100 uses
std::to_string); the sample is a set of item strings.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

from .base import (
    FAMILY_RESERVOIR,
    SketchDeserializeError,
    frame,
    is_framed,
    unframe,
)
from .frequent_items import canonicalize_series


class ReservoirSampleSketch:
    FAMILY = FAMILY_RESERVOIR
    NAME = "Reservoir Sample"
    K_MIN, K_MAX = 1, 1 << 22

    __slots__ = ("k", "n", "tags", "items", "weighted", "_rng")

    def __init__(self, k: int = 1024):
        if not (self.K_MIN <= k <= self.K_MAX):
            raise ValueError(
                f"Invalid k for {self.NAME} sketch: {k} (must be in "
                f"[{self.K_MIN}, {self.K_MAX}])"
            )
        self.k = int(k)
        self.n = 0
        self.tags = np.empty(0, dtype=np.float64)
        self.items: list[str] = []
        # True once any weighted update touched this state (directly or
        # via merge): the sample is then inclusion-∝-weight, not
        # uniform, and must not be exported as an Apache uniform
        # reservoir (to_wire refuses)
        self.weighted = False
        self._rng = np.random.default_rng()

    # -- building -------------------------------------------------------
    def _keep_bottom_k(self, tags: np.ndarray, items: list[str]) -> None:
        if tags.size > self.k:
            idx = np.argpartition(tags, self.k - 1)[: self.k]
            # sort for deterministic serialized layout given the same tags
            idx = idx[np.argsort(tags[idx], kind="stable")]
        else:
            idx = np.argsort(tags, kind="stable")
        self.tags = tags[idx]
        self.items = [items[i] for i in idx]

    def update_series(self, s: pd.Series, weights: pd.Series | None = None) -> None:
        if weights is not None:
            self.weighted = True
            mask = s.notna() & weights.notna() & (weights > 0)
            s = s[mask]
            w = weights[mask].to_numpy(dtype=np.float64)
        else:
            s = s.dropna()
            w = None
        if s.empty:
            return
        # Exp(w) keys: -ln(U)/w; numpy's exponential(scale) draws
        # scale * Exp(1), so scale = 1/w
        scale = 1.0 if w is None else 1.0 / w
        new_tags = self._rng.exponential(scale, size=len(s))
        self.n += len(s)
        # select survivors on tags alone, then canonicalize only the
        # <= k incoming winners: stringifying every candidate row was
        # the dominant cost of the whole update
        n_old = self.tags.size
        tags = np.concatenate([self.tags, new_tags])
        if tags.size > self.k:
            idx = np.argpartition(tags, self.k - 1)[: self.k]
            idx = idx[np.argsort(tags[idx], kind="stable")]
        else:
            idx = np.argsort(tags, kind="stable")
        new_sel = idx[idx >= n_old] - n_old
        canon_new = (
            canonicalize_series(s.iloc[new_sel]).tolist() if new_sel.size else []
        )
        new_items = dict(zip(new_sel.tolist(), canon_new))
        self.items = [
            self.items[i] if i < n_old else new_items[i - n_old] for i in idx
        ]
        self.tags = tags[idx]

    def merge(self, other: "ReservoirSampleSketch") -> None:
        if other.k < self.k and other.n > other.k:
            # a smaller-k sketch in estimation mode cannot be widened;
            # degrade to the coarser resolution (mixed-K union, same
            # convention as the HLL family)
            self.k = other.k
        self.n += other.n
        self.weighted = self.weighted or other.weighted
        self._keep_bottom_k(
            np.concatenate([self.tags, other.tags]), self.items + other.items
        )

    # -- queries --------------------------------------------------------
    @property
    def is_empty(self) -> bool:
        return self.n == 0

    @property
    def num_retained(self) -> int:
        return len(self.items)

    @property
    def is_exact(self) -> bool:
        """True iff the sample IS the full input multiset."""
        return self.n <= self.k

    def get_items(self) -> list[str]:
        return list(self.items)

    def describe(self) -> str:
        lines = [
            f"### {self.NAME} sketch summary:",
            f"   k             : {self.k}",
            f"   n seen        : {self.n}",
            f"   retained      : {self.num_retained}",
            f"   exact?        : {self.is_exact}",
            f"   empty?        : {self.is_empty}",
        ]
        return "\n".join(lines) + "\n"

    # -- Apache wire interop ---------------------------------------------
    # ReservoirLongsSketch serVer-2 layout, recovered from the live
    # datasketches-java bundled in pyspark (golden/differentially
    # tested in tests/test_reservoir_wire.py):
    #   byte 0: (resizeFactor << 6) | preLongs   (rf=3/X8; pre 1|2)
    #   byte 1: serVer = 2
    #   byte 2: family id = 11 (RESERVOIR)
    #   byte 3: flags (4 = EMPTY)
    #   bytes 4-7: k (LE u32)   [serVer 1 used the 16-bit encoded size]
    #   non-empty: long 1 = itemsSeen n (LE u64),
    #              then min(n, k) LE int64 sample items.
    _WIRE_FAMILY_ID = 11
    _WIRE_SERVER = 2
    _WIRE_EMPTY_FLAG = 4

    def to_wire(self) -> bytes:
        """Serialize as an Apache ``ReservoirLongsSketch`` blob.

        The Apache reservoir wire is LONGS-ONLY (same story as java's
        ReqSketch being float-only), so every retained item must be an
        int64-canonical string; anything else raises.  The sample set,
        n and k cross exactly; the A-ES tags do not (java's reservoir
        carries no tags — they are re-synthesized on ingest, see
        :meth:`from_wire`).  Weighted samples are NOT representable:
        java's reservoir is uniform, so exporting a weighted sketch
        would silently misdeclare its distribution — refused.
        """
        if self.weighted:
            raise ValueError(
                "Apache reservoir wire is uniform-only: this sketch "
                "holds a weighted (inclusion-proportional-to-weight) "
                "sample and cannot be exported as a ReservoirLongsSketch"
            )
        if self.k < 2:
            raise ValueError(
                "Apache reservoir wire requires k >= 2 (java's "
                "ReservoirLongsSketch refuses smaller reservoirs)"
            )
        try:
            vals = np.array([int(s) for s in self.items], dtype=np.int64)
        except (ValueError, OverflowError) as exc:
            raise ValueError(
                "Apache reservoir wire is longs-only: every retained "
                "item must be an int64 string (got a non-integer item)"
            ) from exc
        if self.is_empty:
            return struct.pack(
                "<BBBBI",
                0xC0 | 1,
                self._WIRE_SERVER,
                self._WIRE_FAMILY_ID,
                self._WIRE_EMPTY_FLAG,
                self.k,
            )
        return (
            struct.pack(
                "<BBBBI",
                0xC0 | 2,
                self._WIRE_SERVER,
                self._WIRE_FAMILY_ID,
                0,
                self.k,
            )
            + struct.pack("<Q", self.n)
            + vals.tobytes()
        )

    @classmethod
    def from_wire(cls, blob: bytes) -> "ReservoirSampleSketch":
        """Ingest an Apache ``ReservoirLongsSketch`` blob.

        The sample set, n and k are read exactly.  Apache's reservoir
        keeps no per-item keys, while this engine's merge is bottom-k
        on A-ES exponential tags — so tags are SYNTHESIZED as the
        bottom-``m`` order statistics of ``n`` unit exponentials
        (E_(i) = Σ_{j≤i} X_j / (n−j+1), the Rényi representation),
        randomly assigned to the imported items.  A uniform k-of-n
        sample with those tags is distributionally identical to an
        A-ES sketch built over a stream those k items won, so later
        merges stay exactly-uniform.  DSKS-framed blobs pass through
        ``deserialize`` untouched (sniffed there), keeping ingest
        idempotent.
        """
        try:
            pre_rf, ser, fam, flags, k = struct.unpack_from("<BBBBI", blob, 0)
        except struct.error as exc:
            raise SketchDeserializeError(
                f"Failed to deserialize {cls.NAME} sketch"
            ) from exc
        if fam != cls._WIRE_FAMILY_ID or ser != cls._WIRE_SERVER:
            raise SketchDeserializeError(
                f"Failed to deserialize {cls.NAME} sketch"
            )
        try:
            sk = cls(k)
        except ValueError as exc:
            # a structurally valid java blob may carry k up to
            # Int.MaxValue; we cap at K_MAX — refuse loudly, but under
            # the corrupt-blob contract, not a bare ValueError
            raise SketchDeserializeError(
                f"Failed to deserialize {cls.NAME} sketch: "
                f"k={k} outside supported [{cls.K_MIN}, {cls.K_MAX}]"
            ) from exc
        if flags & cls._WIRE_EMPTY_FLAG:
            return sk
        try:
            (n,) = struct.unpack_from("<Q", blob, 8)
            m = int(min(n, k))
            vals = np.frombuffer(blob, dtype="<i8", count=m, offset=16)
        except (struct.error, ValueError) as exc:
            raise SketchDeserializeError(
                f"Failed to deserialize {cls.NAME} sketch"
            ) from exc
        sk.n = int(n)
        gaps = sk._rng.exponential(size=m) / (n - np.arange(m, dtype=np.float64))
        sk.tags = np.cumsum(gaps)
        perm = sk._rng.permutation(m)
        sk.items = [str(int(v)) for v in vals[perm]]
        return sk

    # -- serialization --------------------------------------------------
    def serialize(self) -> bytes:
        enc = [s.encode("utf-8") for s in self.items]
        lens = np.array([len(e) for e in enc], dtype=np.int32)
        payload = (
            struct.pack("<IQIB", self.k, self.n, len(enc), int(self.weighted))
            + self.tags.tobytes()
            + lens.tobytes()
            + b"".join(enc)
        )
        return frame(self.FAMILY, payload)

    @classmethod
    def deserialize(cls, blob: bytes) -> "ReservoirSampleSketch":
        if not is_framed(blob):
            # Apache ReservoirLongsSketch blob: implicit ingest, same
            # sniff convention as the theta/quantile families
            return cls.from_wire(bytes(blob))
        payload = unframe(blob, cls.FAMILY)
        try:
            k, n, cnt, weighted = struct.unpack_from("<IQIB", payload, 0)
            sk = cls(k)
            sk.n = n
            sk.weighted = bool(weighted)
            off = 17
            sk.tags = np.frombuffer(payload, dtype=np.float64, count=cnt, offset=off).copy()
            off += 8 * cnt
            lens = np.frombuffer(payload, dtype=np.int32, count=cnt, offset=off)
            off += 4 * cnt
            items = []
            for ln in lens:
                items.append(payload[off : off + ln].decode("utf-8"))
                off += int(ln)
            if len(items) != cnt:
                raise ValueError("truncated items")
            sk.items = items
            return sk
        except (struct.error, ValueError, UnicodeDecodeError) as exc:
            raise SketchDeserializeError(
                f"Failed to deserialize {cls.NAME} sketch"
            ) from exc
