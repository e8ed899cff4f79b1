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

from .base import FAMILY_RESERVOIR, SketchDeserializeError, frame, unframe
from .frequent_items import canonicalize_series


class ReservoirSampleSketch:
    FAMILY = FAMILY_RESERVOIR
    NAME = "Reservoir Sample"
    K_MIN, K_MAX = 1, 1 << 22

    __slots__ = ("k", "n", "tags", "items", "_rng")

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

    # -- serialization --------------------------------------------------
    def serialize(self) -> bytes:
        enc = [s.encode("utf-8") for s in self.items]
        lens = np.array([len(e) for e in enc], dtype=np.int32)
        payload = (
            struct.pack("<IQI", self.k, self.n, len(enc))
            + self.tags.tobytes()
            + lens.tobytes()
            + b"".join(enc)
        )
        return frame(self.FAMILY, payload)

    @classmethod
    def deserialize(cls, blob: bytes) -> "ReservoirSampleSketch":
        payload = unframe(blob, cls.FAMILY)
        try:
            k, n, cnt = struct.unpack_from("<IQI", payload, 0)
            sk = cls(k)
            sk.n = n
            off = 16
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
