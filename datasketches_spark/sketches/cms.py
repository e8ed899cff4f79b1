"""Count-Min sketch (pure-Python core, numpy-vectorized).

Beyond-reference family: the reference's frequency story is Frequent
Items (top of the distribution); Count-Min answers the complementary
question — "estimated count of ANY item" — with the one-sided
guarantee estimate >= true count (never under-counts), error
<= eps * total_weight with eps = 2/width (Cormode & Muthukrishnan
2005).  Spark ships a JVM `count_min_sketch` aggregate (exposed via
functions/native.py); this family provides the same capability in the
engine's own blob format so CMS state composes with the rest of the
surface (two-phase agg, stored tables, scalar queries, streaming).

- depth x width uint64 counter matrix; width is a power of two so the
  per-row index is a mask of a seeded splitmix64 hash;
- update adds 1 (or a weight) at one index per row;
- merge = elementwise add (same shape required; an untouched sketch
  adopts the incoming shape);
- estimate = min over rows — deterministic given the fixed seeds.

Items are canonicalized to strings like the Frequent Items family, so
`datasketch_cms_estimate(sk, item)` agrees across input types.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

from ..hashing import hash_values, splitmix64
from .base import FAMILY_CMS, SketchDeserializeError, frame, unframe


class CountMinSketch:
    FAMILY = FAMILY_CMS
    NAME = "Count-Min"
    LG_W_MIN, LG_W_MAX = 4, 26
    DEPTH_MIN, DEPTH_MAX = 1, 16

    __slots__ = ("lg_w", "depth", "counts", "total")

    def __init__(self, lg_w: int = 16, depth: int = 5):
        if not (self.LG_W_MIN <= lg_w <= self.LG_W_MAX):
            raise ValueError(
                f"Invalid lg_w for {self.NAME} sketch: {lg_w} (must be in "
                f"[{self.LG_W_MIN}, {self.LG_W_MAX}])"
            )
        if not (self.DEPTH_MIN <= depth <= self.DEPTH_MAX):
            raise ValueError(
                f"Invalid depth for {self.NAME} sketch: {depth} (must be in "
                f"[{self.DEPTH_MIN}, {self.DEPTH_MAX}])"
            )
        self.lg_w = int(lg_w)
        self.depth = int(depth)
        self.counts = np.zeros((self.depth, 1 << self.lg_w), dtype=np.uint64)
        self.total = 0

    @property
    def width(self) -> int:
        return 1 << self.lg_w

    @property
    def epsilon(self) -> float:
        """Additive error bound per estimate: eps * total_weight."""
        return 2.0 / self.width

    def _row_indices(self, canon: pd.Series) -> np.ndarray:
        # one expensive value hash + a cheap uint64 re-mix per extra row
        # (Kirsch-Mitzenmacher double hashing, like the Bloom family):
        # hashing the values once instead of `depth` times is a ~depth-x
        # speedup on string inputs where the value hash dominates
        mask = np.uint64(self.width - 1)
        h1 = hash_values(canon, seed=0xC3A5)
        if self.depth == 1:
            return (h1 & mask)[None, :]
        h2 = splitmix64(h1, seed=0x9E37) | np.uint64(1)
        i = np.arange(self.depth, dtype=np.uint64)[:, None]
        with np.errstate(over="ignore"):
            return (h1[None, :] + i * h2[None, :]) & mask

    # -- building -------------------------------------------------------
    def update_series(self, s: pd.Series) -> None:
        from .frequent_items import canonicalize_series

        s = s.dropna()
        if s.empty:
            return
        # collapse duplicates first: the scatter and the canonicalization
        # then touch unique items only (weights carry the counts) --
        # repeated adds to one cell equal one weighted add
        vc = s.value_counts()
        canon = canonicalize_series(pd.Series(vc.index))
        w = vc.to_numpy(dtype=np.uint64)
        idx = self._row_indices(canon)
        for i in range(self.depth):
            np.add.at(self.counts[i], idx[i].astype(np.int64), w)
        self.total += int(len(s))

    def merge(self, other: "CountMinSketch") -> None:
        if (self.lg_w, self.depth) != (other.lg_w, other.depth):
            if self.total == 0:
                self.lg_w, self.depth = other.lg_w, other.depth
                self.counts = other.counts.copy()
                self.total = other.total
                return
            raise ValueError(
                f"Count-Min merge requires identical shape: "
                f"(lg_w={self.lg_w}, d={self.depth}) vs "
                f"(lg_w={other.lg_w}, d={other.depth})"
            )
        self.counts += other.counts
        self.total += other.total

    # -- queries --------------------------------------------------------
    @property
    def is_empty(self) -> bool:
        return self.total == 0

    def total_weight(self) -> int:
        return int(self.total)

    def get_estimate(self, item) -> int:
        from .frequent_items import canonicalize_item

        canon = pd.Series([canonicalize_item(item)])
        idx = self._row_indices(canon)
        return int(min(self.counts[i, int(idx[i, 0])] for i in range(self.depth)))

    def estimate_series(self, items: pd.Series) -> np.ndarray:
        from .frequent_items import canonicalize_series

        canon = canonicalize_series(items)
        idx = self._row_indices(canon)
        ests = np.stack(
            [self.counts[i][idx[i].astype(np.int64)] for i in range(self.depth)]
        )
        return ests.min(axis=0).astype(np.int64)

    def describe(self) -> str:
        lines = [
            f"### {self.NAME} sketch summary:",
            f"   width         : {self.width}",
            f"   depth         : {self.depth}",
            f"   epsilon       : {self.epsilon:.8f}",
            f"   total weight  : {self.total}",
            f"   empty?        : {self.is_empty}",
        ]
        return "\n".join(lines) + "\n"

    # -- serialization --------------------------------------------------
    def serialize(self) -> bytes:
        return frame(
            self.FAMILY,
            struct.pack("<BBQ", self.lg_w, self.depth, self.total)
            + self.counts.tobytes(),
        )

    @classmethod
    def deserialize(cls, blob: bytes) -> "CountMinSketch":
        payload = unframe(blob, cls.FAMILY)
        try:
            lg_w, depth, total = struct.unpack_from("<BBQ", payload, 0)
            sk = cls(lg_w, depth)
            sk.total = int(total)
            n = depth << lg_w
            raw = np.frombuffer(payload, dtype=np.uint64, count=n, offset=10)
            sk.counts = raw.reshape(depth, 1 << lg_w).copy()
            return sk
        except (struct.error, ValueError) as exc:
            raise SketchDeserializeError(
                f"Failed to deserialize {cls.NAME} sketch"
            ) from exc
