"""Shared compactor-stack core for the mergeable quantile families.

The reference ships three rank-error quantile sketches -- classic
Quantiles, KLL, REQ -- all generated from the same aggregate template
(/root/reference/codegen/generated.cpp.j2, spec codegen/generator.py).
They share one structure: a stack of levels of items where level *i*
items carry weight 2^i, and an over-full level is compacted by sorting
and promoting a random half (even/odd offset) to the next level.  The
families differ only in their level-capacity policy:

- KLL: capacity k * (2/3)^(depth-from-top), floor 8 (near-optimal size,
  KLL paper: Karnin, Lang, Liberty, FOCS'16);
- classic Quantiles: constant capacity k per level, 2k base
  (Manku-Rajagopalan-Lindsay style low-discrepancy design);
- REQ: constant capacity with *tail protection* -- the highest items of
  a level are exempt from compaction, which concentrates accuracy in
  high ranks (relative-error behavior, HRA mode; simplified from the
  REQ paper: Cormode et al., 2021).

Exactness contract (relied on by the oracle test corpus, FIXTURES.md):
until the first compaction, the sketch holds every item, so n / min /
max / rank / quantile / cdf / pmf are EXACT and deterministic.  After a
compaction the estimates are randomized (reference docs/README.md:240-247).
All query-time semantics use *inclusive* ranks by default, matching the
reference's default ``inclusive := true`` arguments.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import (
    DTYPE_CODES,
    DTYPE_FROM_CODE,
    FAMILY_KLL,
    FAMILY_QUANTILES,
    FAMILY_REQ,
    SketchDeserializeError,
    frame,
    unframe,
)

_NP_DTYPES = {"float64": np.float64, "float32": np.float32, "int64": np.int64}


class CompactorSketch:
    """Base compactor stack; subclasses define capacity policy + family."""

    FAMILY: int = 0
    K_MIN = 1
    K_MAX = 32768
    NAME = "compactor"

    __slots__ = (
        "k", "dtype", "levels", "n", "min_item", "max_item", "compacted",
        "_coin", "_sorted_cache",
    )

    def __init__(self, k: int, dtype: str = "float64"):
        self.validate_k(k)
        if dtype not in _NP_DTYPES:
            raise ValueError(f"unsupported sketch dtype: {dtype}")
        self.k = int(k)
        self.dtype = dtype
        self.levels: list[np.ndarray] = [np.empty(0, dtype=_NP_DTYPES[dtype])]
        self.n = 0
        self.min_item = None
        self.max_item = None
        self.compacted = False
        self._coin = 0  # deterministic counter-based coin for compaction offsets
        self._sorted_cache = None  # (items, weights); invalidated on mutation

    # -- capacity policy ------------------------------------------------
    @classmethod
    def validate_k(cls, k: int) -> None:
        # message text mirrors the reference's bind-time validation
        # (codegen/generated.cpp.j2:65-90)
        if not (cls.K_MIN <= k <= cls.K_MAX):
            raise ValueError(
                f"{cls.NAME} K value must be between {cls.K_MIN} and "
                f"{cls.K_MAX}, got: {k}"
            )

    def _capacity(self, level: int, num_levels: int) -> int:
        raise NotImplementedError

    def _protect_high(self, level: int) -> int:
        return 0

    def _total_capacity(self) -> int:
        L = len(self.levels)
        return sum(self._capacity(i, L) for i in range(L))

    # -- building -------------------------------------------------------
    def update(self, values: np.ndarray) -> None:
        arr = np.asarray(values, dtype=_NP_DTYPES[self.dtype])
        if arr.dtype.kind == "f":
            arr = arr[~np.isnan(arr)]
        if arr.size == 0:
            return
        lo, hi = arr.min(), arr.max()
        self.min_item = lo if self.min_item is None else min(self.min_item, lo)
        self.max_item = hi if self.max_item is None else max(self.max_item, hi)
        self.n += int(arr.size)
        self.levels[0] = np.concatenate([self.levels[0], arr])
        self._sorted_cache = None
        self._compress()

    def merge(self, other: "CompactorSketch") -> None:
        if other.dtype != self.dtype:
            if self.n == 0:
                # an empty accumulator adopts the dtype of its first input
                # (phase-2 merges start from a default-constructed sketch)
                self.dtype = other.dtype
                self.levels = [np.empty(0, dtype=_NP_DTYPES[self.dtype])]
            else:
                raise ValueError("cannot merge sketches of different value types")
        if other.n == 0:
            return
        # merging different K degrades to the coarser resolution, like the
        # reference's mixed-K unions (test/sql/datasketch_hll.test:224-234)
        self.k = min(self.k, other.k)
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=_NP_DTYPES[self.dtype]))
        for i, lv in enumerate(other.levels):
            if lv.size:
                self.levels[i] = np.concatenate([self.levels[i], lv])
        self.n += other.n
        self._sorted_cache = None
        self.compacted = self.compacted or other.compacted
        if self.min_item is None:
            self.min_item, self.max_item = other.min_item, other.max_item
        else:
            self.min_item = min(self.min_item, other.min_item)
            self.max_item = max(self.max_item, other.max_item)
        self._compress()

    def _retained(self) -> int:
        return sum(lv.size for lv in self.levels)

    def _compress(self) -> None:
        while self._retained() > self._total_capacity():
            L = len(self.levels)
            target = None
            for i in range(L):
                if self.levels[i].size >= self._capacity(i, L):
                    target = i
                    break
            if target is None:
                break
            self._compact_level(target)

    def _compact_level(self, i: int) -> None:
        if i + 1 >= len(self.levels):
            self.levels.append(np.empty(0, dtype=_NP_DTYPES[self.dtype]))
        lv = np.sort(self.levels[i])
        hi = min(self._protect_high(i), max(lv.size - 2, 0))
        body, keep = (lv[: lv.size - hi], lv[lv.size - hi :]) if hi else (lv, lv[:0])
        if body.size < 2:
            # nothing compactable; force-keep to avoid infinite loops
            self.levels[i] = lv
            self.levels.append(np.empty(0, dtype=_NP_DTYPES[self.dtype]))
            return
        if body.size % 2 == 1:
            # odd item stays at this level (standard KLL handling)
            keep = np.concatenate([body[-1:], keep])
            body = body[:-1]
        offset = self._next_coin()
        promoted = body[offset::2]
        self.levels[i] = keep
        self.levels[i + 1] = np.concatenate([self.levels[i + 1], promoted])
        self.compacted = True

    def _next_coin(self) -> int:
        # counter-based deterministic pseudo-random bit: reproducible for a
        # given operation order while still alternating irregularly
        self._coin += 1
        x = (self._coin * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        return (x >> 61) & 1

    # -- queries --------------------------------------------------------
    @property
    def is_empty(self) -> bool:
        return self.n == 0

    @property
    def is_estimation_mode(self) -> bool:
        return self.compacted

    @property
    def num_retained(self) -> int:
        return self._retained()

    def _sorted_items_weights(self):
        # cached: exact-mode sketches retain up to n items, and scalar
        # passes call rank/quantile/cdf repeatedly -- re-sorting 100k+
        # items per call dominated the query wall time
        if self._sorted_cache is not None:
            return self._sorted_cache
        arrs, ws = [], []
        for i, lv in enumerate(self.levels):
            if lv.size:
                arrs.append(lv)
                ws.append(np.full(lv.size, 1 << i, dtype=np.int64))
        if not arrs:
            out = (
                np.empty(0, dtype=_NP_DTYPES[self.dtype]),
                np.empty(0, dtype=np.int64),
            )
        else:
            items = np.concatenate(arrs)
            weights = np.concatenate(ws)
            order = np.argsort(items, kind="stable")
            out = (items[order], weights[order])
        self._sorted_cache = out
        return out

    def get_rank(self, item, inclusive: bool = True) -> float:
        if self.n == 0:
            return float("nan")
        items, weights = self._sorted_items_weights()
        side = "right" if inclusive else "left"
        idx = int(np.searchsorted(items, _NP_DTYPES[self.dtype](item), side=side))
        return float(weights[:idx].sum()) / float(self.n)

    def get_quantile(self, q: float, inclusive: bool = True):
        if self.n == 0:
            return None
        if q <= 0.0:
            return self._pyval(self.min_item)
        if q >= 1.0:
            return self._pyval(self.max_item)
        items, weights = self._sorted_items_weights()
        ranks = np.cumsum(weights).astype(np.float64) / float(self.n)
        side = "left" if inclusive else "right"
        idx = int(np.searchsorted(ranks, q, side=side))
        idx = min(idx, items.size - 1)
        return self._pyval(items[idx])

    def get_cdf(self, split_points, inclusive: bool = True) -> list[float]:
        if self.n == 0:
            return []
        sp = np.asarray(split_points, dtype=np.float64)
        if sp.size and np.any(np.diff(sp) <= 0):
            raise ValueError("split points must be unique and monotonically increasing")
        items, weights = self._sorted_items_weights()
        cum = np.concatenate([[0], np.cumsum(weights)]).astype(np.float64)
        side = "right" if inclusive else "left"
        idx = np.searchsorted(items.astype(np.float64), sp, side=side)
        out = (cum[idx] / float(self.n)).tolist()
        out.append(1.0)
        return out

    def ks_distance(self, other: "CompactorSketch") -> float:
        """Two-sample Kolmogorov-Smirnov statistic between the
        distributions summarized by two sketches: max |F_a(x) - F_b(x)|
        over the union of retained values.  Exact (equals the classical
        two-sample KS on the raw data) while both sketches are in exact
        mode; otherwise approximate with each sketch's rank error.
        Beyond-reference drift/data-quality surface built on the same
        retained-item machinery as get_cdf."""
        if self.n == 0 or other.n == 0:
            return float("nan")
        ia, wa = self._sorted_items_weights()
        ib, wb = other._sorted_items_weights()
        fa64, fb64 = ia.astype(np.float64), ib.astype(np.float64)
        xs = np.union1d(fa64, fb64)
        ca = np.concatenate([[0], np.cumsum(wa)]).astype(np.float64) / float(self.n)
        cb = np.concatenate([[0], np.cumsum(wb)]).astype(np.float64) / float(other.n)
        fa = ca[np.searchsorted(fa64, xs, side="right")]
        fb = cb[np.searchsorted(fb64, xs, side="right")]
        return float(np.max(np.abs(fa - fb)))

    def get_pmf(self, split_points, inclusive: bool = True) -> list[float]:
        cdf = self.get_cdf(split_points, inclusive)
        if not cdf:
            return []
        return [cdf[0]] + [cdf[i] - cdf[i - 1] for i in range(1, len(cdf))]

    def psi(self, other: "CompactorSketch", split_points,
            inclusive: bool = True) -> float:
        """Population Stability Index between the two summarized
        distributions over the bins induced by ``split_points``:
        sum_i (p_a,i - p_b,i) * ln(p_a,i / p_b,i).  Exact in exact
        mode.  An empty bin on either side yields inf/nan (no
        smoothing is applied — choose split points that cover both
        populations, or pre-clamp upstream).  Companion to
        :meth:`ks_distance`; PSI is the binned drift metric model
        monitoring conventionally thresholds at 0.1/0.25."""
        pa = np.asarray(self.get_pmf(split_points, inclusive), dtype=np.float64)
        pb = np.asarray(other.get_pmf(split_points, inclusive), dtype=np.float64)
        if pa.size == 0 or pb.size == 0:
            return float("nan")
        with np.errstate(divide="ignore", invalid="ignore"):
            terms = (pa - pb) * np.log(pa / pb)
        return float(np.sum(terms))

    def _pyval(self, v):
        return None if v is None else (int(v) if self.dtype == "int64" else float(v))

    def get_min_item(self):
        return self._pyval(self.min_item)

    def get_max_item(self):
        return self._pyval(self.max_item)

    def describe(self, include_levels: bool = False, include_items: bool = False) -> str:
        lines = [
            f"### {self.NAME} sketch summary:",
            f"   K              : {self.k}",
            f"   N              : {self.n}",
            f"   retained items : {self.num_retained}",
            f"   levels         : {len(self.levels)}",
            f"   empty?         : {self.is_empty}",
            f"   estimation?    : {self.is_estimation_mode}",
            f"   min item       : {self.get_min_item()}",
            f"   max item       : {self.get_max_item()}",
        ]
        if include_levels:
            for i, lv in enumerate(self.levels):
                lines.append(f"   level {i}: {lv.size} items (weight {1 << i})")
        if include_items:
            items, weights = self._sorted_items_weights()
            lines.append("   items: " + ", ".join(f"{v}x{w}" for v, w in zip(items, weights)))
        return "\n".join(lines) + "\n"

    # -- serialization --------------------------------------------------
    def serialize(self) -> bytes:
        dt = _NP_DTYPES[self.dtype]
        if self.dtype == "int64":
            mn = struct.pack("<q", int(self.min_item) if self.min_item is not None else 0)
            mx = struct.pack("<q", int(self.max_item) if self.max_item is not None else 0)
        else:
            mn = struct.pack("<d", float(self.min_item) if self.min_item is not None else 0.0)
            mx = struct.pack("<d", float(self.max_item) if self.max_item is not None else 0.0)
        head = struct.pack(
            "<IBBQ", self.k, DTYPE_CODES[self.dtype], 1 if self.compacted else 0, self.n
        )
        body = struct.pack("<B", len(self.levels))
        for lv in self.levels:
            body += struct.pack("<I", lv.size)
            body += np.ascontiguousarray(lv, dtype=dt).tobytes()
        return frame(self.FAMILY, head + mn + mx + body)

    @classmethod
    def deserialize(cls, blob: bytes) -> "CompactorSketch":
        payload = unframe(blob, cls.FAMILY)
        try:
            k, dcode, compacted, n = struct.unpack_from("<IBBQ", payload, 0)
            dtype = DTYPE_FROM_CODE[dcode]
            off = 14
            if dtype == "int64":
                mn = struct.unpack_from("<q", payload, off)[0]
                mx = struct.unpack_from("<q", payload, off + 8)[0]
            else:
                mn = struct.unpack_from("<d", payload, off)[0]
                mx = struct.unpack_from("<d", payload, off + 8)[0]
            off += 16
            (num_levels,) = struct.unpack_from("<B", payload, off)
            off += 1
            sk = cls(k, dtype)
            sk.n = n
            sk.compacted = bool(compacted)
            sk.min_item = None if n == 0 else _NP_DTYPES[dtype](mn)
            sk.max_item = None if n == 0 else _NP_DTYPES[dtype](mx)
            sk.levels = []
            itemsize = np.dtype(_NP_DTYPES[dtype]).itemsize
            for _ in range(num_levels):
                (count,) = struct.unpack_from("<I", payload, off)
                off += 4
                lv = np.frombuffer(payload, dtype=_NP_DTYPES[dtype], count=count, offset=off)
                off += count * itemsize
                sk.levels.append(lv.copy())
            if not sk.levels:
                sk.levels = [np.empty(0, dtype=_NP_DTYPES[dtype])]
            return sk
        except (struct.error, ValueError, KeyError, IndexError) as exc:
            raise SketchDeserializeError(f"Failed to deserialize {cls.NAME} sketch") from exc


# Apache DataSketches KLL wire format (family 15).  Serial version 1 =
# empty/full compact, 2 = single-item short form.  The reference's KLL
# blobs ARE this format (its Finalize serializes the datasketches-cpp
# kll_sketch, src/generated.cpp:3108-4485); layout verified against
# datasketches-java 6.2 dumps and cross-checked live in
# tests/test_murmur_wire.py.
_KLL_WIRE_FAMILY = 15
_KLL_WIRE_M = 8  # min level width; java rejects anything else
_KLL_FLAG_EMPTY = 1
_KLL_FLAG_L0_SORTED = 2
_KLL_FLAG_SINGLE = 4


def _kll_wire_level_capacity(k: int, num_levels: int, level: int) -> int:
    """Apache's level capacity: max(m, round-half-up(k * (2/3)^depth)),
    in exact integer arithmetic — readers re-derive the total array
    capacity from (k, m, numLevels), so the writer must agree exactly."""
    depth = num_levels - 1 - level
    pow3 = 3**depth
    return max(_KLL_WIRE_M, ((k << depth) * 2 + pow3) // (2 * pow3))


class KllSketch(CompactorSketch):
    """KLL quantile sketch (reference src/generated.cpp:3108-4485)."""

    FAMILY = FAMILY_KLL
    K_MIN, K_MAX = 1, 32768  # bind validation, codegen/generated.cpp.j2:65-69
    NAME = "KLL"

    def _capacity(self, level: int, num_levels: int) -> int:
        depth = num_levels - 1 - level
        return max(8, int(np.ceil(self.k * (2.0 / 3.0) ** depth)))

    def normalized_rank_error(self, pmf: bool) -> float:
        # calibrated to the reference's published numbers: ~1.33%
        # single-sided / ~1.65% double-sided at K=200 (docs/README.md:532)
        return (2.443 if pmf else 1.970) / self.k**0.9433

    # ---- Apache DataSketches wire format (KLL doubles/floats) ----

    _WIRE_WIDTHS = {"float64": ("<d", 8), "float32": ("<f", 4)}

    @classmethod
    def deserialize(cls, blob: bytes) -> "KllSketch":
        """Accepts the engine-local DSKS frame OR an Apache
        DataSketches KLL blob (sniffed on the frame magic), so blobs
        written by the reference / datasketches-{java,cpp} work
        everywhere a KLL blob does — scalars, union aggregates,
        sketch stores."""
        from .base import is_framed

        if not is_framed(blob):
            return cls.from_wire(blob)
        return super().deserialize(blob)

    def to_wire(self) -> bytes:
        """Serialize as an Apache DataSketches KLL doubles (or floats)
        sketch — readable by DuckDB/Druid/Hive/datasketches-java.
        Empty and single-item short forms are byte-identical to
        datasketches-java; the full form is semantically identical
        (level offsets rebased to 0, every level sorted) and verified
        by heapifying into datasketches-java live.
        """
        if self.dtype not in self._WIRE_WIDTHS:
            raise ValueError(
                "only float64/float32 KLL sketches have an Apache wire form "
                f"(doubles/floats sketch); this sketch holds {self.dtype}"
            )
        fmt, width = self._WIRE_WIDTHS[self.dtype]
        k = int(self.k)
        if self.n == 0:
            return struct.pack(
                "<BBBBHBB", 2, 1, _KLL_WIRE_FAMILY, _KLL_FLAG_EMPTY, k, _KLL_WIRE_M, 0
            )
        if self.n == 1:
            item = next(lv[0] for lv in self.levels if lv.size)
            return (
                struct.pack(
                    "<BBBBHBB", 2, 2, _KLL_WIRE_FAMILY, _KLL_FLAG_SINGLE,
                    k, _KLL_WIRE_M, 0,
                )
                + struct.pack(fmt, item)
            )
        levels = list(self.levels)
        while len(levels) > 1 and levels[-1].size == 0:
            levels.pop()
        num_levels = len(levels)
        # compact layout: the levels array carries numLevels in-memory
        # offsets; Apache readers re-derive the full array capacity from
        # (k, m, numLevels) and require the valid region to be
        # TOP-ALIGNED — offsets[0] = capacity - retained — so emit
        # offsets on that base, not 0
        retained = sum(int(lv.size) for lv in levels)
        capacity = sum(
            _kll_wire_level_capacity(k, num_levels, lvl) for lvl in range(num_levels)
        )
        if retained > capacity:
            # our capacity policy (ceil) can retain slightly more than
            # Apache's (round-half-up) allows; fold the overflow by
            # compacting until the blob fits the Apache envelope
            tmp = self.__class__(self.k, self.dtype)
            tmp.merge(self)
            while sum(lv.size for lv in tmp.levels) > capacity:
                target = max(
                    (i for i, lv in enumerate(tmp.levels) if lv.size >= 2),
                    key=lambda i: tmp.levels[i].size,
                )
                tmp._compact_level(target)
            return tmp.to_wire()
        offsets, acc = [], capacity - retained
        for lv in levels:
            offsets.append(acc)
            acc += int(lv.size)
        head = struct.pack(
            "<BBBBHBB", 5, 1, _KLL_WIRE_FAMILY, _KLL_FLAG_L0_SORTED,
            k, _KLL_WIRE_M, 0,
        )
        # minK: our k degrades in place on mixed-K merges, so it plays
        # both the capacity and the error role — emit it for both fields
        head += struct.pack("<QHBB", self.n, k, num_levels, 0)
        head += struct.pack(f"<{num_levels}I", *offsets)
        head += struct.pack(fmt, self.min_item) + struct.pack(fmt, self.max_item)
        body = b"".join(
            np.ascontiguousarray(np.sort(lv)).tobytes() for lv in levels
        )
        return head + body

    @classmethod
    def from_wire(cls, blob: bytes, dtype: str = "float64") -> "KllSketch":
        """Parse an Apache KLL doubles blob (or floats with
        ``dtype='float32'``; the preamble does not carry the item type
        — like the Apache readers, the caller picks the typed reader,
        and a 4-byte-item blob is auto-detected from the length).
        Compact forms only (serVer 1/2); the rare updatable form
        (serVer 3) is rejected like Apache's compact readers do.
        """
        err = SketchDeserializeError("Failed to deserialize KLL sketch")
        if not isinstance(blob, (bytes, bytearray)) or len(blob) < 8:
            raise err
        blob = bytes(blob)
        pre_ints, ser_ver, family, flags, k, m, _ = struct.unpack_from("<BBBBHBB", blob, 0)
        if family != _KLL_WIRE_FAMILY or m != _KLL_WIRE_M or k < 1:
            raise err
        # Apache allows k up to the u16 range (65535) — wider than the
        # reference's bind-time cap this engine mirrors for SQL-built
        # sketches (32768); accept the full wire range on import by
        # assigning k past validate_k (capacity math is k-agnostic)
        sk = cls(min(max(k, cls.K_MIN), cls.K_MAX), dtype)
        sk.k = int(k)
        if flags & _KLL_FLAG_EMPTY:
            return sk
        fmt, width = cls._WIRE_WIDTHS[dtype]
        if ser_ver == 2 or (flags & _KLL_FLAG_SINGLE):
            if len(blob) < 8 + width:
                raise err
            (item,) = struct.unpack_from(fmt, blob, 8)
            sk.update(np.asarray([item]))
            return sk
        if ser_ver != 1 or pre_ints != 5 or len(blob) < 20:
            raise err
        n, min_k, num_levels, _ = struct.unpack_from("<QHBB", blob, 8)
        if num_levels < 1 or len(blob) < 20 + 4 * num_levels:
            raise err
        offsets = list(struct.unpack_from(f"<{num_levels}I", blob, 20))
        off = 20 + 4 * num_levels
        capacity = sum(
            _kll_wire_level_capacity(k, num_levels, lvl) for lvl in range(num_levels)
        )

        def _width_ok(w: int, exact: bool) -> bool:
            body = len(blob) - off - 2 * w
            if body < 0 or body % w:
                return False
            return not exact or capacity - offsets[0] == body // w

        # the preamble carries no item type; writers top-align offsets so
        # capacity(k, m, numLevels) - offsets[0] == retained — use that
        # identity to tell a doubles body from a floats body, falling
        # back to byte alignment for blobs that rebased their offsets
        if dtype == "float64" and not _width_ok(8, exact=True) and _width_ok(4, exact=True):
            return cls.from_wire(blob, "float32")
        if not _width_ok(width, exact=False):
            if dtype == "float64" and _width_ok(4, exact=False):
                return cls.from_wire(blob, "float32")
            raise err
        body_bytes = len(blob) - off - 2 * width
        retained = body_bytes // width
        np_dt = _NP_DTYPES[dtype]
        sk.min_item = np_dt(struct.unpack_from(fmt, blob, off)[0])
        sk.max_item = np_dt(struct.unpack_from(fmt, blob, off + width)[0])
        items = np.frombuffer(blob, dtype=np_dt, count=retained, offset=off + 2 * width)
        base = offsets[0]
        bounds = [o - base for o in offsets] + [retained]
        if any(b < 0 or b > retained for b in bounds) or any(
            a > b for a, b in zip(bounds, bounds[1:])
        ):
            raise err
        sk.n = int(n)
        # a degraded java sketch reports its error via minK — adopt it as
        # our k so later merges keep the coarser-resolution contract
        sk.k = max(int(min_k), cls.K_MIN)
        sk.levels = [items[bounds[i] : bounds[i + 1]].copy() for i in range(num_levels)]
        sk.compacted = num_levels > 1 or sk.n > retained
        sk._sorted_cache = None
        return sk


class QuantilesSketch(CompactorSketch):
    """Classic quantiles sketch (reference src/generated.cpp:1695-3107)."""

    FAMILY = FAMILY_QUANTILES
    K_MIN, K_MAX = 1, 32768
    NAME = "Quantiles"

    def _capacity(self, level: int, num_levels: int) -> int:
        return 2 * self.k if level == 0 else self.k

    def normalized_rank_error(self, pmf: bool) -> float:
        # empirical constants from the Apache DataSketches classic
        # quantiles analysis (docs/README.md:259-261 table shape)
        return (1.854 if pmf else 1.576) / self.k**0.9657


class ReqSketch(CompactorSketch):
    """Relative-error quantiles, HRA mode (reference src/generated.cpp:4486-5673).

    Simplified from the REQ paper: constant level capacity 3k with the
    top k items of every level exempt from compaction, concentrating
    retained items (hence accuracy) at high ranks.
    """

    FAMILY = FAMILY_REQ
    K_MIN, K_MAX = 4, 1024  # codegen/generated.cpp.j2:70-74
    NAME = "REQ"

    @classmethod
    def validate_k(cls, k: int) -> None:
        super().validate_k(k)
        if k % 2 != 0:
            raise ValueError(f"Invalid k for REQ sketch: {k} (must be even)")

    def _capacity(self, level: int, num_levels: int) -> int:
        return 3 * self.k

    def _protect_high(self, level: int) -> int:
        return self.k
