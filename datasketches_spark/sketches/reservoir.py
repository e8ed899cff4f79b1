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

# Apache Family.VAROPT (datasketches-java Family enum: id 13, min
# preamble 1 long, max 4)
_VAROPT_WIRE_FAMILY_ID = 13
_VAROPT_WIRE_SERVER = 2
_VAROPT_WIRE_EMPTY_FLAG = 4
_VAROPT_WIRE_GADGET_FLAG = 128


class ReservoirSampleSketch:
    FAMILY = FAMILY_RESERVOIR
    NAME = "Reservoir Sample"
    K_MIN, K_MAX = 1, 1 << 22

    __slots__ = ("k", "n", "tags", "items", "weights", "weighted", "_rng")

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
        # reservoir (to_wire refuses; to_varopt_wire is the weighted
        # wire).  Weighted states retain per-item RAW weights plus ONE
        # extra (tag, item, weight) triple: the (k+1)-th smallest tag
        # is the PPSWOR threshold τ that makes bottom-k subset-sum
        # estimation possible (Cohen & Kaplan, "Summarizing data using
        # bottom-k sketches") — and bottom-(k+1) sets merge exactly, so
        # τ survives the two-phase plan.
        self.weights: np.ndarray | None = None
        self.weighted = False
        self._rng = np.random.default_rng()

    # -- building -------------------------------------------------------
    def _cap(self) -> int:
        """Retention cap: weighted states keep one extra triple so the
        (k+1)-th smallest tag (the estimation threshold) is mergeable."""
        return self.k + 1 if self.weighted else self.k

    def _keep_bottom(
        self,
        tags: np.ndarray,
        items: list[str],
        weights: np.ndarray | None,
    ) -> None:
        cap = self._cap()
        if tags.size > cap:
            idx = np.argpartition(tags, cap - 1)[:cap]
            # sort for deterministic serialized layout given the same tags
            idx = idx[np.argsort(tags[idx], kind="stable")]
        else:
            idx = np.argsort(tags, kind="stable")
        self.tags = tags[idx]
        self.items = [items[i] for i in idx]
        self.weights = None if weights is None else weights[idx]

    def update_series(self, s: pd.Series, weights: pd.Series | None = None) -> None:
        if weights is not None:
            first_weighted = not self.weighted
            self.weighted = True
            mask = s.notna() & weights.notna() & (weights > 0)
            s = s[mask]
            w = weights[mask].to_numpy(dtype=np.float64)
            if first_weighted and self.weights is None:
                # a uniform prefix joins the weighted state at w=1
                self.weights = np.ones(len(self.items), dtype=np.float64)
        else:
            s = s.dropna()
            w = np.ones(len(s)) if self.weighted else None
        if s.empty:
            return
        # Exp(w) keys: -ln(U)/w; numpy's exponential(scale) draws
        # scale * Exp(1), so scale = 1/w
        scale = 1.0 if w is None else 1.0 / w
        new_tags = self._rng.exponential(scale, size=len(s))
        self.n += len(s)
        # select survivors on tags alone, then canonicalize only the
        # <= cap incoming winners: stringifying every candidate row was
        # the dominant cost of the whole update
        cap = self._cap()
        n_old = self.tags.size
        tags = np.concatenate([self.tags, new_tags])
        if tags.size > cap:
            idx = np.argpartition(tags, cap - 1)[:cap]
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
        if self.weights is not None:
            self.weights = np.concatenate([self.weights, w])[idx]
        self.tags = tags[idx]

    def merge(self, other: "ReservoirSampleSketch") -> None:
        if other.k < self.k and other.n > other.k:
            # a smaller-k sketch in estimation mode cannot be widened;
            # degrade to the coarser resolution (mixed-K union, same
            # convention as the HLL family)
            self.k = other.k
        self.n += other.n
        was_weighted = (self.weighted, other.weighted)
        self.weighted = self.weighted or other.weighted
        if self.weighted:
            # per-side weights: a uniform side contributes w=1 items; a
            # LEGACY weighted side (pre-r11 blob, weights lost) poisons
            # the merged weights to None — queries that need them refuse
            sides = []
            for sk, w_flag in ((self, was_weighted[0]), (other, was_weighted[1])):
                if sk.weights is not None:
                    sides.append(sk.weights)
                elif not w_flag:
                    sides.append(np.ones(len(sk.items), dtype=np.float64))
                else:
                    sides = None
                    break
            weights = None if sides is None else np.concatenate(sides)
        else:
            weights = None
        self._keep_bottom(
            np.concatenate([self.tags, other.tags]),
            self.items + other.items,
            weights,
        )

    # -- queries --------------------------------------------------------
    @property
    def is_empty(self) -> bool:
        return self.n == 0

    @property
    def sample_size(self) -> int:
        """Items in the SAMPLE — excludes the internal (k+1)-th
        threshold triple a weighted estimation-mode state retains."""
        return min(self.k, len(self.items))

    @property
    def num_retained(self) -> int:
        return self.sample_size

    @property
    def is_exact(self) -> bool:
        """True iff the sample IS the full input multiset."""
        return self.n <= self.k

    @property
    def threshold_tag(self) -> float | None:
        """The (k+1)-th smallest A-ES tag (PPSWOR threshold τ), present
        only on weighted states that overflowed k since round 11."""
        return float(self.tags[self.k]) if len(self.items) > self.k else None

    def get_items(self) -> list[str]:
        return list(self.items[: self.sample_size])

    def get_sample_weights(self) -> np.ndarray:
        """Estimation (Horvitz–Thompson) weight per sampled item,
        parallel to :meth:`get_items` — each item's unbiased share of
        the total stream weight:

        - uniform exact: 1 each; uniform estimation: n / k each;
        - weighted exact: the raw weights (inclusion prob 1);
        - weighted estimation with threshold τ: w / (1 − e^{−wτ})
          (conditional inclusion prob of an Exp(w) tag beating τ);
        - imported VarOpt states carry ALREADY-adjusted weights and no
          τ — returned as stored (the sample-of-sample composition).
        """
        m = self.sample_size
        if not self.weighted:
            per = 1.0 if self.is_exact else self.n / m
            return np.full(m, per, dtype=np.float64)
        if self.weights is None:
            raise ValueError(
                "legacy weighted Reservoir blob carries no per-item "
                "weights (pre-r11 state) — rebuild the sketch to use "
                "weight estimation or VarOpt export"
            )
        w = self.weights[:m]
        tau = self.threshold_tag
        if tau is None:
            return w.copy()
        # -expm1(-w*tau) = 1 - exp(-w*tau), accurate for tiny w*tau
        return w / -np.expm1(-w * tau)

    def total_weight_estimate(self) -> float:
        """Unbiased estimate of the total stream weight (= n when
        uniform)."""
        if not self.weighted:
            return float(self.n)
        return float(self.get_sample_weights().sum())

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

    def to_wire(self, serde: str = "longs") -> bytes:
        """Serialize as an Apache reservoir blob.

        ``serde="longs"`` (default) emits a ``ReservoirLongsSketch``
        image — every retained item must be an int64-canonical string,
        anything else raises.  ``serde="strings"`` emits the generic
        ``ReservoirItemsSketch`` image with the ArrayOfStringsSerDe
        item framing (u32 length + UTF-8 per item; same preamble, no
        item restriction) — java reads it via
        ``ReservoirItemsSketch.heapify(mem, new ArrayOfStringsSerDe())``.
        The sample set, n and k cross exactly; the A-ES tags do not
        (java's reservoir carries no tags — they are re-synthesized on
        ingest, see :meth:`from_wire`).  Weighted samples are NOT
        representable: java's reservoir is uniform, so exporting a
        weighted sketch would silently misdeclare its distribution —
        refused (use :meth:`to_varopt_wire`).
        """
        if serde not in ("longs", "strings"):
            raise ValueError(f"unknown reservoir serde {serde!r}")
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
        if serde == "longs":
            try:
                enc = np.array(
                    [int(s) for s in self.items], dtype=np.int64
                ).tobytes()
            except (ValueError, OverflowError) as exc:
                raise ValueError(
                    "Apache reservoir longs wire requires every "
                    "retained item to be an int64 string (got a "
                    "non-integer item); use serde='strings'"
                ) from exc
        else:
            parts = []
            for s in self.items:
                b = s.encode("utf-8")
                parts.append(struct.pack("<I", len(b)) + b)
            enc = b"".join(parts)
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
            + enc
        )

    @classmethod
    def from_wire(
        cls, blob: bytes, serde: str | None = None
    ) -> "ReservoirSampleSketch":
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
            rest = blob[16:]
            if serde is None:
                # a ReservoirLongsSketch items region is exactly 8·m
                # bytes; anything else is the generic strings image
                serde = "longs" if len(rest) == 8 * m else "strings"
            if serde == "longs":
                if len(rest) < 8 * m:
                    raise ValueError("truncated items")
                vals = np.frombuffer(rest, dtype="<i8", count=m)
                items = [str(int(v)) for v in vals]
            elif serde == "strings":
                items = []
                p = 0
                for _ in range(m):
                    (ln,) = struct.unpack_from("<I", rest, p)
                    p += 4
                    if p + ln > len(rest):
                        raise ValueError("truncated items")
                    items.append(rest[p : p + ln].decode("utf-8"))
                    p += ln
            else:
                raise ValueError(f"unknown reservoir serde {serde!r}")
        except (struct.error, ValueError, UnicodeDecodeError) as exc:
            raise SketchDeserializeError(
                f"Failed to deserialize {cls.NAME} sketch"
            ) from exc
        sk.n = int(n)
        gaps = sk._rng.exponential(size=m) / (n - np.arange(m, dtype=np.float64))
        sk.tags = np.cumsum(gaps)
        perm = sk._rng.permutation(m)
        sk.items = [items[i] for i in perm]
        return sk

    # -- serialization --------------------------------------------------
    # DSKS payload flag byte: 0 = uniform; 1 = legacy weighted (pre-r11,
    # no per-item weights — read-only support); 2 = weighted with a
    # float64 weights array between the tags and the item lengths.
    def serialize(self) -> bytes:
        enc = [s.encode("utf-8") for s in self.items]
        lens = np.array([len(e) for e in enc], dtype=np.int32)
        if not self.weighted:
            flag = 0
        else:
            flag = 1 if self.weights is None else 2
        payload = (
            struct.pack("<IQIB", self.k, self.n, len(enc), flag)
            + self.tags.tobytes()
            + (self.weights.tobytes() if flag == 2 else b"")
            + lens.tobytes()
            + b"".join(enc)
        )
        return frame(self.FAMILY, payload)

    @classmethod
    def deserialize(cls, blob: bytes) -> "ReservoirSampleSketch":
        if not is_framed(blob):
            # Apache blob: implicit ingest, same sniff convention as
            # the theta/quantile families — family byte 11 is a
            # ReservoirLongsSketch, 13 a VarOptItemsSketch
            raw = bytes(blob)
            if len(raw) > 2 and raw[2] == _VAROPT_WIRE_FAMILY_ID:
                return cls.from_varopt_wire(raw)
            return cls.from_wire(raw)
        payload = unframe(blob, cls.FAMILY)
        try:
            k, n, cnt, flag = struct.unpack_from("<IQIB", payload, 0)
            if flag not in (0, 1, 2):
                raise ValueError("bad weighted flag")
            sk = cls(k)
            sk.n = n
            sk.weighted = flag != 0
            off = 17
            sk.tags = np.frombuffer(payload, dtype=np.float64, count=cnt, offset=off).copy()
            off += 8 * cnt
            if flag == 2:
                sk.weights = np.frombuffer(
                    payload, dtype=np.float64, count=cnt, offset=off
                ).copy()
                if sk.weights.size and not (sk.weights > 0).all():
                    raise ValueError("non-positive weight")
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

    # -- Apache VarOpt wire interop ---------------------------------------
    # VarOptItemsSketch serVer-2 layout, recovered from the live
    # datasketches-java 6.2.0 bundled in pyspark (sampling/PreambleUtil
    # insert* offsets; differentially tested in tests/test_varopt_wire.py):
    #   byte 0: (lgResizeFactor << 6) | preLongs   (pre 1 empty; 3 if
    #           the R region is empty; 4 otherwise)
    #   byte 1: serVer = 2;  byte 2: family id = 13 (VAROPT)
    #   byte 3: flags (4 = EMPTY, 128 = GADGET/marks present)
    #   bytes 4-7: k (LE u32)
    #   non-empty: n u64 @8, hCount u32 @16, rCount u32 @20,
    #              totalWtR f64 @24 (only when rCount > 0, preLongs=4);
    #   then hCount f64 weights, then (GADGET only) ceil(h/8) mark
    #   bytes, then the h+r items via the serde — raw LE int64s for
    #   ArrayOfLongsSerDe, (LE u32 length + UTF-8) per item for
    #   ArrayOfStringsSerDe.  java's heapify requires k >= 1 and every
    #   H weight > 0.
    def to_varopt_wire(self, serde: str = "longs") -> bytes:
        """Serialize as an Apache ``VarOptItemsSketch`` blob — the
        DataSketches ecosystem's weighted-sampling wire family (the
        uniform :meth:`to_wire` counterpart; reference pitch
        docs/README.md:9, sketch state that crosses systems).

        Region mapping (subset-sum estimates are preserved exactly):

        - uniform exact / weighted states: every sampled item goes to
          the H region carrying its Horvitz–Thompson estimation weight
          (:meth:`get_sample_weights`), R empty.  java accepts,
          estimates, and unions such all-H states (n > k with r = 0 is
          a valid heapify image, verified against the live jar).
        - uniform estimation mode: the k items ARE an equal-weight
          light region — exported as R with totalWtR = n, h = 0,
          exactly the state java's own VarOpt reaches on a unit-weight
          stream.

        ``serde``: ``"longs"`` (ArrayOfLongsSerDe; every item must be
        an int64-canonical string) or ``"strings"``
        (ArrayOfStringsSerDe; any items).  The Apache wire carries no
        serde marker — the reader must be told, same contract as the
        typed quantile families.
        """
        if serde not in ("longs", "strings"):
            raise ValueError(f"unknown VarOpt serde {serde!r}")
        if self.weighted and self.weights is None and not self.is_empty:
            raise ValueError(
                "legacy weighted Reservoir blob carries no per-item "
                "weights (pre-r11 state) and cannot be exported as a "
                "VarOptItemsSketch"
            )
        if self.is_empty:
            return struct.pack(
                "<BBBBI",
                0xC0 | 1,
                _VAROPT_WIRE_SERVER,
                _VAROPT_WIRE_FAMILY_ID,
                _VAROPT_WIRE_EMPTY_FLAG,
                self.k,
            )
        m = self.sample_size
        items = self.items[:m]
        if serde == "longs":
            try:
                enc = np.array([int(s) for s in items], dtype=np.int64).tobytes()
            except (ValueError, OverflowError) as exc:
                raise ValueError(
                    "VarOpt longs serde requires every retained item "
                    "to be an int64 string (got a non-integer item); "
                    "use serde='strings'"
                ) from exc
        else:
            parts = []
            for s in items:
                b = s.encode("utf-8")
                parts.append(struct.pack("<I", len(b)) + b)
            enc = b"".join(parts)
        if not self.weighted and not self.is_exact:
            # uniform estimation: k equal-weight items = a pure R region
            pre = struct.pack(
                "<BBBBI",
                0xC0 | 4,
                _VAROPT_WIRE_SERVER,
                _VAROPT_WIRE_FAMILY_ID,
                0,
                self.k,
            )
            pre += struct.pack("<QII", self.n, 0, m)
            pre += struct.pack("<d", float(self.n))
            return pre + enc
        hw = self.get_sample_weights()
        pre = struct.pack(
            "<BBBBI",
            0xC0 | 3,
            _VAROPT_WIRE_SERVER,
            _VAROPT_WIRE_FAMILY_ID,
            0,
            self.k,
        )
        pre += struct.pack("<QII", self.n, m, 0)
        return pre + hw.astype("<f8").tobytes() + enc

    @classmethod
    def from_varopt_wire(
        cls, blob: bytes, serde: str | None = None
    ) -> "ReservoirSampleSketch":
        """Ingest an Apache ``VarOptItemsSketch`` blob as a WEIGHTED
        reservoir state.

        H-region items keep their exact weights; each R-region item
        carries the implied weight τ = totalWtR / r.  A-ES tags are
        synthesized as fresh Exp(1)/w draws over those weights — the
        standard sample-of-sample composition: the imported summary is
        re-sampled as a weighted stream of its own (adjusted) weights,
        so later merges keep subset-sum estimates unbiased.  No
        threshold triple exists for imported states (the wire carries
        none), so re-export passes the stored weights through
        unchanged.

        ``serde``: ``"longs"``, ``"strings"``, or None to auto-detect
        (the items region is exactly 8·(h+r) bytes iff longs).
        """
        try:
            pre_rf, ser, fam, flags, k = struct.unpack_from("<BBBBI", blob, 0)
            pre = pre_rf & 0x3F
        except struct.error as exc:
            raise SketchDeserializeError(
                f"Failed to deserialize {cls.NAME} sketch"
            ) from exc
        if (
            fam != _VAROPT_WIRE_FAMILY_ID
            or ser != _VAROPT_WIRE_SERVER
            or pre not in (1, 3, 4)
        ):
            raise SketchDeserializeError(
                f"Failed to deserialize {cls.NAME} sketch"
            )
        try:
            sk = cls(k)
        except ValueError as exc:
            raise SketchDeserializeError(
                f"Failed to deserialize {cls.NAME} sketch: "
                f"k={k} outside supported [{cls.K_MIN}, {cls.K_MAX}]"
            ) from exc
        if flags & _VAROPT_WIRE_EMPTY_FLAG:
            return sk
        try:
            n, h, r = struct.unpack_from("<QII", blob, 8)
            if pre == 4:
                if r <= 0:
                    raise ValueError("preLongs=4 but empty R region")
                (wt_r,) = struct.unpack_from("<d", blob, 24)
                tau = wt_r / r
                if not (tau > 0) or not np.isfinite(tau):
                    raise ValueError("non-positive R weight")
            else:
                if r != 0:
                    raise ValueError("R items but preLongs != 4")
                tau = 0.0
            off = pre * 8
            hw = np.frombuffer(blob, dtype="<f8", count=h, offset=off)
            if hw.size and (not np.isfinite(hw).all() or not (hw > 0).all()):
                raise ValueError("non-positive H weight")
            off += 8 * h
            if flags & _VAROPT_WIRE_GADGET_FLAG:
                off += (h + 7) // 8  # union-gadget mark bytes: skip
            cnt = h + r
            rest = blob[off:]
            if serde is None:
                serde = "longs" if len(rest) == 8 * cnt else "strings"
            if serde == "longs":
                if len(rest) < 8 * cnt:
                    raise ValueError("truncated items")
                vals = np.frombuffer(rest, dtype="<i8", count=cnt)
                items = [str(int(v)) for v in vals]
            elif serde == "strings":
                items = []
                p = 0
                for _ in range(cnt):
                    (ln,) = struct.unpack_from("<I", rest, p)
                    p += 4
                    if p + ln > len(rest):
                        raise ValueError("truncated items")
                    items.append(rest[p : p + ln].decode("utf-8"))
                    p += ln
            else:
                raise SketchDeserializeError(
                    f"unknown VarOpt serde {serde!r}"
                )
        except (struct.error, ValueError, UnicodeDecodeError) as exc:
            raise SketchDeserializeError(
                f"Failed to deserialize {cls.NAME} sketch"
            ) from exc
        weights = np.concatenate(
            [hw.astype(np.float64), np.full(r, tau, dtype=np.float64)]
        )
        sk.n = int(n)
        sk.weighted = True
        tags = sk._rng.exponential(size=cnt) / weights
        order = np.argsort(tags, kind="stable")
        sk.tags = tags[order]
        sk.weights = weights[order]
        sk.items = [items[i] for i in order]
        return sk
