"""Property-based round-trip fuzz for the Apache wire formats.

Every wire-capable family: random build → to_wire → from_wire must
reproduce the queryable state (estimates, ranks, counts), across edge
sizes (0, 1, 2 items), extreme magnitudes, and negative values.  The
JVM cross-checks live in the per-family test files; these run without
a JVM and hammer the parsers instead.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from datasketches_spark.sketches.base import SketchDeserializeError
from datasketches_spark.sketches.compactor import KllSketch
from datasketches_spark.sketches.compactor import QuantilesSketch, ReqSketch
from datasketches_spark.sketches.cpc import CpcSketch
from datasketches_spark.sketches.frequent_items import FrequentItemsSketch
from datasketches_spark.sketches.hll import HllSketch
from datasketches_spark.sketches.tdigest import TDigestSketch
from datasketches_spark.sketches.theta import ThetaSketch

_floats = st.lists(
    st.floats(
        min_value=-1e12, max_value=1e12, allow_nan=False, allow_infinity=False
    ),
    min_size=0,
    max_size=400,
)


@settings(max_examples=40, deadline=None)
@given(_floats)
def test_kll_wire_roundtrip_property(values):
    sk = KllSketch(60)
    if values:
        sk.update(np.asarray(values, dtype=np.float64))
    rt = KllSketch.from_wire(sk.to_wire())
    assert rt.n == sk.n
    assert rt.num_retained == sk.num_retained
    if values:
        for q in (0.0, 0.37, 1.0):
            assert rt.get_quantile(q) == sk.get_quantile(q)


@settings(max_examples=40, deadline=None)
@given(_floats)
def test_tdigest_wire_roundtrip_property(values):
    sk = TDigestSketch(50)
    if values:
        sk.update(np.asarray(values, dtype=np.float64))
    rt = TDigestSketch.from_wire(sk.to_wire())
    assert rt.total_weight() == sk.total_weight()
    if values:
        assert rt.min_item == sk.min_item and rt.max_item == sk.max_item
        for q in (0.1, 0.9):
            assert rt.get_quantile(q) == pytest.approx(sk.get_quantile(q))


_ints = st.lists(
    st.integers(min_value=-(2**62), max_value=2**62), min_size=0, max_size=400
)


@settings(max_examples=40, deadline=None)
@given(_ints, st.sampled_from(["kll", "quantiles", "req"]))
def test_int64_wire_roundtrip_property(values, fam):
    """Round 8: integer-typed wire (the reference's sketch_*_bigint).
    Random int64 builds must survive to_wire -> from_wire(dtype=int64)
    with identical n/retained/quantiles, across empty/single/negative/
    extreme-magnitude inputs."""
    cls = {"kll": KllSketch, "quantiles": QuantilesSketch, "req": ReqSketch}[fam]
    k = 12 if fam == "req" else 60
    sk = cls(k, "int64")
    if values:
        sk.update(np.asarray(values, dtype=np.int64))
    rt = cls.from_wire(sk.to_wire(), "int64")
    assert rt.n == sk.n and rt.dtype == "int64"
    assert rt.num_retained == sk.num_retained
    if values:
        for q in (0.0, 0.37, 1.0):
            got = rt.get_quantile(q)
            assert got == sk.get_quantile(q)
            assert isinstance(got, (int, np.integer))


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=500))
def test_theta_wire_roundtrip_property(values):
    sk = ThetaSketch(8)
    if values:
        sk.update_values(np.asarray(values, dtype=np.int64))
    rt = ThetaSketch.from_wire(sk.to_wire())
    assert rt.get_estimate() == sk.get_estimate()
    assert rt.theta == sk.theta
    assert np.array_equal(rt.hashes, sk.hashes)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=500))
def test_hll_wire_roundtrip_property(values):
    sk = HllSketch(8)  # sparse limit 128 — exercises LIST, SET and HLL_8
    if values:
        sk.update_values(np.asarray(values, dtype=np.int64))
    rt = HllSketch.from_wire(sk.to_wire())
    if sk.mode == 1:  # dense: registers must survive exactly
        assert np.array_equal(rt.registers, sk.registers)
        assert rt.get_estimate() == sk.get_estimate()
    elif rt.mode == 1:
        # sparse state ABOVE Apache's SET capacity (3/4 * 2^(lgK-3)
        # coupons): to_wire projects to the dense HLL_8 registers java
        # itself would hold (round-9 wire fix) — the round trip must be
        # exactly that projection, register for register.  The dense
        # harmonic estimate legally differs from the local coupon-exact
        # one here; structural equality is the stronger check.
        assert sk.sparse.size > ((1 << (sk.lg_k - 3)) * 3) // 4
        regs = np.zeros(1 << sk.lg_k, dtype=np.uint8)
        idx = (sk.sparse & np.uint64((1 << sk.lg_k) - 1)).astype(np.int64)
        np.maximum.at(regs, idx, sk.sparse_vals)
        assert np.array_equal(rt.registers, regs)
    else:
        # sparse → coupon forms: estimates agree up to slot+value
        # coupon collisions (none at these sizes in practice)
        assert rt.get_estimate() == pytest.approx(sk.get_estimate(), rel=0.02)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(st.text(min_size=1, max_size=12), st.integers(1, 1000)),
        max_size=120,
    )
)
def test_fi_wire_roundtrip_property(pairs):
    sk = FrequentItemsSketch(4)
    for item, w in pairs:
        sk.update_counts(np.array([item], dtype=object), np.array([w]))
    rt = FrequentItemsSketch.from_wire(sk.to_wire())
    assert rt.counts == sk.counts
    assert rt.offset == sk.offset
    assert rt.total_weight() == sk.total_weight()


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=600),
    st.integers(min_value=4, max_value=12),
)
def test_cpc_wire_roundtrip_property(values, lg_k):
    sk = CpcSketch(lg_k)
    if values:
        sk.update_values(np.array(values, dtype=np.int64))
    rt = CpcSketch.from_wire(sk.to_wire())
    assert rt.lg_k == lg_k
    assert np.array_equal(rt.bitmap, sk._to_bitmap())
    assert rt.num_coupons() == sk.num_coupons()


@settings(max_examples=30, deadline=None)
@given(_floats, st.sampled_from([16, 64, 128]))
def test_quantiles_wire_roundtrip_property(values, k):
    sk = QuantilesSketch(k)
    if values:
        sk.update(np.array(values))
    rt = QuantilesSketch.from_wire(sk.to_wire())
    assert rt.n == sk.n and rt.k == sk.k
    for a, b in zip(rt.levels, sk.levels):
        assert np.array_equal(np.sort(a), np.sort(b))


@settings(max_examples=30, deadline=None)
@given(_floats, st.sampled_from([4, 12, 64]))
def test_req_wire_roundtrip_property(values, k):
    sk = ReqSketch(k)
    if values:
        sk.update(np.array(values))
    rt = ReqSketch.from_wire(sk.to_wire(), "float64")
    assert rt.n == sk.n
    assert rt.num_retained == sk.num_retained
    if values:
        mid = float(np.median(values))
        assert rt.get_rank(mid) == sk.get_rank(mid)


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=64))
def test_garbage_never_parses_silently(blob):
    """Random bytes must raise the reference's deserialize error, never
    return a sketch (except the vanishingly-unlikely valid preamble —
    guarded by the per-family structural checks)."""
    for cls, name in (
        (KllSketch, "KLL"),
        (TDigestSketch, "TDigest"),
        (ThetaSketch, "Theta"),
        (HllSketch, "HLL"),
        (FrequentItemsSketch, "Frequent Items"),
        (CpcSketch, "CPC"),
        (QuantilesSketch, "Quantiles"),
        (ReqSketch, "REQ"),
    ):
        try:
            cls.from_wire(blob)
        except SketchDeserializeError:
            pass  # the expected outcome
        except Exception as exc:  # noqa: BLE001
            pytest.fail(f"{name} raised {type(exc).__name__} instead: {exc}")


# ---- hardening regressions (round-5 advice items) -------------------


def test_hll_saturated_registers_estimate_is_finite():
    """All registers at 63 (only reachable from a crafted wire blob)
    must yield a large finite estimate, not inf."""
    import math

    from datasketches_spark.sketches import hll as hll_mod

    sk = HllSketch(12)
    sk._promote()
    sk.registers[:] = 63
    est = sk.get_estimate()
    assert math.isfinite(est)
    assert est > 1e15  # astronomically large, as Apache reports
    assert math.isfinite(sk.get_bound(2, upper=True))
    del hll_mod


def test_theta_from_wire_rejects_invalid_hashes():
    """Zeros, duplicates, or hashes >= theta in a compact blob are a
    corruption signal: the reader fails loud (like every other family)
    instead of returning a quietly skewed estimate."""
    sk = ThetaSketch(12)
    sk.update_values(np.arange(1, 6, dtype=np.int64))
    blob = bytearray(sk.to_wire())
    # pre_longs==2 form: count at byte 8, hashes from byte 16
    assert blob[0] == 2
    hashes = np.frombuffer(bytes(blob[16:]), dtype=np.uint64).copy()
    for corrupt in (
        lambda h: h.__setitem__(0, 0),  # zero entry
        lambda h: h.__setitem__(2, h[1]),  # duplicate
        lambda h: h.__setitem__(4, np.uint64(2**63)),  # == theta => range
    ):
        bad_h = hashes.copy()
        corrupt(bad_h)
        bad = bytes(blob[:16]) + bad_h.tobytes()
        with pytest.raises(SketchDeserializeError, match="Theta"):
            ThetaSketch.from_wire(bad)
    # the uncorrupted blob still parses (sanity)
    assert ThetaSketch.from_wire(bytes(blob)).hashes.size == hashes.size


def test_fi_from_wire_purges_to_clamped_capacity():
    """A wire blob whose active-item count exceeds the (clamped)
    map capacity purges on import, keeping the offset consistent."""
    sk = FrequentItemsSketch(4)  # capacity 12
    for i in range(10):
        sk.counts[f"item{i}"] = i + 1
        sk.stream_weight += i + 1
    blob = bytearray(sk.to_wire())
    blob[3] = 3  # patch lg_max down => clamped capacity 6 < 10 active
    rt = FrequentItemsSketch.from_wire(bytes(blob))
    assert len(rt.counts) <= rt._capacity
    assert rt.offset > 0  # purge accrued error honestly
    # lower-bound semantics preserved: stored + offset >= true count
    for item, c in rt.counts.items():
        assert c + rt.offset >= sk.counts[item]


@settings(max_examples=120, deadline=None)
@given(
    st.sampled_from(["cpc", "quantiles", "req", "kll_items"]),
    st.integers(min_value=0, max_value=10_000),
    st.integers(min_value=0, max_value=2**31),
)
def test_bitflip_corruption_never_escapes(family, n, corrupt_seed):
    """Structured corruption: flip one byte of a VALID wire blob.
    The parser must either reject it with the reference's deserialize
    error or parse a (differently-valid) sketch — never leak an
    IndexError/OverflowError/MemoryError from numpy internals."""
    rng = np.random.default_rng(corrupt_seed)
    if family == "cpc":
        from datasketches_spark.sketches.cpc import CpcSketch as C

        sk = C(10)
        if n:
            sk.update_values(np.arange(n, dtype=np.int64))
        blob = bytearray(sk.to_wire())
        parse = C.from_wire
    elif family == "quantiles":
        from datasketches_spark.sketches.compactor import QuantilesSketch as C

        sk = C(16)
        if n:
            sk.update(rng.random(n))
        blob = bytearray(sk.to_wire())
        parse = C.from_wire
    elif family == "kll_items":
        from datasketches_spark.sketches import KllItemsSketch as C

        sk = C(16)
        if n:
            sk.update([f"s{int(v):06d}" for v in rng.integers(0, 1 << 20, n)])
        blob = bytearray(sk.to_wire())
        parse = C.from_wire
    else:
        from datasketches_spark.sketches.compactor import ReqSketch as C

        sk = C(12)
        if n:
            sk.update(rng.random(n))
        blob = bytearray(sk.to_wire())
        parse = C.from_wire
    pos = int(rng.integers(0, len(blob)))
    blob[pos] ^= int(rng.integers(1, 256))
    try:
        parse(bytes(blob))
    except SketchDeserializeError:
        pass  # expected rejection
    except Exception as exc:  # noqa: BLE001
        pytest.fail(f"{family} byte-flip at {pos} leaked {type(exc).__name__}: {exc}")


def test_reservoir_garbage_never_parses_silently():
    """Round 10: the reservoir wire parser joins the contract — random
    bytes raise the deserialize error, never leak numpy/struct
    internals."""
    from datasketches_spark.sketches.reservoir import ReservoirSampleSketch

    rng = np.random.default_rng(0xE5E)
    for size in (0, 1, 4, 8, 15, 16, 17, 64):
        for _ in range(20):
            blob = bytes(rng.integers(0, 256, size=size, dtype=np.uint8))
            try:
                ReservoirSampleSketch.from_wire(blob)
            except SketchDeserializeError:
                pass
            except Exception as exc:  # noqa: BLE001
                pytest.fail(
                    f"Reservoir from_wire({size}B) raised "
                    f"{type(exc).__name__}: {exc}"
                )


@settings(max_examples=150, deadline=None)
@given(
    st.sampled_from(
        ["theta", "kll", "quantiles", "req", "tdigest", "hll", "cpc",
         "frequent_items", "bloom", "reservoir", "cms", "stats", "ebpps",
         "aod", "fdt", "kll_items"]
    ),
    st.integers(min_value=0, max_value=2**31),
)
def test_dsks_frame_bitflip_never_escapes(family, seed):
    """Round 10: one flipped byte in a VALID DSKS frame (ALL 16
    families, including the beyond-reference ones the Apache-wire
    fuzz can't reach) must either raise the reference's deserialize
    error or parse as a differently-valid sketch — never leak
    IndexError/OverflowError/UnicodeDecodeError/MemoryError from
    parser internals."""
    import pandas as pd

    from datasketches_spark.families import (
        build_params,
        create_sketch,
        update_sketch,
    )
    from datasketches_spark.sketches import FAMILY_CLASSES, peek_family

    rng = np.random.default_rng(seed)
    n = int(rng.integers(0, 200))
    s = pd.Series(rng.integers(0, 1 << 30, size=n))
    if family == "aod":
        # tuple family builds from (key, values) pairs
        from datasketches_spark.sketches import AodSketch

        sk = AodSketch(8, 2)
        if n:
            sk.update_batch(s, rng.random((n, 2)))
    elif family == "fdt":
        from datasketches_spark.sketches import FdtSketch

        sk = FdtSketch(8)
        if n:
            sk.update_tuples([(str(v % 7), str(v)) for v in s])
    else:
        if family == "kll_items":
            s = s.astype(str)
        sk = create_sketch(family, build_params(family, None, s))
        if n:
            update_sketch(family, sk, s)
    blob = bytearray(sk.serialize())
    cls = type(sk)
    pos = int(rng.integers(0, len(blob)))
    orig = blob[pos]
    blob[pos] = (orig ^ int(rng.integers(1, 256))) & 0xFF
    try:
        cls.deserialize(bytes(blob))
    except SketchDeserializeError:
        pass
    except Exception as exc:  # noqa: BLE001
        pytest.fail(
            f"{family} byte-flip at {pos} leaked "
            f"{type(exc).__name__}: {exc}"
        )


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.text(min_size=0, max_size=24), min_size=0, max_size=300),
    st.integers(min_value=8, max_value=400),
)
def test_kll_items_roundtrip_property(values, k):
    """Arbitrary unicode item streams: DSKS frame AND Apache wire
    round trips preserve n/min/max and exact-mode quantiles."""
    from datasketches_spark.sketches import KllItemsSketch

    sk = KllItemsSketch(k)
    if values:
        sk.update(np.asarray(values, dtype=object))
    for rt in (
        KllItemsSketch.deserialize(sk.serialize()),
        KllItemsSketch.from_wire(sk.to_wire()),
    ):
        assert rt.n == sk.n
        assert rt.get_min_item() == sk.get_min_item()
        assert rt.get_max_item() == sk.get_max_item()
        if values and not sk.is_estimation_mode:
            for q in (0.0, 0.37, 1.0):
                assert rt.get_quantile(q) == sk.get_quantile(q)
