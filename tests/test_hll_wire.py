"""Apache DataSketches HLL wire-format verification.

Round 4 reworked the Python HLL onto Apache's coupon scheme (murmur3
x64-128 seed 9001; slot = h1 low bits, value = min(NLZ(h2),62)+1), so
its DENSE REGISTERS ARE BYTE-IDENTICAL to datasketches-java's HLL_8
array for the same inputs — verified live below.  That makes wire
blobs not merely parseable but cross-system MERGEABLE.  Estimates in
estimation mode may differ between engines (each applies its own
estimator — ours Ertl's improved raw estimator, Apache HIP or
composite — to the same registers); the registers, and therefore every
downstream union, agree exactly.
"""

from __future__ import annotations

import numpy as np
import pytest

from datasketches_spark.sketches.base import SketchDeserializeError
from datasketches_spark.sketches.hll import HllSketch


# ------------------------------------------------- golden blobs (java 6.2.0)

# new HllSketch(12, TgtHllType.HLL_8) with no updates
_GOLDEN_EMPTY = "0201070c030c0008"
# ... after update(5): LIST mode, one coupon — the same coupon golden
# the reference pins in test/sql/datasketch_hll.test:17
_GOLDEN_ONE = "0201070c030801087b65e608"


def test_empty_byte_parity():
    assert HllSketch(12).to_wire().hex() == _GOLDEN_EMPTY


def test_single_coupon_byte_parity():
    sk = HllSketch(12)
    sk.update_values(np.array([5], dtype=np.int64))
    assert sk.to_wire().hex() == _GOLDEN_ONE


def test_reads_java_list_blob():
    sk = HllSketch.from_wire(bytes.fromhex(_GOLDEN_ONE))
    assert sk.get_estimate() == 1.0
    # deserialize() sniffs wire blobs (no DSKS frame required)
    assert HllSketch.deserialize(bytes.fromhex(_GOLDEN_ONE)).get_estimate() == 1.0


def test_sparse_wire_roundtrip_exact():
    sk = HllSketch(12)
    sk.update_values(np.arange(300, dtype=np.int64))
    rt = HllSketch.from_wire(sk.to_wire())
    assert rt.get_estimate() == 300.0  # unique-coupon counting stays exact
    assert rt.lg_config_k == 12


def test_dense_wire_roundtrip_identical_registers():
    sk = HllSketch(10)
    sk.update_values(np.arange(50_000, dtype=np.int64))
    rt = HllSketch.from_wire(sk.to_wire())
    assert np.array_equal(rt.registers, sk.registers)
    assert rt.get_estimate() == sk.get_estimate()


def test_corrupt_raises_reference_message():
    with pytest.raises(SketchDeserializeError, match="Failed to deserialize HLL"):
        HllSketch.from_wire(b"\xde\xad\xbe\xef\xde\xad\xbe\xef")
    with pytest.raises(SketchDeserializeError, match="Failed to deserialize HLL"):
        HllSketch.deserialize(b"\x00\x01\x02")


# ------------------------------------------------ live JVM cross-validation


@pytest.fixture(scope="module")
def jvm_hll(spark):
    jvm = spark.sparkContext._jvm
    HS = jvm.org.apache.datasketches.hll.HllSketch
    TT = jvm.org.apache.datasketches.hll.TgtHllType

    # memoized builds (r15 suite-runtime fix): each java update is one
    # py4j round trip, so a 100k build costs ~20 s — and the suite
    # built the SAME (n, lg_k, HLL_8) state repeatedly.  States are
    # deterministic given (n, lg_k, tgt); non-HLL_8 targets come from
    # java's own copyAs conversion of the cached HLL_8 build (the
    # converted image is produced entirely by java, so decode tests
    # still verify OUR reader against java's writer).
    _cache: dict = {}

    def build(n, lg_k=12, tgt="HLL_8"):
        key = (n, lg_k, tgt)
        if key not in _cache:
            if tgt != "HLL_8":
                _cache[key] = build(n, lg_k).copyAs(getattr(TT, tgt))
            else:
                sk = HS(lg_k, getattr(TT, tgt))
                for i in range(n):
                    sk.update(i)
                _cache[key] = sk
        return _cache[key]

    def heapify(blob: bytes):
        mem = jvm.org.apache.datasketches.memory.Memory.wrap(blob)
        return HS.heapify(mem)

    return jvm, build, heapify


def test_live_jvm_registers_byte_identical(jvm_hll):
    """The core wire contract: same inputs → byte-identical HLL_8
    register arrays.  Everything else (cross-merges, unions in either
    engine) follows from this."""
    _, build, _ = jvm_hll
    jsk = build(100_000)
    jregs = np.frombuffer(bytes(jsk.toCompactByteArray())[40:], dtype=np.uint8)
    ours = HllSketch(12)
    ours.update_values(np.arange(100_000, dtype=np.int64))
    assert np.array_equal(jregs, ours.registers)


def test_live_jvm_reads_all_our_forms(jvm_hll):
    _, _, heapify = jvm_hll
    small = HllSketch(12)
    small.update_values(np.arange(5, dtype=np.int64))
    assert heapify(small.to_wire()).getEstimate() == pytest.approx(5.0, abs=0.01)
    mid = HllSketch(12)
    mid.update_values(np.arange(300, dtype=np.int64))
    assert heapify(mid.to_wire()).getEstimate() == pytest.approx(300.0, rel=0.01)
    big = HllSketch(12)
    big.update_values(np.arange(60_000, dtype=np.int64))
    jbig = heapify(big.to_wire())
    assert jbig.getEstimate() == pytest.approx(60_000, rel=0.05)


def test_live_jvm_we_read_all_java_tgt_types(jvm_hll):
    """HLL_4 (nibbles+curMin+coupon aux), HLL_6 (6-bit packed) and
    HLL_8 must all decode to the SAME register array (HLL_8 is the
    uncompressed truth)."""
    _, build, _ = jvm_hll
    truth = np.frombuffer(
        bytes(build(100_000, tgt="HLL_8").toCompactByteArray())[40:], dtype=np.uint8
    )
    for tgt in ("HLL_4", "HLL_6", "HLL_8"):
        ours = HllSketch.from_wire(bytes(build(100_000, tgt=tgt).toCompactByteArray()))
        assert np.array_equal(ours.registers, truth), tgt


def test_live_jvm_cross_merge(jvm_hll):
    """Union half java / half ours in BOTH engines: results agree
    because the register mapping is identical."""
    jvm, build, heapify = jvm_hll
    jsk = build(50_000)
    ours = HllSketch(12)
    ours.update_values(np.arange(25_000, 75_000, dtype=np.int64))
    # java-side union
    u = jvm.org.apache.datasketches.hll.Union(12)
    u.update(jsk)
    u.update(heapify(ours.to_wire()))
    jm = np.frombuffer(
        bytes(u.getResult(jvm.org.apache.datasketches.hll.TgtHllType.HLL_8)
              .toCompactByteArray())[40:], dtype=np.uint8,
    )
    # our-side union
    merged = HllSketch.from_wire(bytes(jsk.toCompactByteArray()))
    merged.merge(ours)
    assert np.array_equal(jm, merged.registers)
    assert merged.get_estimate() == pytest.approx(75_000, rel=0.05)


def test_native_wire_sparse_merge_does_not_double_count():
    """Regression: native sparse keys are 64-bit h1, wire-imported
    sparse keys are coupons — merging must unify the key space (both
    to coupons), not dedupe across spaces and double-count."""
    a = HllSketch(12)
    a.update_values(np.arange(100, dtype=np.int64))
    b = HllSketch.from_wire(a.to_wire())
    a.merge(b)
    assert a.get_estimate() == 100.0
    # reverse direction: coupon-keyed absorbing native
    c = HllSketch.from_wire(b.to_wire())
    native = HllSketch(12)
    native.update_values(np.arange(100, dtype=np.int64))
    c.merge(native)
    assert c.get_estimate() == 100.0
    # coupon-keyed state survives the engine frame
    rt = HllSketch.deserialize(c.serialize())
    assert rt.sparse_is_coupons and rt.get_estimate() == 100.0


def test_malformed_preamble_rejected():
    import struct

    # pre_ints contradicting the mode
    with pytest.raises(SketchDeserializeError):
        HllSketch.from_wire(struct.pack("<BBBBBBBB", 99, 1, 7, 12, 3, 8, 0, 8))
    # negative auxCount in an HLL_4 blob
    m = 4096
    bad = (
        struct.pack("<BBBBBBBB", 10, 1, 7, 12, 5, 8, 2, 2)
        + b"\x00" * 24
        + struct.pack("<ii", 0, -1)
        + b"\x00" * (m // 2)
        + b"\x00\x01\x02\x03"
    )
    with pytest.raises(SketchDeserializeError):
        HllSketch.from_wire(bad)


def test_live_jvm_updatable_blobs_rejected_not_misparsed(jvm_hll):
    """java's toUpdatableByteArray SET/HLL_4 layouts interleave zero
    gaps / padded aux tables; a compact-shaped read would silently
    corrupt, so they must raise instead."""
    jvm, build, _ = jvm_hll
    HS = jvm.org.apache.datasketches.hll.HllSketch
    TT = jvm.org.apache.datasketches.hll.TgtHllType
    jset = HS(12, TT.HLL_8)
    for i in range(300):
        jset.update(i)
    with pytest.raises(SketchDeserializeError):
        HllSketch.from_wire(bytes(jset.toUpdatableByteArray()))
    j4 = build(100_000, tgt="HLL_4")
    with pytest.raises(SketchDeserializeError):
        HllSketch.from_wire(bytes(j4.toUpdatableByteArray()))
    # ...while HLL_8 updatable == compact layout and stays readable
    j8 = build(100_000)
    ours = HllSketch.from_wire(bytes(j8.toUpdatableByteArray()))
    truth = np.frombuffer(bytes(j8.toCompactByteArray())[40:], dtype=np.uint8)
    assert np.array_equal(ours.registers, truth)
