"""Apache DataSketches CPC wire-format verification.

The CPC wire format (serVer 1, family 16) is a lossless compressed
encoding of the coupon bit matrix — exactly our dense state — so the
round-5 codec (sketches/cpc_wire.py) crosses blobs both ways with
datasketches-java and, because the coupon mapping (murmur3 seed 9001,
row = low lgK bits of h1, col = NLZ(h2)) is identical, the crossed
sketches are MERGEABLE, not merely parseable.  Our exports are
byte-identical to java's MERGED (CpcUnion result) serialization for
every flavor; java's HIP (directly-updated) blobs import losslessly
with the HIP accumulators skipped, the same thing java itself does
when such a sketch enters a union.

Golden blobs below are datasketches-java 6.2.0 CpcUnion outputs.
"""

from __future__ import annotations

import numpy as np
import pytest

from datasketches_spark.sketches.base import SketchDeserializeError
from datasketches_spark.sketches.cpc import CpcSketch

# ------------------------------------------------- golden blobs (java 6.2.0)

# CpcUnion(11) results over update(0..n-1)
_GOLDEN_EMPTY = "0201100b0002cc93"
_GOLDEN_ONE = "0401100b000acc9301000000010000002e1f0000"
_GOLDEN_SPARSE20 = (
    "0401100b000acc9314000000070000005fe8e049c6da7a1325ac0e2bc858dc16"
    "026d883487d6482b3b010000"
)
# directly-updated CpcSketch(11) after update(0..5): SPARSE_HYBRID_HIP
_GOLDEN_HIP6 = (
    "0801100b000ecc9306000000030000000000000080f69f4082e6e09a30031840"
    "acd316adaa3f2e5804000000"
)


def _build(n, lg_k=11):
    sk = CpcSketch(lg_k)
    if n:
        sk.update_values(np.arange(n, dtype=np.int64))
    return sk


def test_empty_byte_parity():
    assert _build(0).to_wire().hex() == _GOLDEN_EMPTY


def test_single_coupon_byte_parity():
    assert _build(1).to_wire().hex() == _GOLDEN_ONE


def test_sparse_byte_parity():
    assert _build(20).to_wire().hex() == _GOLDEN_SPARSE20


def test_reads_java_hip_blob():
    """HIP-format import: same matrix, accumulators skipped."""
    sk = CpcSketch.from_wire(bytes.fromhex(_GOLDEN_HIP6))
    ref = _build(6)
    assert np.array_equal(sk.bitmap, ref._to_bitmap())
    assert sk.get_estimate() == pytest.approx(6.0, rel=0.01)


def test_wire_roundtrip_all_flavors():
    """to_wire → from_wire reproduces the exact coupon matrix for
    every flavor (SPARSE / HYBRID / PINNED / SLIDING at lgK=11)."""
    for n in [0, 5, 150, 900, 3000, 20000]:
        sk = _build(n)
        rt = CpcSketch.from_wire(sk.to_wire())
        assert rt.lg_k == sk.lg_k
        assert np.array_equal(rt.bitmap, sk._to_bitmap()), n
        if n:
            assert rt.get_estimate() == pytest.approx(
                max(n, 1), rel=4 * 0.7213 / np.sqrt(2048)
            )


def test_deserialize_sniffs_wire_blobs():
    sk = CpcSketch.deserialize(bytes.fromhex(_GOLDEN_SPARSE20))
    assert sk.num_coupons() == 20


def test_merge_wire_imported_with_native():
    """An imported wire sketch merges with natively-built sketches
    (same coupon space) — the union estimate covers both streams."""
    a = _build(4000)
    imported = CpcSketch.from_wire(a.to_wire())
    b = CpcSketch(11)
    b.update_values(np.arange(2000, 6000, dtype=np.int64))
    imported.merge(b)
    assert imported.get_estimate() == pytest.approx(6000, rel=0.1)


def test_mixed_k_wire_import_folds():
    big = CpcSketch.from_wire(_build(5000, lg_k=12).to_wire())
    small = CpcSketch(10)
    small.update_values(np.arange(100, dtype=np.int64))
    small.merge(big)  # big folds down to lgK=10
    assert small.lg_k == 10
    assert small.get_estimate() == pytest.approx(5000, rel=0.15)


def test_corrupt_raises_reference_message():
    with pytest.raises(SketchDeserializeError, match="Failed to deserialize CPC"):
        CpcSketch.from_wire(b"\xde\xad\xbe\xef\xde\xad\xbe\xef")
    # truncated stream
    good = _build(3000).to_wire()
    with pytest.raises(SketchDeserializeError, match="Failed to deserialize CPC"):
        CpcSketch.from_wire(good[: len(good) // 2])
    # wrong seed hash
    bad = bytearray(_build(20).to_wire())
    bad[6] ^= 0xFF
    with pytest.raises(SketchDeserializeError, match="seed hash"):
        CpcSketch.from_wire(bytes(bad))


# ------------------------------------------------ live JVM cross-validation


@pytest.fixture(scope="module")
def jvm_cpc(spark):
    jvm = spark.sparkContext._jvm

    def build(values, lg_k=11):
        sk = jvm.org.apache.datasketches.cpc.CpcSketch(lg_k)
        for v in values:
            sk.update(int(v))
        return sk

    def merged_blob(sk, lg_k=11):
        u = jvm.org.apache.datasketches.cpc.CpcUnion(lg_k)
        u.update(sk)
        return bytes(u.getResult().toByteArray())

    def heapify(blob: bytes):
        return jvm.org.apache.datasketches.cpc.CpcSketch.heapify(bytearray(blob))

    return jvm, build, merged_blob, heapify


def test_live_jvm_byte_parity_per_flavor(jvm_cpc):
    """Our to_wire equals java's merged serialization byte-for-byte in
    every flavor — the strongest possible format claim."""
    _, build, merged_blob, _ = jvm_cpc
    for n in [0, 7, 100, 900, 3000, 20000]:
        jsk = build(range(n))
        ours = _build(n)
        assert ours.to_wire() == merged_blob(jsk), f"n={n}"


def test_live_jvm_reads_our_blobs(jvm_cpc):
    _, _, _, heapify = jvm_cpc
    for n in [1, 500, 5000, 30000]:
        ours = _build(n)
        jsk = heapify(ours.to_wire())
        assert jsk.getEstimate() == pytest.approx(n, rel=0.1)


def test_live_jvm_cross_merge(jvm_cpc):
    """java unions OUR wire blob with its own sketch and gets the
    union cardinality — proof the coupon spaces are identical."""
    jvm, build, _, heapify = jvm_cpc
    ours = _build(5000)
    jsk = build(range(2500, 7500))
    u = jvm.org.apache.datasketches.cpc.CpcUnion(11)
    u.update(heapify(ours.to_wire()))
    u.update(jsk)
    assert u.getResult().getEstimate() == pytest.approx(7500, rel=0.05)


def test_live_jvm_we_read_all_flavors_hip(jvm_cpc):
    """Directly-updated java sketches (HIP formats) import losslessly."""
    _, build, _, _ = jvm_cpc
    for n in [3, 400, 1500, 20000]:
        jsk = build(range(n))
        ours = CpcSketch.from_wire(bytes(jsk.toByteArray()))
        ref = _build(n)
        assert np.array_equal(ours.bitmap, ref._to_bitmap()), f"n={n}"


def test_pinned_duplicate_row_pairs_roundtrip():
    """Regression (round 5): PINNED import must OR-accumulate pairs
    that share a ROW — `bitmap[rows] |= x` silently dropped all but
    one duplicate-row update, failing the coupon-count consistency
    check on real mid-density sketches.  Dense random streams at
    lgK=11 reliably produce multi-pair rows."""
    rng = np.random.default_rng(0)
    for trial in range(30):
        sk = CpcSketch(11)
        sk.update_values(rng.integers(0, 1 << 40, 6000))
        rt = CpcSketch.from_wire(sk.to_wire())
        assert np.array_equal(rt.bitmap, sk._to_bitmap()), trial
