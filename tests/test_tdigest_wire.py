"""Apache DataSketches t-digest wire-format verification.

Golden blobs captured from datasketches-java 6.2.0
(``TDigestDouble.toByteArray()``), plus live JVM cross-validation in
both directions.  Any valid centroid set is a valid t-digest — engines
differ in scale function (compaction policy), not format — so full-form
checks compare totals/min/max exactly and ranks/quantiles within
t-digest accuracy.
"""

from __future__ import annotations

import numpy as np
import pytest

from datasketches_spark.sketches.base import SketchDeserializeError
from datasketches_spark.sketches.tdigest import TDigestSketch


# ------------------------------------------------- golden blobs (java 6.2.0)

# new TDigestDouble(100) with no updates
_GOLDEN_EMPTY = "0101146400010000"
# ... after update(1.5)
_GOLDEN_SINGLE = "0101146400060000000000000000f83f"
# ... after update(1.5), update(2.0) ... update(11.0): n=11, all
# singleton centroids (mean f64, weight u64 = 1) between min/max
_GOLDEN_N11_HEAD = "02011464000000000b00000000000000000000000000f83f0000000000002640"


def test_empty_byte_parity():
    assert TDigestSketch(100).to_wire().hex() == _GOLDEN_EMPTY


def test_single_byte_parity():
    sk = TDigestSketch(100)
    sk.update(np.array([1.5]))
    assert sk.to_wire().hex() == _GOLDEN_SINGLE


def test_full_form_layout_matches_java():
    sk = TDigestSketch(100)
    sk.update(np.array([1.5] + [float(i) for i in range(2, 12)]))
    blob = sk.to_wire()
    # same preamble + count + min/max as java's n=11 blob; centroid
    # order/means identical for singleton centroids
    assert blob[:32].hex() == _GOLDEN_N11_HEAD
    assert len(blob) == 32 + 16 * 11


def test_reads_java_single_and_empty():
    assert TDigestSketch.from_wire(bytes.fromhex(_GOLDEN_EMPTY)).is_empty
    sk = TDigestSketch.from_wire(bytes.fromhex(_GOLDEN_SINGLE))
    assert sk.total_weight() == 1
    assert sk.get_quantile(0.5) == 1.5
    # deserialize() sniffs wire blobs (no DSKS frame required)
    assert TDigestSketch.deserialize(bytes.fromhex(_GOLDEN_SINGLE)).total_weight() == 1


def test_roundtrip_through_wire():
    sk = TDigestSketch(100)
    sk.update(np.arange(50_000, dtype=np.float64))
    rt = TDigestSketch.from_wire(sk.to_wire())
    assert rt.total_weight() == sk.total_weight()
    assert rt.min_item == sk.min_item and rt.max_item == sk.max_item
    assert rt.means.size == sk.means.size
    for q in (0.01, 0.5, 0.99):
        assert rt.get_quantile(q) == pytest.approx(sk.get_quantile(q))


def test_corrupt_raises_reference_message():
    with pytest.raises(SketchDeserializeError, match="Failed to deserialize TDigest"):
        TDigestSketch.from_wire(b"\xde\xad\xbe\xef\xde\xad\xbe\xef")
    with pytest.raises(SketchDeserializeError, match="Failed to deserialize TDigest"):
        TDigestSketch.deserialize(b"\x00\x01\x02")


# ------------------------------------------------ live JVM cross-validation


@pytest.fixture(scope="module")
def jvm_td(spark):
    jvm = spark.sparkContext._jvm

    def build(values, k=100):
        td = jvm.org.apache.datasketches.tdigest.TDigestDouble(k)
        for v in values:
            td.update(float(v))
        return td

    def heapify(blob: bytes):
        mem = jvm.org.apache.datasketches.memory.Memory.wrap(blob)
        return jvm.org.apache.datasketches.tdigest.TDigestDouble.heapify(mem)

    return jvm, build, heapify


def test_live_jvm_blob_parses(jvm_td):
    _, build, _ = jvm_td
    jtd = build([float(i) for i in range(10_000)])
    ours = TDigestSketch.from_wire(bytes(jtd.toByteArray()))
    assert ours.total_weight() == jtd.getTotalWeight() == 10_000
    assert ours.min_item == jtd.getMinValue()
    assert ours.max_item == jtd.getMaxValue()
    for v in (100.0, 5_000.0, 9_900.0):
        assert ours.get_rank(v) == pytest.approx(jtd.getRank(v), abs=0.01)


def test_live_jvm_reads_our_blob(jvm_td):
    _, _, heapify = jvm_td
    sk = TDigestSketch(100)
    sk.update(np.arange(10_000, dtype=np.float64))
    jtd = heapify(sk.to_wire())
    assert jtd.getTotalWeight() == 10_000
    assert jtd.getMinValue() == 0.0 and jtd.getMaxValue() == 9_999.0
    for v in (100.0, 5_000.0, 9_900.0):
        assert jtd.getRank(v) == pytest.approx(sk.get_rank(v), abs=0.01)


def test_live_jvm_empty_single_byte_parity(jvm_td):
    _, build, _ = jvm_td
    assert TDigestSketch(200).to_wire() == bytes(build([], k=200).toByteArray())
    ours = TDigestSketch(200)
    ours.update(np.array([42.25]))
    assert ours.to_wire() == bytes(build([42.25], k=200).toByteArray())


def test_live_jvm_cross_merge(jvm_td):
    """java merging OUR blob: totals add, quantiles track the union."""
    _, build, heapify = jvm_td
    jtd = build([float(i) for i in range(5_000)])
    half = TDigestSketch(100)
    half.update(np.arange(5_000, 10_000, dtype=np.float64))
    jtd.merge(heapify(half.to_wire()))
    assert jtd.getTotalWeight() == 10_000
    assert jtd.getRank(5_000.0) == pytest.approx(0.5, abs=0.02)
    assert jtd.getQuantile(0.5) == pytest.approx(5_000.0, rel=0.05)
