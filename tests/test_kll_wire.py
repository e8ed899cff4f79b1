"""Apache DataSketches KLL wire-format verification.

Ground truth layers, strongest first:

1. Golden blobs captured from datasketches-java 6.2.0 (bundled in
   Spark's jars; the reference's DuckDB extension builds on the C++
   port of the same code, /root/reference/vcpkg.json) — hex literals
   are ``KllDoublesSketch.toByteArray()`` outputs for the given inputs.
   Empty and single-item forms must match byte for byte; the full form
   is read back and queried exactly.
2. Live JVM cross-validation: fresh sketches built in the session's
   datasketches-java, parsed by us (and vice versa via heapify), with
   rank/CDF/min/max/n compared exactly — identical serialized state
   must answer identically.
"""

from __future__ import annotations

import numpy as np
import pytest

from datasketches_spark.sketches.base import SketchDeserializeError
from datasketches_spark.sketches.compactor import KllSketch


# ------------------------------------------------- golden blobs (java 6.2.0)

# KllDoublesSketch.newHeapInstance(200) with no updates
_GOLDEN_EMPTY = "02010f01c8000800"
# ... after update(1.5)
_GOLDEN_SINGLE = "02020f04c8000800000000000000f83f"
# ... after update(1.5), update(2.0) ... update(11.0)  (n=11, exact)
_GOLDEN_N11 = (
    "05010f00c80008000b00000000000000c8000100bd000000000000000000f83f"
    "0000000000002640000000000000264000000000000024400000000000002240"
    "00000000000020400000000000001c4000000000000018400000000000001440"
    "000000000000104000000000000008400000000000000040000000000000f83f"
)
_N11_VALUES = [1.5] + [float(i) for i in range(2, 12)]


def test_empty_byte_parity():
    assert KllSketch(200).to_wire().hex() == _GOLDEN_EMPTY


def test_single_byte_parity():
    sk = KllSketch(200)
    sk.update(np.array([1.5]))
    assert sk.to_wire().hex() == _GOLDEN_SINGLE


def test_reads_java_exact_blob():
    sk = KllSketch.from_wire(bytes.fromhex(_GOLDEN_N11))
    assert sk.n == 11 and sk.k == 200
    assert sk.get_min_item() == 1.5 and sk.get_max_item() == 11.0
    assert not sk.is_estimation_mode
    # exact mode: every query is exact over the recovered multiset
    assert sk.get_rank(5.0) == pytest.approx(5 / 11)
    assert sk.get_quantile(1.0) == 11.0
    assert sorted(np.concatenate(sk.levels).tolist()) == sorted(_N11_VALUES)
    # deserialize() sniffs wire blobs (no DSKS frame required)
    sk2 = KllSketch.deserialize(bytes.fromhex(_GOLDEN_N11))
    assert sk2.get_rank(5.0) == sk.get_rank(5.0)


def test_roundtrip_through_wire_exact():
    sk = KllSketch(200)
    sk.update(np.arange(100, dtype=np.float64))
    rt = KllSketch.from_wire(sk.to_wire())
    assert rt.n == sk.n and rt.k == sk.k
    for q in (0.0, 0.25, 0.5, 0.99, 1.0):
        assert rt.get_quantile(q) == sk.get_quantile(q)


def test_roundtrip_through_wire_estimation():
    sk = KllSketch(20)
    sk.update(np.arange(10_000, dtype=np.float64))
    assert sk.is_estimation_mode
    rt = KllSketch.from_wire(sk.to_wire())
    assert rt.n == sk.n
    assert rt.num_retained == sk.num_retained
    for v in (100.0, 2_500.0, 7_777.0):
        assert rt.get_rank(v) == sk.get_rank(v)


def test_engine_frame_still_reads():
    sk = KllSketch(160)
    sk.update(np.arange(50, dtype=np.float64))
    assert KllSketch.deserialize(sk.serialize()).get_rank(25.0) == sk.get_rank(25.0)


def test_int64_sketch_has_no_wire_form():
    sk = KllSketch(200, "int64")
    sk.update(np.arange(10))
    with pytest.raises(ValueError, match="int64"):
        sk.to_wire()


def test_corrupt_raises_reference_message():
    with pytest.raises(SketchDeserializeError, match="Failed to deserialize KLL"):
        KllSketch.from_wire(b"\xde\xad\xbe\xef\xde\xad\xbe\xef\x01")
    with pytest.raises(SketchDeserializeError, match="Failed to deserialize KLL"):
        KllSketch.deserialize(b"\x00\x01\x02")


# ------------------------------------------------ live JVM cross-validation


@pytest.fixture(scope="module")
def jvm_kll(spark):
    jvm = spark.sparkContext._jvm

    def build(values, k=200):
        sk = jvm.org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(k)
        for v in values:
            sk.update(float(v))
        return sk

    def heapify(blob: bytes):
        mem = jvm.org.apache.datasketches.memory.Memory.wrap(blob)
        return jvm.org.apache.datasketches.kll.KllDoublesSketch.heapify(mem)

    return jvm, build, heapify


def _ranks(jsk, values):
    return [jsk.getRank(float(v)) for v in values]


def test_live_jvm_blob_parses_identically(jvm_kll):
    """A fresh estimation-mode java sketch: parsing its bytes must
    reproduce the exact same answers (identical state ⇒ identical
    queries) — catches bundled-library drift beyond the goldens."""
    _, build, _ = jvm_kll
    jsk = build([float(i) for i in range(10_000)], k=50)
    ours = KllSketch.from_wire(bytes(jsk.toByteArray()))
    assert ours.n == jsk.getN()
    assert ours.num_retained == jsk.getNumRetained()
    assert ours.get_min_item() == jsk.getMinItem()
    assert ours.get_max_item() == jsk.getMaxItem()
    # ranks agree within 1/n: java's sorted view injects an unretained
    # minItem with weight 1 (docking the smallest heavy item to
    # compensate) so its quantile(0) == minItem — a presentation
    # guarantee, not serialized state, so ranks below the smallest
    # retained item legitimately differ by exactly 1/n
    for v in (200.0, 123.0, 4_999.5, 9_999.0):
        assert ours.get_rank(v) == pytest.approx(jsk.getRank(v), abs=1.01 / ours.n)


def test_live_jvm_reads_our_blob(jvm_kll):
    """datasketches-java must heapify a blob we wrote — including an
    estimation-mode one — and answer identically."""
    _, _, heapify = jvm_kll
    sk = KllSketch(60)
    sk.update(np.arange(20_000, dtype=np.float64))
    assert sk.is_estimation_mode
    jsk = heapify(sk.to_wire())
    assert jsk.getN() == sk.n
    assert jsk.getNumRetained() == sk.num_retained
    assert jsk.getMinItem() == sk.get_min_item()
    assert jsk.getMaxItem() == sk.get_max_item()
    # within 1/n of each other: java's sorted view injects unretained
    # min/max items with weight 1 (see test_live_jvm_blob_parses_identically)
    for v in (17.0, 5_000.0, 19_999.0):
        assert jsk.getRank(v) == pytest.approx(sk.get_rank(v), abs=1.01 / sk.n)


def test_live_jvm_empty_single_byte_parity(jvm_kll):
    _, build, _ = jvm_kll
    assert KllSketch(77).to_wire() == bytes(build([], k=77).toByteArray())
    ours = KllSketch(77)
    ours.update(np.array([42.25]))
    assert ours.to_wire() == bytes(build([42.25], k=77).toByteArray())


def test_live_jvm_cross_merge(jvm_kll):
    """Merge in both directions across the wire: totals and ranks must
    behave like one sketch over the union of the streams."""
    _, build, heapify = jvm_kll
    jsk = build([float(i) for i in range(5_000)], k=200)
    ours = KllSketch.from_wire(bytes(jsk.toByteArray()))
    local = KllSketch(200)
    local.update(np.arange(5_000, 10_000, dtype=np.float64))
    local.merge(ours)
    assert local.n == 10_000
    assert local.get_rank(5_000.0) == pytest.approx(0.5, abs=0.02)
    # and java merging OUR blob
    jmerged = build([float(i) for i in range(5_000)], k=200)
    half = KllSketch(200)
    half.update(np.arange(5_000, 10_000, dtype=np.float64))
    jmerged.merge(heapify(half.to_wire()))
    assert jmerged.getN() == 10_000
    assert jmerged.getRank(5_000.0) == pytest.approx(0.5, abs=0.02)


def test_live_jvm_floats_sketch_autodetected(jvm_kll):
    jvm, _, _ = jvm_kll
    jsk = jvm.org.apache.datasketches.kll.KllFloatsSketch.newHeapInstance(200)
    for i in range(500):
        jsk.update(float(i))
    ours = KllSketch.from_wire(bytes(jsk.toByteArray()))
    assert ours.dtype == "float32"
    assert ours.n == 500
    assert ours.get_rank(250.0) == pytest.approx(jsk.getRank(250.0))
    # and ours → java floats reader
    f32 = KllSketch(200, "float32")
    f32.update(np.arange(300, dtype=np.float32))
    mem = jvm.org.apache.datasketches.memory.Memory.wrap(f32.to_wire())
    back = jvm.org.apache.datasketches.kll.KllFloatsSketch.heapify(mem)
    assert back.getN() == 300
    assert back.getMaxItem() == 299.0


def test_from_wire_accepts_java_k_range_past_sql_cap():
    # Apache allows k up to 65535; our SQL bind cap is 32768 — wire
    # import must accept the full range (empty-form blob, k=40000)
    import struct

    blob = struct.pack("<BBBBHBB", 2, 1, 15, 1, 40000, 8, 0)
    sk = KllSketch.from_wire(blob)
    assert sk.k == 40000 and sk.n == 0
