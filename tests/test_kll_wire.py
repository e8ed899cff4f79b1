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


def test_int64_wire_roundtrip():
    """Round 8: integer-typed wire crossing (the reference's
    sketch_kll_bigint, codegen/generator.py:49-60).  The preamble has
    no item type, so the typed reader must be named on import."""
    for n in (0, 1, 3, 500, 20_000):
        sk = KllSketch(200, "int64")
        sk.update(np.arange(n, dtype=np.int64) * 7 - 3)
        rt = KllSketch.from_wire(sk.to_wire(), "int64")
        assert rt.n == sk.n and rt.dtype == "int64"
        if n:
            assert rt.get_min_item() == sk.get_min_item()
            assert rt.get_max_item() == sk.get_max_item()
            for q in (0.0, 0.25, 0.5, 0.99, 1.0):
                got = rt.get_quantile(q)
                assert got == sk.get_quantile(q)
                assert isinstance(got, (int, np.integer))


def test_int32_wire_import_widens():
    """A 4-byte-item integer blob (the reference's
    sketch_kll_integer) reads via dtype='int32' and widens losslessly
    to the engine's int64 representation.  Synthesized by re-widthing
    a float32 blob's layout: the width-4 parse paths are shared with
    the java-verified floats reader, only the numpy view differs."""
    src = KllSketch(160, "float32")
    vals = np.arange(-250, 250, dtype=np.float32)
    src.update(vals)
    f32 = src.to_wire()
    # same layout, items reinterpreted: float32 values here are exact
    # small integers, so byte-for-byte re-encoding as int32 is a valid
    # integer blob with the identical preamble/offsets
    off = 20 + 4 * 1  # full form, 1 level at this n? derive instead:
    import struct as _s
    pre_ints, ser_ver, _, flags, k, m, _ = _s.unpack_from("<BBBBHBB", f32, 0)
    assert ser_ver == 1 and pre_ints == 5
    (nlv,) = _s.unpack_from("<B", f32, 18)
    off = 20 + 4 * nlv
    body = np.frombuffer(f32, dtype=np.float32, offset=off)
    i32 = f32[:off] + body.astype(np.int32).tobytes()
    rt = KllSketch.from_wire(i32, "int32")
    assert rt.dtype == "int64" and rt.n == src.n
    assert rt.get_min_item() == -250 and rt.get_max_item() == 249
    assert rt.get_quantile(0.5) == int(src.get_quantile(0.5))


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


def test_live_jvm_longs_blob_parses_identically(jvm_kll):
    """datasketches-java 6.x ships KllLongsSketch — the 8-byte-integer
    wire layout the reference's sketch_kll_bigint uses.  Its blobs
    must parse via the int64 typed reader with identical answers."""
    jvm, _, _ = jvm_kll
    jsk = jvm.org.apache.datasketches.kll.KllLongsSketch.newHeapInstance(50)
    for v in range(10_000):
        jsk.update(v * 3 - 5)
    ours = KllSketch.from_wire(bytes(jsk.toByteArray()), "int64")
    assert ours.dtype == "int64"
    assert ours.n == jsk.getN()
    assert ours.num_retained == jsk.getNumRetained()
    assert ours.get_min_item() == jsk.getMinItem()
    assert ours.get_max_item() == jsk.getMaxItem()
    for v in (0, 100, 14_000, 29_990):
        assert ours.get_rank(v) == pytest.approx(jsk.getRank(v), abs=1.01 / ours.n)


def test_live_jvm_longs_reads_our_int64_blob(jvm_kll):
    """... and java must heapify OUR int64 export (estimation mode),
    plus byte-parity on the empty/single short forms."""
    jvm, _, _ = jvm_kll
    KllLongs = jvm.org.apache.datasketches.kll.KllLongsSketch

    def jheapify(blob):
        mem = jvm.org.apache.datasketches.memory.Memory.wrap(blob)
        return KllLongs.heapify(mem)

    sk = KllSketch(60, "int64")
    sk.update(np.arange(20_000, dtype=np.int64))
    assert sk.is_estimation_mode
    jsk = jheapify(sk.to_wire())
    assert jsk.getN() == sk.n
    assert jsk.getNumRetained() == sk.num_retained
    assert jsk.getMinItem() == sk.get_min_item()
    assert jsk.getMaxItem() == sk.get_max_item()
    for v in (17, 5_000, 19_999):
        assert jsk.getRank(v) == pytest.approx(sk.get_rank(v), abs=1.01 / sk.n)
    # short-form byte parity
    jempty = KllLongs.newHeapInstance(77)
    assert KllSketch(77, "int64").to_wire() == bytes(jempty.toByteArray())
    one = KllSketch(77, "int64")
    one.update(np.array([42], dtype=np.int64))
    jempty.update(42)
    assert one.to_wire() == bytes(jempty.toByteArray())


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
