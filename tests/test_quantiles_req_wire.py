"""Apache DataSketches classic-Quantiles + REQ wire verification.

With these two families (round 5) all EIGHT reference families cross
systems.  Classic quantiles was restructured onto the Apache/MRL state
(2k base buffer + exact-k levels, bitPattern = n // 2k), making the
wire layout a lossless projection: a java compact blob round-trips
through this engine byte-identically except the flags byte (we write
the datasketches-cpp flag set the reference emits; java also sets
READ_ONLY).  REQ's serialized state is a per-compactor buffer list —
structurally our level stack — so it crosses without restructuring.

Goldens: the reference's own test blobs
(test/sql/datasketch_quantiles.test:14-17, datasketch_req.test:14-17).
"""

from __future__ import annotations

import numpy as np
import pytest

from datasketches_spark.sketches.base import SketchDeserializeError
from datasketches_spark.sketches.compactor import QuantilesSketch, ReqSketch

# the reference's golden single-value blobs (float32 variants)
_Q_GOLDEN_ONE = "02030818100000000100000000000000" + "0000a040" * 3
_REQ_GOLDEN_ONE = "0201113810000101" + "0000a040"


# ------------------------------------------------------------- quantiles


def test_quantiles_reference_golden_byte_parity():
    sk = QuantilesSketch(16, "float32")
    sk.update(np.array([5.0], dtype=np.float32))
    assert sk.to_wire().hex() == _Q_GOLDEN_ONE


def test_quantiles_reads_reference_golden():
    sk = QuantilesSketch.from_wire(bytes.fromhex(_Q_GOLDEN_ONE))
    assert sk.dtype == "float32"
    assert sk.n == 1 and sk.k == 16
    assert sk.get_quantile(0.5) == 5.0
    # deserialize() sniffs wire blobs
    assert QuantilesSketch.deserialize(bytes.fromhex(_Q_GOLDEN_ONE)).n == 1


def test_quantiles_mrl_invariant():
    """levels[0] == n mod 2k; level j full iff bit j-1 of n // 2k."""
    rng = np.random.default_rng(1)
    for k, n in [(16, 31), (16, 32), (16, 1000), (128, 50_000)]:
        sk = QuantilesSketch(k)
        sk.update(rng.random(n))
        assert sk.levels[0].size == n % (2 * k)
        bp = n // (2 * k)
        for j in range(1, len(sk.levels)):
            assert sk.levels[j].size == (k if (bp >> (j - 1)) & 1 else 0)


def test_quantiles_wire_roundtrip_lossless():
    rng = np.random.default_rng(2)
    for k, n in [(16, 0), (16, 1), (16, 100), (128, 50_000)]:
        sk = QuantilesSketch(k)
        if n:
            sk.update(rng.random(n))
        rt = QuantilesSketch.from_wire(sk.to_wire())
        assert rt.n == sk.n and rt.k == sk.k
        for a, b in zip(rt.levels, sk.levels):
            assert np.array_equal(np.sort(a), np.sort(b))


def test_quantiles_merge_preserves_invariant_and_accuracy():
    rng = np.random.default_rng(3)
    a, b = QuantilesSketch(64), QuantilesSketch(64)
    da, db = rng.random(7000), rng.random(4000) + 0.3
    a.update(da)
    b.update(db)
    a.merge(b)
    n = 11_000
    assert a.n == n and a.levels[0].size == n % 128
    alldata = np.concatenate([da, db])
    assert a.get_quantile(0.5) == pytest.approx(np.quantile(alldata, 0.5), abs=0.05)


def test_quantiles_mixed_k_downsample():
    rng = np.random.default_rng(4)
    fine, coarse = QuantilesSketch(64), QuantilesSketch(16)
    df, dc = rng.random(5000), rng.random(3000)
    fine.update(df)
    coarse.update(dc)
    fine.merge(coarse)  # pow2 ratio: Apache-style stride zip
    assert fine.k == 16 and fine.n == 8000
    assert fine.get_quantile(0.5) == pytest.approx(0.5, abs=0.1)
    odd, oddc = QuantilesSketch(48), QuantilesSketch(20)
    odd.update(df)
    oddc.update(dc)
    odd.merge(oddc)  # non-pow2 ratio: exact O(n) weight expansion
    assert odd.k == 20 and odd.n == 8000
    assert odd.get_quantile(0.5) == pytest.approx(0.5, abs=0.1)


def test_quantiles_int64_wire_roundtrip():
    """Round 8: the reference's sketch_quantiles_bigint layout
    (codegen/generator.py:49-60) — 8-byte integer items, typed reader
    named on import."""
    for n in (0, 1, 700, 30_000):
        sk = QuantilesSketch(128, "int64")
        sk.update(np.arange(n, dtype=np.int64) * 11 - 99)
        rt = QuantilesSketch.from_wire(sk.to_wire(), "int64")
        assert rt.n == sk.n and rt.dtype == "int64"
        if n:
            assert rt.get_min_item() == sk.get_min_item()
            assert rt.get_max_item() == sk.get_max_item()
            for q in (0.0, 0.5, 0.9, 1.0):
                got = rt.get_quantile(q)
                assert got == sk.get_quantile(q)
                assert isinstance(got, (int, np.integer))


def test_req_int64_wire_roundtrip():
    """sketch_req_bigint: all four REQ wire forms cross at int64."""
    for n in (0, 1, 3, 40, 25_000):
        sk = ReqSketch(12, "int64")
        sk.update(np.arange(n, dtype=np.int64) - 7)
        rt = ReqSketch.from_wire(sk.to_wire(), "int64")
        assert rt.n == sk.n and rt.dtype == "int64"
        if n:
            assert rt.get_min_item() == sk.get_min_item()
            assert rt.get_max_item() == sk.get_max_item()
            for q in (0.0, 0.5, 0.95, 1.0):
                assert rt.get_quantile(q) == sk.get_quantile(q)


def test_quantiles_int32_wire_import_widens():
    """A 4-byte integer blob (sketch_quantiles_integer) reads via
    dtype='int32' and widens to int64; synthesized by re-widthing a
    float32 blob (the width-4 layout is java/float32-verified)."""
    import struct as _s

    src = QuantilesSketch(64, "float32")
    src.update(np.arange(-300, 300, dtype=np.float32))
    f32 = src.to_wire()
    pre_longs = _s.unpack_from("<B", f32, 0)[0]
    assert pre_longs == 2
    body = np.frombuffer(f32, dtype=np.float32, offset=16)
    i32 = f32[:16] + body.astype(np.int32).tobytes()
    rt = QuantilesSketch.from_wire(i32, "int32")
    assert rt.dtype == "int64" and rt.n == src.n
    assert rt.get_min_item() == -300 and rt.get_max_item() == 299


def test_quantiles_corrupt_raises():
    with pytest.raises(SketchDeserializeError, match="Failed to deserialize Quantiles"):
        QuantilesSketch.from_wire(b"\x00\x01\x02\x03\x04\x05\x06\x07")
    good = QuantilesSketch(16)
    good.update(np.arange(100.0))
    with pytest.raises(SketchDeserializeError, match="Failed to deserialize Quantiles"):
        QuantilesSketch.from_wire(good.to_wire()[:30])


def test_quantiles_from_wire_rejects_out_of_range_k():
    """A preamble k outside [K_MIN, K_MAX] is corruption — no valid
    writer emits it (java: pow2 <= 32768; this binder: 1..32768).  The
    old clamp-then-overwrite admitted k up to 65535 past validate_k."""
    good = QuantilesSketch(16)
    good.update(np.arange(100.0))
    blob = bytearray(good.to_wire())
    for bad_k in (0, 40000, 65535):
        b = blob.copy()
        b[4:6] = int(bad_k).to_bytes(2, "little")
        with pytest.raises(
            SketchDeserializeError, match="Failed to deserialize Quantiles"
        ):
            QuantilesSketch.from_wire(bytes(b))
    # every in-range k (including java's max, 32768) still parses
    assert QuantilesSketch.from_wire(bytes(blob)).k == 16


# ------------------------------------------------------------------- REQ


def test_req_reference_golden_byte_parity():
    sk = ReqSketch(16, "float32")
    sk.update(np.array([5.0], dtype=np.float32))
    assert sk.to_wire().hex() == _REQ_GOLDEN_ONE


def test_req_reads_reference_golden():
    sk = ReqSketch.from_wire(bytes.fromhex(_REQ_GOLDEN_ONE))
    assert sk.n == 1 and sk.k == 16 and sk.dtype == "float32"
    assert sk.get_quantile(0.9) == 5.0
    assert ReqSketch.deserialize(bytes.fromhex(_REQ_GOLDEN_ONE)).n == 1


def test_req_wire_roundtrip_all_formats():
    rng = np.random.default_rng(5)
    for k, n in [(12, 0), (12, 1), (12, 4), (12, 50), (12, 3000), (64, 20_000)]:
        sk = ReqSketch(k)
        if n:
            sk.update(rng.random(n) * 100)
        rt = ReqSketch.from_wire(sk.to_wire(), "float64")
        assert rt.n == sk.n and rt.k == sk.k
        assert rt.num_retained == sk.num_retained
        if n:
            assert rt.get_rank(50.0) == sk.get_rank(50.0)
            assert rt.get_quantile(0.95) == sk.get_quantile(0.95)


def _req_with_gap_level(dtype: str = "float64") -> ReqSketch:
    """A REQ sketch whose middle level is empty — the state a merge can
    produce (level 1 fully compacted away while level 2 holds items)."""
    np_dt = np.float32 if dtype == "float32" else np.float64
    sk = ReqSketch(12, dtype)
    lv0 = np.sort(np.arange(10, dtype=np_dt))
    lv2 = np.sort(np.arange(100, 120, dtype=np_dt))
    sk.levels = [lv0, np.empty(0, dtype=np_dt), lv2]
    sk.sections = [sk._new_section() for _ in range(3)]
    sk.n = int(lv0.size) + int(lv2.size) * 4
    sk.min_item = np_dt(0)
    sk.max_item = np_dt(119)
    sk.compacted = True
    sk._sorted_cache = None
    return sk


def test_req_gap_level_roundtrip():
    """An empty middle level round-trips: the export writes java's
    layout (every compactor, count=0 allowed) and the reader accepts
    it — a foreign blob with a gap level re-exports losslessly."""
    sk = _req_with_gap_level()
    rt = ReqSketch.from_wire(sk.to_wire(), "float64")
    assert rt.n == sk.n
    assert [lv.size for lv in rt.levels] == [10, 0, 20]
    assert np.array_equal(rt.levels[2], sk.levels[2])
    # and the re-export parses again (the round-5 bug: it did not)
    rt2 = ReqSketch.from_wire(rt.to_wire(), "float64")
    assert [lv.size for lv in rt2.levels] == [10, 0, 20]


def test_req_corrupt_raises():
    with pytest.raises(SketchDeserializeError, match="Failed to deserialize REQ"):
        ReqSketch.from_wire(b"\xff" * 16)
    good = ReqSketch(12)
    good.update(np.arange(1000.0))
    with pytest.raises(SketchDeserializeError, match="Failed to deserialize REQ"):
        ReqSketch.from_wire(good.to_wire()[:40])


# ------------------------------------------------ live JVM cross-checks


@pytest.fixture(scope="module")
def jvm_q(spark):
    jvm = spark.sparkContext._jvm

    def wrap(blob: bytes):
        return jvm.org.apache.datasketches.memory.Memory.wrap(bytearray(blob))

    return jvm, wrap


def test_live_jvm_reads_our_quantiles(jvm_q):
    """java heapifies our blobs and answers IDENTICAL quantiles —
    the state projection is lossless and the rank semantics agree."""
    jvm, wrap = jvm_q
    rng = np.random.default_rng(6)
    for k, n in [(16, 1), (16, 100), (128, 10_000)]:
        sk = QuantilesSketch(k)
        sk.update(rng.random(n) * 100)
        jsk = jvm.org.apache.datasketches.quantiles.DoublesSketch.heapify(
            wrap(sk.to_wire())
        )
        assert jsk.getN() == n
        for q in (0.1, 0.5, 0.9):
            assert jsk.getQuantile(q) == sk.get_quantile(q)


def test_live_jvm_quantiles_roundtrip_parity(jvm_q):
    """java compact blob -> from_wire -> to_wire is byte-identical
    except the flags byte (cpp vs java flag conventions); both the
    compact and updatable java forms parse."""
    jvm, wrap = jvm_q
    rng = np.random.default_rng(7)
    for k, n in [(16, 100), (128, 10_000)]:
        b = jvm.org.apache.datasketches.quantiles.DoublesSketch.builder()
        b.setK(k)
        jsk = b.build()
        for v in rng.random(n) * 50:
            jsk.update(float(v))
        jb = bytearray(jsk.toByteArray(True))
        rt = QuantilesSketch.from_wire(bytes(jb))
        ob = bytearray(rt.to_wire())
        jb[3] = ob[3] = 0
        assert bytes(jb) == bytes(ob)
        upd = QuantilesSketch.from_wire(bytes(jsk.toByteArray(False)))
        assert upd.n == n
        assert upd.get_quantile(0.5) == jsk.getQuantile(0.5)


def test_live_jvm_quantiles_merged_estimation_parity(jvm_q):
    """Estimation-mode MERGED state crosses losslessly: two java
    sketches (same-k and mixed-k) merged by java's DoublesUnion, the
    compact union blob imports, re-exports byte-identically (mod the
    flags byte), and every rank surface matches java's."""
    jvm, wrap = jvm_q
    rng = np.random.default_rng(9)

    def jsk(k, data):
        b = jvm.org.apache.datasketches.quantiles.DoublesSketch.builder()
        b.setK(k)
        s = b.build()
        for v in data:
            s.update(float(v))
        return s

    for ka, kb in [(64, 64), (128, 32)]:
        u = jvm.org.apache.datasketches.quantiles.DoublesUnion.builder().build()
        u.union(jsk(ka, rng.random(20_000) * 100))
        u.union(jsk(kb, rng.random(7_000) * 100 + 30))
        ju = u.getResult()
        assert ju.getN() == 27_000
        jb = bytearray(ju.toByteArray(True))
        rt = QuantilesSketch.from_wire(bytes(jb))
        assert rt.n == 27_000 and rt.k == ju.getK()
        for q in (0.01, 0.25, 0.5, 0.75, 0.99):
            assert rt.get_quantile(q) == ju.getQuantile(q)
        ob = bytearray(rt.to_wire())
        jb[3] = ob[3] = 0
        assert bytes(jb) == bytes(ob)


def test_live_jvm_quantiles_updatable_fuzz(jvm_q):
    """Bit-flip fuzz of the SLOTTED updatable DoublesSketch form
    (toByteArray(false)): every corruption either raises the
    deserialize error or yields a structurally sane sketch — never an
    unhandled exception.  (The updatable layout has garbage slots, so
    some flips land in dead bytes and parse identically — that is
    valid, not a miss.)"""
    jvm, wrap = jvm_q
    rng = np.random.default_rng(10)
    b = jvm.org.apache.datasketches.quantiles.DoublesSketch.builder()
    b.setK(32)
    s = b.build()
    for v in rng.random(5_000) * 10:
        s.update(float(v))
    blob = bytes(s.toByteArray(False))
    assert QuantilesSketch.from_wire(blob).n == 5_000
    for _ in range(300):
        pos = int(rng.integers(0, len(blob)))
        bit = 1 << int(rng.integers(0, 8))
        bad = bytearray(blob)
        bad[pos] ^= bit
        try:
            sk = QuantilesSketch.from_wire(bytes(bad))
        except SketchDeserializeError:
            continue
        # parsed: state must be internally consistent
        assert sk.k >= 1
        assert all(lv.size >= 0 for lv in sk.levels)
        assert sk.levels[0].size <= 2 * sk.k


def test_live_jvm_req_merged_estimation_parity(jvm_q):
    """Estimation-mode MERGED REQ state: java merges two sketches, the
    blob imports with identical rank surfaces, and the re-export is
    byte-identical to java's serialization of the same merged state."""
    jvm, wrap = jvm_q
    rng = np.random.default_rng(11)
    RB = jvm.org.apache.datasketches.req.ReqSketchBuilder()
    RB.setK(12)
    a = RB.build()
    for v in (rng.random(15_000) * 100).astype(np.float32):
        a.update(float(v))
    b2 = RB.build()
    for v in (rng.random(4_000) * 50).astype(np.float32):
        b2.update(float(v))
    a.merge(b2)
    jb = bytearray(a.toByteArray())
    rt = ReqSketch.from_wire(bytes(jb))
    assert rt.n == 19_000 and rt.k == 12 and rt.dtype == "float32"
    assert rt.num_retained == a.getNumRetained()
    for q in (0.05, 0.5, 0.95, 0.99):
        assert np.float32(rt.get_quantile(q)) == np.float32(a.getQuantile(q))
    ob = bytearray(rt.to_wire())
    jb[3] = ob[3] = 0
    assert bytes(jb) == bytes(ob)


def test_live_jvm_req_cross(jvm_q):
    jvm, wrap = jvm_q
    rng = np.random.default_rng(8)
    for k, n in [(12, 4), (12, 80), (12, 3000), (32, 20_000)]:
        data = (rng.random(n) * 100).astype(np.float32)
        sk = ReqSketch(k, "float32")
        sk.update(data)
        jsk = jvm.org.apache.datasketches.req.ReqSketch.heapify(wrap(sk.to_wire()))
        assert jsk.getN() == n
        for q in (0.5, 0.95):
            # py4j renders java floats through a lossy repr; compare as f32
            assert np.float32(jsk.getQuantile(q)) == np.float32(sk.get_quantile(q))
        RB = jvm.org.apache.datasketches.req.ReqSketchBuilder()
        RB.setK(k)
        j2 = RB.build()
        for v in data:
            j2.update(float(v))
        rt = ReqSketch.from_wire(bytes(j2.toByteArray()))
        assert rt.n == n and rt.dtype == "float32"
        assert np.float32(rt.get_quantile(0.5)) == np.float32(j2.getQuantile(0.5))
