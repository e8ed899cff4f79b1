"""ArrayOfDoubles tuple sketch: core behavior, DSKS framing, and
Apache wire interop differential vs LIVE datasketches-java
(org.apache.datasketches.tuple.arrayofdoubles.* in the bundled jar).

The tuple family rides the theta hash space, so EXACT-mode states are
fully deterministic: java-built and python-built sketches over the
same keys retain the SAME hash set and the SAME summed summaries, and
cross-heapified states answer identically.  Estimation-mode states
differ only in the retention policy (our bottom-k KMV vs java's
quick-select rebuild), so cross-reads assert state equality (same
blob -> same answers), not estimator identity.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pytest

from datasketches_spark.sketches.base import SketchDeserializeError
from datasketches_spark.sketches.tuple_aod import (
    AodSketch,
    aod_a_not_b,
    aod_intersect,
    aod_union,
)

BIG = 1 << 32  # py4j sends ints >= 2^31 as java Long (update(long, ...) overload)


@pytest.fixture(scope="module")
def jvm(spark):
    return spark.sparkContext._jvm


def _mem(jvm, blob: bytes):
    return jvm.org.apache.datasketches.memory.Memory.wrap(blob)


def _builder(jvm, lg_k: int, num_values: int):
    b = jvm.org.apache.datasketches.tuple.arrayofdoubles.ArrayOfDoublesUpdatableSketchBuilder()
    return b.setNominalEntries(1 << lg_k).setNumberOfValues(num_values).build()


def _jarr(spark, vals):
    gw = spark.sparkContext._gateway
    arr = gw.new_array(gw.jvm.double, len(vals))
    for i, v in enumerate(vals):
        arr[i] = float(v)
    return arr


def _heapify(jvm, blob: bytes):
    return jvm.org.apache.datasketches.tuple.arrayofdoubles.ArrayOfDoublesSketches.heapifySketch(
        _mem(jvm, blob)
    )


def _jsums(jsk, num_values: int) -> list[float]:
    out = [0.0] * num_values
    for row in jsk.getValues():
        for j in range(num_values):
            out[j] += row[j]
    return out


# ------------------------------------------------------------- core


def test_exact_mode_sums_and_estimate():
    sk = AodSketch(12, 2)
    sk.update_batch(
        pd.Series([1, 2, 3, 2, 1, None, 4]),
        np.array([[1.0, 10], [2, 20], [3, 30], [4, 40], [5, 50], [6, 60], [7, 70]]),
    )
    assert sk.get_estimate() == 4.0 and sk.num_retained == 4
    assert sk.column_sums() == [22.0, 220.0]
    assert sk.column_sums_retained() == [22.0, 220.0]
    assert sk.column_means() == [5.5, 55.0]
    assert not sk.is_estimation_mode and not sk.is_empty


def test_empty_and_null_only():
    sk = AodSketch(12, 1)
    assert sk.is_empty and sk.get_estimate() == 0.0
    sk.update_batch(pd.Series([None, None]), np.ones((2, 1)))
    assert sk.is_empty
    sk.update_batch(pd.Series(["", ""]), np.ones((2, 1)))  # Apache skips empties
    assert sk.is_empty


def test_merge_equals_one_shot_build():
    keys = pd.Series(np.arange(100_000, dtype=np.int64))
    vals = np.arange(100_000, dtype=np.float64).reshape(-1, 1)
    a, b, one = AodSketch(10, 1), AodSketch(10, 1), AodSketch(10, 1)
    a.update_batch(keys[:60_000], vals[:60_000])
    b.update_batch(keys[60_000:], vals[60_000:])
    one.update_batch(keys, vals)
    u = aod_union(a, b)
    one._consolidate()
    assert u.theta == one.theta
    assert np.array_equal(u.keys, one.keys)
    assert np.array_equal(u.values, one.values)
    est = u.get_estimate()
    assert abs(est - 100_000) / 100_000 < 4 / np.sqrt(1 << 10)


def test_duplicate_keys_sum_across_merge():
    a, b = AodSketch(12, 1), AodSketch(12, 1)
    a.update_batch(pd.Series([1, 2]), np.array([[10.0], [20.0]]))
    b.update_batch(pd.Series([2, 3]), np.array([[5.0], [7.0]]))
    u = aod_union(a, b)
    assert u.get_estimate() == 3.0
    assert u.column_sums() == [42.0]


def test_set_ops_exact():
    x, y = AodSketch(12, 1), AodSketch(12, 1)
    x.update_batch(pd.Series([1, 2, 3, 4]), np.array([[1.0], [2], [3], [4]]))
    y.update_batch(pd.Series([3, 4, 5]), np.array([[30.0], [40], [50]]))
    inter = aod_intersect(x, y)
    assert inter.get_estimate() == 2.0
    assert inter.column_sums() == [77.0]  # (3+30) + (4+40)
    diff = aod_a_not_b(x, y)
    assert diff.get_estimate() == 2.0
    assert diff.column_sums() == [3.0]  # keys 1,2 keep A's values


def test_validation():
    with pytest.raises(ValueError):
        AodSketch(3, 1)
    with pytest.raises(ValueError):
        AodSketch(12, 0)
    a, b = AodSketch(12, 1), AodSketch(12, 2)
    a.update_batch(pd.Series([1]), np.ones((1, 1)))
    b.update_batch(pd.Series([2]), np.ones((1, 2)))
    with pytest.raises(ValueError):
        a.merge(b)
    # but a FRESH accumulator adopts the first input's width (the
    # generic blob-merge path can't know num_values up front)
    fresh = AodSketch(12, 1)
    fresh.merge(b)
    assert fresh.num_values == 2 and fresh.get_estimate() == 1.0


def test_dsks_roundtrip_and_corrupt():
    sk = AodSketch(8, 3)
    keys = pd.Series(np.arange(5000, dtype=np.int64))
    sk.update_batch(keys, np.tile(np.array([1.0, 2.0, 3.0]), (5000, 1)))
    blob = sk.serialize()
    rt = AodSketch.deserialize(blob)
    assert rt.theta == sk.theta and rt.num_values == 3
    assert np.array_equal(rt.keys, sk.keys) and np.array_equal(rt.values, sk.values)
    with pytest.raises(SketchDeserializeError):
        AodSketch.deserialize(blob[:20])
    # flip a retained-count byte -> loud failure, never a skewed estimate
    bad = bytearray(blob)
    bad[6 + 11] ^= 0xFF
    with pytest.raises(SketchDeserializeError):
        AodSketch.deserialize(bytes(bad))


# ------------------------------------------------- wire, self-consistency


def test_wire_self_roundtrip_exact_and_estimation():
    for lg_k, n in ((12, 1000), (6, 50_000)):
        sk = AodSketch(lg_k, 2)
        sk.update_batch(
            pd.Series(np.arange(n, dtype=np.int64)),
            np.column_stack([np.ones(n), np.arange(n, dtype=np.float64)]),
        )
        rt = AodSketch.from_wire(sk.to_wire(), lg_k=lg_k)
        assert rt.theta == sk.theta
        assert np.array_equal(rt.keys, sk.keys)
        assert np.array_equal(rt.values, sk.values)


def test_wire_empty_roundtrip():
    sk = AodSketch(12, 4)
    w = sk.to_wire()
    assert len(w) == 16
    rt = AodSketch.from_wire(w)
    assert rt.is_empty and rt.num_values == 4


# ------------------------------------------------- differential vs java


def test_java_reads_our_exact_wire(spark, jvm):
    sk = AodSketch(12, 2)
    keys = pd.Series([BIG + i for i in range(500)])
    vals = np.column_stack(
        [np.full(500, 2.0), np.arange(500, dtype=np.float64)]
    )
    sk.update_batch(keys, vals)
    jsk = _heapify(jvm, sk.to_wire())
    assert jsk.getEstimate() == 500.0
    assert jsk.getRetainedEntries() == 500
    assert not jsk.isEstimationMode()
    assert _jsums(jsk, 2) == sk.column_sums_retained()


def test_we_read_java_exact_wire(spark, jvm):
    jsk = _builder(jvm, 12, 2)
    expect0 = expect1 = 0.0
    for i in range(300):
        jsk.update(BIG + i, _jarr(spark, [1.5, float(i)]))
        expect0 += 1.5
        expect1 += float(i)
    # repeated key: java SUMS summaries element-wise
    jsk.update(BIG, _jarr(spark, [1.5, 100.0]))
    expect0 += 1.5
    expect1 += 100.0
    blob = bytes(jsk.compact().toByteArray())
    sk = AodSketch.from_wire(blob)
    assert sk.get_estimate() == 300.0 and sk.num_retained == 300
    assert sk.column_sums() == pytest.approx([expect0, expect1])


def test_hash_parity_long_and_string_keys(spark, jvm):
    """java-built and python-built EXACT states retain identical hash
    sets — the murmur/key-canonicalization parity that makes wire
    blobs genuinely mergeable across systems."""
    jsk = _builder(jvm, 12, 1)
    ours = AodSketch(12, 1)
    longs = [BIG + 7 * i for i in range(100)]
    strs = [f"user-{i}" for i in range(100)]
    for v in longs:
        jsk.update(v, _jarr(spark, [1.0]))
    for s in strs:
        jsk.update(s, _jarr(spark, [1.0]))
    ours.update_batch(pd.Series(longs, dtype=np.int64), np.ones((100, 1)))
    ours.update_batch(pd.Series(strs), np.ones((100, 1)))
    theirs = AodSketch.from_wire(bytes(jsk.compact().toByteArray()))
    ours._consolidate()
    assert np.array_equal(ours.keys, theirs.keys)
    assert np.array_equal(ours.values, theirs.values)


def test_java_reads_our_estimation_wire_state_exact(spark, jvm):
    n = 200_000
    sk = AodSketch(8, 1)
    sk.update_batch(
        pd.Series(np.arange(n, dtype=np.int64)), np.ones((n, 1), dtype=np.float64)
    )
    assert sk.is_estimation_mode
    jsk = _heapify(jvm, sk.to_wire())
    # same serialized state -> identical answers from java
    assert jsk.isEstimationMode()
    assert jsk.getRetainedEntries() == sk.num_retained
    assert jsk.getEstimate() == pytest.approx(sk.get_estimate(), rel=1e-12)
    assert jsk.getEstimate() == pytest.approx(n, rel=4 / np.sqrt(1 << 8))


def test_we_read_java_estimation_wire(spark, jvm):
    jsk = _builder(jvm, 8, 1)
    # 4k keys >> 256 nominal, so java rebuilds and lowers theta
    for i in range(4096):
        jsk.update(BIG + i, _jarr(spark, [1.0]))
    comp = jsk.compact()
    blob = bytes(comp.toByteArray())
    sk = AodSketch.from_wire(blob)
    assert sk.is_estimation_mode
    assert sk.num_retained == comp.getRetainedEntries()
    assert sk.get_estimate() == pytest.approx(comp.getEstimate(), rel=1e-12)
    assert sk.column_sums_retained()[0] == pytest.approx(
        _jsums(comp, 1)[0], rel=1e-12
    )


def test_we_read_java_updatable_qs_image(spark, jvm):
    """The updatable (QuickSelect, type 2) image with its full hash
    table also heapifies — both in exact and rebuilt states."""
    for n in (100, 2000):  # nominal 256: exact, then rebuilt
        jsk = _builder(jvm, 8, 2)
        for i in range(n):
            jsk.update(BIG + i, _jarr(spark, [1.0, 2.0]))
        blob = bytes(jsk.toByteArray())
        assert blob[3] == 2  # SketchType.ArrayOfDoublesQuickSelectSketch
        sk = AodSketch.from_wire(blob)
        assert sk.num_retained == jsk.getRetainedEntries()
        assert sk.get_estimate() == pytest.approx(jsk.getEstimate(), rel=1e-12)
        assert sk.column_sums_retained() == pytest.approx(_jsums(jsk, 2), rel=1e-12)


def test_java_unions_our_wire_with_java_sketch(spark, jvm):
    ours = AodSketch(12, 1)
    ours.update_batch(
        pd.Series([BIG + i for i in range(100)], dtype=np.int64), np.ones((100, 1))
    )
    jsk = _builder(jvm, 12, 1)
    for i in range(50, 150):  # 50-key overlap
        jsk.update(BIG + i, _jarr(spark, [1.0]))
    u = (
        jvm.org.apache.datasketches.tuple.arrayofdoubles.ArrayOfDoublesSetOperationBuilder()
        .setNominalEntries(1 << 12)
        .buildUnion()
    )
    u.union(_heapify(jvm, ours.to_wire()))
    u.union(jsk.compact())
    res = u.getResult()
    assert res.getEstimate() == 150.0
    # overlap keys carry summed summaries through the java union
    assert _jsums(res, 1)[0] == pytest.approx(200.0)
    # and we can ingest the union result right back
    back = AodSketch.from_wire(bytes(res.toByteArray()))
    assert back.get_estimate() == 150.0
    assert back.column_sums() == pytest.approx([200.0])


def test_empty_wire_cross_reads(spark, jvm):
    jsk = _builder(jvm, 12, 3)
    ours = AodSketch.from_wire(bytes(jsk.compact().toByteArray()))
    assert ours.is_empty and ours.num_values == 3
    jempty = _heapify(jvm, AodSketch(12, 3).to_wire())
    assert jempty.isEmpty() and jempty.getNumValues() == 3


def test_wire_rejects_corruption(spark, jvm):
    sk = AodSketch(12, 1)
    sk.update_batch(pd.Series([1, 2, 3]), np.ones((3, 1)))
    w = bytearray(sk.to_wire())
    for mut in (
        lambda b: struct.pack_into("<B", b, 1, 9),  # serVer
        lambda b: struct.pack_into("<B", b, 2, 3),  # family
        lambda b: struct.pack_into("<H", b, 6, 0x1234),  # seed hash
        lambda b: struct.pack_into("<q", b, 8, -5),  # negative theta
        lambda b: struct.pack_into("<i", b, 16, 10_000),  # count > len
    ):
        bad = bytearray(w)
        mut(bad)
        with pytest.raises(SketchDeserializeError):
            AodSketch.from_wire(bytes(bad))


def test_aod_to_theta_projection():
    """The key-set projection is lossless: same theta, same hashes,
    and it composes with plain theta built over the same keys."""
    import pandas as pd

    from datasketches_spark.sketches.theta import ThetaSketch, theta_intersect
    from datasketches_spark.sketches.tuple_aod import AodSketch, aod_to_theta

    keys = pd.Series(np.arange(50_000, dtype=np.int64))
    aod = AodSketch(8, 2)
    aod.update_batch(keys, np.ones((50_000, 2)))
    th = ThetaSketch(8)
    th.update_values(keys)
    proj = aod_to_theta(aod)
    th._consolidate()
    assert proj.theta == th.theta
    assert np.array_equal(proj.hashes, th.hashes)
    # composes with theta set algebra: self-intersection is identity
    inter = theta_intersect(proj, th)
    assert inter.get_estimate() == proj.get_estimate()


def test_union_agg_preserves_large_exact_states(spark):
    """datasketch_aod_union_agg accumulates at the inputs' lg_k (min
    across blobs), so same-k blobs union LOSSLESSLY — a 50k-key
    exact-mode state must not purge to the 4096 default."""
    import datasketches_spark as dss

    dss.register(spark)
    df = spark.range(0, 50_000).selectExpr(
        "id % 2 AS part", "id AS key", "array(1.0D) AS vals"
    )
    df.createOrReplaceTempView("aod_big_t")
    parts = spark.sql(
        "SELECT part, datasketch_aod(16, key, vals) AS sk"
        " FROM aod_big_t GROUP BY part"
    )
    parts.createOrReplaceTempView("aod_big_parts")
    row = spark.sql(
        "SELECT datasketch_aod_estimate(datasketch_aod_union_agg(sk)) AS d,"
        " datasketch_aod_is_estimation_mode(datasketch_aod_union_agg(sk)) AS est"
        " FROM aod_big_parts"
    ).first()
    assert row.d == 50_000.0 and not row.est


def test_from_wire_adopts_qs_lgk_and_raises_compact_lgk(spark, jvm):
    # QS image carries lgNomEntries: adopt it
    jsk = _builder(jvm, 14, 1)
    for i in range(100):
        jsk.update(BIG + i, _jarr(spark, [1.0]))
    rt = AodSketch.from_wire(bytes(jsk.toByteArray()))
    assert rt.lg_k == 14
    # compact carries no K: lg_k is raised to hold the retained set
    big = AodSketch(16, 1)
    big.update_batch(
        pd.Series(np.arange(50_000, dtype=np.int64)), np.ones((50_000, 1))
    )
    rt2 = AodSketch.from_wire(big.to_wire())  # default lg_k=12
    assert rt2.lg_k >= 16 and rt2.num_retained == 50_000
    # and a follow-up merge keeps the state exact
    other = AodSketch(16, 1)
    other.update_batch(pd.Series([1, 2]), np.ones((2, 1)))
    rt2.merge(other)
    assert rt2.get_estimate() == 50_000.0  # keys 1,2 already present


def test_all_null_summary_groups_widen_on_merge():
    """An all-NULL-summaries group builds zero summaries at width 1;
    merging with a real width-m state widens the zeros exactly."""
    narrow = AodSketch(12, 1)
    narrow.update_batch(pd.Series([10, 11]), np.zeros((2, 1)))
    wide = AodSketch(12, 2)
    wide.update_batch(pd.Series([11, 12]), np.array([[1.0, 2.0], [3.0, 4.0]]))
    u = AodSketch(12, 1)
    u.merge(narrow)
    u.merge(wide)
    assert u.num_values == 2 and u.get_estimate() == 3.0
    assert u.column_sums() == [4.0, 6.0]
    # the reverse order too
    v = AodSketch(12, 2)
    v.merge(wide)
    v.merge(narrow)
    assert v.num_values == 2 and v.column_sums() == [4.0, 6.0]
    # but non-zero summaries still refuse a width change
    hot = AodSketch(12, 1)
    hot.update_batch(pd.Series([1]), np.array([[5.0]]))
    with pytest.raises(ValueError):
        hot.merge(wide)


def test_null_summary_elements_are_zero_in_udaf(spark):
    import datasketches_spark as dss

    dss.register(spark)
    row = spark.sql(
        "SELECT datasketch_aod_column_sums("
        " datasketch_aod(12, key, vals))[0] AS s,"
        " datasketch_aod_estimate(datasketch_aod(12, key, vals)) AS d"
        " FROM VALUES (1, array(2.0D)), (2, array(CAST(NULL AS DOUBLE))),"
        " (3, NULL) AS t(key, vals)"
    ).first()
    # NULL element and NULL array both contribute 0; keys still count
    assert row.s == 2.0 and row.d == 3.0


def test_java_reads_our_string_key_wire(spark, jvm):
    """r12: java heapifies a STRING-keyed blob of ours and keeps
    merging it with java-side String updates — full string-key interop
    (hash parity is test_hash_parity_long_and_string_keys; this gates
    the export + java-side union direction)."""
    ours = AodSketch(12, 1)
    strs = [f"doc-{i}" for i in range(500)]
    ours.update_batch(pd.Series(strs), np.full((500, 1), 2.0))
    jsk = _heapify(jvm, ours.to_wire())
    assert jsk.getEstimate() == 500.0
    assert float(jsk.getValues()[0][0]) == 2.0
    # java unions our blob with more java String updates: overlap sums
    u = (
        jvm.org.apache.datasketches.tuple.arrayofdoubles.ArrayOfDoublesSetOperationBuilder()
        .setNumberOfValues(1)
        .buildUnion()
    )
    u.union(jsk)
    jup = _builder(jvm, 12, 1)
    for s in strs[:100]:
        jup.update(s, _jarr(spark, [1.0]))
    u.union(jup.compact())
    merged = AodSketch.from_wire(bytes(u.getResult().toByteArray()))
    assert merged.get_estimate() == 500.0
    assert merged.column_sums() == pytest.approx([500 * 2.0 + 100 * 1.0])
