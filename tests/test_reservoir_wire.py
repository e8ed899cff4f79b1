"""Apache ReservoirLongsSketch wire interop, differential vs LIVE
datasketches-java (the jar bundled in pyspark — CLAUDE.md's live
oracle).  Beyond-reference interop, same pitch as the 8 gated wire
families (reference docs/README.md:9 — sketch state that crosses
systems): a uniform sample published by this engine must heapify in
java with identical n/k/sample set, and vice versa.

What crosses exactly: k, n, and the retained sample SET (both writers
serialize min(n, k) longs).  What does not exist on the Apache side:
the A-ES tags this engine merges by — ingest re-synthesizes them as
exponential order statistics (Rényi representation), which keeps later
merges distributionally uniform; structural invariants of that
synthesis are asserted here, the distribution itself in
test_reservoir.py's statistical tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from datasketches_spark.sketches.base import SketchDeserializeError
from datasketches_spark.sketches.reservoir import ReservoirSampleSketch

N_CASES = 50


@pytest.fixture(scope="module")
def jvm(spark):
    return spark.sparkContext._jvm


def _mem(jvm, blob: bytes):
    return jvm.org.apache.datasketches.memory.Memory.wrap(blob)


def _jres(jvm, k: int):
    return jvm.org.apache.datasketches.sampling.ReservoirLongsSketch.newInstance(k)


def _jheapify(jvm, blob: bytes):
    return jvm.org.apache.datasketches.sampling.ReservoirLongsSketch.heapify(
        _mem(jvm, blob)
    )


def _build_ours(values: np.ndarray, k: int) -> ReservoirSampleSketch:
    sk = ReservoirSampleSketch(k)
    sk.update_series(pd.Series(values))
    return sk


# ---------------------------------------------------------------- golden


def test_java_blob_ingests_exact_mode(jvm):
    jsk = _jres(jvm, 32)
    for i in range(10):
        jsk.update(i * 1000 + 7)
    sk = ReservoirSampleSketch.from_wire(bytes(jsk.toByteArray()))
    assert sk.k == 32 and sk.n == 10 and sk.num_retained == 10
    assert sorted(sk.items, key=int) == [str(i * 1000 + 7) for i in range(10)]
    assert sk.is_exact and not sk.weighted


def test_java_blob_ingests_estimation_mode(jvm):
    jsk = _jres(jvm, 8)
    for i in range(100):
        jsk.update(i)
    blob = bytes(jsk.toByteArray())
    sk = ReservoirSampleSketch.from_wire(blob)
    assert sk.k == 8 and sk.n == 100 and sk.num_retained == 8
    assert sorted(int(s) for s in sk.items) == sorted(jsk.getSamples())
    # synthesized tags: ascending bottom-k exponential order statistics
    assert np.all(np.diff(sk.tags) > 0) and sk.tags.size == 8
    # implicit sniff: deserialize accepts the raw Apache blob too
    via_deser = ReservoirSampleSketch.deserialize(blob)
    assert via_deser.n == 100 and via_deser.num_retained == 8


def test_java_empty_blob(jvm):
    jsk = _jres(jvm, 16)
    sk = ReservoirSampleSketch.from_wire(bytes(jsk.toByteArray()))
    assert sk.is_empty and sk.k == 16 and sk.n == 0


def test_our_blob_heapifies_in_java(jvm):
    sk = _build_ours(np.arange(500, dtype=np.int64), 64)
    jsk = _jheapify(jvm, sk.to_wire())
    assert jsk.getK() == 64 and jsk.getN() == 500 and jsk.getNumSamples() == 64
    assert sorted(jsk.getSamples()) == sorted(int(s) for s in sk.items)


def test_our_empty_blob_heapifies_in_java(jvm):
    sk = ReservoirSampleSketch(16)
    jsk = _jheapify(jvm, sk.to_wire())
    assert jsk.getK() == 16 and jsk.getN() == 0 and jsk.getNumSamples() == 0


def test_weighted_sample_refuses_export():
    sk = ReservoirSampleSketch(8)
    sk.update_series(
        pd.Series(np.arange(100, dtype=np.int64)),
        weights=pd.Series(np.linspace(1.0, 5.0, 100)),
    )
    with pytest.raises(ValueError, match="uniform-only"):
        sk.to_wire()
    # weightedness survives a DSKS round trip (the v2 payload flag)
    rt = ReservoirSampleSketch.deserialize(sk.serialize())
    assert rt.weighted
    with pytest.raises(ValueError, match="uniform-only"):
        rt.to_wire()


def test_non_integer_items_refuse_export():
    sk = ReservoirSampleSketch(8)
    sk.update_series(pd.Series(["alpha", "beta"]))
    with pytest.raises(ValueError, match="longs wire"):
        sk.to_wire()
    # ...and the error names the escape hatch
    sk.to_wire(serde="strings")


def test_k1_refuses_export():
    # java: "Cannot instantiate sketch with reservoir size less than 2"
    sk = _build_ours(np.arange(5, dtype=np.int64), 1)
    with pytest.raises(ValueError, match="k >= 2"):
        sk.to_wire()


def test_corrupt_wire_blob_raises():
    with pytest.raises(SketchDeserializeError, match="Failed to deserialize"):
        ReservoirSampleSketch.from_wire(b"\x00" * 4)
    with pytest.raises(SketchDeserializeError, match="Failed to deserialize"):
        # right length, wrong family byte
        ReservoirSampleSketch.from_wire(b"\xc2\x02\x0c\x00" + b"\x00" * 12)


def test_out_of_range_k_wire_blob_raises():
    """Valid family/serVer header but k outside [K_MIN, K_MAX] (k=0 is
    corrupt; a huge k is a legitimate java blob we cap) must honour the
    corrupt-blob contract — SketchDeserializeError, never a bare
    ValueError (ADVICE r10)."""
    import struct

    for bad_k in (0, ReservoirSampleSketch.K_MAX + 1, (1 << 31) - 1):
        hdr = struct.pack(
            "<BBBBI",
            2,
            ReservoirSampleSketch._WIRE_SERVER,
            ReservoirSampleSketch._WIRE_FAMILY_ID,
            0,
            bad_k,
        )
        with pytest.raises(
            SketchDeserializeError, match="Failed to deserialize"
        ):
            ReservoirSampleSketch.from_wire(hdr + b"\x00" * 8)


# ------------------------------------------------------------- fuzz

def test_differential_fuzz_vs_java(jvm):
    """Both directions, random k / n across exact and estimation
    regimes: java reads our blobs, we read java's, and k/n/sample-set
    survive each crossing exactly."""
    rng = np.random.default_rng(0xE5)
    for case in range(N_CASES):
        k = int(rng.integers(2, 200))
        n = int(rng.integers(0, 800))
        values = rng.integers(-(1 << 62), 1 << 62, size=n)
        # ours -> java
        ours = _build_ours(values, k)
        jsk = _jheapify(jvm, ours.to_wire())
        assert jsk.getK() == k and jsk.getN() == n, case
        assert jsk.getNumSamples() == min(n, k), case
        assert sorted(jsk.getSamples()) == sorted(
            int(s) for s in ours.items
        ), case
        # java -> ours (java's own RNG picks its sample)
        jsk2 = _jres(jvm, k)
        for v in values.tolist():
            jsk2.update(int(v))
        back = ReservoirSampleSketch.from_wire(bytes(jsk2.toByteArray()))
        assert back.k == k and back.n == n, case
        assert back.num_retained == min(n, k), case
        assert sorted(int(s) for s in back.items) == sorted(
            jsk2.getSamples()
        ), case
        # ingested state keeps merging: union with a fresh local build
        local = _build_ours(rng.integers(0, 1 << 30, size=50), k)
        local.merge(back)
        assert local.n == n + 50
        assert local.num_retained == min(local.n, k)
        assert np.all(np.diff(local.tags) >= 0)


def test_imported_state_merges_uniformly(jvm):
    """The tag-synthesis claim behind from_wire: a java-imported
    reservoir (k of n) merged with a locally built one must behave as
    ONE uniform sample over the concatenated population — imported
    items must appear in the union sample at the same rate as local
    ones.  The synthesized tags are the bottom-k order statistics of
    n unit exponentials, randomly assigned, which is exactly the tag
    state of an A-ES sketch those k items won; any bias here (e.g.
    forgetting the (n - k) unseen mass, or sorted-not-permuted
    assignment) skews this rate measurably."""
    k, n_java, n_local = 20, 1000, 1000
    trials = 200
    hits_java_side = 0
    jsk = _jres(jvm, k)
    for v in range(n_java):
        jsk.update(v)
    blob = bytes(jsk.toByteArray())  # one java sample, re-imported per trial
    for _ in range(trials):
        imported = ReservoirSampleSketch.from_wire(blob)
        local = _build_ours(
            np.arange(n_java, n_java + n_local, dtype=np.int64), k
        )
        local.merge(imported)
        assert local.n == n_java + n_local and local.num_retained == k
        hits_java_side += sum(
            1 for it in local.get_items() if int(it) < n_java
        )
    frac = hits_java_side / (trials * k)
    # equal halves -> expected 0.5; sd of the mean over 4000 draws
    # ~0.008, band is ~6 sigma
    assert 0.45 < frac < 0.55, frac


# ------------------------------------------- generic items (strings) serde


def test_strings_image_crosses_to_java(jvm):
    """serde='strings' emits the GENERIC ReservoirItemsSketch image —
    same preamble as the longs wire, ArrayOfStringsSerDe item framing;
    java must heapify it with identical n/k/sample set."""
    sk = ReservoirSampleSketch(8)
    sk.update_series(pd.Series(["alpha", "beta", "gamma"]))
    blob = sk.to_wire(serde="strings")
    serde = jvm.org.apache.datasketches.common.ArrayOfStringsSerDe()
    got = jvm.org.apache.datasketches.sampling.ReservoirItemsSketch.heapify(
        _mem(jvm, blob), serde
    )
    assert got.getN() == 3 and got.getK() == 8
    jitems = sorted(str(x) for x in got.getSamples())
    assert jitems == ["alpha", "beta", "gamma"]


def test_java_items_blob_ingests(jvm):
    """Reverse direction: a java ReservoirItemsSketch<String> blob
    auto-detects as the strings image (the items region is not 8·m
    bytes) and ingests with the exact sample set."""
    jsk = jvm.org.apache.datasketches.sampling.ReservoirItemsSketch.newInstance(8)
    for i in range(30):
        jsk.update(f"doc-{i:03d}")
    serde = jvm.org.apache.datasketches.common.ArrayOfStringsSerDe()
    StrCls = jvm.java.lang.Class.forName("java.lang.String")
    blob = bytes(jsk.toByteArray(serde, StrCls))
    ours = ReservoirSampleSketch.from_wire(blob)
    assert ours.n == 30 and ours.k == 8 and ours.num_retained == 8
    jitems = sorted(str(x) for x in jsk.getSamples())
    assert sorted(ours.get_items()) == jitems
    # and the DSKS sniff route accepts it too
    assert sorted(
        ReservoirSampleSketch.deserialize(blob).get_items()
    ) == jitems


def test_strings_image_roundtrip_both_ways(jvm):
    """ours -> java -> bytes -> ours: the sample set survives, and the
    re-synthesized tags keep the uniform-merge invariants (sorted,
    one per item)."""
    sk = ReservoirSampleSketch(16)
    sk.update_series(pd.Series([f"item{i}" for i in range(100)]))
    serde = jvm.org.apache.datasketches.common.ArrayOfStringsSerDe()
    StrCls = jvm.java.lang.Class.forName("java.lang.String")
    j = jvm.org.apache.datasketches.sampling.ReservoirItemsSketch.heapify(
        _mem(jvm, sk.to_wire(serde="strings")), serde
    )
    back = ReservoirSampleSketch.from_wire(bytes(j.toByteArray(serde, StrCls)))
    assert sorted(back.get_items()) == sorted(sk.get_items())
    assert back.n == 100 and np.all(np.diff(back.tags) >= 0)
