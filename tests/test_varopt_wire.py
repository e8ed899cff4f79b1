"""Apache VarOptItemsSketch wire interop, differential vs LIVE
datasketches-java (the jar bundled in pyspark — CLAUDE.md's live
oracle).  This closes cross-system interop for the WEIGHTED sampling
surface (round-10 verdict item #3): weighted reservoir blobs could
not honestly export as the uniform ReservoirLongsSketch; VarOpt is
the ecosystem's weighted-sampling wire family (same pitch as the
other nine — reference docs/README.md:9, sketch state that crosses
systems).

Mapping contract (sketches/reservoir.py to_varopt_wire/from_varopt_wire):
- export puts every sampled item in the H region with its
  Horvitz–Thompson estimation weight (exact raw weights in exact
  mode; w/(1-e^{-wτ}) with the merge-surviving (k+1)-th-tag threshold
  τ in estimation mode), EXCEPT uniform estimation mode which is a
  pure equal-weight R region with totalWtR = n — exactly the state
  java's own VarOpt reaches on a unit-weight stream;
- ingest keeps H weights exactly and assigns each R item τ =
  totalWtR/r, then re-samples with fresh Exp(1)/w tags (the standard
  sample-of-sample composition), so java's estimateSubsetSum and our
  total_weight_estimate agree exactly on the crossing.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pytest

from datasketches_spark.sketches.base import SketchDeserializeError
from datasketches_spark.sketches.reservoir import ReservoirSampleSketch

N_CASES = 40
BIG = 1 << 32  # py4j sends ints >= 2^31 as java Long


@pytest.fixture(scope="module")
def jvm(spark):
    return spark.sparkContext._jvm


def _mem(jvm, blob: bytes):
    return jvm.org.apache.datasketches.memory.Memory.wrap(blob)


def _jvaropt(jvm, k: int):
    return jvm.org.apache.datasketches.sampling.VarOptItemsSketch.newInstance(k)


def _jheapify(jvm, blob: bytes, serde="longs"):
    s = (
        jvm.org.apache.datasketches.common.ArrayOfLongsSerDe()
        if serde == "longs"
        else jvm.org.apache.datasketches.common.ArrayOfStringsSerDe()
    )
    return jvm.org.apache.datasketches.sampling.VarOptItemsSketch.heapify(
        _mem(jvm, blob), s
    )


def _jsamples(jsk, longs=True):
    it = jsk.getSketchSamples().iterator()
    out = []
    while it.hasNext():
        ws = it.next()
        item = ws.getItem()
        out.append((int(item) if longs else str(item), float(ws.getWeight())))
    return out


def _ours_weighted(values, weights, k) -> ReservoirSampleSketch:
    sk = ReservoirSampleSketch(k)
    sk.update_series(pd.Series(values), weights=pd.Series(weights))
    return sk


# ---------------------------------------------------------------- golden


def test_exact_mode_crosses_exactly(jvm):
    """n <= k: the sample IS the input; java must see every (item,
    weight) pair bit-exactly."""
    vals = [BIG + i for i in range(10)]
    ws = [float(1 + i) for i in range(10)]
    sk = _ours_weighted(vals, ws, 16)
    got = _jheapify(jvm, sk.to_varopt_wire())
    assert got.getN() == 10 and got.getNumSamples() == 10
    assert sorted(_jsamples(got)) == sorted(zip(vals, ws))


def test_strings_serde_crosses_exactly(jvm):
    sk = _ours_weighted(["alpha", "beta", "gamma"], [1.0, 2.0, 3.0], 8)
    got = _jheapify(jvm, sk.to_varopt_wire(serde="strings"), serde="strings")
    assert sorted(_jsamples(got, longs=False)) == [
        ("alpha", 1.0),
        ("beta", 2.0),
        ("gamma", 3.0),
    ]


def test_uniform_estimation_exports_pure_r_region(jvm):
    """A uniform k-of-n sample is an equal-weight light region: h=0,
    r=k, tau = n/k — the state java's VarOpt reaches on unit weights."""
    sk = ReservoirSampleSketch(8)
    sk.update_series(pd.Series(np.arange(100) + BIG))
    blob = sk.to_varopt_wire()
    h, r = struct.unpack_from("<II", blob, 16)
    assert (h, r) == (0, 8)
    got = _jheapify(jvm, blob)
    assert got.getN() == 100 and got.getNumSamples() == 8
    assert got.getTau() == pytest.approx(100 / 8)


def test_empty_crosses(jvm):
    blob = ReservoirSampleSketch(8).to_varopt_wire()
    assert len(blob) == 8
    got = _jheapify(jvm, blob)
    assert got.getN() == 0 and got.getNumSamples() == 0


def test_java_blob_ingests_with_exact_estimate(jvm):
    """H weights and tau·r reproduce java's total weight EXACTLY —
    the crossing loses no estimation information."""
    jsk = _jvaropt(jvm, 8)
    true_total = 0.0
    for i in range(50):
        w = float(1 + (i % 7))
        jsk.update(BIG + i, w)
        true_total += w
    serde = jvm.org.apache.datasketches.common.ArrayOfLongsSerDe()
    ours = ReservoirSampleSketch.from_varopt_wire(bytes(jsk.toByteArray(serde)))
    assert ours.n == 50 and ours.k == 8 and ours.weighted
    assert ours.num_retained == 8
    assert ours.total_weight_estimate() == pytest.approx(true_total)
    # tags are sorted ascending and parallel to items/weights
    assert np.all(np.diff(ours.tags) >= 0)
    assert len(ours.items) == len(ours.weights) == ours.tags.size


def test_reexport_roundtrip(jvm):
    """our-blob -> java -> bytes -> our ingest -> our blob -> java:
    sample set and estimation weights survive every crossing."""
    sk = _ours_weighted(
        [BIG + i for i in range(12)], [float(1 + i % 5) for i in range(12)], 16
    )
    j1 = _jheapify(jvm, sk.to_varopt_wire())
    serde = jvm.org.apache.datasketches.common.ArrayOfLongsSerDe()
    ours2 = ReservoirSampleSketch.from_varopt_wire(bytes(j1.toByteArray(serde)))
    j2 = _jheapify(jvm, ours2.to_varopt_wire())
    assert sorted(_jsamples(j1)) == sorted(_jsamples(j2))


def test_java_unions_our_blob(jvm):
    """java's VarOptItemsUnion accepts our all-H estimation-mode state
    (n > k, r = 0) and produces a working merged sketch."""
    sk = _ours_weighted(
        [BIG + i for i in range(200)],
        np.random.default_rng(3).uniform(0.5, 4.0, 200),
        16,
    )
    assert not sk.is_exact
    got = _jheapify(jvm, sk.to_varopt_wire())
    u = jvm.org.apache.datasketches.sampling.VarOptItemsUnion.newInstance(16)
    u.update(got)
    other = _jvaropt(jvm, 16)
    for i in range(30):
        other.update(BIG + 1000 + i, 1.0)
    u.update(other)
    res = u.getResult()
    assert res.getN() == 230 and res.getNumSamples() == 16


# ------------------------------------------------------- estimation math


def test_threshold_survives_merge():
    """Bottom-(k+1) retention: the (k+1)-th smallest tag (the PPSWOR
    threshold) of a merged state equals the (k+1)-th smallest over the
    union of the parts' retained tags — merge-exact."""
    rng = np.random.default_rng(11)
    a = _ours_weighted(np.arange(500), rng.uniform(0.5, 3.0, 500), 32)
    b = _ours_weighted(np.arange(500, 900), rng.uniform(0.5, 3.0, 400), 32)
    union_tags = np.sort(np.concatenate([a.tags, b.tags]))
    a.merge(b)
    assert len(a.items) == 33
    assert a.threshold_tag == pytest.approx(union_tags[32])


def test_total_weight_estimator_unbiased():
    """The HT estimator over the exported sample is unbiased for the
    total stream weight (mean over trials within 3 standard errors)."""
    rng = np.random.default_rng(7)
    ratios = []
    for _ in range(200):
        w = rng.uniform(0.5, 5.0, size=400)
        sk = _ours_weighted(np.arange(400), w, 32)
        ratios.append(sk.total_weight_estimate() / w.sum())
    mean = np.mean(ratios)
    se = np.std(ratios) / np.sqrt(len(ratios))
    assert abs(mean - 1.0) < 3 * se + 0.01


def test_sample_weights_parallel_to_items():
    sk = _ours_weighted(np.arange(100), np.full(100, 2.0), 16)
    items = sk.get_items()
    w = sk.get_sample_weights()
    assert len(items) == len(w) == 16
    # equal raw weights -> equal adjusted weights, each >= raw
    assert np.allclose(w, w[0]) and w[0] > 2.0


def test_uniform_sample_weights():
    sk = ReservoirSampleSketch(8)
    sk.update_series(pd.Series(np.arange(5)))
    assert np.allclose(sk.get_sample_weights(), 1.0)
    sk.update_series(pd.Series(np.arange(5, 100)))
    assert np.allclose(sk.get_sample_weights(), 100 / 8)
    assert sk.total_weight_estimate() == 100.0


# ------------------------------------------------------------- refusals


def test_legacy_weighted_blob_refuses_varopt_export():
    sk = _ours_weighted(np.arange(10), np.arange(1.0, 11.0), 16)
    sk.weights = None  # simulate a pre-r11 legacy state
    with pytest.raises(ValueError, match="legacy weighted"):
        sk.to_varopt_wire()
    with pytest.raises(ValueError, match="legacy weighted"):
        sk.get_sample_weights()


def test_non_integer_items_refuse_longs_serde():
    sk = _ours_weighted(["x", "y"], [1.0, 2.0], 8)
    with pytest.raises(ValueError, match="longs serde"):
        sk.to_varopt_wire()
    sk.to_varopt_wire(serde="strings")  # fine


def test_corrupt_varopt_blob_raises():
    for bad in (
        b"\x00" * 4,
        b"\xc3\x02\x0d\x00" + b"\x00" * 12,  # k=0
        b"\xc3\x01\x0d\x00" + struct.pack("<I", 8) + b"\x00" * 16,  # serVer 1
        b"\xc2\x02\x0d\x00" + struct.pack("<I", 8) + b"\x00" * 16,  # pre=2
        # pre=4 but r=0
        struct.pack("<BBBBI", 0xC4, 2, 13, 0, 8)
        + struct.pack("<QII", 10, 1, 0)
        + struct.pack("<d", 1.0),
        # negative H weight
        struct.pack("<BBBBI", 0xC3, 2, 13, 0, 8)
        + struct.pack("<QII", 2, 2, 0)
        + struct.pack("<dd", 1.0, -1.0)
        + struct.pack("<qq", 1, 2),
    ):
        with pytest.raises(SketchDeserializeError):
            ReservoirSampleSketch.from_varopt_wire(bad)


# ------------------------------------------------------------------ fuzz


def test_differential_fuzz_vs_java(jvm):
    """Seeded random k/n across exact and estimation regimes, both
    serdes, both directions: java reads every blob we emit; we read
    every blob java emits; n/k/sample-count and the total-weight
    estimate survive each crossing."""
    rng = np.random.default_rng(0xFA)
    serde = jvm.org.apache.datasketches.common.ArrayOfLongsSerDe()
    for case in range(N_CASES):
        k = int(rng.integers(2, 64))
        n = int(rng.integers(1, 300))
        w = rng.uniform(0.25, 8.0, n)
        vals = rng.integers(BIG, BIG + 10**9, n)
        sk = _ours_weighted(vals, w, k)
        blob = sk.to_varopt_wire()
        got = _jheapify(jvm, blob)
        assert got.getN() == n, case
        assert got.getNumSamples() == min(n, k), case
        jw = sorted(wt for _, wt in _jsamples(got))
        assert np.allclose(jw, np.sort(sk.get_sample_weights())), case

        # reverse: java builds, we ingest
        jsk = _jvaropt(jvm, k)
        jtot = 0.0
        for i in range(n):
            jsk.update(int(vals[i]), float(w[i]))
            jtot += float(w[i])
        ours = ReservoirSampleSketch.from_varopt_wire(
            bytes(jsk.toByteArray(serde))
        )
        assert ours.n == n and ours.k == k, case
        assert ours.num_retained == min(n, k), case
        if n <= k:
            # exact mode: the ingested weights ARE the stream weights
            assert ours.total_weight_estimate() == pytest.approx(jtot), case


def test_merged_import_stays_unbiased(jvm):
    """Statistical: ingest a java VarOpt summary, merge MORE weighted
    data into it, and the total-weight estimate stays unbiased (the
    sample-of-sample composition claim; 200 trials, 3 SE band)."""
    serde = jvm.org.apache.datasketches.common.ArrayOfLongsSerDe()
    rng = np.random.default_rng(0xB0)
    ratios = []
    for _ in range(200):
        jsk = _jvaropt(jvm, 24)
        w1 = rng.uniform(0.5, 4.0, 150)
        for i in range(150):
            jsk.update(BIG + i, float(w1[i]))
        ours = ReservoirSampleSketch.from_varopt_wire(
            bytes(jsk.toByteArray(serde))
        )
        w2 = rng.uniform(0.5, 4.0, 150)
        ours.update_series(
            pd.Series(np.arange(150) + BIG + 10**6), weights=pd.Series(w2)
        )
        ratios.append(ours.total_weight_estimate() / (w1.sum() + w2.sum()))
    mean = np.mean(ratios)
    se = np.std(ratios) / np.sqrt(len(ratios))
    assert abs(mean - 1.0) < 3 * se + 0.02


def test_union_gadget_blob_with_marks_ingests(jvm):
    """java's VarOptItemsUnion serializes its internal gadget WITH the
    GADGET flag (128) and ceil(h/8) mark bytes between the H weights
    and the items (ArrayOfBooleansSerDe.computeBytesNeeded).  Our
    ingest must skip the marks and still read the exact estimation
    state: the total-weight estimate of the embedded gadget AND of the
    union's result must equal the true stream total exactly."""
    LongCls = jvm.java.lang.Class.forName("java.lang.Long")
    serde = jvm.org.apache.datasketches.common.ArrayOfLongsSerDe()
    u = jvm.org.apache.datasketches.sampling.VarOptItemsUnion.newInstance(16)
    a = _jvaropt(jvm, 16)
    b = _jvaropt(jvm, 16)
    true_total = 0.0
    for i in range(100):
        w = float(1 + (i % 5))
        a.update(BIG + i, w)
        true_total += w
    for i in range(80):
        w = float(2 + (i % 3))
        b.update(BIG + 1000 + i, w)
        true_total += w
    u.update(a)
    u.update(b)
    ub = bytes(u.toByteArray(serde, LongCls))
    # the union wire (family 14) embeds the gadget (family 13) at an
    # 8-byte-aligned offset; find and ingest it
    off = next(
        o for o in range(0, 64, 8)
        if len(ub) > o + 3 and ub[o + 1] == 2 and ub[o + 2] == 13
    )
    assert ub[off + 3] & 128  # GADGET flag: marks present
    gadget = ReservoirSampleSketch.from_varopt_wire(ub[off:])
    assert gadget.total_weight_estimate() == pytest.approx(true_total)
    result = ReservoirSampleSketch.from_varopt_wire(
        bytes(u.getResult().toByteArray(serde, LongCls))
    )
    assert result.total_weight_estimate() == pytest.approx(true_total)
