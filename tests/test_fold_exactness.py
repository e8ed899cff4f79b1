"""Randomized mixed-K union stress + fold exactness for HLL/CPC.

Found the round-2 bugs the example-based tests missed: (a) sparse
coarser inputs not demoting the result's lg_k, (b) dense folding using
the wrong aliasing groups and biasing unions low.  Kept as a bounded
regression harness (seeded, deterministic).
"""

import numpy as np
import pandas as pd

from datasketches_spark.sketches import CpcSketch, HllSketch


def test_folded_copy_matches_direct_coarse_build():
    rng = np.random.default_rng(42)
    for _ in range(60):
        k1 = int(rng.integers(5, 13))
        k2 = int(rng.integers(4, k1))
        n = int(rng.integers(2000, 15000))
        vals = pd.Series(rng.integers(0, 10**9, n))
        fine = HllSketch(k1)
        fine.update_values(vals)
        if fine.mode != 1:
            continue
        coarse = HllSketch(k2)
        coarse.update_values(vals)
        if coarse.mode != 1:
            coarse._promote()
        folded = fine._folded_copy(k2)
        assert np.array_equal(folded.registers, coarse.registers), (k1, k2, n)


def test_mixed_k_union_stays_in_error_band():
    rng = np.random.default_rng(7)
    for trial in range(300):
        cls = HllSketch if trial % 2 == 0 else CpcSketch
        k1, k2 = (int(x) for x in rng.integers(4, 13, 2))
        n1, n2 = (int(x) for x in rng.integers(0, 8000, 2))
        a, b = cls(k1), cls(k2)
        v1 = rng.integers(0, 20000, n1)
        v2 = rng.integers(0, 20000, n2)
        if n1:
            a.update_values(pd.Series(v1))
        if n2:
            b.update_values(pd.Series(v2))
        a.merge(b)
        if a.mode != 0:
            assert a.lg_k == min(k1, k2), (cls.__name__, k1, k2, n1, n2)
        rt = cls.deserialize(a.serialize())
        assert rt.get_estimate() == a.get_estimate()
        true = len(set(v1.tolist()) | set(v2.tolist()))
        if true > 200:
            err = abs(a.get_estimate() - true) / true
            band = 4 * 1.04 / (2 ** (min(k1, k2) / 2)) + 0.05
            assert err <= band, (cls.__name__, k1, k2, n1, n2, err, band)
