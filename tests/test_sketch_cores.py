"""Unit tests for the pure-Python sketch cores (no Spark needed).

Scenarios ported from the reference sqllogictests (SURVEY.md §5):
exact-mode identities, merge/union correctness, error bands on
estimates, edge cases, corrupt-blob errors.
"""

import numpy as np
import pandas as pd
import pytest

from datasketches_spark.sketches import (
    CpcSketch,
    FrequentItemsSketch,
    HllSketch,
    KllSketch,
    QuantilesSketch,
    ReqSketch,
    SketchDeserializeError,
    TDigestSketch,
    ThetaSketch,
    deserialize_any,
    theta_a_not_b,
    theta_intersect,
    theta_union,
)


# ---------------- Theta (test/sql/datasketch_theta.test idioms) --------


class TestTheta:
    def test_exact_small(self):
        sk = ThetaSketch()
        sk.update_values(np.array([1, 2, 3, 4, 5, 1, 2, 3], dtype=np.int64))
        assert sk.get_estimate() == 5.0
        assert not sk.is_estimation_mode
        assert sk.num_retained == 5
        assert sk.get_theta() == 1.0

    def test_set_algebra_exact(self):
        # A = {1..5}, B = {4..8}: A∩B=2, A\B=3, B\A=3, A∪B=8 (FIXTURES F7)
        a, b = ThetaSketch(), ThetaSketch()
        a.update_values(np.arange(1, 6, dtype=np.int64))
        b.update_values(np.arange(4, 9, dtype=np.int64))
        assert theta_union(a, b).get_estimate() == 8.0
        assert theta_intersect(a, b).get_estimate() == 2.0
        assert theta_a_not_b(a, b).get_estimate() == 3.0
        assert theta_a_not_b(b, a).get_estimate() == 3.0

    def test_estimation_band(self):
        sk = ThetaSketch(12)
        sk.update_values(np.arange(100_000, dtype=np.int64))
        est = sk.get_estimate()
        assert 95_000 <= est <= 105_000  # reference asserts ±2% at lg_k=12
        assert sk.is_estimation_mode
        assert sk.get_bound(3, False) <= sk.get_bound(1, False) <= est
        assert est <= sk.get_bound(1, True) <= sk.get_bound(3, True)

    def test_merge_matches_single_build(self):
        parts = [np.arange(i, 50_000, 3, dtype=np.int64) for i in range(3)]
        merged = ThetaSketch(12)
        for p in parts:
            s = ThetaSketch(12)
            s.update_values(p)
            merged.merge(ThetaSketch.deserialize(s.serialize()))
        whole = ThetaSketch(12)
        whole.update_values(np.arange(50_000, dtype=np.int64))
        assert merged.get_estimate() == pytest.approx(whole.get_estimate(), rel=0.05)

    def test_empty_and_nulls(self):
        sk = ThetaSketch()
        assert sk.is_empty and sk.get_estimate() == 0.0
        s = pd.Series([1.0, None, 2.0, None, 3.0])
        sk.update_values(s.dropna())
        assert sk.get_estimate() == 3.0

    def test_strings_and_empty_string(self):
        # empty strings are skipped, matching datasketches-cpp
        # update(const std::string&) — '' is NOT a distinct value
        sk = ThetaSketch()
        sk.update_values(pd.Series(["hello", "world", "hello world", "", "hello"]))
        assert sk.get_estimate() == 3.0

    def test_serialize_roundtrip(self):
        sk = ThetaSketch(10)
        sk.update_values(np.arange(10_000, dtype=np.int64))
        rt = ThetaSketch.deserialize(sk.serialize())
        assert rt.get_estimate() == sk.get_estimate()
        assert rt.num_retained == sk.num_retained

    def test_corrupt_blob(self):
        with pytest.raises(SketchDeserializeError, match="Failed to deserialize"):
            ThetaSketch.deserialize(b"\x01\x02garbage")


# ---------------- Quantile families -----------------------------------


@pytest.mark.parametrize("cls,k", [(KllSketch, 200), (QuantilesSketch, 128), (ReqSketch, 12)])
class TestQuantileFamilies:
    def test_exact_mode(self, cls, k):
        sk = cls(max(k, 1024) if cls is not ReqSketch else 1024, "float64")
        vals = np.arange(1.0, 1001.0)
        sk.update(vals)
        assert not sk.is_estimation_mode
        assert sk.n == 1000
        assert sk.get_min_item() == 1.0 and sk.get_max_item() == 1000.0
        assert sk.get_quantile(0.5) == 500.0
        assert sk.get_rank(500.0) == 0.5
        cdf = sk.get_cdf([100.5, 900.5])
        assert cdf == [0.1, 0.9, 1.0]
        pmf = sk.get_pmf([100.5, 900.5])
        assert pmf == pytest.approx([0.1, 0.8, 0.1])

    def test_estimation_band(self, cls, k):
        sk = cls(k, "float64")
        sk.update(np.arange(1.0, 100_001.0))
        assert sk.is_estimation_mode
        assert sk.n == 100_000
        q = sk.get_quantile(0.5)
        assert 40_000 <= q <= 60_000
        r = sk.get_rank(50_000.0)
        assert 0.4 <= r <= 0.6
        assert sk.get_min_item() == 1.0 and sk.get_max_item() == 100_000.0

    def test_merge(self, cls, k):
        a, b = cls(k, "float64"), cls(k, "float64")
        a.update(np.arange(0.0, 5000.0))
        b.update(np.arange(5000.0, 10000.0))
        b_rt = cls.deserialize(b.serialize())
        a.merge(b_rt)
        assert a.n == 10_000
        assert 0.35 <= a.get_rank(4000.0) <= 0.45

    def test_int64_dtype(self, cls, k):
        sk = cls(k if cls is ReqSketch else 1024, "int64")
        sk.update(np.arange(100, dtype=np.int64))
        assert sk.get_min_item() == 0
        assert isinstance(sk.get_quantile(0.5), int)

    def test_corrupt(self, cls, k):
        with pytest.raises(SketchDeserializeError):
            cls.deserialize(b"DSKS\xff\xffgarbage")


class TestKllSpecific:
    def test_rank_error_formula(self):
        assert KllSketch(200, "float64").normalized_rank_error(False) == pytest.approx(
            0.0133, abs=0.002
        )

    def test_split_points_validation(self):
        sk = KllSketch(200, "float64")
        sk.update(np.arange(10.0))
        with pytest.raises(ValueError, match="split points"):
            sk.get_cdf([5.0, 1.0])


# ---------------- TDigest ----------------------------------------------


class TestTDigest:
    def test_infinities_isolated_and_ranked_exactly(self):
        """Round-10 semantics (found by the ±inf wire fuzz): observed
        infinities become centroids but never merge with anything else
        (a ±inf pair in one k1 bucket would average to NaN; an inf
        mean swallowing finite items misplaces their mass), and a
        probe in a segment touching an infinity ranks at the exact
        cumulative-weight boundary between the support points.
        java's getRank is NaN in these states; ours is exact."""
        sk = TDigestSketch(10)
        sk.update(np.array([-np.inf] * 250 + [np.inf] * 750))
        assert sk.get_rank(0.0) == 0.25
        assert sk.get_quantile(0.1) == float("-inf")
        assert sk.get_quantile(0.9) == float("inf")

        sk = TDigestSketch(10)
        sk.update(
            np.concatenate(
                [np.full(100, -np.inf), np.linspace(0, 1, 800), np.full(100, np.inf)]
            )
        )
        assert sk.get_rank(-1.0) == 0.1
        assert sk.get_rank(2.0) == 0.9
        assert sk.get_rank(0.5) == pytest.approx(0.5, abs=0.01)
        assert not np.isnan(sk.means).any()

        a = TDigestSketch(20)
        a.update(np.full(300, np.inf))
        b = TDigestSketch(20)
        b.update(np.linspace(0, 1, 700))
        a.merge(b)
        assert a.get_rank(2.0) == 0.7

    def test_huge_magnitude_means_do_not_overflow(self):
        """Round-10: group means are Σ(w/W)·m, never Σ(w·m)/W — the
        unnormalized products overflow to ±inf near ±1.7e308, and
        rank interpolation over a near-1e308 span must not overflow
        either (divide-first segment arithmetic)."""
        sk = TDigestSketch(50)
        sk.update(np.array([1.7e308] * 100 + [-1.7e308] * 100 + [0.0] * 100))
        assert np.isfinite(sk.means).all()
        r = sk.get_rank(1.0)
        assert 0.0 <= r <= 1.0

    def test_exact_small(self):
        sk = TDigestSketch(100)
        sk.update(np.arange(1.0, 11.0))
        assert sk.total_weight() == 10
        assert sk.get_quantile(0.0) == 1.0
        assert sk.get_quantile(1.0) == 10.0

    def test_accuracy(self):
        sk = TDigestSketch(200)
        rng = np.random.default_rng(42)
        vals = rng.normal(0, 1, 200_000)
        sk.update(vals)
        assert sk.get_quantile(0.5) == pytest.approx(np.quantile(vals, 0.5), abs=0.02)
        assert sk.get_quantile(0.999) == pytest.approx(np.quantile(vals, 0.999), abs=0.05)
        assert sk.get_rank(0.0) == pytest.approx(0.5, abs=0.01)

    def test_merge(self):
        a, b = TDigestSketch(100), TDigestSketch(100)
        a.update(np.arange(0.0, 1000.0))
        b.update(np.arange(1000.0, 2000.0))
        a.merge(TDigestSketch.deserialize(b.serialize()))
        assert a.total_weight() == 2000
        assert a.get_quantile(0.5) == pytest.approx(1000.0, rel=0.05)

    def test_cdf(self):
        sk = TDigestSketch(100)
        sk.update(np.arange(1.0, 101.0))
        cdf = sk.get_cdf([50.0])
        assert len(cdf) == 2 and cdf[1] == 1.0
        assert cdf[0] == pytest.approx(0.5, abs=0.05)

    def test_update_then_merge_flushes_buffer(self):
        # regression: merge() must flush self's pending update buffer
        # before concatenating centroids -- the sorted-merge fast path
        # in _compress requires self.means sorted, and an unsorted
        # concatenation gave silently wrong quantiles
        rng = np.random.default_rng(11)
        a_vals = rng.normal(60_000, 5_000, 3_000)
        b_vals = rng.normal(40_000, 5_000, 3_000)
        a, b = TDigestSketch(100), TDigestSketch(100)
        b.update(b_vals)
        a.update(a_vals)  # stays buffered: 3k < compress threshold
        assert a._buf, "precondition: update left a pending buffer"
        a.merge(b)
        exact = np.quantile(np.concatenate([a_vals, b_vals]), 0.5)
        assert a.get_quantile(0.5) == pytest.approx(exact, rel=0.01)
        assert a.total_weight() == 6_000


# ---------------- HLL / CPC ---------------------------------------------


@pytest.mark.parametrize("cls", [HllSketch, CpcSketch])
class TestCounting:
    def test_exact_sparse(self, cls):
        sk = cls(12)
        sk.update_values(pd.Series(["a", "b", "c", "a"]))
        assert sk.get_estimate() == 3.0

    def test_dense_band(self, cls):
        sk = cls(12)
        sk.update_values(np.arange(100_000, dtype=np.int64))
        est = sk.get_estimate()
        assert 95_000 <= est <= 105_000  # reference ±5% gate at lg_k=12
        assert sk.get_bound(2, False) <= est <= sk.get_bound(2, True)

    def test_union_disjoint(self, cls):
        a, b = cls(12), cls(12)
        a.update_values(np.arange(0, 30_000, dtype=np.int64))
        b.update_values(np.arange(30_000, 60_000, dtype=np.int64))
        a.merge(cls.deserialize(b.serialize()))
        assert a.get_estimate() == pytest.approx(60_000, rel=0.05)

    def test_union_overlap(self, cls):
        a, b = cls(12), cls(12)
        a.update_values(np.arange(0, 50_000, dtype=np.int64))
        b.update_values(np.arange(25_000, 75_000, dtype=np.int64))
        a.merge(b)
        assert a.get_estimate() == pytest.approx(75_000, rel=0.05)

    def test_mixed_k_union(self, cls):
        # reference unions k=8 and k=14 sketches (datasketch_hll.test:224-234)
        a, b = cls(8), cls(14)
        a.update_values(np.arange(0, 20_000, dtype=np.int64))
        b.update_values(np.arange(10_000, 30_000, dtype=np.int64))
        a.merge(b)
        assert a.get_estimate() == pytest.approx(30_000, rel=0.25)

    def test_roundtrip(self, cls):
        sk = cls(10)
        sk.update_values(np.arange(5_000, dtype=np.int64))
        rt = cls.deserialize(sk.serialize())
        assert rt.get_estimate() == sk.get_estimate()


def test_cpc_smaller_than_hll():
    h, c = HllSketch(12), CpcSketch(12)
    data = np.arange(100_000, dtype=np.int64)
    h.update_values(data)
    c.update_values(data)
    assert len(c.serialize()) < len(h.serialize())


# ---------------- Frequent Items ----------------------------------------


class TestFrequentItems:
    def test_exact_counts(self):
        sk = FrequentItemsSketch()
        sk.update_series(pd.Series(["apple"] * 3 + ["banana"] * 2 + ["cherry"]))
        assert sk.get_estimate("apple") == 3
        assert sk.get_estimate("banana") == 2
        assert sk.get_estimate("missing") == 0
        assert sk.total_weight() == 6
        assert sk.num_active == 3
        rows = sk.get_frequent_items()
        assert [r[0] for r in rows] == ["apple", "banana", "cherry"]
        assert [r[1] for r in rows] == [3, 2, 1]

    def test_epsilon(self):
        assert FrequentItemsSketch(10).epsilon == pytest.approx(0.00341796875)

    def test_heavy_hitter_survives_purge(self):
        # 100x heavy hitter among 2000 singletons at lg_k=6
        # (docs/README.md:1284-1310)
        sk = FrequentItemsSketch(6)
        items = ["heavy_hitter"] * 100 + [f"noise_{i}" for i in range(2000)]
        sk.update_series(pd.Series(items))
        assert sk.get_estimate("heavy_hitter") >= 100
        assert sk.get_lower_bound("heavy_hitter") <= 100 <= sk.get_upper_bound("heavy_hitter")
        rows = sk.get_frequent_items("NO_FALSE_POSITIVES")
        assert rows and rows[0][0] == "heavy_hitter"

    def test_numeric_canonicalization(self):
        sk = FrequentItemsSketch()
        sk.update_series(pd.Series([5, 5, 7], dtype=np.int64))
        assert sk.get_estimate(5) == 2
        assert sk.get_estimate("5") == 2
        skf = FrequentItemsSketch()
        skf.update_series(pd.Series([1.5, 1.5]))
        assert skf.get_estimate(1.5) == 2
        assert skf.get_estimate("1.500000") == 2

    def test_merge_exact(self):
        a, b = FrequentItemsSketch(), FrequentItemsSketch()
        a.update_series(pd.Series(["x"] * 5 + ["y"]))
        b.update_series(pd.Series(["x"] * 3 + ["z"]))
        a.merge(FrequentItemsSketch.deserialize(b.serialize()))
        assert a.get_estimate("x") == 8
        assert a.total_weight() == 10

    def test_bad_error_type(self):
        sk = FrequentItemsSketch()
        with pytest.raises(ValueError):
            sk.get_frequent_items("BOGUS")


# ---------------- framing ------------------------------------------------


def test_deserialize_any_dispatch():
    sk = ThetaSketch()
    sk.update_values(np.arange(10, dtype=np.int64))
    assert isinstance(deserialize_any(sk.serialize()), ThetaSketch)
    kll = KllSketch(200, "float64")
    kll.update(np.arange(10.0))
    assert isinstance(deserialize_any(kll.serialize()), KllSketch)
    with pytest.raises(SketchDeserializeError):
        deserialize_any(b"not a sketch")


def test_k_validation_ranges():
    with pytest.raises(ValueError):
        KllSketch(0, "float64")
    with pytest.raises(ValueError):
        KllSketch(32769, "float64")
    with pytest.raises(ValueError):
        ReqSketch(3, "float64")  # odd
    with pytest.raises(ValueError):
        ReqSketch(2048, "float64")
    with pytest.raises(ValueError):
        HllSketch(3)
    with pytest.raises(ValueError):
        HllSketch(22)
    with pytest.raises(ValueError):
        CpcSketch(27)
    with pytest.raises(ValueError):
        TDigestSketch(0)


class TestPublishedErrorContracts:
    """Empirical checks against BASELINE.md's published accuracy rows
    (reference docs/README.md:532 KLL ~1.33% @ K=200; :683 REQ ~1%
    tail relative error @ K=12)."""

    def test_kll_k200_rank_error_band(self):
        rng = np.random.RandomState(7)
        sk = KllSketch(200, "float64")
        data = rng.rand(100_000)
        sk.update(data)
        worst = 0.0
        for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
            true_val = np.quantile(data, q)
            est_rank = sk.get_rank(true_val, True)
            worst = max(worst, abs(est_rank - q))
        # published single-sided error ~1.33%; allow 3x slack for one seed
        assert worst < 0.04

    def test_req_tail_relative_error(self):
        rng = np.random.RandomState(11)
        sk = ReqSketch(12, "float64")
        data = rng.rand(100_000)
        sk.update(data)
        for q in (0.95, 0.99, 0.999):
            est = sk.get_quantile(q, True)
            true_val = np.quantile(data, q)
            # ~1% relative RANK error near the tail -> value error is
            # bounded by the local density; uniform data makes them equal
            assert abs(est - true_val) < 0.03

    def test_tdigest_extreme_tail(self):
        rng = np.random.RandomState(13)
        sk = TDigestSketch(200)
        data = rng.rand(100_000)
        sk.update(data)
        for q in (0.001, 0.999):
            assert abs(sk.get_quantile(q) - np.quantile(data, q)) < 0.01


def test_serialized_size_contracts():
    """BASELINE.md size rows: blobs must stay within the reference's
    published sizes (measured 2026-08-13: quantiles 15.7 KB vs the
    reference's 26.7 KB at K=256/N=1M; CPC 54% smaller than HLL vs the
    published ~40%)."""
    rng = np.random.RandomState(0)
    data = rng.rand(1_000_000)
    q = QuantilesSketch(256, "float64")
    q.update(data)
    assert len(q.serialize()) <= 26_664  # reference docs/README.md:262-297

    keys = rng.randint(0, 1 << 40, 1_000_000)
    h = HllSketch(12)
    h.update_values(keys)
    assert len(h.serialize()) <= 4096 + 64
    # CPC's ">=40% smaller" pitch is at EQUAL ACCURACY: real-CPC ICON
    # RSE is 0.7213/sqrt(k) vs HLL's 1.04/sqrt(k), so CPC at lg_k=11
    # (1.59% err) matches HLL at lg_k=12 (1.63% err) — and its
    # window+surprise blob must be >=40% smaller than that HLL
    c = CpcSketch(11)
    c.update_values(keys)
    assert len(c.serialize()) <= 0.6 * len(h.serialize())
    # same-lg_k form is still strictly smaller (despite 2.3x better
    # accuracy per key at equal lg_k... the bitmap holds more info)
    c12 = CpcSketch(12)
    c12.update_values(keys)
    assert len(c12.serialize()) < len(h.serialize())

    t = ThetaSketch(12)
    t.update_values(keys)
    assert len(t.serialize()) <= (1 << 12) * 8 + 64  # bounded at nominal


class TestStatsSketch:
    """Exact mergeable summary stats (sketches/stats.py) — the family
    that lets profile_table fold exact metadata into the same single
    scan as its Theta/KLL sketches."""

    def test_null_counting_and_numeric(self):
        import pandas as pd
        from datasketches_spark.sketches import StatsSketch

        sk = StatsSketch()
        sk.update_series(pd.Series([3, None, 1, 7, None], dtype="float64"))
        assert (sk.get_n(), sk.get_nonnull()) == (5, 3)
        assert (sk.get_min(), sk.get_max()) == (1.0, 7.0)
        assert sk.get_sum() == 11.0

    def test_merge_order_invariant_and_roundtrip(self):
        import pandas as pd
        from datasketches_spark.sketches import StatsSketch

        parts = []
        rng = np.random.RandomState(7)
        all_vals = []
        for _ in range(5):
            vals = rng.randint(0, 1000, 200).astype(float)
            vals[rng.rand(200) < 0.1] = np.nan
            all_vals.append(vals)
            p = StatsSketch()
            p.update_series(pd.Series(vals))
            parts.append(StatsSketch.deserialize(p.serialize()))
        merged = StatsSketch()
        for p in reversed(parts):
            merged.merge(p)
        flat = np.concatenate(all_vals)
        assert merged.get_n() == flat.size
        assert merged.get_nonnull() == int(np.sum(~np.isnan(flat)))
        assert merged.get_min() == float(np.nanmin(flat))
        assert merged.get_max() == float(np.nanmax(flat))

    def test_string_minmax_and_empty(self):
        import pandas as pd
        from datasketches_spark.sketches import StatsSketch

        sk = StatsSketch()
        sk.update_series(pd.Series(["pear", None, "apple", "zed"]))
        blob = sk.serialize()
        rt = StatsSketch.deserialize(blob)
        assert (rt.get_min(), rt.get_max()) == ("apple", "zed")
        assert rt.get_sum() is None
        empty = StatsSketch.deserialize(StatsSketch().serialize())
        assert empty.is_empty is True and empty.get_min() is None

    def test_corrupt_blob(self):
        from datasketches_spark.sketches import StatsSketch
        from datasketches_spark.sketches.base import SketchDeserializeError

        with pytest.raises(SketchDeserializeError, match="Failed to deserialize"):
            StatsSketch.deserialize(b"DSKSxx")

    def test_binary_input_raises_type_error(self):
        # build-path bytes is an unsupported-input condition, not blob
        # corruption -- must NOT read as SketchDeserializeError
        import pandas as pd
        from datasketches_spark.sketches import StatsSketch

        sk = StatsSketch()
        with pytest.raises(TypeError, match="unsupported input type"):
            sk.update_series(pd.Series(["x", b"\x00\x01", "y"]))

    def test_all_null_blob_series_merges_empty(self):
        # an all-NULL blob series in merge context is an empty state,
        # not len(series) NULL data rows (families.update_sketch hint)
        import pandas as pd
        from datasketches_spark.families import create_sketch, update_sketch

        sk = create_sketch("stats", {})
        update_sketch("stats", sk, pd.Series([None, None], dtype=object), merge=True)
        assert sk.is_empty and sk.get_n() == 0


class TestDtypePromotion:
    """Mixed-dtype quantile-family merges: pandas renders a nullable
    int batch as float64, so same-column partials can disagree —
    promote to float64 (exact below 2^53) instead of failing."""

    def _int_sk(self, cls, vals, k=64):
        sk = cls(k, "int64")
        sk.update(np.array(vals, dtype=np.int64))
        return sk

    def _f64_sk(self, cls, vals, k=64):
        sk = cls(k, "float64")
        sk.update(np.array(vals, dtype=np.float64))
        return sk

    @pytest.mark.parametrize(
        "cls", [KllSketch, QuantilesSketch, ReqSketch]
    )
    def test_int_float_merge_promotes(self, cls):
        a = self._int_sk(cls, [1, 2, 3, 10])
        b = self._f64_sk(cls, [4.0, 5.0])
        a.merge(b)
        assert a.dtype == "float64"
        assert a.n == 6
        assert float(a.min_item) == 1.0 and float(a.max_item) == 10.0
        # exact mode: every value retained, exactly representable
        got = sorted(float(x) for lv in a.levels for x in lv)
        assert got == [1.0, 2.0, 3.0, 4.0, 5.0, 10.0]

    @pytest.mark.parametrize(
        "cls", [KllSketch, QuantilesSketch, ReqSketch]
    )
    def test_float_accumulator_absorbs_int_partial(self, cls):
        a = self._f64_sk(cls, [4.0])
        b = self._int_sk(cls, [1, 2])
        a.merge(b)
        assert a.dtype == "float64" and a.n == 3

    def test_empty_partial_any_dtype_is_noop(self):
        a = self._int_sk(KllSketch, [1, 2])
        b = KllSketch(64, "float64")  # default-dtype EMPTY partial
        a.merge(b)
        assert a.dtype == "int64" and a.n == 2

    def test_beyond_2_53_refuses_promotion(self):
        big = (1 << 60) + 1
        a = self._int_sk(KllSketch, [big])
        b = self._f64_sk(KllSketch, [1.5])
        with pytest.raises(ValueError, match="2\\^53"):
            a.merge(b)
        with pytest.raises(ValueError, match="2\\^53"):
            b.merge(a)
