"""Property-based tests (hypothesis) for the sketch cores.

Invariants the reference's design guarantees and our engine must too:
exactness below the sketch threshold, merge order-independence of
estimates, weight conservation, bound ordering, serialization
round-trip identity.
"""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from datasketches_spark.sketches import (
    FrequentItemsSketch,
    HllSketch,
    KllSketch,
    ThetaSketch,
)

ints = st.lists(st.integers(-(2**62), 2**62), min_size=0, max_size=300)
floats = st.lists(
    st.floats(allow_nan=False, allow_infinity=False, width=64), min_size=1, max_size=300
)


@settings(max_examples=50, deadline=None)
@given(ints)
def test_theta_exact_below_k(values):
    sk = ThetaSketch(12)
    sk.update_values(np.array(values, dtype=np.int64))
    assert sk.get_estimate() == len(set(values))


@settings(max_examples=30, deadline=None)
@given(ints, ints)
def test_theta_merge_order_independent(a, b):
    s1, s2 = ThetaSketch(12), ThetaSketch(12)
    s1.update_values(np.array(a, dtype=np.int64))
    s2.update_values(np.array(b, dtype=np.int64))
    m1, m2 = ThetaSketch(12), ThetaSketch(12)
    m1.merge(s1)
    m1.merge(s2)
    m2.merge(s2)
    m2.merge(s1)
    assert m1.get_estimate() == m2.get_estimate() == len(set(a) | set(b))


@settings(max_examples=30, deadline=None)
@given(ints)
def test_theta_roundtrip(values):
    sk = ThetaSketch(10)
    sk.update_values(np.array(values, dtype=np.int64))
    rt = ThetaSketch.deserialize(sk.serialize())
    assert rt.get_estimate() == sk.get_estimate()
    assert rt.get_theta() == sk.get_theta()


@settings(max_examples=50, deadline=None)
@given(floats)
def test_kll_exact_stats_always(values):
    sk = KllSketch(200, "float64")
    sk.update(np.array(values))
    arr = np.array(values)
    assert sk.n == len(values)
    assert sk.get_min_item() == arr.min()
    assert sk.get_max_item() == arr.max()
    q = sk.get_quantile(0.5)
    assert arr.min() <= q <= arr.max()
    assert 0.0 <= sk.get_rank(float(np.median(arr))) <= 1.0


@settings(max_examples=30, deadline=None)
@given(floats, floats)
def test_kll_merge_conserves_n(a, b):
    s1, s2 = KllSketch(128, "float64"), KllSketch(128, "float64")
    s1.update(np.array(a))
    s2.update(np.array(b))
    s1.merge(KllSketch.deserialize(s2.serialize()))
    assert s1.n == len(a) + len(b)
    assert s1.get_min_item() == min(np.min(a), np.min(b))
    assert s1.get_max_item() == max(np.max(a), np.max(b))


@settings(max_examples=40, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=10), min_size=0, max_size=200))
def test_frequent_items_exact_under_capacity(items):
    sk = FrequentItemsSketch(10)  # capacity 768 > max distinct here
    sk.update_series(pd.Series(items, dtype=object))
    assert sk.total_weight() == len(items)
    from collections import Counter

    for item, cnt in Counter(items).items():
        assert sk.get_estimate(item) == cnt
        assert sk.get_lower_bound(item) <= cnt <= sk.get_upper_bound(item)


@settings(max_examples=30, deadline=None)
@given(ints)
def test_hll_sparse_exact_and_bounds(values):
    sk = HllSketch(12)
    sk.update_values(np.array(values, dtype=np.int64))
    d = len(set(values))
    if d <= 2048:  # sparse limit at lg_k=12
        assert sk.get_estimate() == d
    assert sk.get_bound(3, False) <= sk.get_estimate() <= sk.get_bound(3, True)


@settings(max_examples=20, deadline=None)
@given(ints, st.integers(4, 16), st.integers(4, 16))
def test_hll_mixed_k_union_estimate_sane(values, k1, k2):
    if not values:
        return
    a, b = HllSketch(k1), HllSketch(k2)
    half = len(values) // 2
    a.update_values(np.array(values[:half] or [0], dtype=np.int64))
    b.update_values(np.array(values[half:] or [0], dtype=np.int64))
    a.merge(b)
    assert a.get_estimate() >= 0.0
    assert a.lg_k == min(k1, k2) or a.mode == 0


# ---------------- Bloom filter (beyond-reference) ----------------------


@settings(max_examples=50, deadline=None)
@given(ints)
def test_bloom_never_false_negative(values):
    from datasketches_spark.sketches import BloomFilterSketch

    sk = BloomFilterSketch(lg_m=12)
    s = pd.Series(values, dtype=object)
    sk.update_values(s)
    if values:
        assert sk.contains_values(pd.Series(values, dtype=object)).all()
    assert sk.is_empty == (len(values) == 0)


@settings(max_examples=30, deadline=None)
@given(ints, ints)
def test_bloom_union_is_commutative_superset(a, b):
    from datasketches_spark.sketches import BloomFilterSketch, bloom_union

    sa, sb = BloomFilterSketch(lg_m=12), BloomFilterSketch(lg_m=12)
    sa.update_values(pd.Series(a, dtype=object))
    sb.update_values(pd.Series(b, dtype=object))
    u1, u2 = bloom_union(sa, sb), bloom_union(sb, sa)
    assert (u1.bits == u2.bits).all()
    both = a + b
    if both:
        assert u1.contains_values(pd.Series(both, dtype=object)).all()


@settings(max_examples=30, deadline=None)
@given(ints)
def test_bloom_roundtrip(values):
    from datasketches_spark.sketches import BloomFilterSketch

    sk = BloomFilterSketch(lg_m=10, num_hashes=3)
    sk.update_values(pd.Series(values, dtype=object))
    back = BloomFilterSketch.deserialize(sk.serialize())
    assert (back.bits == sk.bits).all()
    assert back.num_hashes == 3 and back.lg_m == 10


# ---------------- Reservoir sample (beyond-reference) ------------------


@settings(max_examples=50, deadline=None)
@given(ints)
def test_reservoir_exact_below_k_any_split(values):
    from datasketches_spark.sketches import ReservoirSampleSketch

    mid = len(values) // 2
    a, b = ReservoirSampleSketch(k=400), ReservoirSampleSketch(k=400)
    a.update_series(pd.Series(values[:mid], dtype=object))
    b.update_series(pd.Series(values[mid:], dtype=object))
    a.merge(b)
    assert a.n == len(values)
    assert sorted(a.get_items()) == sorted(str(v) for v in values)


@settings(max_examples=30, deadline=None)
@given(ints, st.integers(1, 20))
def test_reservoir_size_invariants(values, k):
    from datasketches_spark.sketches import ReservoirSampleSketch

    sk = ReservoirSampleSketch(k=k)
    sk.update_series(pd.Series(values, dtype=object))
    assert sk.num_retained == min(k, len(values))
    assert sk.n == len(values)
    assert set(sk.get_items()) <= {str(v) for v in values}
    back = type(sk).deserialize(sk.serialize())
    assert back.get_items() == sk.get_items() and back.n == sk.n


# ---------------- deserialization fuzz (all families) ------------------


@settings(max_examples=80, deadline=None)
@given(st.integers(1, 11), st.binary(min_size=0, max_size=64))
def test_framed_garbage_never_crashes(family_byte, junk):
    """A well-framed blob with arbitrary payload either parses or
    raises SketchDeserializeError -- never an unhandled exception."""
    from datasketches_spark.sketches import deserialize_any
    from datasketches_spark.sketches.base import SketchDeserializeError, frame

    blob = frame(family_byte, junk)
    try:
        deserialize_any(blob)
    except SketchDeserializeError:
        pass


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=64))
def test_unframed_garbage_rejected(junk):
    from datasketches_spark.sketches import deserialize_any
    from datasketches_spark.sketches.base import SketchDeserializeError

    try:
        deserialize_any(junk)
        assert False, "garbage accepted"
    except SketchDeserializeError:
        pass


# ---------------- Count-Min (beyond-reference) -------------------------


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(0, 50), min_size=0, max_size=400))
def test_cms_never_undercounts_any_split(values):
    from datasketches_spark.sketches import CountMinSketch

    mid = len(values) // 2
    a, b = CountMinSketch(lg_w=8, depth=4), CountMinSketch(lg_w=8, depth=4)
    a.update_series(pd.Series(values[:mid], dtype=object))
    b.update_series(pd.Series(values[mid:], dtype=object))
    a.merge(b)
    assert a.total_weight() == len(values)
    from collections import Counter

    true = Counter(str(v) for v in values)
    for item, cnt in true.items():
        assert a.get_estimate(item) >= cnt  # one-sided guarantee
    rt = CountMinSketch.deserialize(a.serialize())
    assert (rt.counts == a.counts).all()
