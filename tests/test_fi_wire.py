"""Apache DataSketches frequent-items wire-format verification.

Golden blobs captured from datasketches-java 6.2.0
(``ItemsSketch<String>.toByteArray(new ArrayOfStringsSerDe())``), plus
live JVM cross-validation both directions.  Stored per-item counts are
LOWER bounds in both engines (verified empirically: java stored=1
est=978 lb=1 ub=978 at offset 977), so counts map across directly.
"""

from __future__ import annotations

import numpy as np
import pytest

from datasketches_spark.sketches.base import SketchDeserializeError
from datasketches_spark.sketches.frequent_items import FrequentItemsSketch


# ------------------------------------------------- golden blobs (java 6.2.0)

# new ItemsSketch<String>(64) with no updates
_GOLDEN_EMPTY = "01010a0603050000"
# ... update("apple",3); update("banana",2); update("cherry",1)
_GOLDEN_THREE = (
    "04010a060300000003000000000000000600000000000000000000000000000003"
    "0000000000000002000000000000000100000000000000050000006170706c6506"
    "00000062616e616e6106000000636865727279"
)


def _build(pairs, lg_max_k=6) -> FrequentItemsSketch:
    sk = FrequentItemsSketch(lg_max_k)
    for item, w in pairs:
        sk.update_counts(np.array([item], dtype=object), np.array([w]))
    return sk


def test_empty_byte_parity():
    assert FrequentItemsSketch(6).to_wire().hex() == _GOLDEN_EMPTY


def test_reads_java_blob():
    sk = FrequentItemsSketch.from_wire(bytes.fromhex(_GOLDEN_THREE))
    assert sk.lg_max_k == 6 and sk.offset == 0
    assert sk.total_weight() == 6 and sk.num_active == 3
    assert sk.get_estimate("apple") == 3
    assert sk.get_estimate("banana") == 2
    assert sk.get_estimate("cherry") == 1
    # deserialize() sniffs wire blobs (no DSKS frame required)
    sk2 = FrequentItemsSketch.deserialize(bytes.fromhex(_GOLDEN_THREE))
    assert sk2.get_estimate("apple") == 3


def test_exact_mode_roundtrip_matches_java_bytes_semantically():
    ours = _build([("apple", 3), ("banana", 2), ("cherry", 1)])
    rt = FrequentItemsSketch.from_wire(ours.to_wire())
    assert rt.counts == ours.counts
    assert rt.total_weight() == 6 and rt.offset == 0


def test_purged_roundtrip():
    sk = FrequentItemsSketch(3)
    for i in range(100):
        sk.update_counts(np.array([f"item{i}"], dtype=object), np.array([i + 1]))
    assert sk.offset > 0
    rt = FrequentItemsSketch.from_wire(sk.to_wire())
    assert rt.counts == sk.counts
    assert rt.offset == sk.offset
    assert rt.total_weight() == sk.total_weight()
    assert rt.get_frequent_items() == sk.get_frequent_items()


def test_corrupt_raises_reference_message():
    with pytest.raises(SketchDeserializeError, match="Failed to deserialize Freq"):
        FrequentItemsSketch.from_wire(b"\xde\xad\xbe\xef\xde\xad\xbe\xef")
    with pytest.raises(SketchDeserializeError, match="Failed to deserialize Freq"):
        FrequentItemsSketch.deserialize(b"\x00\x01\x02")


def test_unicode_items_survive_wire():
    ours = _build([("héllo", 5), ("日本語", 2)])
    rt = FrequentItemsSketch.from_wire(ours.to_wire())
    assert rt.get_estimate("héllo") == 5
    assert rt.get_estimate("日本語") == 2


# ------------------------------------------------ live JVM cross-validation


@pytest.fixture(scope="module")
def jvm_fi(spark):
    jvm = spark.sparkContext._jvm
    serde = jvm.org.apache.datasketches.common.ArrayOfStringsSerDe()
    ItemsSketch = jvm.org.apache.datasketches.frequencies.ItemsSketch

    def build(pairs, max_map_size=64):
        sk = ItemsSketch(max_map_size)
        for item, w in pairs:
            sk.update(item, int(w))
        return sk

    def load(blob: bytes):
        mem = jvm.org.apache.datasketches.memory.Memory.wrap(blob)
        return ItemsSketch.getInstance(mem, serde)

    return jvm, serde, build, load


def test_live_jvm_purged_blob_parses_identically(jvm_fi):
    _, serde, build, _ = jvm_fi
    jsk = build([(f"item{i}", i + 1) for i in range(100)], max_map_size=8)
    assert jsk.getMaximumError() > 0
    ours = FrequentItemsSketch.from_wire(bytes(jsk.toByteArray(serde)))
    assert ours.total_weight() == jsk.getStreamLength()
    assert ours.offset == jsk.getMaximumError()
    assert ours.num_active == jsk.getNumActiveItems()
    for item in list(ours.counts):
        assert ours.get_estimate(item) == jsk.getEstimate(item)
        assert ours.get_lower_bound(item) == jsk.getLowerBound(item)
        assert ours.get_upper_bound(item) == jsk.getUpperBound(item)


def test_live_jvm_reads_our_blob(jvm_fi):
    _, serde, _, load = jvm_fi
    sk = FrequentItemsSketch(3)
    for i in range(100):
        sk.update_counts(np.array([f"w{i}"], dtype=object), np.array([i + 1]))
    assert sk.offset > 0
    jsk = load(sk.to_wire())
    assert jsk.getStreamLength() == sk.total_weight()
    assert jsk.getMaximumError() == sk.offset
    assert jsk.getNumActiveItems() == sk.num_active
    for item in list(sk.counts):
        assert jsk.getEstimate(item) == sk.get_estimate(item)


def test_live_jvm_empty_byte_parity(jvm_fi):
    _, serde, build, _ = jvm_fi
    assert FrequentItemsSketch(6).to_wire() == bytes(build([]).toByteArray(serde))
    assert FrequentItemsSketch(4).to_wire() == bytes(
        build([], max_map_size=16).toByteArray(serde)
    )


def test_live_jvm_cross_merge(jvm_fi):
    """java merging OUR blob must agree with us merging java's blob."""
    _, serde, build, load = jvm_fi
    jsk = build([("a", 10), ("b", 5)])
    local = _build([("b", 7), ("c", 2)])
    # java side: merge our wire blob in
    jsk.merge(load(local.to_wire()))
    # our side: merge java's blob in
    merged = FrequentItemsSketch.from_wire(bytes(build([("a", 10), ("b", 5)]).toByteArray(serde)))
    merged.merge(local)
    assert jsk.getStreamLength() == merged.total_weight() == 24
    for item in ("a", "b", "c"):
        assert jsk.getEstimate(item) == merged.get_estimate(item)
