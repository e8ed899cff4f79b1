"""Bloom-filter runtime pruning: semi-join reduction without a shuffle.

The classic 100 TB pattern: a huge fact table must be reduced to rows
whose key appears in a (relatively) small dimension/allowlist before an
expensive downstream join or shuffle.  A real semi-join shuffles the
fact side; broadcasting the raw keyset is limited by driver memory.  A
Bloom filter of the keyset is a few KB-MB regardless of key count, so:

  phase 1: two-phase sketch build over the dim keys (blob-only shuffle)
  phase 2: broadcast the single filter row; probe it with an
           Arrow-vectorized UDF — the fact table streams through its
           scan, no shuffle, no driver collect of the keyset.

False positives pass the filter (tune via ``lg_m``) — downstream exact
joins stay correct, they just see slightly more rows; false negatives
cannot occur, so no matching row is ever lost.  This mirrors what
Spark's AQE runtime filter / ``InjectRuntimeFilter`` does internally
with ``BloomFilterAggregate`` (not exposed to the public SQL registry
in this build), but works on any DataFrame pair and any key expression,
and the filter itself is a storable, mergeable sketch column.
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

from . import compat
from .aggregation import sketch_agg
from .families import coerce_value_batch
from .sketches import BloomFilterSketch


def _declared_kind(fact: DataFrame, fact_key) -> "str | None":
    """``"int64"`` when the probe key is a DECLARED integral column —
    the probe must undo pandas' null-driven float64 rendering (5 int
    and 5.0 double hash differently) exactly like the build side's
    :func:`~datasketches_spark.families.coerce_value_batch` does.
    Column expressions (unresolvable here) keep the raw dtype."""
    if isinstance(fact_key, Column):
        return None
    try:
        return (
            "int64"
            if isinstance(fact.schema[fact_key].dataType, _INTEGRAL)
            else None
        )
    except Exception:
        return None


def bloom_filter_of(
    df: DataFrame, key_col: str, lg_m: int = 22, output_col: str = "sketch"
) -> DataFrame:
    """One-row DataFrame holding a Bloom filter of ``df[key_col]``."""
    return sketch_agg(df, key_col, "bloom", k=lg_m, output_col=output_col)


def bloom_filter_blob(
    df: DataFrame, key_col: str, lg_m: int = 22, driver_merge: bool | None = None
) -> bytes:
    """The serialized filter bytes, built distributed.

    Two merge strategies, picked by the (partitions x blob-size)
    product when ``driver_merge`` is None:

    - **driver merge** (small filters / bounded parallelism): phase-1
      partials are collected and OR-merged on the driver — one job,
      one Python stage, NO shuffle.  Collected bytes are
      partitions * 2^lg_m/8, so this is gated at ~64 MB.
    - **two-phase** (wide clusters / big filters): the blob-only
      shuffle merge; the driver receives exactly one blob regardless
      of cluster width.

    Measured (sf0.1, local[32]): the driver-merge path saves the whole
    merge stage, ~0.15 s off the build job.
    """
    from .aggregation import sketch_partial

    if driver_merge is None:
        # one partial per INPUT PARTITION (not per core): gate on the
        # actual scan partition count so the collect stays bounded on
        # wide scans (getNumPartitions plans but runs no job)
        parts = compat.scan_partitions(df)
        # unknown width (Spark Connect): the blob-only shuffle merge is
        # bounded at any cluster width, so it is the safe default
        driver_merge = parts is not None and parts * (1 << lg_m) // 8 <= (64 << 20)
    if not driver_merge:
        return bloom_filter_of(df, key_col, lg_m=lg_m).collect()[0]["sketch"]
    rows = sketch_partial(df, key_col, "bloom", k=lg_m).collect()
    if not rows:
        return BloomFilterSketch(lg_m).serialize()
    out = BloomFilterSketch.deserialize(rows[0]["sketch"])
    for r in rows[1:]:
        out.merge(BloomFilterSketch.deserialize(r["sketch"]))
    return out.serialize()


def bloom_prune_with(
    fact: DataFrame, fact_key, blob: bytes, invert: bool = False
) -> DataFrame:
    """Filter ``fact`` by a pre-built Bloom filter blob.

    The blob travels to executors as a task broadcast (bounded size:
    2^lg_m/8 bytes regardless of key count) and is deserialized ONCE
    per Python worker — never shipped per-row through Arrow, which is
    what makes probing O(keys) instead of O(keys x filter_size).

    ``invert=True`` keeps only *definitely-unseen* keys (Bloom
    negatives are exact) — the dedup/novelty direction; NULL keys are
    dropped either way.
    """
    key = fact_key if isinstance(fact_key, Column) else F.col(fact_key)
    kind = _declared_kind(fact, fact_key)
    bc = compat.broadcast_value(fact.sparkSession, bytes(blob))
    holder: list[BloomFilterSketch] = []

    @pandas_udf("boolean")
    def probe(keys: pd.Series) -> pd.Series:
        if not holder:
            holder.append(BloomFilterSketch.deserialize(bc.value))
        sk = holder[0]
        out = pd.Series(False, index=keys.index)
        ok = keys.notna()
        if ok.any():
            hits = sk.contains_values(coerce_value_batch(keys[ok], kind))
            out[ok] = ~hits if invert else hits
        return out

    return fact.where(probe(key))


def bloomfilter_blob(
    df: DataFrame,
    key_col: str,
    lg_m: int = 22,
    num_hashes: int = 6,
    seed: int = 9001,
    driver_merge: bool | None = None,
) -> bytes:
    """Apache-wire BloomFilter bytes of ``df[key_col]``, built
    distributed (sketches/bloom_apache.py — XXH64 bits byte-identical
    to datasketches-java, so the returned blob is directly loadable by
    ANY DataSketches system: the cross-system runtime-filter hand-off).

    Same merge-strategy gate as :func:`bloom_filter_blob`: driver
    OR-merge of phase-1 partials while partitions x filter bytes stay
    bounded, the blob-only shuffle otherwise.  ``num_hashes`` and
    ``seed`` flow into BOTH build paths (a filter meant to union with
    an existing java-side filter must match its full geometry)."""
    import pandas as pd  # noqa: PLC0415

    from .aggregation import sketch_merge  # noqa: PLC0415
    from .sketches import ApacheBloomFilter  # noqa: PLC0415

    num_bits = 1 << lg_m

    def build(batches):
        sk = ApacheBloomFilter(num_bits, num_hashes, seed)
        for pdf in batches:
            sk.update_series(pdf[key_col])
        yield pd.DataFrame({"sketch": [sk.to_wire()]})

    partial = df.select(key_col).mapInPandas(build, "sketch binary")
    if driver_merge is None:
        parts = compat.scan_partitions(df)
        driver_merge = parts is not None and parts * num_bits // 8 <= (64 << 20)
    if not driver_merge:
        # blob-only shuffle merge; the empty accumulator adopts the
        # partials' geometry on the first union
        return sketch_merge(partial, "bloomfilter", k=lg_m).collect()[0][
            "sketch"
        ]
    rows = partial.collect()
    if not rows:
        return ApacheBloomFilter(num_bits, num_hashes, seed).to_wire()
    out = ApacheBloomFilter.from_wire(bytes(rows[0]["sketch"]))
    for r in rows[1:]:
        out.union(ApacheBloomFilter.from_wire(bytes(r["sketch"])))
    return out.to_wire()


def bloomfilter_prune_with(
    fact: DataFrame, fact_key, blob: bytes, invert: bool = False
) -> DataFrame:
    """:func:`bloom_prune_with`, Apache-wire edition: the broadcast
    blob may come from THIS engine or from any other DataSketches
    system (java/cpp/py BloomFilter.toByteArray()) — probe semantics
    are bit-identical either way."""
    from .sketches import ApacheBloomFilter  # noqa: PLC0415

    key = fact_key if isinstance(fact_key, Column) else F.col(fact_key)
    kind = _declared_kind(fact, fact_key)
    bc = compat.broadcast_value(fact.sparkSession, bytes(blob))
    holder: list = []

    @pandas_udf("boolean")
    def probe(keys: pd.Series) -> pd.Series:
        if not holder:
            holder.append(ApacheBloomFilter.from_wire(bc.value))
        sk = holder[0]
        out = pd.Series(False, index=keys.index)
        ok = keys.notna()
        if ok.any():
            hits = sk.query_series(coerce_value_batch(keys[ok], kind))
            out[ok] = ~hits if invert else hits
        return out

    return fact.where(probe(key))


# ------------------------- JVM-native fast path (Spark built-in bloom)
#
# Spark ships a BloomFilter (util.sketch.BloomFilterImpl -- the same
# machinery AQE's InjectRuntimeFilter aggregates with) whose BUILD runs
# entirely JVM-side via DataFrameStatFunctions.bloomFilter: one
# all-JVM job over the dim keys, zero Arrow transfer.  Scala-only API,
# so reach it through the DataFrame's underlying _jdf.  The probe side
# re-implements BloomFilterImpl.mightContainLong as vectorized numpy
# (Murmur3_x86_32 over the long's two int halves, h1 + i*h2 double
# hashing) so the fact side still streams through an Arrow-batched
# UDF against broadcast filter bytes.  Integral keys only; the
# portable DSKS sketch path below handles everything else and remains
# the storable/mergeable surface.

_M32_C1 = np.uint32(0xCC9E2D51)
_M32_C2 = np.uint32(0x1B873593)


def _mm32_rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint32(r)) | (x >> np.uint32(32 - r))


def _mm32_hash_long(vals: np.ndarray, seed) -> np.ndarray:
    """Vectorized Murmur3_x86_32.hashLong (uint32 out).  ``seed`` is a
    scalar or per-element uint32 array — the double-hashing scheme
    seeds the second hash with the first."""
    with np.errstate(over="ignore"):
        low = (vals & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        high = (vals >> np.uint64(32)).astype(np.uint32)
        h1 = np.asarray(seed, dtype=np.uint32)
        for half in (low, high):
            k1 = half * _M32_C1
            k1 = _mm32_rotl(k1, 15) * _M32_C2
            h1 = _mm32_rotl(h1 ^ k1, 13) * np.uint32(5) + np.uint32(0xE6546B64)
        h1 ^= np.uint32(8)  # fmix(h1, 8 bytes)
        h1 ^= h1 >> np.uint32(16)
        h1 *= np.uint32(0x85EBCA6B)
        h1 ^= h1 >> np.uint32(13)
        h1 *= np.uint32(0xC2B2AE35)
        h1 ^= h1 >> np.uint32(16)
        return h1


class SparkBloomFilter:
    """Parsed Spark BloomFilter stream, probe-only.

    Handles both wire versions: V1 (BloomFilterImpl — int32
    double-hashing ``h1 + i*h2``) and V2 (BloomFilterImplV2, the
    Spark 4 default — seeded hash pair, int64 accumulator
    ``hi*0x7FFFFFFF + i*lo``).  Layouts recovered from the bundled
    spark-sketch jar's bytecode (writeTo/scatterHashAndGetAllBits)."""

    def __init__(self, version: int, num_hashes: int, seed: int, words: np.ndarray):
        self.version = int(version)
        self.num_hashes = int(num_hashes)
        self.seed = np.uint32(seed & 0xFFFFFFFF)
        self.words = words  # uint64, java BitArray layout

    @classmethod
    def from_bytes(cls, blob: bytes) -> "SparkBloomFilter":
        (version,) = struct.unpack_from(">i", blob, 0)
        if version == 1:
            num_hashes, num_words = struct.unpack_from(">ii", blob, 4)
            seed, off = 0, 12
        elif version == 2:
            num_hashes, seed, num_words = struct.unpack_from(">iii", blob, 4)
            off = 16
        else:
            raise ValueError(f"unsupported Spark BloomFilter version {version}")
        words = np.frombuffer(blob, dtype=">u8", count=num_words, offset=off)
        return cls(version, num_hashes, seed, words.astype(np.uint64))

    def _bit_test(self, idx: np.ndarray, out: np.ndarray) -> None:
        bits = (self.words[idx >> 6] >> (idx.astype(np.uint64) & np.uint64(63))) & np.uint64(1)
        out &= bits.astype(bool)

    def contains_longs(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized mightContainLong over int64 keys."""
        vals = np.ascontiguousarray(keys, dtype=np.int64).view(np.uint64)
        hi = _mm32_hash_long(vals, self.seed)
        lo = _mm32_hash_long(vals, hi)
        bit_size = np.int64(self.words.size * 64)
        out = np.ones(vals.shape, dtype=bool)
        with np.errstate(over="ignore"):
            if self.version == 2:
                hi64 = hi.view(np.int32).astype(np.int64)
                lo64 = lo.view(np.int32).astype(np.int64)
                acc = hi64 * np.int64(0x7FFFFFFF)
                for _ in range(self.num_hashes):
                    acc = acc + lo64
                    comb = np.where(acc < 0, ~acc, acc)
                    self._bit_test(comb % bit_size, out)
            else:
                h1i = hi.view(np.int32).astype(np.int64)
                h2i = lo.view(np.int32).astype(np.int64)
                for i in range(1, self.num_hashes + 1):
                    # int32 wrap-around like java, then flip negatives
                    comb = (h1i + i * h2i).astype(np.int32)
                    comb = np.where(comb < 0, ~comb, comb).astype(np.int64)
                    self._bit_test(comb % bit_size, out)
        return out


def jvm_bloom_filter_bytes(
    df: DataFrame, key_col: str, lg_m: int = 22, num_hashes: int = 6
) -> bytes:
    """Serialized Spark BloomFilter of an integral key column, built by
    the JVM in one job (no Python, no Arrow).  ``2^lg_m`` bits;
    expectedNumItems is back-derived so java picks ``num_hashes``
    hash functions (k = round(numBits/n * ln 2))."""
    if not compat.has_jvm(df):
        raise RuntimeError(
            "engine='jvm' needs a classic py4j session "
            "(DataFrameStatFunctions.bloomFilter is Scala-only); use "
            "engine='python' or 'apache' under Spark Connect"
        )
    num_bits = 1 << lg_m
    expected = max(1, int(round(num_bits * math.log(2) / num_hashes)))
    jbf = df._jdf.stat().bloomFilter(key_col, expected, num_bits)
    jvm = df.sparkSession.sparkContext._jvm
    baos = jvm.java.io.ByteArrayOutputStream()
    jbf.writeTo(baos)
    return bytes(baos.toByteArray())


def jvm_bloom_prune_with(
    fact: DataFrame, fact_key, blob: bytes, invert: bool = False
) -> DataFrame:
    """Filter ``fact`` by Spark BloomFilter bytes (integral keys)."""
    key = fact_key if isinstance(fact_key, Column) else F.col(fact_key)
    bc = compat.broadcast_value(fact.sparkSession, bytes(blob))
    holder: list[SparkBloomFilter] = []

    @pandas_udf("boolean")
    def probe(keys: pd.Series) -> pd.Series:
        if not holder:
            holder.append(SparkBloomFilter.from_bytes(bc.value))
        sk = holder[0]
        out = pd.Series(False, index=keys.index)
        ok = keys.notna()
        if ok.any():
            hits = sk.contains_longs(keys[ok].to_numpy(dtype="int64"))
            out[ok] = ~hits if invert else hits
        return out

    return fact.where(probe(key.cast("long")))


_INTEGRAL = (ByteType, ShortType, IntegerType, LongType)


def bloom_prune(
    fact: DataFrame,
    fact_key,
    dim: DataFrame,
    dim_key: str,
    lg_m: int = 22,
    engine: str = "auto",
) -> DataFrame:
    """Rows of ``fact`` whose key is (probably) in ``dim[dim_key]``.

    No false negatives: every fact row with a genuinely matching dim key
    survives.  Output may contain a small fraction of non-matching rows
    (FPP ~ (1-e^(-6n/m))^6); follow with an exact join if needed.

    ``engine='auto'`` rides Spark's built-in JVM BloomFilter when the
    dim key is integral (build = one all-JVM job; probe = vectorized
    numpy over the broadcast bytes — ``SparkBloomFilter``), and the
    portable two-phase DSKS sketch path otherwise
    (``bloom_filter_blob``: driver-merged partials when bounded, else
    the blob-only shuffle).  Both scale unchanged when ``dim`` has
    billions of keys; only the portable path yields a storable,
    mergeable sketch column.
    """
    if engine not in ("auto", "jvm", "python", "apache"):
        raise ValueError(f"engine ({engine!r}) must be auto/jvm/python/apache")
    if engine == "auto":
        dim_type = dim.schema[dim_key].dataType
        engine = (
            "jvm"
            if isinstance(dim_type, _INTEGRAL) and compat.has_jvm(dim)
            else "python"
        )
    if engine == "jvm":
        blob = jvm_bloom_filter_bytes(dim, dim_key, lg_m=lg_m)
        return jvm_bloom_prune_with(fact, fact_key, blob)
    if engine == "apache":
        # Apache-wire filter (bloomfilter_blob): same plan shape as the
        # python path, but the blob is loadable by any DataSketches
        # system — pick this when the filter itself must cross systems
        return bloomfilter_prune_with(
            fact, fact_key, bloomfilter_blob(dim, dim_key, lg_m=lg_m)
        )
    return bloom_prune_with(fact, fact_key, bloom_filter_blob(dim, dim_key, lg_m=lg_m))


def bloom_pruned_anti_join(
    fact: DataFrame,
    drop: DataFrame,
    key_col: str,
    lg_m: int = 23,
    engine: str = "auto",
) -> DataFrame:
    """``fact LEFT ANTI JOIN drop ON key_col`` with the fact side
    pre-split by a Bloom filter over ``drop``'s keys — guide §3.2's
    big-side reduction applied to the ANTI direction.

    A plain anti-join against a Python-derived ``drop`` (unknown
    planner stats) sort-merges the whole corpus: every fact row —
    matching or not — is shuffled and sorted just to be checked
    against a key set that is usually tiny.  Bloom NEGATIVES are
    exact, so definitely-unseen rows (the overwhelming majority when
    duplicates are sparse) ship straight to the output with NO
    shuffle; only possibly-seen rows (true drops + the filter's false
    positives) enter the exact anti-join.  NULL-key rows can never
    match and are routed straight to the output, matching
    ``left_anti`` semantics.  The result ROW SET is identical to the
    plain anti-join for any filter contents — false positives only
    send extra rows through the exact join.

    Costs: the drop side is scanned twice (filter build + join side —
    cheap: it is the small side, typically checkpointed/persisted by
    callers), the fact side is scanned per branch instead of shuffled
    once (scans with pushdown beat a corpus-wide shuffle at scale),
    and the ``2^lg_m``-bit filter is broadcast.  Default ``lg_m=23``
    (1 MB) holds ~1M dropped keys at <1% FPP; beyond that the prune
    degrades gracefully (more rows re-checked exactly, never wrong) —
    raise ``lg_m`` when billions of keys are dropped.  Engine
    dispatch matches :func:`bloom_prune`.
    """
    if engine not in ("auto", "jvm", "python", "apache"):
        raise ValueError(f"engine ({engine!r}) must be auto/jvm/python/apache")
    if engine == "auto":
        key_type = drop.schema[key_col].dataType
        engine = (
            "jvm"
            if isinstance(key_type, _INTEGRAL) and compat.has_jvm(drop)
            else "python"
        )
    drop_keys = drop.select(key_col).where(F.col(key_col).isNotNull())
    # NULL keys are routed around the probes entirely (below): besides
    # matching anti-join semantics, this keeps integral key batches
    # int64 in pandas — ONE null in a batch renders the whole batch
    # float64, and ints hash differently from doubles (the
    # coerce_value_batch disease; the probes also coerce defensively)
    fact_nn = fact.where(F.col(key_col).isNotNull())
    try:
        if engine == "jvm":
            blob = jvm_bloom_filter_bytes(drop_keys, key_col, lg_m=lg_m)
        elif engine == "apache":
            blob = bloomfilter_blob(drop_keys, key_col, lg_m=lg_m)
        else:
            blob = bloom_filter_blob(drop_keys, key_col, lg_m=lg_m)
    except Exception:
        # the prune is an optimization, the plain join is always
        # correct.  Known case: Spark's DataFrameStatFunctions
        # .bloomFilter throws on an EMPTY build side (zero dropped
        # keys — e.g. a dedup threshold that keeps everything).
        return fact.join(drop, key_col, "left_anti")
    if engine == "jvm":
        pos = jvm_bloom_prune_with(fact_nn, key_col, blob)
        neg = jvm_bloom_prune_with(fact_nn, key_col, blob, invert=True)
    elif engine == "apache":
        pos = bloomfilter_prune_with(fact_nn, key_col, blob)
        neg = bloomfilter_prune_with(fact_nn, key_col, blob, invert=True)
    else:
        pos = bloom_prune_with(fact_nn, key_col, blob)
        neg = bloom_prune_with(fact_nn, key_col, blob, invert=True)
    checked = pos.join(drop_keys, key_col, "left_anti")
    out = neg.unionByName(checked)
    if fact.schema[key_col].nullable:
        # both probe branches drop NULL keys; anti-join keeps them
        out = out.unionByName(fact.where(F.col(key_col).isNull()))
    return out


def anti_join_pruned(
    fact: DataFrame, drop: DataFrame, key_col: str, lg_m: int = 23
) -> DataFrame:
    """``left_anti`` that bloom-prunes the fact side ONLY when the
    planner would otherwise shuffle it (SortMergeJoin/ShuffledHashJoin
    against a small-but-unknown-stats ``drop`` side).  When the plain
    join already broadcasts ``drop`` — one corpus scan, no shuffle —
    that plan is strictly better than the split and is kept; likewise
    when the plan cannot be inspected (the prune is an optimization,
    the plain join is always correct)."""
    plain = fact.join(drop, key_col, "left_anti")
    try:
        plan = compat.physical_plan_string(plain)
    except Exception:
        return plain
    if "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan:
        return plain
    return bloom_pruned_anti_join(fact, drop, key_col, lg_m=lg_m)
