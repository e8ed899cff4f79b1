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

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .aggregation import sketch_agg
from .sketches import BloomFilterSketch


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
        parts = df.rdd.getNumPartitions()
        driver_merge = parts * (1 << lg_m) // 8 <= (64 << 20)
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
    bc = fact.sparkSession.sparkContext.broadcast(bytes(blob))
    holder: list[BloomFilterSketch] = []

    @pandas_udf("boolean")
    def probe(keys: pd.Series) -> pd.Series:
        if not holder:
            holder.append(BloomFilterSketch.deserialize(bc.value))
        sk = holder[0]
        out = pd.Series(False, index=keys.index)
        ok = keys.notna()
        if ok.any():
            hits = sk.contains_values(keys[ok])
            out[ok] = ~hits if invert else hits
        return out

    return fact.where(probe(key))


def bloom_prune(
    fact: DataFrame,
    fact_key,
    dim: DataFrame,
    dim_key: str,
    lg_m: int = 22,
) -> DataFrame:
    """Rows of ``fact`` whose key is (probably) in ``dim[dim_key]``.

    No false negatives: every fact row with a genuinely matching dim key
    survives.  Output may contain a small fraction of non-matching rows
    (FPP ~ (1-e^(-6n/m))^6); follow with an exact join if needed.

    The filter build is fully distributed (``bloom_filter_blob``:
    driver-merged partials when bounded, else the two-phase blob-only
    shuffle collecting exactly one blob), so this works unchanged when
    ``dim`` has billions of keys.
    """
    return bloom_prune_with(fact, fact_key, bloom_filter_blob(dim, dim_key, lg_m=lg_m))
