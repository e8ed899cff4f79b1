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

    The filter build is fully distributed (two-phase, blob-only
    shuffle); only the single finished filter — bounded at 2^lg_m/8
    bytes — is collected and re-broadcast, so this works unchanged when
    ``dim`` has billions of keys.
    """
    blob = bloom_filter_of(dim, dim_key, lg_m=lg_m).collect()[0]["sketch"]
    return bloom_prune_with(fact, fact_key, blob)
