"""Family adapters: uniform create/update/merge over the 8 sketch cores.

This is the glue the Spark layer (aggregation.py, functions/) uses so
that every aggregate behaves like the reference's overload sets: fed
raw values it *builds*, fed sketch blobs it *merges* (reference
docs/README.md:346-348 -- "This same aggregate function can perform a
union of multiple sketches").  Dispatch is on the pandas dtype of the
incoming batch: binary -> merge, anything else -> build.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .sketches.base import is_framed
from .sketches import (
    AodSketch,
    ApacheBloomFilter,
    BloomFilterSketch,
    FdtSketch,
    CountMinSketch,
    CpcSketch,
    EbppsSketch,
    FrequentItemsSketch,
    HllSketch,
    KllItemsSketch,
    KllSketch,
    QuantilesSketch,
    ReqSketch,
    ReservoirSampleSketch,
    StatsSketch,
    TDigestSketch,
    ThetaSketch,
)

QUANTILE_FAMILIES = {"quantiles": QuantilesSketch, "kll": KllSketch, "req": ReqSketch}

FAMILY_CLASSES = {
    "theta": ThetaSketch,
    "kll": KllSketch,
    "kll_items": KllItemsSketch,
    "quantiles": QuantilesSketch,
    "req": ReqSketch,
    "tdigest": TDigestSketch,
    "hll": HllSketch,
    "cpc": CpcSketch,
    "frequent_items": FrequentItemsSketch,
    "bloom": BloomFilterSketch,
    "reservoir": ReservoirSampleSketch,
    "cms": CountMinSketch,
    "stats": StatsSketch,
    "ebpps": EbppsSketch,
    "aod": AodSketch,
    "bloomfilter": ApacheBloomFilter,
    "fdt": FdtSketch,
}


def spark_value_kind(data_type) -> "str | None":
    """'int64' for integral Spark column types, else None — the hint
    :func:`coerce_value_batch` needs to undo pandas' nullable-int
    upcast in Arrow workers."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    if isinstance(data_type, (ByteType, ShortType, IntegerType, LongType)):
        return "int64"
    return None


def coerce_value_batch(series: pd.Series, kind: "str | None", weights=None):
    """Undo pandas' nullable-int rendering before sketch updates.

    An integral Spark column whose Arrow batch contains NULLs arrives
    as float64-with-NaN, and sketch semantics are dtype-sensitive:
    5 (int) and 5.0 (double) murmur-hash DIFFERENTLY (reference
    parity), quantile sketches are typed, and sampling families
    stringify items.  Found live: with one null-bearing and one clean
    partition, sketch_agg's theta path double-counted every
    overlapping value (int-hashed in one partial, double-hashed in the
    other).  Drops the NULL rows (aligned with ``weights`` when
    given) and restores int64."""
    if kind == "int64" and series.dtype.kind == "f":
        keep = series.notna()
        series = series[keep].astype(np.int64)
        if weights is not None:
            weights = weights[keep]
    return (series, weights) if weights is not None else series


def infer_value_dtype(series: pd.Series) -> str:
    kind = series.dtype.kind
    if kind in "iu" or series.dtype == object and isinstance(series.iloc[0], (int, np.integer)):
        return "int64"
    if series.dtype == np.float32:
        return "float32"
    return "float64"


def create_sketch(family: str, params: dict):
    params = dict(params or {})
    if family == "theta":
        return ThetaSketch(int(params.get("lg_k", 12)))
    if family in QUANTILE_FAMILIES:
        return QUANTILE_FAMILIES[family](
            int(params.get("k", 200)), params.get("dtype", "float64")
        )
    if family == "kll_items":
        return KllItemsSketch(int(params.get("k", 200)))
    if family == "tdigest":
        return TDigestSketch(int(params.get("k", 100)))
    if family == "hll":
        return HllSketch(int(params.get("lg_k", 12)))
    if family == "cpc":
        return CpcSketch(int(params.get("lg_k", 12)))
    if family == "frequent_items":
        return FrequentItemsSketch(int(params.get("lg_max_k", 10)))
    if family == "bloom":
        return BloomFilterSketch(
            int(params.get("lg_m", 20)), int(params.get("num_hashes", 6))
        )
    if family == "reservoir":
        return ReservoirSampleSketch(int(params.get("k", 1024)))
    if family == "ebpps":
        return EbppsSketch(int(params.get("k", 1024)))
    if family == "aod":
        lgk = params.get("lg_k")
        # no declared K -> a merge accumulator that adopts the first
        # blob's lg_k (k-less union/rollup paths stay lossless)
        return AodSketch(
            None if lgk is None else int(lgk), int(params.get("num_values", 1))
        )
    if family == "fdt":
        lgk = params.get("lg_k")
        # no declared K -> adopt the first blob's lg_k on merge
        return FdtSketch(None if lgk is None else int(lgk))
    if family == "bloomfilter":
        return ApacheBloomFilter(
            1 << int(params.get("lg_m", 20)),
            int(params.get("num_hashes", 6)),
            int(params.get("seed", 9001)),
        )
    if family == "cms":
        return CountMinSketch(
            int(params.get("lg_w", 16)), int(params.get("depth", 5))
        )
    if family == "stats":
        return StatsSketch()
    raise ValueError(f"unknown sketch family: {family}")


def is_blob_series(series: pd.Series) -> bool:
    if series.dtype != object:
        return False
    for v in series:
        if v is None:
            continue
        return isinstance(v, (bytes, bytearray))
    return False


def update_sketch(family: str, sk, series: pd.Series, merge: bool = False) -> None:
    """Feed one Arrow batch into a sketch: values build, blobs merge.

    ``merge=True`` declares the series is sketch blobs even when every
    value is NULL (an all-NULL series carries no type evidence).  Only
    the stats family needs the hint: every other family drops NULLs
    before doing anything, but stats counts NULLs on its *build* path,
    so an all-NULL blob series would otherwise be miscounted as rows.
    """
    s = series.dropna()
    if family == "stats":
        # stats is the one family that must SEE the NULLs (its null
        # count is n - nonnull); blobs still merge like everywhere else
        if is_blob_series(s) or merge:
            for blob in s:
                sk.merge(StatsSketch.deserialize(bytes(blob)))
        else:
            sk.update_series(series)
        return
    if s.empty:
        return
    cls = FAMILY_CLASSES[family]
    if is_blob_series(s):
        if family in ("hll", "cpc"):
            # Reference parity: HLL/CPC accept raw BLOB *values* in
            # addition to sketch blobs (generator.py:30-44 lists BLOB
            # among the allowed input types). Spark has no catalog type
            # alias to distinguish sketch_hll from plain BINARY, so
            # dispatch per value on the DSKS frame magic OR the Apache
            # wire preamble (serVer/family/lgK — the reference's typed
            # blobs ARE that format): sketch blobs merge, anything
            # else is hashed as a raw byte value.
            framed = s.map(
                lambda b: b is not None
                and (is_framed(b) or cls.sniff_wire(bytes(b)))
            )
            for blob in s[framed]:
                sk.merge(cls.deserialize(bytes(blob)))
            raw = s[~framed].dropna()
            if not raw.empty:
                sk.update_values(raw.map(bytes))
            return
        for blob in s:
            if blob is not None:
                sk.merge(cls.deserialize(bytes(blob)))
        return
    if family in ("theta", "hll", "cpc", "bloom"):
        sk.update_values(s)
    elif family == "bloomfilter":
        sk.update_series(s)
    elif family in QUANTILE_FAMILIES or family == "tdigest":
        if s.dtype == object and isinstance(
            next((v for v in s if v is not None), None), str
        ):
            # The reference binds numeric overloads only for the
            # quantile families (codegen/generator.py:46-60); mirror
            # DuckDB's binder rejection instead of a numpy cast error.
            raise ValueError(
                "No function matches the given name and argument types "
                f"'datasketch_{family}(VARCHAR)': "
                f"{family} sketches accept numeric values only. "
                "You might need to add explicit type casts."
            )
        sk.update(s.to_numpy())
    elif family in ("frequent_items", "reservoir", "cms", "ebpps", "fdt", "kll_items"):
        sk.update_series(s)
    elif family == "aod":
        raise ValueError(
            "datasketch_aod builds from (key, values) pairs — use "
            "aggregation.tuple_sketch_agg or the datasketch_aod SQL "
            "aggregate; this path only merges tuple sketch blobs"
        )
    else:  # pragma: no cover
        raise ValueError(f"unknown sketch family: {family}")


def build_params(family: str, k: int | None, series: pd.Series | None) -> dict:
    """Resolve constructor params from a constant-K argument plus the
    batch dtype (typed quantile sketches, SURVEY.md §1.2)."""
    params: dict = {}
    if family in ("theta", "aod", "fdt"):
        if k is not None:
            params["lg_k"] = k
    elif family in ("hll", "cpc"):
        if k is not None:
            params["lg_k"] = k
    elif family == "frequent_items":
        if k is not None:
            params["lg_max_k"] = k
    elif family in ("bloom", "bloomfilter"):
        if k is not None:
            params["lg_m"] = k
    elif family in ("reservoir", "ebpps"):
        if k is not None:
            params["k"] = k
    elif family == "cms":
        if k is not None:
            params["lg_w"] = k
    else:
        if k is not None:
            params["k"] = k
    if family in QUANTILE_FAMILIES and series is not None and not is_blob_series(series):
        params["dtype"] = infer_value_dtype(series)
    return params
