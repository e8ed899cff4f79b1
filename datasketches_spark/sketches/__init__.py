"""Pure-Python (numpy-vectorized) sketch cores for all 8 reference families.

Family inventory mirrors /root/reference/src/datasketches_extension.cpp:32-39
(SURVEY.md §0).  Every sketch is: mergeable in any order, serializable
to a framed BLOB (base.py), and NULL-skipping at the update layer.
"""

from .base import (
    FAMILY_AOD,
    FAMILY_BLOOM,
    FAMILY_FDT,
    FAMILY_CMS,
    FAMILY_EBPPS,
    FAMILY_CPC,
    FAMILY_FREQUENT_ITEMS,
    FAMILY_RESERVOIR,
    FAMILY_STATS,
    FAMILY_HLL,
    FAMILY_KLL,
    FAMILY_KLL_ITEMS,
    FAMILY_QUANTILES,
    FAMILY_REQ,
    FAMILY_TDIGEST,
    FAMILY_THETA,
    SketchDeserializeError,
    peek_family,
)
from .bloom import BloomFilterSketch, bloom_intersect, bloom_union
from .bloom_apache import (
    ApacheBloomFilter,
    bloomfilter_intersect,
    bloomfilter_union,
)
from .cms import CountMinSketch
from .compactor import KllSketch, QuantilesSketch, ReqSketch
from .kll_items import KllItemsSketch
from .ebpps import EbppsSketch
from .reservoir import ReservoirSampleSketch
from .stats import StatsSketch
from .frequent_items import FrequentItemsSketch
from .cpc import CpcSketch
from .hll import HllSketch
from .tdigest import TDigestSketch
from .theta import ThetaSketch, theta_a_not_b, theta_intersect, theta_union
from .fdt import FdtSketch, fdt_union
from .tuple_aod import (
    AodSketch,
    aod_a_not_b,
    aod_intersect,
    aod_to_theta,
    aod_union,
)

FAMILY_CLASSES = {
    FAMILY_AOD: AodSketch,
    FAMILY_FDT: FdtSketch,
    FAMILY_THETA: ThetaSketch,
    FAMILY_KLL: KllSketch,
    FAMILY_KLL_ITEMS: KllItemsSketch,
    FAMILY_QUANTILES: QuantilesSketch,
    FAMILY_REQ: ReqSketch,
    FAMILY_TDIGEST: TDigestSketch,
    FAMILY_HLL: HllSketch,
    FAMILY_CPC: CpcSketch,
    FAMILY_FREQUENT_ITEMS: FrequentItemsSketch,
    FAMILY_BLOOM: BloomFilterSketch,
    FAMILY_RESERVOIR: ReservoirSampleSketch,
    FAMILY_CMS: CountMinSketch,
    FAMILY_STATS: StatsSketch,
    FAMILY_EBPPS: EbppsSketch,
}


def deserialize_any(blob: bytes):
    fam = peek_family(blob)
    if fam is None or fam not in FAMILY_CLASSES:
        raise SketchDeserializeError("Failed to deserialize sketch")
    return FAMILY_CLASSES[fam].deserialize(blob)


__all__ = [
    "ThetaSketch",
    "KllSketch",
    "KllItemsSketch",
    "QuantilesSketch",
    "ReqSketch",
    "TDigestSketch",
    "HllSketch",
    "CpcSketch",
    "FrequentItemsSketch",
    "theta_union",
    "theta_intersect",
    "theta_a_not_b",
    "AodSketch",
    "aod_union",
    "aod_intersect",
    "aod_a_not_b",
    "aod_to_theta",
    "FdtSketch",
    "fdt_union",
    "BloomFilterSketch",
    "bloom_union",
    "bloom_intersect",
    "ApacheBloomFilter",
    "bloomfilter_union",
    "bloomfilter_intersect",
    "ReservoirSampleSketch",
    "EbppsSketch",
    "CountMinSketch",
    "StatsSketch",
    "deserialize_any",
    "SketchDeserializeError",
    "peek_family",
]
