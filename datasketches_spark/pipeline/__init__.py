"""Large-scale training-data pipeline operators (beyond reference parity):

- :mod:`.dedup` -- exact, MinHash+LSH, SimHash, n-gram Jaccard,
  connected-component duplicate clusters, incremental cross-corpus
  near-dup against stored signature tables
- :mod:`.spans` -- repeated n-gram span detection/removal (exact-
  substring dedup), line-level boilerplate removal, stored n-gram
  count tables with additive incremental upserts
- :mod:`.similarity` -- brute-force + LSH cosine top-k, embedding
  near-duplicates
- :mod:`.text` -- language ID, quality scoring, token counting,
  fingerprinting (all JVM-side Column expressions)
- :mod:`.multimodal` -- opaque-binary columns, metadata extraction,
  stubbed-but-plumbed decoders
- :mod:`.mixture` -- source-mixture rebalancing + token-budget
  selection (deterministic, hash-based)
- :mod:`.sampling` -- weighted sampling without replacement
  (Efraimidis-Spirakis) + scale-safe two-phase grouped top-k
- :mod:`.tfidf` -- TF-IDF term scoring / top characteristic terms

(:mod:`.asof`, :mod:`.binning`, :mod:`.decontam`, :mod:`.packing`,
:mod:`.rangejoin`, :mod:`.sessions`, :mod:`.skewjoin`, :mod:`.split`
are imported directly by callers.)
"""

from . import (
    dedup,
    mixture,
    multimodal,
    sampling,
    sessions,
    similarity,
    spans,
    text,
    tfidf,
)

__all__ = [
    "dedup", "mixture", "sampling", "sessions", "similarity", "spans",
    "text", "tfidf", "multimodal",
]
