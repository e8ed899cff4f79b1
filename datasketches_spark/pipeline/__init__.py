"""Large-scale training-data pipeline operators (beyond reference parity):

- :mod:`.dedup` -- exact, MinHash+LSH, SimHash, n-gram Jaccard,
  connected-component duplicate clusters
- :mod:`.similarity` -- brute-force + LSH cosine top-k, embedding
  near-duplicates
- :mod:`.text` -- language ID, quality scoring, token counting,
  fingerprinting (all JVM-side Column expressions)
- :mod:`.multimodal` -- opaque-binary columns, metadata extraction,
  stubbed-but-plumbed decoders
- :mod:`.mixture` -- source-mixture rebalancing + token-budget
  selection (deterministic, hash-based)

(:mod:`.asof`, :mod:`.binning`, :mod:`.decontam`, :mod:`.packing`,
:mod:`.rangejoin`, :mod:`.sessions`, :mod:`.skewjoin`, :mod:`.split`
are imported directly by callers.)
"""

from . import dedup, mixture, multimodal, sessions, similarity, text

__all__ = ["dedup", "mixture", "sessions", "similarity", "text", "multimodal"]
