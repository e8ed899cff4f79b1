"""Native JVM fast paths for frequency sketches (Spark built-ins).

Two more reference-adjacent sketches ship inside Spark's Catalyst
expression library, entirely JVM-side (no Python transfer):

- ``approx_top_k`` — heavy hitters.  Functional analog of the
  reference's ``datasketch_frequent_items`` + ``..._get_frequent``
  (SURVEY.md §2.2, /root/reference/src/frequent_items_sketch.cpp:
  295-348) for the common "give me the top-k with counts" question.
  Use the UDAF surface when you need mergeable blobs, error bounds, or
  the NO_FALSE_POSITIVES/NEGATIVES distinction; use this when you need
  raw throughput.
- ``count_min_sketch`` — per-item frequency estimation with a
  mergeable binary state (different guarantees than Frequent Items:
  CMS never under-counts, FI tracks the top of the distribution).
  The reference has no CMS; Spark's is the standard fast path for
  "estimate counts of many items" at scale.

Thin Column wrappers via ``F.call_function`` so both paths are named
explicitly in the engine's API, mirroring functions/hll_native.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col) -> Column:
    return col if isinstance(col, Column) else F.col(col)


def approx_top_k(col, k: int = 5, max_items_tracked: int = 10000) -> Column:
    """Native top-k heavy hitters -> array<struct<item, count>>.

    JVM analog of ``datasketch_frequent_items_get_frequent``; exact
    whenever the number of distinct items fits in max_items_tracked
    (the reference's small-N exact-mode contract,
    test/sql/datasketch_frequent.test:26-45).
    """
    return F.call_function(
        "approx_top_k", _c(col), F.lit(int(k)), F.lit(int(max_items_tracked))
    )


def count_min_build(
    col, eps: float = 0.001, confidence: float = 0.99, seed: int = 42
) -> Column:
    """Native Count-Min sketch aggregate -> mergeable binary blob."""
    return F.count_min_sketch(_c(col), float(eps), float(confidence), int(seed))
