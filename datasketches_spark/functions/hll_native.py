"""Native JVM HLL fast path (Spark >= 3.5 built-in Apache DataSketches).

Spark ships the same Apache DataSketches HLL core the reference links
against, entirely JVM-side (whole-stage codegen, no Python transfer),
and its blobs are wire-compatible with the wider DataSketches
ecosystem (Druid/Hive/DuckDB).  Use these wrappers for raw distinct-
count throughput; use the ``datasketch_hll*`` UDAF surface when you
need the full scalar-function set (bounds, describe, ...) on the
Python-format blobs.

Reference parity: datasketch_hll -> hll_sketch_agg (SURVEY.md §2.2
maps these directly), datasketch_hll_union -> hll_union_agg,
datasketch_hll_estimate -> hll_sketch_estimate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hll_build(col, lg_k: int = 12) -> Column:
    """Native HLL build aggregate (maps datasketch_hll(lg_k, col))."""
    if not (4 <= lg_k <= 21):
        raise ValueError(f"Invalid lg_k for HLL sketch: {lg_k}")
    return F.hll_sketch_agg(col, lg_k)


def hll_merge(col, allow_different_lg_k: bool = True) -> Column:
    """Native HLL union aggregate (maps datasketch_hll_union).

    ``allow_different_lg_k=True`` matches the reference's mixed-K union
    behavior (test/sql/datasketch_hll.test:224-234: result degrades to
    the coarser K).
    """
    return F.hll_union_agg(col, allow_different_lg_k)


def hll_estimate(col) -> Column:
    """Native estimate scalar (maps datasketch_hll_estimate)."""
    return F.hll_sketch_estimate(col)
