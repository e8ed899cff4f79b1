"""Deterministic dataset splitting and pseudo-shuffling for training
pipelines.

``df.randomSplit`` is non-reproducible across runs/cluster layouts
(seeded per-partition, so a repartition reshuffles membership) and
unauditable: you cannot ask "which split is doc X in?" without
re-materializing.  Hash splitting fixes both — membership is a pure
function of the id (plus a salt for re-rolls), so it is stable under
repartitioning, incremental ingest (new rows join their split without
touching old ones), and is joinable after the fact.

The hash is the first 8 hex chars of md5(id || salt) scaled to [0,1) —
chosen because every engine renders md5 identically, so the exact same
assignment is computable in DuckDB/Trino/pandas for audits (and our
oracle gate).  md5 here is a uniformity device, not cryptography.

``pseudo_shuffle`` orders by the same hash: a deterministic, seedable
global shuffle.  At scale Spark executes it as a range-partitioned
sort (sample → range bounds → per-partition sort) — the standard
distributed total order, no single-task bottleneck.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SCALE = float(1 << 32)


def unit_hash(col: Column | str, salt: str = "") -> Column:
    """Deterministic uniform [0,1) value from any id column."""
    s = F.concat(F.col(col).cast("string") if isinstance(col, str) else col.cast("string"), F.lit(salt))
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long") / F.lit(_SCALE)


def oracle_unit_hash_sql(col: str, salt: str = "") -> str:
    """The identical computation in ANSI/DuckDB SQL (for audits)."""
    return (
        f"CAST(('0x' || substr(md5({col}::VARCHAR || '{salt}'), 1, 8)) AS BIGINT)"
        f" / {_SCALE!r}"
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    salt: str = "",
    output_col: str = "split",
) -> DataFrame:
    """Label every row with its split name; proportions follow
    ``weights`` (need not sum to 1 — they are normalized).  Assignment
    depends only on (id, salt)."""
    if not weights:
        raise ValueError("weights must be a non-empty dict")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    u = unit_hash(id_col, salt)
    names = list(weights)
    expr = None
    acc = 0.0
    for name in names[:-1]:
        acc += weights[name] / total
        clause = u < F.lit(acc)
        expr = F.when(clause, name) if expr is None else expr.when(clause, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(output_col, expr)


def pseudo_shuffle(
    df: DataFrame, id_col: str, salt: str = "", rank_col: str | None = None
) -> DataFrame:
    """Deterministic global shuffle: order rows by unit_hash(id, salt).
    With ``rank_col`` set, also materialize the 1-based position (a
    global window — use only when positions are actually needed)."""
    h = unit_hash(id_col, salt)
    out = df.orderBy(h, F.col(id_col))
    if rank_col is not None:
        w = Window.orderBy(h, F.col(id_col))
        out = df.withColumn(rank_col, F.row_number().over(w))
    return out
