"""Bounded range (interval) join — match right rows whose ordering
value falls in ``[left.on + lower, left.on + upper]``.

The standard use: "events within the next hour", feature windows,
label attribution.  Spark executes an equality-free range predicate as
BroadcastNestedLoopJoin / CartesianProduct — O(n*m) and a guaranteed
100 TB blowup.  Even with an equality key, one hot key degenerates to
the same quadratic scan inside the join group.

Scalable formulation (the bin-bucketing trick, as in Flink interval
joins and Databricks' range-join optimization): pick bucket width
``w = upper - lower``; each left row covers at most TWO consecutive
buckets of ``on + lower``, each right row lives in exactly ONE bucket
of its ``on`` — so the range predicate becomes an equi-join on
``(by?, bucket)`` followed by an exact filter, with no duplicate
pairs to dedupe.  Cost: one hash shuffle per side on (by, bucket),
join groups bounded by data density per bucket, never by key
cardinality.  Every matched pair is found in the right row's own
bucket; the exact BETWEEN filter then discards near-misses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKET = "__rj_bucket"


def _floordiv(x: Column, w: int) -> Column:
    """Exact floor division for longs (``div`` truncates toward zero,
    which is wrong for negative values; doubles lose precision above
    2^53 — epoch-nanos territory)."""
    pm = ((x % w) + w) % w
    return ((x - pm) / F.lit(w)).cast("long")


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    lower: int,
    upper: int,
    by: str | list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Inner join of ``left`` with every right row satisfying
    ``left.left_on + lower <= right.right_on <= left.left_on + upper``
    (and equal ``by`` keys, if given).

    ``lower``/``upper`` are in the units of the ``on`` columns (e.g.
    raw nanos).  Right columns that collide with left names are
    suffixed.  Compose aggregations on top (e.g. ``.groupBy(left_id)
    .count()``) — the exchange on ``(by, bucket)`` is already done.
    """
    if upper < lower:
        raise ValueError(f"upper ({upper}) must be >= lower ({lower})")
    w = max(upper - lower, 1)
    by_cols = [by] if isinstance(by, str) else list(by or [])

    lo = F.col(left_on) + F.lit(lower)
    hi = F.col(left_on) + F.lit(upper)
    l = left.withColumn(
        _BUCKET,
        F.explode(F.sequence(_floordiv(lo, w), _floordiv(hi, w))),
    )
    r = right.withColumn(_BUCKET, _floordiv(F.col(right_on), w))

    # rename colliding right columns (by-keys excluded: the right copy
    # is dropped by the equi-join below)
    left_names = set(left.columns)
    renames = {
        c: f"{c}{suffix}"
        for c in right.columns
        if c in left_names and c not in by_cols
    }
    for old, new in renames.items():
        r = r.withColumnRenamed(old, new)
    r_on = renames.get(right_on, right_on)

    joined = l.join(r, [*by_cols, _BUCKET]).filter(
        F.col(r_on).between(
            F.col(left_on) + F.lit(lower), F.col(left_on) + F.lit(upper)
        )
    )
    return joined.drop(_BUCKET)
