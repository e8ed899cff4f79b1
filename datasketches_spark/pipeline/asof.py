"""As-of (most-recent-match) join — a core time-series operator Spark
lacks natively.

For each left row, find the single right row with the largest ``on``
value that is <= the left row's ``on`` value (direction="backward";
"forward" mirrors it), optionally within the same ``by`` key and a
``tolerance``.  The standard use in a training-data pipeline: attach
the latest feature snapshot / model score / label event to every
example without exploding a range join.

Spark-first design (the union-window formulation, not a join):

- Both sides are unioned with a side tag and processed by ONE window
  over ``(by) ORDER BY (on, tag)``: ``last(right_payload, ignoreNulls)``
  carries the most recent right row forward onto each left row.  Cost
  is a single hash shuffle on ``by`` + an in-partition sort — the same
  Exchange any per-key work needs, reused by downstream ops on the
  same key.  A naive ``l.on >= r.on`` range join is O(n*m) per key and
  blows up exactly when the data is large; this stays O((n+m) log) and
  never materializes candidate pairs.
- At 100 TB: both sides shuffle once on the key; no broadcast needed,
  no skew amplification beyond what any per-key window has (salt the
  key upstream if one key dominates).
- Ties (equal ``on``): backward joins sort right rows BEFORE left rows
  so an equal-timestamp right row matches (inclusive, same as pandas
  ``merge_asof`` and DuckDB ``ASOF JOIN ... >=``); forward joins sort
  them after.  Among multiple right rows with identical (by, on) the
  payload struct orders the winner deterministically (last in struct
  order for backward).

DuckDB's native ``ASOF [LEFT] JOIN`` is the oracle for the gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_SIDE = "__asof_side"
_PAYLOAD = "__asof_payload"
_MATCH = "__asof_match"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str] | None = None,
    direction: str = "backward",
    tolerance: int | float | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: every left row, plus matched right columns.

    Parameters
    ----------
    on : ordering column, present in both frames (numeric or timestamp;
        must support subtraction if ``tolerance`` is given).
    by : optional equality key(s) — the shuffle key.  Without it the
        window is global (single partition): fine for small frames,
        not for 100 TB — supply a key at scale.
    direction : "backward" (largest right.on <= left.on, the default)
        or "forward" (smallest right.on >= left.on).  Both inclusive.
    tolerance : max allowed |left.on - right.on|; matches farther away
        are nulled out (left row kept), like pandas ``merge_asof``.
    right_cols : right columns to attach (default: all but ``on``/``by``).
        Emitted as ``<name><suffix>`` if the name collides with a left
        column, bare otherwise; the matched ``on`` value is always
        emitted as ``<on><suffix>``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    by_cols = [by] if isinstance(by, str) else list(by or [])
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on and c not in by_cols]
    missing = [c for c in [on, *by_cols, *right_cols] if c not in right.columns]
    if missing:
        raise ValueError(f"columns missing from right side: {missing}")

    # Right rows carry their payload (matched `on` first, then values);
    # left rows carry null payload + their original columns.
    payload = F.struct(F.col(on).alias(on), *[F.col(c) for c in right_cols])
    r = right.select(
        *[F.col(c) for c in by_cols],
        F.col(on),
        payload.alias(_PAYLOAD),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns
          if c not in by_cols and c != on],
        F.lit(0 if direction == "backward" else 1).alias(_SIDE),
    )
    l = left.select(
        *[F.col(c) for c in by_cols],
        F.col(on),
        F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
        *[F.col(c) for c in left.columns if c not in by_cols and c != on],
        F.lit(1 if direction == "backward" else 0).alias(_SIDE),
    )
    unioned = r.unionByName(l)

    # Secondary sort on the payload struct makes duplicate (by, on)
    # right rows resolve deterministically.
    order = [F.col(on), F.col(_SIDE), F.col(_PAYLOAD)]
    w = Window.partitionBy(*[F.col(c) for c in by_cols]) if by_cols else Window.partitionBy()
    if direction == "backward":
        w = w.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
        match = F.last(_PAYLOAD, ignorenulls=True).over(w)
    else:
        w = w.orderBy(*order).rowsBetween(0, Window.unboundedFollowing)
        match = F.first(_PAYLOAD, ignorenulls=True).over(w)

    out = unioned.withColumn(_MATCH, match).filter(
        F.col(_SIDE) == (1 if direction == "backward" else 0)
    )
    if tolerance is not None:
        dist = (
            F.col(on) - F.col(f"{_MATCH}.{on}")
            if direction == "backward"
            else F.col(f"{_MATCH}.{on}") - F.col(on)
        )
        out = out.withColumn(
            _MATCH, F.when(dist <= F.lit(tolerance), F.col(_MATCH))
        )

    left_names = set(left.columns)
    sel = [F.col(c) for c in left.columns]
    sel.append(F.col(f"{_MATCH}.{on}").alias(f"{on}{suffix}"))
    for c in right_cols:
        out_name = f"{c}{suffix}" if c in left_names else c
        sel.append(F.col(f"{_MATCH}.{c}").alias(out_name))
    return out.select(*sel)
