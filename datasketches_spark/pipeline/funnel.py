"""Ordered-funnel analysis: how many users complete step1 -> ... -> stepN.

The greedy-earliest semantics (step i+1 counts only strictly after the
earliest completion of step i) is the standard product-analytics
definition, and it is order-independent: the result equals the chained
correlated minimum t_{i+1} = min(ts : step, ts > t_i), so no
tie-breaking convention is needed.

Execution shape (one shuffle, zero Python):
  - group events by user, ``sort_array(collect_list(struct(ts, step)))``
  - fold the sorted array with ``F.aggregate`` -- a JVM lambda carrying
    (depth reached, ts of last matched step); per-user state is two
    scalars, per-user work is O(events log events) in the sort
  - a global aggregate turns per-user depths into per-step user counts
    (one tiny row), exploded back to one row per funnel step.

At 100 TB: the only data-size shuffle is the groupBy(user); skewed
users are bounded by collect_list size (events per user), and the
final count frame is O(steps).  The reference has no funnel operator
-- its host (DuckDB) would run the same chained-min SQL the oracle
uses; this formulation replaces N correlated self-joins with one pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NEG_INF = -(1 << 62)


def funnel_counts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    step_col: str,
    steps: list[str],
) -> DataFrame:
    """One row per funnel step: (step_index, step, users reaching it).

    ``ts_col`` may be any orderable type (raw int64 nanos from
    TIMESTAMP(NANOS) parquet included -- cast to long internally when
    numeric); ``steps`` is the ordered list of step_col values.
    """
    if not steps:
        raise ValueError("funnel_counts: steps must be non-empty")
    n = len(steps)
    steps_arr = F.array(*[F.lit(s) for s in steps])

    evs = F.sort_array(
        F.collect_list(
            F.struct(
                F.col(ts_col).cast("long").alias("t"),
                F.col(step_col).alias("s"),
            )
        )
    )
    init = F.struct(
        F.lit(0).cast("int").alias("d"), F.lit(_NEG_INF).cast("long").alias("last")
    )

    def fold(acc, e):
        advance = (
            (acc["d"] < F.lit(n))
            & (e["s"] == F.element_at(steps_arr, acc["d"] + F.lit(1)))
            & (e["t"] > acc["last"])
        )
        return F.when(
            advance,
            F.struct((acc["d"] + F.lit(1)).alias("d"), e["t"].alias("last")),
        ).otherwise(acc)

    per_user = (
        df.filter(F.col(step_col).isin(steps) & F.col(ts_col).isNotNull())
        .groupBy(user_col)
        .agg(F.aggregate(evs, init, fold)["d"].alias("depth"))
    )

    counts = per_user.agg(
        *[
            F.sum((F.col("depth") >= i + 1).cast("long")).alias(f"__s{i}")
            for i in range(n)
        ]
    )
    structs = [
        F.struct(
            F.lit(i + 1).alias("step_index"),
            F.lit(steps[i]).alias("step"),
            F.coalesce(F.col(f"__s{i}"), F.lit(0).cast("long")).alias("users"),
        )
        for i in range(n)
    ]
    return counts.select(F.explode(F.array(*structs)).alias("x")).select("x.*")


def funnel_conversion(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    step_col: str,
    steps: list[str],
) -> DataFrame:
    """funnel_counts plus per-step conversion ratios (vs entry step and
    vs the previous step) -- all computed on the O(steps) count frame."""
    counts = funnel_counts(df, user_col, ts_col, step_col, steps)
    entry = counts.filter(F.col("step_index") == 1).select(
        F.col("users").alias("__entry")
    )
    prev = counts.select(
        (F.col("step_index") + 1).alias("step_index"),
        F.col("users").alias("__prev"),
    )
    return (
        counts.join(F.broadcast(entry))
        .join(F.broadcast(prev), "step_index", "left")
        .select(
            "step_index",
            "step",
            "users",
            F.when(F.col("__entry") > 0, F.col("users") / F.col("__entry"))
            .otherwise(F.lit(None))
            .alias("conversion_from_entry"),
            F.when(F.col("__prev") > 0, F.col("users") / F.col("__prev"))
            .otherwise(F.lit(None))
            .alias("conversion_from_prev"),
        )
    )
