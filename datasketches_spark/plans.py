"""Plan lint: detect scale anti-patterns in a DataFrame's physical plan.

The difference between "works on 60k rows" and "works on 100 TB" is
visible in the plan *before* running anything: a nested-loop join, a
single-partition exchange, or a driver-side collect turns into a
straggler or an OOM only at scale.  ``scalability_report`` walks the
planned physical tree and flags the known killers;
``assert_scalable`` turns that into a test/CI guard — several of this
repo's own operator tests pin their plan shape with it.

This is a *lint*, not a proof: a BroadcastNestedLoopJoin over a
10-row dimension is fine (suppress via ``allow``), and a clean report
doesn't guarantee balanced partitions.  It catches the class of
regression that silently turns an equi-join formulation back into a
cartesian one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import compat

# pattern -> why it breaks at 100 TB
RED_FLAGS: dict[str, str] = {
    "CartesianProduct": (
        "O(n*m) all-pairs join; at scale this never finishes. "
        "Re-express as an equi-join (bucketing/banding) or broadcast a "
        "genuinely small side."
    ),
    "BroadcastNestedLoopJoin": (
        "nested-loop per broadcast row: quadratic work unless one side "
        "is tiny and stays tiny at production scale."
    ),
    "Exchange SinglePartition": (
        "every row funnels through ONE task (global window/orderBy "
        "without partitioning, or a global pandas UDAF). Partition the "
        "window (`by=`) or use a mergeable-sketch aggregate."
    ),
    "InMemoryTableScan": None,  # informational only (see below)
}

_INFO_FLAGS = {"InMemoryTableScan"}


def scalability_report(df: DataFrame) -> dict:
    """Inspect the planned physical tree: returns ``{"flags": [...],
    "info": [...], "num_exchanges": N, "plan": <string>}``.  Each flag
    is ``{"pattern": ..., "advice": ...}``."""
    plan = compat.physical_plan_string(df)
    flags, info = [], []
    for pattern, advice in RED_FLAGS.items():
        if pattern in plan:
            if pattern in _INFO_FLAGS:
                info.append(pattern)
            else:
                flags.append({"pattern": pattern, "advice": advice})
    return {
        "flags": flags,
        "info": info,
        "num_exchanges": plan.count("Exchange "),
        "plan": plan,
    }


def estimate_equi_join_rows(
    left: DataFrame,
    left_key: str,
    right: DataFrame,
    right_key: str,
    lg_k: int = 12,
) -> DataFrame:
    """Pre-flight equi-join size estimate from key sketches — decide
    broadcast vs shuffle vs skew-handling BEFORE running a 100 TB join.

    One bounded-state pass per side builds a theta sketch of the join
    keys (the same set-algebra surface the reference exposes —
    /root/reference/src/theta_sketch.cpp:221-270); the estimate is

        |K_L ∩ K_R| * (rows_L / |K_L|) * (rows_R / |K_R|)

    i.e. shared keys times the two average multiplicities — exact for
    uniform fan-out, an expected-value estimate otherwise (heavy-key
    fan-out is precisely what ``pipeline.skewjoin.detect_hot_keys``
    diagnoses next).  Exact-mode sketches make the whole row
    deterministic.  Returns one row: ``left_rows, right_rows,
    left_keys, right_keys, shared_keys, est_rows``.  Requires
    ``register(spark)``.
    """
    from .aggregation import sketch_agg

    lsk = sketch_agg(left, left_key, "theta", k=lg_k).withColumnRenamed(
        "sketch", "__lsk"
    )
    rsk = sketch_agg(right, right_key, "theta", k=lg_k).withColumnRenamed(
        "sketch", "__rsk"
    )
    ln = left.agg(F.count(left_key).alias("left_rows"))
    rn = right.agg(F.count(right_key).alias("right_rows"))
    one = (
        lsk.crossJoin(F.broadcast(rsk))
        .crossJoin(F.broadcast(ln))
        .crossJoin(F.broadcast(rn))
    )
    lk = F.expr("datasketch_theta_estimate(__lsk)")
    rk = F.expr("datasketch_theta_estimate(__rsk)")
    shared = F.expr(
        "datasketch_theta_estimate(datasketch_theta_intersect(__lsk, __rsk))"
    )
    return one.select(
        F.col("left_rows"),
        F.col("right_rows"),
        lk.alias("left_keys"),
        rk.alias("right_keys"),
        shared.alias("shared_keys"),
        (
            shared
            * (F.col("left_rows") / lk)
            * (F.col("right_rows") / rk)
        ).alias("est_rows"),
    )


def assert_scalable(df: DataFrame, allow: tuple[str, ...] = ()) -> dict:
    """Raise ``ValueError`` if the plan contains a red flag not listed
    in ``allow``; returns the report otherwise."""
    report = scalability_report(df)
    bad = [f for f in report["flags"] if f["pattern"] not in allow]
    if bad:
        lines = "\n".join(f"  {f['pattern']}: {f['advice']}" for f in bad)
        raise ValueError(
            f"plan has {len(bad)} scale anti-pattern(s):\n{lines}"
        )
    return report
