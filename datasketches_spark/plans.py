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
    plan = df._jdf.queryExecution().executedPlan().toString()
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
