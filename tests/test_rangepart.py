"""Sketch-driven range partition planning (pipeline/rangepart.py):
exact boundaries in exact mode, near-balance in estimation mode,
codegen vs searchsorted path agreement, and determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datasketches_spark.pipeline.rangepart import (
    assign_range_partition,
    partition_bounds,
    range_repartition,
)


@pytest.fixture(scope="module")
def pdf(spark):
    return spark.range(0, 10_000).selectExpr(
        "CAST(id AS DOUBLE) AS v", "id"
    ).persist()


def test_exact_mode_bounds_are_exact_quantiles(spark, pdf):
    bs = partition_bounds(pdf, "v", 4, k=16384)  # k > n: exact
    # inclusive quantiles of 0..9999 at 1/4, 2/4, 3/4
    assert bs == [2499.0, 4999.0, 7499.0]


def test_assignment_balanced_and_tie_semantics(spark, pdf):
    bs = partition_bounds(pdf, "v", 4, k=16384)
    counts = {
        r.range_pid: r.c
        for r in assign_range_partition(pdf, "v", bs)
        .groupBy("range_pid").agg(F.count("*").alias("c")).collect()
    }
    assert set(counts) == {0, 1, 2, 3}
    assert sum(counts.values()) == 10_000
    # ties go UP: v == bound belongs to the higher partition
    row = assign_range_partition(
        pdf.filter(F.col("v") == 2499.0), "v", bs
    ).first()
    assert row.range_pid == 1
    # near-balance: tie-up semantics shift each boundary row into the
    # next cell, so a uniform ramp lands within 2 of perfectly equal
    assert max(counts.values()) - min(counts.values()) <= 2


def test_case_chain_and_searchsorted_agree(spark, pdf):
    bs = [float(b) for b in range(100, 9901, 100)]  # 99 bounds > chain max
    wide = {
        r.id: r.range_pid
        for r in assign_range_partition(pdf, "v", bs).collect()
    }
    narrow_bs = bs[:50]  # codegen path
    narrow = {
        r.id: r.range_pid
        for r in assign_range_partition(pdf, "v", narrow_bs).collect()
    }
    import numpy as np

    for i in (0, 99, 100, 101, 5000, 9999):
        assert wide[i] == int(np.searchsorted(bs, float(i), side="right"))
        assert narrow[i] == int(np.searchsorted(narrow_bs, float(i), side="right"))


def test_null_values_get_null_pid(spark):
    df = spark.createDataFrame([(1.0,), (None,)], "v double")
    rows = assign_range_partition(df, "v", [0.5, 2.0]).collect()
    got = {r.v: r.range_pid for r in rows}
    assert got[1.0] == 1 and got[None] is None


def test_estimation_mode_near_balance(spark):
    import numpy as np

    df = spark.range(0, 200_000).selectExpr(
        "CAST(pmod(id * 2654435761, 1000003) AS DOUBLE) AS v"
    )
    out = range_repartition(df, "v", 8, k=256)  # estimation mode
    counts = [
        r.c for r in out.groupBy("range_pid").agg(F.count("*").alias("c")).collect()
    ]
    assert len(counts) == 8
    # KLL k=256 rank error ~ 2% at high confidence; allow generous 15%
    assert max(counts) < (200_000 / 8) * 1.15
    assert min(counts) > (200_000 / 8) * 0.85


def test_bounds_deterministic_across_runs(spark, pdf):
    a = partition_bounds(pdf, "v", 8, k=512)
    b = partition_bounds(pdf.repartition(7), "v", 8, k=512)
    # merge-order independence is NOT guaranteed bit-exact for KLL in
    # estimation mode, but with k > sqrt-scale the SAME partitioning
    # of the SAME data gives identical bounds; and exact mode always
    c = partition_bounds(pdf, "v", 8, k=16384)
    d = partition_bounds(pdf.repartition(7), "v", 8, k=16384)
    assert a == partition_bounds(pdf, "v", 8, k=512)
    assert c == d


def test_plan_no_shuffle_in_assignment(spark, pdf):
    bs = [2500.0, 5000.0, 7500.0]
    plan = (
        assign_range_partition(pdf, "v", bs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Project" in plan


def test_nan_gets_null_pid_on_both_paths(spark):
    import numpy as np

    df = spark.createDataFrame(
        [(1.0,), (float("nan"),), (None,)], "v double"
    )
    few = [0.5, 2.0]
    many = [float(b) for b in range(0, 130)]  # > chain max
    for bs in (few, many):
        got = {
            ("nan" if r.v is not None and np.isnan(r.v) else r.v): r.range_pid
            for r in assign_range_partition(df, "v", bs).collect()
        }
        assert got[1.0] is not None
        assert got["nan"] is None and got[None] is None


# --------------------------- live-java differential (r11 verdict #3)


def test_partition_bounds_match_java_partitions_feature(spark):
    """partition_bounds == the interior boundaries of datasketches-java's
    PartitioningFeature (KllItemsSketch.getPartitionBoundariesFromNumParts,
    the API org.apache.datasketches.partitions drives) on the same data.

    Exact-mode sketches on both sides: java's boundaries are
    getQuantile(i/parts, INCLUSIVE) over evenly spaced ranks 0..1
    (ItemsSketchSortedView bytecode), identical to our convention, so
    the interior split points must be EQUAL."""
    jvm = spark.sparkContext._jvm
    gw = spark.sparkContext._gateway
    vals = [float(v) for v in range(397)]  # exact mode at k=512
    import random

    random.Random(7).shuffle(vals)

    jsk = jvm.org.apache.datasketches.kll.KllItemsSketch.newHeapInstance(
        512,
        jvm.java.util.Comparator.naturalOrder(),
        jvm.org.apache.datasketches.common.ArrayOfDoublesSerDe(),
    )
    for v in vals:
        jsk.update(v)
    inclusive = getattr(
        jvm.org.apache.datasketches.quantilescommon.QuantileSearchCriteria,
        "INCLUSIVE",
    )
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    for parts in (2, 4, 7):
        gpb = jsk.getPartitionBoundariesFromNumParts(parts, inclusive)
        jb = [float(b) for b in gpb.getBoundaries()]
        ours = partition_bounds(df, "x", parts, k=512)
        assert ours == jb[1:-1], (parts, ours, jb)
        # endpoints are the data min/max in exact mode
        assert jb[0] == min(vals) and jb[-1] == max(vals)


def test_estimation_mode_bounds_within_java_rank_band(spark):
    """Estimation mode: our split points land within the KLL
    normalized rank error of the target ranks when measured by JAVA's
    getRank on a sketch heapified from OUR wire blob.  (Exact equality
    is not expected: java's sorted view injects unretained min/max
    items with weight 1 — documented r8 divergence — and the two-phase
    Spark build merges in partition order.)"""
    import pandas as pd

    from datasketches_spark.sketches.compactor import KllSketch

    jvm = spark.sparkContext._jvm
    n = 60_000
    rng_vals = [((v * 2654435761) % n) / 7.0 for v in range(n)]
    sk = KllSketch(200)
    sk.update(pd.Series(rng_vals).to_numpy())
    mem = jvm.org.apache.datasketches.memory.Memory.wrap(sk.to_wire())
    jsk = jvm.org.apache.datasketches.kll.KllDoublesSketch.heapify(mem)
    inclusive = getattr(
        jvm.org.apache.datasketches.quantilescommon.QuantileSearchCriteria,
        "INCLUSIVE",
    )
    parts = 8
    eps = jsk.getNormalizedRankError(False)  # single-sided, getQuantile
    for i in range(1, parts):
        p = i / parts
        b = sk.get_quantile(p, True)
        jr = jsk.getRank(b, inclusive)
        assert abs(jr - p) <= 2 * eps, (p, b, jr, eps)
