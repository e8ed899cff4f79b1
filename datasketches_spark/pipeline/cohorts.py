"""Cohort retention via Theta set algebra over stored activity sketches.

This is the reference's flagship Theta use case made into an operator:
serializable distinct-count state with union/intersection
(/root/reference/src/theta_sketch.cpp:221-270, pitched for exactly
this "compare audiences across partitions" pattern in
docs/README.md's theta examples).  Retention asks "of the users active
in period p0, how many were still active in period p?" -- i.e.
|active(p0) ∩ active(p)| -- classically an O(P) self-join of the raw
events table with a COUNT(DISTINCT) per pair.

Sketch formulation:
  1. ONE scan builds a Theta sketch of the user set per period
     (two-phase ``sketch_agg``: only bounded blobs shuffle);
  2. the period-pair matrix is a join of that O(P)-row blob frame with
     itself -- kilobytes, broadcast, never touches the events again;
  3. ``datasketch_theta_intersect`` + ``_estimate`` give retained
     counts, exact below 2^lg_k distinct users per period, within
     theta error bands above.

At 100 TB the raw-events self-join is the difference between rescanning
the fact table P times and never rescanning it at all; the sketch
frame can also be persisted (io.py) so tomorrow's retention report
reuses today's blobs -- the reference's "sketch state as data" pitch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..aggregation import sketch_agg


def _ensure_registered(df: DataFrame) -> None:
    from .. import register

    spark = df.sparkSession
    if not spark.catalog.functionExists("datasketch_theta_intersect"):
        register(spark)


def activity_sketches(
    df: DataFrame,
    user_col: str,
    period_col: str,
    lg_k: int = 16,
) -> DataFrame:
    """(period, sketch): one Theta user-set blob per period, one scan."""
    return sketch_agg(
        df.select(period_col, user_col),
        user_col,
        "theta",
        group_cols=[period_col],
        k=lg_k,
    )


def retention_from_sketches(
    sketches: DataFrame,
    period_col: str,
    cohort_period=None,
) -> DataFrame:
    """Retention matrix from a stored (period, sketch) frame.

    Pairs each cohort period with every later-or-equal period:
    (cohort_period, period, cohort_size_est, retained_est,
    retention_rate).  ``cohort_period`` restricts to one cohort.
    Runs entirely over the O(P)-row blob frame -- broadcast join, the
    events table is never touched.
    """
    _ensure_registered(sketches)
    a = sketches.select(
        F.col(period_col).alias("cohort_period"), F.col("sketch").alias("__a")
    )
    if cohort_period is not None:
        a = a.filter(F.col("cohort_period") == F.lit(cohort_period))
    b = sketches.select(F.col(period_col).alias("period"), F.col("sketch").alias("__b"))
    pairs = a.join(F.broadcast(b), F.col("period") >= F.col("cohort_period"))
    return pairs.select(
        "cohort_period",
        "period",
        F.expr("CAST(round(datasketch_theta_estimate(__a)) AS BIGINT)").alias(
            "cohort_size_est"
        ),
        F.expr(
            "CAST(round(datasketch_theta_estimate("
            "datasketch_theta_intersect(__a, __b))) AS BIGINT)"
        ).alias("retained_est"),
        F.expr(
            "round(datasketch_theta_estimate(datasketch_theta_intersect(__a, __b))"
            " / datasketch_theta_estimate(__a), 6)"
        ).alias("retention_rate"),
    )


def retention_matrix(
    df: DataFrame,
    user_col: str,
    period_col: str,
    lg_k: int = 16,
    cohort_period=None,
) -> DataFrame:
    """One-call retention: build per-period user sketches (one scan of
    the events), then intersect period pairs over the tiny blob frame."""
    sk = activity_sketches(df, user_col, period_col, lg_k=lg_k)
    return retention_from_sketches(sk, period_col, cohort_period=cohort_period)
