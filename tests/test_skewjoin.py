"""Skew join: exact parity with plain join, hot path broadcasts."""

import pytest
from pyspark.sql import functions as F

from datasketches_spark.pipeline.skewjoin import detect_hot_keys, skew_join


def _mk_skewed(spark, n_hot=5000, n_cold=2000):
    # key 0 is hot; cold keys 1..1000 uniform
    hot = spark.range(n_hot).select(
        F.lit(0).alias("k"), F.col("id").alias("lv")
    )
    cold = spark.range(n_cold).select(
        (F.col("id") % 1000 + 1).alias("k"), F.col("id").alias("lv")
    )
    left = hot.unionByName(cold)
    right = spark.range(1001).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("rv")
    )
    return left, right


class TestSkewJoin:
    def test_detect_hot_keys(self, spark):
        left, _ = _mk_skewed(spark)
        hot = detect_hot_keys(left, "k", sample_fraction=None, min_share=0.1)
        assert hot and 0 in {int(h) for h in hot}

    def test_inner_parity(self, spark):
        left, right = _mk_skewed(spark)
        got = skew_join(left, right, "k", hot_keys=[0])
        want = left.join(right, "k")
        assert got.count() == want.count()
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0

    def test_left_parity_with_unmatched_and_nulls(self, spark):
        left = spark.createDataFrame(
            [(0, 1), (0, 2), (5, 3), (9999, 4), (None, 5)],
            "k int, lv int",
        )
        right = spark.createDataFrame([(0, 100), (5, 500)], "k int, rv int")
        got = skew_join(left, right, "k", how="left", hot_keys=[0])
        want = left.join(right, "k", "left")

        def _key(rows):
            return sorted(
                (
                    tuple((v is None, v) for v in (r["k"], r["lv"], r["rv"]))
                    for r in rows
                )
            )

        assert _key(got.collect()) == _key(want.collect())

    def test_auto_detection_parity(self, spark):
        left, right = _mk_skewed(spark)
        got = skew_join(left, right, "k", min_share=0.05)
        want = left.join(right, "k")
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0

    def test_hot_path_is_broadcast(self, spark):
        left, right = _mk_skewed(spark)
        plan = (
            skew_join(left, right, "k", hot_keys=[0])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan

    def test_auto_mode_short_circuits_broadcastable_right(self, spark):
        # a right side under the broadcast threshold never pays the
        # split (no Union in the plan) -- a broadcast join has no skew
        # problem; an explicit hot_keys list still forces the split
        left, right = _mk_skewed(spark)
        auto_plan = (
            skew_join(left, right, "k", min_share=0.05)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert auto_plan.count("Join") == 1  # single plain join
        forced_plan = (
            skew_join(left, right, "k", hot_keys=[0])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert forced_plan.count("Join") >= 2  # hot + cold split

    def test_bad_how(self, spark):
        left, right = _mk_skewed(spark)
        with pytest.raises(ValueError, match="how"):
            skew_join(left, right, "k", how="full", hot_keys=[0])

    def test_no_hot_keys_falls_through(self, spark):
        left = spark.createDataFrame([(1, 1), (2, 2)], "k int, lv int")
        right = spark.createDataFrame([(1, 10)], "k int, rv int")
        got = skew_join(left, right, "k", hot_keys=[])
        assert got.count() == 1
