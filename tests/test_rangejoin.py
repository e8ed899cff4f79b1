"""Bounded range join: exact parity with the naive formulation, plan shape."""

import pytest
from pyspark.sql import functions as F

from datasketches_spark.pipeline.rangejoin import range_join


def _pairs(df, lcol="lid", rcol="rid"):
    return sorted((r[lcol], r[rcol]) for r in df.collect())


class TestRangeJoin:
    def test_matches_naive_random(self, spark):
        import numpy as np

        rng = np.random.default_rng(11)
        left = spark.createDataFrame(
            [(int(i), int(k), int(t)) for i, (k, t) in enumerate(
                zip(rng.integers(0, 4, 120), rng.integers(-500, 500, 120)))],
            ["lid", "k", "lt"],
        )
        right = spark.createDataFrame(
            [(int(i), int(k), int(t)) for i, (k, t) in enumerate(
                zip(rng.integers(0, 4, 150), rng.integers(-500, 500, 150)))],
            ["rid", "k", "rt"],
        )
        lower, upper = -30, 70
        got = _pairs(range_join(left, right, "lt", "rt", lower, upper, by="k"))
        want = _pairs(
            left.alias("l")
            .join(right.alias("r"), F.col("l.k") == F.col("r.k"))
            .filter(F.col("rt").between(F.col("lt") + lower, F.col("lt") + upper))
        )
        assert got == want and len(got) > 0

    def test_no_by_key(self, spark):
        left = spark.createDataFrame([(1, 100), (2, 250)], ["lid", "lt"])
        right = spark.createDataFrame(
            [(10, 90), (11, 160), (12, 240), (13, 350), (14, 351)],
            ["rid", "rt"],
        )
        got = _pairs(range_join(left, right, "lt", "rt", -20, 100))
        # rt in [lt-20, lt+100]: lt=100 -> 90,160; lt=250 -> 240,350
        # (351 is one past the inclusive upper edge)
        assert got == [(1, 10), (1, 11), (2, 12), (2, 13)]

    def test_point_interval(self, spark):
        left = spark.createDataFrame([(1, 5)], ["lid", "lt"])
        right = spark.createDataFrame([(10, 5), (11, 6)], ["rid", "rt"])
        assert _pairs(range_join(left, right, "lt", "rt", 0, 0)) == [(1, 10)]

    def test_colliding_column_names(self, spark):
        left = spark.createDataFrame([(1, 10, "L")], ["id", "ts", "tag"])
        right = spark.createDataFrame([(2, 12, "R")], ["id", "ts", "tag"])
        row = range_join(left, right, "ts", "ts", 0, 5).first()
        assert (row["id"], row["id_right"]) == (1, 2)
        assert (row["ts"], row["ts_right"]) == (10, 12)
        assert (row["tag"], row["tag_right"]) == ("L", "R")

    def test_bad_bounds(self, spark):
        left = spark.createDataFrame([(1, 10)], ["lid", "lt"])
        with pytest.raises(ValueError, match="upper"):
            range_join(left, left, "lt", "lt", 5, 4)

    def test_plan_is_equi_join(self, spark):
        """Scale contract: hash/sort-merge equi-join on (by, bucket) —
        no nested-loop or cartesian fallback anywhere in the plan."""
        left = spark.createDataFrame([(1, 0, 100)], ["lid", "k", "lt"])
        right = spark.createDataFrame([(2, 0, 150)], ["rid", "k", "rt"])
        plan = (
            range_join(left, right, "lt", "rt", 0, 3_600_000, by="k")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
