"""As-of join semantics: backward/forward, ties, tolerance, keys."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from datasketches_spark.pipeline.asof import asof_join


@pytest.fixture()
def frames(spark):
    left = spark.createDataFrame(
        [
            ("a", 10, "l1"),
            ("a", 20, "l2"),
            ("a", 25, "l3"),
            ("b", 5, "l4"),
            ("b", 30, "l5"),
            ("c", 7, "l6"),  # key with no right rows
        ],
        ["k", "t", "lval"],
    )
    right = spark.createDataFrame(
        [
            ("a", 8, 1.0),
            ("a", 20, 2.0),  # equal-timestamp tie with l2
            ("a", 22, 3.0),
            ("b", 6, 4.0),
            ("b", 29, 5.0),
        ],
        ["k", "t", "rval"],
    )
    return left, right


def _by_lval(df):
    return {r["lval"]: (r["t_right"], r["rval"]) for r in df.collect()}


class TestBackward:
    def test_matches(self, spark, frames):
        left, right = frames
        got = _by_lval(asof_join(left, right, on="t", by="k"))
        assert got == {
            "l1": (8, 1.0),
            "l2": (20, 2.0),  # inclusive: equal ts matches
            "l3": (22, 3.0),
            "l4": (None, None),  # right t=6 is after left t=5
            "l5": (29, 5.0),
            "l6": (None, None),
        }

    def test_tolerance(self, spark, frames):
        left, right = frames
        got = _by_lval(asof_join(left, right, on="t", by="k", tolerance=2))
        assert got["l1"] == (8, 1.0)  # dist 2 <= tolerance 2: inclusive
        got1 = _by_lval(asof_join(left, right, on="t", by="k", tolerance=1))
        assert got1["l1"] == (None, None)
        assert got1["l2"] == (20, 2.0)
        assert got1["l5"] == (29, 5.0)

    def test_matches_pandas_merge_asof(self, spark):
        import numpy as np

        rng = np.random.default_rng(7)
        lp = pd.DataFrame(
            {
                "k": rng.integers(0, 5, 200),
                "t": rng.integers(0, 1000, 200),
                "lid": range(200),
            }
        ).sort_values("t")
        rp = (
            pd.DataFrame(
                {
                    "k": rng.integers(0, 5, 150),
                    "t": rng.integers(0, 1000, 150),
                    "rv": rng.normal(size=150).round(3),
                }
            )
            .drop_duplicates(["k", "t"])
            .sort_values("t")
        )
        want = pd.merge_asof(lp, rp, on="t", by="k").set_index("lid")["rv"]
        got = asof_join(
            spark.createDataFrame(lp),
            spark.createDataFrame(rp),
            on="t",
            by="k",
        ).toPandas().set_index("lid")["rv"]
        pd.testing.assert_series_equal(
            got.sort_index(), want.sort_index(), check_names=False
        )


class TestForward:
    def test_matches(self, spark, frames):
        left, right = frames
        got = _by_lval(asof_join(left, right, on="t", by="k", direction="forward"))
        assert got == {
            "l1": (20, 2.0),
            "l2": (20, 2.0),  # inclusive
            "l3": (None, None),
            "l4": (6, 4.0),
            "l5": (None, None),
            "l6": (None, None),
        }


class TestEdges:
    def test_no_by_global(self, spark):
        left = spark.createDataFrame([(10, "x"), (1, "y")], ["t", "lval"])
        right = spark.createDataFrame([(2, 9.0), (9, 1.0)], ["t", "rval"])
        got = {
            r["lval"]: r["rval"]
            for r in asof_join(left, right, on="t").collect()
        }
        assert got == {"x": 1.0, "y": None}

    def test_duplicate_right_deterministic(self, spark):
        left = spark.createDataFrame([("a", 10, "x")], ["k", "t", "lval"])
        right = spark.createDataFrame(
            [("a", 10, 1.0), ("a", 10, 2.0)], ["k", "t", "rval"]
        )
        vals = {
            asof_join(left, right, on="t", by="k").first()["rval"]
            for _ in range(3)
        }
        assert vals == {2.0}  # largest payload wins, every run

    def test_name_collision_suffix(self, spark):
        left = spark.createDataFrame([("a", 10, 1.0)], ["k", "t", "v"])
        right = spark.createDataFrame([("a", 9, 2.0)], ["k", "t", "v"])
        row = asof_join(left, right, on="t", by="k").first()
        assert row["v"] == 1.0 and row["v_right"] == 2.0 and row["t_right"] == 9

    def test_bad_direction(self, spark, frames):
        left, right = frames
        with pytest.raises(ValueError, match="direction"):
            asof_join(left, right, on="t", by="k", direction="nearest")

    def test_single_shuffle_plan(self, spark, frames):
        """Scale contract: exactly one Exchange (hash on the by-key) —
        the union-window formulation must not add a join shuffle."""
        left, right = frames
        plan = (
            asof_join(left, right, on="t", by="k")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange hashpartitioning") == 1
        assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
