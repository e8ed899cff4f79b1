"""Equi-depth bucketing: NTILE parity in exact mode, plan shape."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from datasketches_spark import register
from datasketches_spark.pipeline.binning import (
    equi_depth_histogram,
    quantile_bucket,
)


@pytest.fixture(autouse=True)
def _reg(spark):
    register(spark)


class TestQuantileBucket:
    def test_matches_ntile_exact_mode(self, spark):
        import numpy as np

        rng = np.random.default_rng(7)
        vals = rng.normal(100.0, 25.0, 4000)
        df = spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate(vals)], ["id", "x"]
        )
        got = quantile_bucket(df, "x", 4, k=32768)
        # inclusive-rank cut points == the values NTILE(4) places at the
        # bucket edges when n divides evenly; with distinct values and
        # n % 4 == 0 the two labelings coincide everywhere
        w = Window.orderBy("x")
        want = df.withColumn("bucket", F.ntile(4).over(w))
        mismatches = (
            got.alias("g")
            .join(want.alias("w"), "id")
            .filter(F.col("g.bucket") != F.col("w.bucket"))
            .count()
        )
        assert mismatches == 0

    def test_grouped_buckets(self, spark):
        rows = [(i, "a" if i % 2 == 0 else "b", float(i)) for i in range(400)]
        df = spark.createDataFrame(rows, ["id", "g", "x"])
        got = quantile_bucket(df, "x", 4, by=["g"], k=1024)
        sizes = got.groupBy("g", "bucket").count().collect()
        assert len(sizes) == 8
        assert all(45 <= r["count"] <= 55 for r in sizes)

    def test_null_values_get_null_bucket(self, spark):
        df = spark.createDataFrame(
            [(1, 1.0), (2, 2.0), (3, None), (4, 4.0)], ["id", "x"]
        )
        rows = {r["id"]: r["bucket"] for r in quantile_bucket(df, "x", 2).collect()}
        assert rows[3] is None
        assert rows[1] is not None

    def test_bad_num_buckets(self, spark):
        df = spark.createDataFrame([(1, 1.0)], ["id", "x"])
        with pytest.raises(ValueError, match="num_buckets"):
            quantile_bucket(df, "x", 1)

    def test_histogram_counts_sum(self, spark):
        df = spark.createDataFrame(
            [(i, float(i % 97)) for i in range(970)], ["id", "x"]
        )
        h = equi_depth_histogram(df, "x", 5, k=4096).collect()
        assert sum(r["cnt"] for r in h) == 970
        by_bucket = {r["bucket"]: r for r in h}
        assert sorted(by_bucket) == [1, 2, 3, 4, 5]
        for b in range(1, 5):
            assert by_bucket[b]["hi"] <= by_bucket[b + 1]["lo"]

    def test_hist_method_matches_sketch_exact_mode(self, spark):
        """The value-histogram path and the exact-mode KLL path define
        the identical inclusive-rank cuts, so labels must agree."""
        rows = [(i, "a" if i % 3 == 0 else "b", float(i % 53)) for i in range(1200)]
        df = spark.createDataFrame(rows, ["id", "g", "x"])
        hist = quantile_bucket(df, "x", 4, by=["g"], method="hist")
        kll = quantile_bucket(df, "x", 4, by=["g"], k=32768, method="sketch")
        mismatches = (
            hist.alias("h")
            .join(kll.alias("k"), "id")
            .filter(F.col("h.bucket") != F.col("k.bucket"))
            .count()
        )
        assert mismatches == 0

    def test_hist_method_null_and_grouped(self, spark):
        df = spark.createDataFrame(
            [(1, "a", 1.0), (2, "a", 2.0), (3, "a", None), (4, "b", 4.0)],
            ["id", "g", "x"],
        )
        rows = {
            r["id"]: r["bucket"]
            for r in quantile_bucket(df, "x", 2, by=["g"], method="hist").collect()
        }
        assert rows[3] is None and rows[1] == 1 and rows[2] == 2

    def test_bad_method(self, spark):
        df = spark.createDataFrame([(1, 1.0)], ["id", "x"])
        with pytest.raises(ValueError, match="method"):
            quantile_bucket(df, "x", 2, method="nope")

    def test_hist_plan_no_python(self, spark):
        """hist path stays entirely JVM-side: no Arrow/Python eval
        nodes anywhere in the executed plan."""
        df = spark.range(1000).withColumn("x", (F.col("id") % 17).cast("double"))
        plan = (
            quantile_bucket(df, "x", 4, method="hist")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan
        assert "FlatMapGroupsInPandas" not in plan

    def test_plan_broadcast_no_sort(self, spark):
        """Scale contract: data side has no global sort and no hash
        shuffle — cut points arrive by broadcast."""
        df = spark.range(1000).withColumn("x", F.col("id").cast("double"))
        plan = (
            quantile_bucket(df, "x", 4)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
        assert "Sort [x" not in plan


def test_hist_path_null_edges(spark):
    """NULL rows land in bucket NULL with exact counts; a group whose
    values are ALL NULL drops from the output (the masked CDF total is
    0 -- must not DIVIDE_BY_ZERO under ANSI mode)."""
    from pyspark.sql import functions as F

    from datasketches_spark.pipeline.binning import equi_depth_histogram

    df = spark.createDataFrame(
        [("a", float(v)) for v in range(10)]
        + [("b", None)] * 4
        + [("a", None)] * 2,
        "g string, x double",
    )
    rows = equi_depth_histogram(df, "x", 2, by=["g"], method="hist").collect()
    got = {(r["g"], r["bucket"]): r["cnt"] for r in rows}
    assert got == {("a", None): 2, ("a", 1): 5, ("a", 2): 5}
    # global variant with NULLs present
    g = equi_depth_histogram(
        df.filter(F.col("g") == "a"), "x", 2, method="hist"
    ).collect()
    assert {(r["bucket"], r["cnt"]) for r in g} == {(None, 2), (1, 5), (2, 5)}


class TestQuantileClip:
    @pytest.fixture(scope="class")
    def skewed(self, spark):
        import numpy as np

        rng = np.random.default_rng(3)
        vals = np.concatenate(
            [rng.normal(50.0, 5.0, 900), rng.normal(500.0, 50.0, 100)]
        )
        return spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate(vals)], ["id", "x"]
        )

    def test_clip_matches_cume_dist_bounds(self, spark, skewed):
        from datasketches_spark.pipeline.binning import quantile_clip

        got = quantile_clip(skewed, "x", 0.1, 0.9, k=32768)
        cd = skewed.withColumn(
            "cd", F.cume_dist().over(Window.orderBy("x"))
        )
        lo = cd.filter("cd >= 0.1").agg(F.min("x")).first()[0]
        hi = cd.filter("cd >= 0.9").agg(F.min("x")).first()[0]
        rows = got.collect()
        assert len(rows) == 1000
        assert min(r.x for r in rows) == lo
        assert max(r.x for r in rows) == hi
        originals = {r.id: r.x for r in skewed.collect()}
        for r in rows:
            assert r.x == min(max(originals[r.id], lo), hi)

    def test_filter_mode_and_hist_equality(self, spark, skewed):
        from datasketches_spark.pipeline.binning import quantile_clip

        f_sketch = quantile_clip(
            skewed, "x", 0.1, 0.9, k=32768, mode="filter"
        )
        f_hist = quantile_clip(
            skewed, "x", 0.1, 0.9, mode="filter", method="hist"
        )
        a = sorted(r.id for r in f_sketch.collect())
        b = sorted(r.id for r in f_hist.collect())
        assert a == b
        assert 0 < len(a) < 1000  # both tails actually dropped

    def test_output_col_nulls_and_type(self, spark):
        from datasketches_spark.pipeline.binning import quantile_clip

        df = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 3), (3, 1000), (4, None)],
            "id long, v long",
        )
        out = quantile_clip(df, "v", 0.0, 0.75, k=64, output_col="v_clip")
        rows = {r.id: (r.v, r.v_clip) for r in out.collect()}
        assert rows[4] == (None, None)          # NULL passes through
        assert rows[3][0] == 1000               # original kept
        assert rows[3][1] == 3                  # clamped to p75 value
        assert dict(out.dtypes)["v_clip"] == "bigint"  # type preserved

    def test_validation(self, spark, skewed):
        from datasketches_spark.pipeline.binning import quantile_clip

        with pytest.raises(ValueError, match="lower <= upper"):
            quantile_clip(skewed, "x", 0.9, 0.1)
        with pytest.raises(ValueError, match="mode"):
            quantile_clip(skewed, "x", mode="zap")
        with pytest.raises(ValueError, match="method"):
            quantile_clip(skewed, "x", method="zap")
