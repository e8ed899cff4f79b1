"""Mixture rebalancing + token-budget selection: determinism, feasibility,
proportion targets, plan shape."""

import pytest
from pyspark.sql import functions as F

from datasketches_spark.pipeline.mixture import (
    mixture_keep_fractions,
    sample_to_mixture,
    token_budget_filter,
)


def _docs(spark, per_source):
    rows = []
    i = 0
    for src, n in per_source.items():
        for _ in range(n):
            rows.append((i, src))
            i += 1
    return spark.createDataFrame(rows, ["id", "src"])


class TestMixture:
    def test_keep_fractions_feasibility(self, spark):
        df = _docs(spark, {"a": 6000, "b": 3000, "c": 1000})
        # target 50/25/25: c is binding (1000/0.25 = 4000 total),
        # so keep all of c, 2000 of a, 1000 of b
        fr = {
            r["src"]: r["keep_frac"]
            for r in mixture_keep_fractions(df, "src", {"a": 0.5, "b": 0.25, "c": 0.25}).collect()
        }
        assert fr["c"] == pytest.approx(1.0)
        assert fr["a"] == pytest.approx(2000 / 6000)
        assert fr["b"] == pytest.approx(1000 / 3000)

    def test_sampled_proportions_near_target(self, spark):
        df = _docs(spark, {"a": 6000, "b": 3000, "c": 1000})
        kept = sample_to_mixture(df, "src", "id", {"a": 2, "b": 1, "c": 1}, salt="s")
        counts = {r["src"]: r["count"] for r in kept.groupBy("src").count().collect()}
        total = sum(counts.values())
        assert counts["c"] == 1000  # binding source kept whole
        assert abs(counts["a"] / total - 0.5) < 0.03
        assert abs(counts["b"] / total - 0.25) < 0.03

    def test_membership_stable_under_repartition(self, spark):
        df = _docs(spark, {"a": 2000, "b": 500})
        w = {"a": 0.5, "b": 0.5}
        ids1 = {r["id"] for r in sample_to_mixture(df, "src", "id", w, salt="x").collect()}
        ids2 = {
            r["id"]
            for r in sample_to_mixture(df.repartition(13), "src", "id", w, salt="x").collect()
        }
        assert ids1 == ids2

    def test_absent_source_dropped(self, spark):
        df = _docs(spark, {"a": 100, "zzz": 50})
        kept = sample_to_mixture(df, "src", "id", {"a": 1.0}, salt="s")
        assert kept.filter(F.col("src") == "zzz").count() == 0

    def test_bad_weights(self, spark):
        df = _docs(spark, {"a": 10})
        with pytest.raises(ValueError, match="weights"):
            sample_to_mixture(df, "src", "id", {})
        with pytest.raises(ValueError, match="weights"):
            sample_to_mixture(df, "src", "id", {"a": -1.0})

    def test_no_data_shuffle_in_plan(self, spark):
        """Data side is scan -> broadcast-join -> filter; the only
        exchanges feed the tiny fraction frame."""
        df = _docs(spark, {"a": 1000, "b": 1000})
        kept = sample_to_mixture(df, "src", "id", {"a": 1, "b": 1})
        plan = kept._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" in plan


class TestTokenBudget:
    def test_longest_affordable_prefix(self, spark):
        rows = [(i, "g", 10, float(100 - i)) for i in range(20)]
        df = spark.createDataFrame(rows, ["id", "g", "tok", "score"])
        kept = token_budget_filter(
            df, "tok", 55, order_by=[F.col("score").desc(), "id"], by=["g"]
        ).collect()
        # 10 tokens each, budget 55 -> exactly the 5 best fit
        assert sorted(r["id"] for r in kept) == [0, 1, 2, 3, 4]

    def test_per_shard_budgets_independent(self, spark):
        rows = [(i, "x" if i % 2 == 0 else "y", 5, float(i)) for i in range(40)]
        df = spark.createDataFrame(rows, ["id", "g", "tok", "score"])
        kept = token_budget_filter(
            df, "tok", 25, order_by=[F.col("score").desc(), "id"], by=["g"]
        )
        counts = {r["g"]: r["count"] for r in kept.groupBy("g").count().collect()}
        assert counts == {"x": 5, "y": 5}

    def test_null_and_nonpositive_tokens_dropped(self, spark):
        df = spark.createDataFrame(
            [(1, 10), (2, None), (3, 0), (4, -5), (5, 10)], ["id", "tok"]
        )
        kept = token_budget_filter(df, "tok", 100, order_by=["id"]).collect()
        assert sorted(r["id"] for r in kept) == [1, 5]

    def test_cum_col_exposed(self, spark):
        df = spark.createDataFrame([(1, 7), (2, 7), (3, 7)], ["id", "tok"])
        rows = token_budget_filter(
            df, "tok", 14, order_by=["id"], cum_col="cum"
        ).collect()
        assert [(r["id"], r["cum"]) for r in sorted(rows, key=lambda r: r["id"])] == [
            (1, 7),
            (2, 14),
        ]

    def test_bad_budget(self, spark):
        df = spark.createDataFrame([(1, 1)], ["id", "tok"])
        with pytest.raises(ValueError, match="budget"):
            token_budget_filter(df, "tok", 0, order_by=["id"])

    def test_window_is_partitioned(self, spark):
        """Scale contract: the cumulative-sum window carries the shard
        key, so no single-partition global sort appears."""
        df = spark.createDataFrame([(1, "g", 5)], ["id", "g", "tok"])
        plan = (
            token_budget_filter(df, "tok", 10, order_by=["id"], by=["g"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "hashpartitioning(g" in plan


class TestShardedPrefixSum:
    """Two-phase prefix-sum path (VERDICT r2 #4): a single-language
    corpus spread over >=8 monotone range buckets must select exactly
    the same rows as the one-window-task path."""

    def _corpus(self, spark, n=4000):
        # deterministic scores with duplicates, one giant shard
        rows = [
            (i, "en", (i * 37) % 101 / 100.0, 5 + (i * 13) % 40)
            for i in range(n)
        ]
        return spark.createDataFrame(rows, ["id", "lang", "score", "tok"])

    def test_bucketed_budget_matches_single_window(self, spark):
        df = self._corpus(spark)
        order = [F.col("score").desc(), F.col("id")]
        # monotone non-decreasing along (score desc): flip the sign of
        # a range bucket on score -- 10 buckets via integer ranges
        df = df.withColumn(
            "bkt", -F.floor(F.col("score") * 10).cast("int")
        )
        base = token_budget_filter(
            df, "tok", 20000, order_by=order, by=["lang"], cum_col="cum"
        )
        two = token_budget_filter(
            df, "tok", 20000, order_by=order, by=["lang"],
            cum_col="cum", bucket_col="bkt",
        )
        a = sorted((r["id"], r["cum"]) for r in base.collect())
        b = sorted((r["id"], r["cum"]) for r in two.collect())
        assert a == b
        assert len(a) > 100  # non-trivial kept set

    def test_bucketed_budget_no_shard_column(self, spark):
        df = self._corpus(spark, n=1000).withColumn(
            "bkt", F.floor(F.col("id") / 125).cast("int")  # 8 buckets
        )
        base = token_budget_filter(df, "tok", 5000, order_by=["id"])
        two = token_budget_filter(
            df, "tok", 5000, order_by=["id"], bucket_col="bkt"
        )
        assert sorted(r["id"] for r in base.collect()) == sorted(
            r["id"] for r in two.collect()
        )

    def test_bucketed_plan_parallel_windows(self, spark):
        """Scale contract: the data-side window partitioning carries
        the bucket column, never the bare shard key alone."""
        df = self._corpus(spark, n=100).withColumn(
            "bkt", F.floor(F.col("id") / 25).cast("int")
        )
        plan = (
            token_budget_filter(
                df, "tok", 500, order_by=["id"], by=["lang"], bucket_col="bkt"
            )
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "hashpartitioning(lang" in plan and "bkt" in plan


class TestPrefixSumNullKeys:
    def test_null_shard_kept_bit_identical(self, spark):
        """NULL shard / bucket keys survive the two-phase path: the
        offsets join is null-safe, so the NULL-lang shard selects the
        same rows as the single-window path (code-review regression)."""
        from pyspark.sql import functions as F

        rows = [
            (i, None if i % 3 == 0 else "en", (i * 37) % 101 / 100.0, 7)
            for i in range(600)
        ]
        df = spark.createDataFrame(rows, ["id", "lang", "score", "tok"])
        df = df.withColumn("bkt", -F.floor(F.col("score") * 5).cast("int"))
        order = [F.col("score").desc(), F.col("id")]
        base = token_budget_filter(
            df, "tok", 700, order_by=order, by=["lang"], cum_col="cum"
        )
        two = token_budget_filter(
            df, "tok", 700, order_by=order, by=["lang"],
            cum_col="cum", bucket_col="bkt",
        )
        a = sorted((r["id"], r["cum"]) for r in base.collect())
        b = sorted((r["id"], r["cum"]) for r in two.collect())
        assert a == b
        assert any(r["lang"] is None for r in two.collect())
