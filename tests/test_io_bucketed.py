"""Bucketed sketch tables: shuffle-free co-located merge."""

import pytest
from pyspark.sql import functions as F

import datasketches_spark.io as dio
from datasketches_spark import register
from datasketches_spark.aggregation import sketch_agg
from datasketches_spark.sketches import ThetaSketch


@pytest.fixture(autouse=True)
def _reg(spark):
    register(spark)
    yield
    for t in ("day1_sk", "day2_sk"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _day_sketches(spark, start, end):
    df = spark.range(start, end).select(
        (F.col("id") % 16).alias("g"), F.col("id").alias("user_id")
    )
    return sketch_agg(df, "user_id", "theta", group_cols=["g"], k=14)


class TestBucketedSketchTables:
    def test_merge_is_shuffle_free_and_correct(self, spark):
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            day1 = _day_sketches(spark, 0, 4000)
            day2 = _day_sketches(spark, 2000, 6000)  # overlapping users
            dio.write_bucketed_sketch_table(
                day1, "day1_sk", ["g"], num_buckets=8, family="theta", k=14
            )
            dio.write_bucketed_sketch_table(
                day2, "day2_sk", ["g"], num_buckets=8, family="theta", k=14
            )
            merged = dio.merge_bucketed_sketch_tables(
                spark, "day1_sk", "day2_sk", ["g"], "datasketch_theta_union"
            )
            plan = merged._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan  # co-located: no shuffle

            out = merged.select(
                "g", F.expr("datasketch_theta_estimate(sketch)").alias("est")
            ).collect()
            # exact mode: each group holds 6000/16 = 375 distinct users
            assert len(out) == 16
            assert all(r["est"] == 375.0 for r in out)
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    def test_disjoint_groups_survive_outer_merge(self, spark):
        d1 = _day_sketches(spark, 0, 1600).filter(F.col("g") < 8)
        d2 = _day_sketches(spark, 0, 1600).filter(F.col("g") >= 8)
        dio.write_bucketed_sketch_table(d1, "day1_sk", ["g"], num_buckets=4)
        dio.write_bucketed_sketch_table(d2, "day2_sk", ["g"], num_buckets=4)
        merged = dio.merge_bucketed_sketch_tables(
            spark, "day1_sk", "day2_sk", ["g"], "datasketch_theta_union"
        )
        out = merged.select(
            "g", F.expr("datasketch_theta_estimate(sketch)").alias("est")
        ).collect()
        assert len(out) == 16
        assert all(r["est"] == 100.0 for r in out)
