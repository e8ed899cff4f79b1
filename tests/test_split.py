"""Hash split: determinism, proportions, repartition invariance."""

import pytest
from pyspark.sql import functions as F

from datasketches_spark.pipeline.split import (
    hash_split,
    pseudo_shuffle,
    unit_hash,
)


class TestHashSplit:
    def test_proportions_and_determinism(self, spark):
        df = spark.range(20000).withColumnRenamed("id", "doc_id")
        w = {"train": 0.8, "val": 0.1, "test": 0.1}
        counts = {
            r["split"]: r["count"]
            for r in hash_split(df, "doc_id", w).groupBy("split").count().collect()
        }
        assert set(counts) == {"train", "val", "test"}
        assert abs(counts["train"] / 20000 - 0.8) < 0.02
        assert abs(counts["val"] / 20000 - 0.1) < 0.01
        # exact re-run determinism
        again = {
            r["split"]: r["count"]
            for r in hash_split(df, "doc_id", w).groupBy("split").count().collect()
        }
        assert counts == again

    def test_repartition_invariant(self, spark):
        df = spark.range(5000).withColumnRenamed("id", "doc_id")
        w = {"train": 0.9, "test": 0.1}
        a = hash_split(df, "doc_id", w).filter(F.col("split") == "test")
        b = hash_split(df.repartition(17), "doc_id", w).filter(
            F.col("split") == "test"
        )
        assert sorted(r["doc_id"] for r in a.collect()) == sorted(
            r["doc_id"] for r in b.collect()
        )

    def test_salt_changes_membership(self, spark):
        df = spark.range(5000).withColumnRenamed("id", "doc_id")
        w = {"a": 0.5, "b": 0.5}
        s1 = set(
            r["doc_id"]
            for r in hash_split(df, "doc_id", w).filter("split = 'a'").collect()
        )
        s2 = set(
            r["doc_id"]
            for r in hash_split(df, "doc_id", w, salt="v2")
            .filter("split = 'a'")
            .collect()
        )
        assert s1 != s2
        assert 0.3 < len(s1 & s2) / len(s1) < 0.7  # independent re-roll

    def test_weights_normalized(self, spark):
        df = spark.range(4000).withColumnRenamed("id", "doc_id")
        counts = {
            r["split"]: r["count"]
            for r in hash_split(df, "doc_id", {"x": 3, "y": 1})
            .groupBy("split")
            .count()
            .collect()
        }
        assert abs(counts["x"] / 4000 - 0.75) < 0.03

    def test_bad_weights(self, spark):
        df = spark.range(10).withColumnRenamed("id", "doc_id")
        with pytest.raises(ValueError):
            hash_split(df, "doc_id", {})
        with pytest.raises(ValueError):
            hash_split(df, "doc_id", {"a": 0.0})

    def test_unit_hash_range_and_uniformity(self, spark):
        df = spark.range(10000)
        stats = df.select(unit_hash("id").alias("u")).agg(
            F.min("u"), F.max("u"), F.avg("u")
        ).first()
        assert 0.0 <= stats[0] and stats[1] < 1.0
        assert abs(stats[2] - 0.5) < 0.02

    def test_pseudo_shuffle_deterministic(self, spark):
        df = spark.range(1000).withColumnRenamed("id", "doc_id")
        a = [r["doc_id"] for r in pseudo_shuffle(df, "doc_id").collect()]
        b = [r["doc_id"] for r in pseudo_shuffle(df, "doc_id").collect()]
        assert a == b
        assert a != sorted(a)  # actually shuffled
        ranked = pseudo_shuffle(df, "doc_id", rank_col="pos")
        top = ranked.orderBy("pos").limit(5).collect()
        assert [r["pos"] for r in top] == [1, 2, 3, 4, 5]
        assert [r["doc_id"] for r in top] == a[:5]
