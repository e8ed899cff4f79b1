"""Two-sample KS distance: exact-mode parity with brute force, SQL surface."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from datasketches_spark import register
from datasketches_spark.aggregation import sketch_agg
from datasketches_spark.sketches import KllSketch


def _brute_ks(a: np.ndarray, b: np.ndarray) -> float:
    xs = np.union1d(a, b)
    fa = np.searchsorted(np.sort(a), xs, side="right") / a.size
    fb = np.searchsorted(np.sort(b), xs, side="right") / b.size
    return float(np.max(np.abs(fa - fb)))


class TestKsDistance:
    def test_exact_mode_matches_brute_force(self):
        rng = np.random.default_rng(5)
        a = rng.normal(0, 1, 3000)
        b = rng.normal(0.3, 1.2, 2000)
        ska, skb = KllSketch(8192), KllSketch(8192)
        ska.update(a)
        skb.update(b)
        assert not ska.is_estimation_mode and not skb.is_estimation_mode
        assert ska.ks_distance(skb) == pytest.approx(_brute_ks(a, b), abs=1e-12)

    def test_identity_and_disjoint(self):
        a = KllSketch(1024)
        a.update(np.arange(100, dtype=np.float64))
        assert a.ks_distance(a) == 0.0
        b = KllSketch(1024)
        b.update(np.arange(1000, 1100, dtype=np.float64))
        assert a.ks_distance(b) == 1.0

    def test_empty_gives_nan(self):
        a, b = KllSketch(256), KllSketch(256)
        b.update(np.ones(5))
        assert np.isnan(a.ks_distance(b))

    def test_estimation_mode_close(self):
        rng = np.random.default_rng(9)
        a = rng.normal(0, 1, 200_000)
        b = rng.normal(0.5, 1, 200_000)
        ska, skb = KllSketch(200), KllSketch(200)
        ska.update(a)
        skb.update(b)
        assert ska.is_estimation_mode
        # true KS ~= 0.197 for a 0.5 sigma shift
        assert ska.ks_distance(skb) == pytest.approx(_brute_ks(a, b), abs=0.03)

    def test_sql_surface(self, spark):
        register(spark)
        df = spark.range(2000).select(
            (F.col("id") % 2).alias("g"),
            (F.col("id") + (F.col("id") % 2) * 500).cast("double").alias("x"),
        )
        sk = sketch_agg(df, "x", "kll", group_cols=["g"], k=8192)
        pair = (
            sk.filter("g = 0")
            .select(F.col("sketch").alias("ska"))
            .crossJoin(sk.filter("g = 1").select(F.col("sketch").alias("skb")))
        )
        row = pair.select(
            F.expr("datasketch_kll_ks(ska, skb)").alias("ks"),
            F.expr("datasketch_kll_ks(ska, ska)").alias("self_ks"),
        ).first()
        assert 0.2 < row["ks"] <= 1.0
        assert row["self_ks"] == 0.0
