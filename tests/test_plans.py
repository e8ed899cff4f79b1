"""Plan lint: red flags fire on known-bad shapes, stay quiet on good ones."""

import pytest
from pyspark.sql import functions as F

from datasketches_spark.plans import assert_scalable, scalability_report


class TestPlanLint:
    def test_cartesian_flagged(self, spark):
        a = spark.range(10).withColumnRenamed("id", "x")
        b = spark.range(10).withColumnRenamed("id", "y")
        bad = a.crossJoin(b)
        rep = scalability_report(bad)
        pats = {f["pattern"] for f in rep["flags"]}
        assert pats & {"CartesianProduct", "BroadcastNestedLoopJoin"}
        with pytest.raises(ValueError, match="anti-pattern"):
            assert_scalable(bad)

    def test_allow_suppresses(self, spark):
        a = spark.range(10).withColumnRenamed("id", "x")
        b = spark.range(10).withColumnRenamed("id", "y")
        bad = a.crossJoin(b)
        rep = assert_scalable(
            bad, allow=("CartesianProduct", "BroadcastNestedLoopJoin")
        )
        assert rep["num_exchanges"] >= 0

    def test_global_window_flagged(self, spark):
        from pyspark.sql import Window

        df = spark.range(100).withColumn(
            "rn", F.row_number().over(Window.orderBy("id"))
        )
        pats = {f["pattern"] for f in scalability_report(df)["flags"]}
        assert "Exchange SinglePartition" in pats

    def test_equi_join_clean(self, spark):
        from datasketches_spark.pipeline.rangejoin import range_join

        left = spark.createDataFrame([(1, 0, 100)], ["lid", "k", "lt"])
        right = spark.createDataFrame([(2, 0, 150)], ["rid", "k", "rt"])
        rep = assert_scalable(range_join(left, right, "lt", "rt", 0, 60, by="k"))
        assert rep["flags"] == []

    def test_sharded_packing_clean_unsharded_flagged(self, spark):
        from datasketches_spark.pipeline.packing import chunk_pack

        df = spark.createDataFrame(
            [("a", 1, 30), ("b", 2, 40)], ["shard", "doc_id", "n_tok"]
        )
        assert_scalable(chunk_pack(df, "n_tok", 64, "doc_id", by=["shard"]))
        pats = {
            f["pattern"]
            for f in scalability_report(chunk_pack(df, "n_tok", 64, "doc_id"))[
                "flags"
            ]
        }
        assert "Exchange SinglePartition" in pats


# Benign shapes a declared query may carry (each is bounded by
# construction and safe at any scale):
# - Exchange SinglePartition: a one-row GLOBAL aggregate whose input is
#   already partial-aggregated (sketch blobs / partial counts), or an
#   ordered window over a per-group sketch frame (O(groups) rows).
# - BroadcastNestedLoopJoin: a cross join whose build side is a
#   one-row frame (global-aggregate scalar, capacity scalar, bounds
#   frame) or the broadcast query set of an ANN lookup.
_SWEEP_ALLOW = ("Exchange SinglePartition", "BroadcastNestedLoopJoin")


class TestEntryQuerySweep:
    """Every declared query must plan free of CartesianProduct — the
    one flag with no benign reading.  This is the regression guard for
    'an equi-join formulation silently degraded to all-pairs'."""

    def test_no_cartesian_in_any_declared_query(self, spark):
        import __spark_entry__ as entry
        from datasketches_spark import register

        register(spark)
        sf = "/root/testdata/sf0.001"
        offenders = {}
        # Construct+plan the 164 queries from a small thread pool
        # (guide §2.6: overlap independent jobs).  Each item is mostly
        # py4j/JVM planning latency (plus the eager build jobs some
        # query constructors run), during which the GIL is released,
        # so 8 in flight cut this sweep's wall time ~4x (it was the
        # single slowest test in the r15 durations profile, 267 s
        # under load).  Results are order-independent.
        from concurrent.futures import ThreadPoolExecutor

        def check(item):
            name, fn = item
            rep = scalability_report(fn(spark, sf))
            return name, {f["pattern"] for f in rep["flags"]}

        # Longest-first (LPT) submission order: the streaming gates run
        # a real micro-batch replay at construction (13-42 s each) and
        # sit near the END of the registry dict, so in registry order
        # they form the makespan tail after the pool has drained the
        # cheap items.  Starting them first overlaps their replays with
        # the ~150 cheap constructions instead of after them.
        items = sorted(
            entry.queries().items(),
            key=lambda kv: (not kv[0].startswith("streaming"),),
        )
        with ThreadPoolExecutor(max_workers=8) as pool:
            results = list(pool.map(check, items))
        for name, pats in results:
            if "CartesianProduct" in pats:
                offenders[name] = sorted(pats)
            # anything beyond the documented-allow set is a failure too
            extra = pats - set(_SWEEP_ALLOW) - {"CartesianProduct"}
            if extra:
                offenders[name] = sorted(pats)
        assert offenders == {}
