"""Plan-shape canaries for the r14/r15 optimizer-vs-Catalyst wins.

Round 14 proved why these exist: the r7 repartition-before-regex win
had been *silently* undone by filter pushdown — correctness gates
cannot see a perf-only plan regression.  Each test pins the plan
structure a measured win depends on (the Arrow-sentinel canary
pattern, tests/test_arrow_sentinel_canary.py):

1. curation: the quality Filter must sit ABOVE the narrow-gate
   round-robin Exchange (the ``+ rand(7)*0.0`` nondeterminism taint
   blocks pushdown; a future Catalyst rule that constant-folds
   nondeterministic-times-zero would push it back below).
2. duplicate_spans (narrow gate): the count branch and the probe
   branch must share ONE cached explode (two InMemoryTableScan
   consumers) instead of re-running the scan + n-gram build.
3. remove_common_lines (narrow gate): same shared-cache shape for the
   line explode.
4. minhash/simhash signature fan-out (r15, opt-in): ``fan_out=True``
   must put a round-robin Exchange under the Python pass on a narrow
   scan; the default must not.
"""

from datasketches_spark import compat

SF_DIR = "/root/testdata/sf0.001"


def _is_node(line: str, name: str) -> bool:
    """True when the plan line IS this operator node (not a substring
    hit like the scan's ``PushedFilters: []``)."""
    return line.lstrip(" +-:*(0123456789)").startswith(name)


def _docs(spark):
    import __spark_entry__ as entrymod

    return entrymod._t(spark, SF_DIR, "documents")


class TestCurationFilterAboveExchange:
    def test_quality_filter_not_pushed_below_fanout(self, spark):
        import __spark_entry__ as entrymod

        plan = compat.physical_plan_string(
            entrymod._curation_eligible(spark, SF_DIR)
        )
        assert "rand(7)" in plan, "nondeterminism taint folded away"
        lines = plan.splitlines()
        rr = [i for i, ln in enumerate(lines) if "RoundRobinPartitioning" in ln]
        assert rr, "narrow-gate fan-out exchange missing"
        below = lines[rr[0] + 1 :]
        assert not any(
            _is_node(ln, "Filter") for ln in below
        ), "quality filter pushed below the fan-out exchange (r7/r14 win undone)"
        above = lines[: rr[0]]
        assert any(
            _is_node(ln, "Filter") and "quality" in ln for ln in above
        ), "quality filter missing above the exchange"


class TestSpansSharedCache:
    def test_duplicate_spans_single_cached_explode(self, spark):
        from datasketches_spark.pipeline import spans as S

        try:
            plan = compat.physical_plan_string(
                S.duplicate_spans(_docs(spark), "doc_id", "text", n=8, min_count=2)
            )
            assert plan.count("InMemoryTableScan") >= 2, (
                "count+probe branches no longer share one cached explode "
                "(r14 win undone: each branch re-scans and re-explodes)"
            )
        finally:
            spark.catalog.clearCache()

    def test_remove_common_lines_single_cached_explode(self, spark):
        from datasketches_spark.pipeline import spans as S

        try:
            plan = compat.physical_plan_string(
                S.remove_common_lines(_docs(spark), "doc_id", "text", min_docs=2)
            )
            assert plan.count("InMemoryTableScan") >= 2, (
                "count+strip branches no longer share one cached explode"
            )
        finally:
            spark.catalog.clearCache()


class TestSignatureFanOut:
    def test_minhash_fan_out_opt_in_plan_and_parity(self, spark):
        from datasketches_spark.pipeline import dedup as D

        docs = _docs(spark)
        default_plan = compat.physical_plan_string(
            D.minhash_signatures(docs, "doc_id", "text")
        )
        assert "RoundRobinPartitioning" not in default_plan, (
            "default signature pass gained an exchange (measured 2.2x "
            "LOSS on filtered slices — fan-out must stay opt-in)"
        )
        fanned = D.minhash_signatures(docs, "doc_id", "text", fan_out=True)
        assert "RoundRobinPartitioning" in compat.physical_plan_string(fanned)
        base = sorted(
            map(str, D.minhash_signatures(docs, "doc_id", "text").collect())
        )
        assert sorted(map(str, fanned.collect())) == base

    def test_simhash_fan_out_opt_in(self, spark):
        from datasketches_spark.pipeline import dedup as D

        docs = _docs(spark)
        assert "RoundRobinPartitioning" not in compat.physical_plan_string(
            D.simhash64(docs, "doc_id", "text")
        )
        fanned = D.simhash64(docs, "doc_id", "text", fan_out=True)
        assert "RoundRobinPartitioning" in compat.physical_plan_string(fanned)
        assert sorted(map(str, fanned.collect())) == sorted(
            map(str, D.simhash64(docs, "doc_id", "text").collect())
        )
