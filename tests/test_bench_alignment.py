"""The bench and DuckDB-proxy workloads must time the SAME query set.

Round-3 postmortem: a bench-head trim left the proxy timing two
retired queries and missing a new one, silently skewing the ratio the
perf gate compares.  This test pins the contract: every timed name
matches, except scalar_over_2k_stored (stored mergeable sketch state
has no DuckDB-native equivalent — the documented omission in
scripts/baseline_duckdb.py).  No Spark/DuckDB session is started.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import baseline_duckdb
import bench
import __spark_entry__ as entry


def test_proxy_times_exactly_the_bench_workload():
    proxy = set(baseline_duckdb.build_queries())
    timed = set(bench.HEADS) | {"hll_native_distinct", "scalar_over_2k_stored"}
    assert timed - proxy == {"scalar_over_2k_stored"}
    assert proxy - timed == set()


def test_bench_heads_are_registered_queries():
    q = set(entry.queries())
    missing = [h for h in bench.HEADS if h not in q]
    assert missing == []
