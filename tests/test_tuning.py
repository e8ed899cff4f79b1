"""tuning.recommended_confs is the user-facing statement of the bench
session's measured conf choices — pin the two in sync so a bench tune
can't silently diverge from what we tell users to set.

The critical entry is the Arrow byte-limit sentinel: any finite
``maxBytesPerBatch`` triggers a per-row ``ArrowWriter.sizeInBytes()``
in ``BatchedPythonArrowInput.writeSizedBatch`` whose JIT profile
decays ~6x after the first grouped-map stage (round-9 finding, see
tuning.py module docstring).  Only the exact Int.MaxValue sentinel
short-circuits the check, so the VALUE is load-bearing, not stylistic.
"""

import ast
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from datasketches_spark import tuning


def _session_confs(relpath: str) -> dict[str, str]:
    """Extract the .config(k, v) pairs from a script's builder chain
    without importing (parsing keeps this test independent of the
    script's own import side effects)."""
    path = os.path.join(os.path.dirname(__file__), "..", relpath)
    tree = ast.parse(open(path).read())
    confs = {}
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "config"
            and len(node.args) == 2
            and all(isinstance(a, ast.Constant) for a in node.args)
        ):
            confs[node.args[0].value] = str(node.args[1].value)
    return confs


def test_arrow_byte_limit_is_the_exact_sentinel():
    # BatchedPythonArrowInput.underBatchSizeLimit compares the parsed
    # limit to Int.MaxValue EXACTLY — 2147483646b would per-row-check.
    assert tuning.ARROW_BYTE_LIMIT_OFF == "2147483647b"
    confs = tuning.recommended_confs()
    assert (
        confs["spark.sql.execution.arrow.maxBytesPerBatch"]
        == tuning.ARROW_BYTE_LIMIT_OFF
    )


def test_cluster_confs_are_a_subset_of_local():
    base = tuning.recommended_confs(local=False)
    full = tuning.recommended_confs(local=True)
    assert set(base) < set(full)
    for k, v in base.items():
        assert full[k] == v
    # cluster-safe set must not pin local-only knobs
    for k in ("spark.sql.shuffle.partitions", "spark.sql.adaptive.enabled"):
        assert k not in base


def test_bench_session_matches_recommendations():
    bench_confs = _session_confs("bench.py")
    for k, v in tuning.recommended_confs(local=True).items():
        assert bench_confs.get(k) == v, (
            f"bench.py sets {k}={bench_confs.get(k)!r}, "
            f"tuning.py recommends {v!r} — keep them in sync"
        )


def test_oracle_gate_session_sets_the_sentinel():
    # the 110-pair gate mixes applyInPandas and mapInPandas stages all
    # session long — exactly the degradation shape; keep it protected
    confs = _session_confs("scripts/check_oracle.py")
    assert (
        confs.get("spark.sql.execution.arrow.maxBytesPerBatch")
        == tuning.ARROW_BYTE_LIMIT_OFF
    )
