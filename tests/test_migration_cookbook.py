"""Execute every Spark SQL block in docs/MIGRATION.md.

The cookbook's contract is that a reference (DuckDB extension) user
can port any query by lookup — which only holds if every Spark-side
snippet actually runs.  This test extracts every ```sql fenced block
(```duckdb blocks are the originals, not executed), runs the
statements in document order in one session (temp views carry over,
as they would in a user session), and checks any ``-- expect:``
annotation against the first column of the first row.
"""

import os
import re

import pytest

DOC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs",
    "MIGRATION.md",
)

_BLOCK_RE = re.compile(r"```sql\n(.*?)```", re.DOTALL)


def _blocks():
    with open(DOC) as f:
        text = f.read()
    return [m.group(1) for m in _BLOCK_RE.finditer(text)]


def _statements(block: str):
    """Split on top-level semicolons (cookbook SQL never embeds ';'
    in literals — enforced here by refusing quoted semicolons)."""
    # odd-index segments of a quote-split are INSIDE string literals
    if any(";" in seg for seg in block.split("'")[1::2]):
        raise AssertionError(
            "cookbook block embeds ';' inside a string literal — the "
            "splitter can't handle that; rewrite the snippet"
        )
    for raw in block.split(";"):
        stmt = raw.strip()
        if stmt:
            yield stmt


def test_cookbook_has_blocks():
    assert len(_blocks()) >= 20, "cookbook looks truncated"


def test_every_spark_block_runs(spark):
    from datasketches_spark import register

    register(spark)
    failures = []
    for i, block in enumerate(_blocks()):
        expect = None
        m = re.search(r"^--\s*expect:\s*(.+)$", block, re.MULTILINE)
        if m:
            expect = m.group(1).strip()
        try:
            rows = None
            for stmt in _statements(block):
                rows = spark.sql(stmt).collect()
            if expect is not None:
                got = str(rows[0][0])
                assert got == expect, f"block {i}: expect {expect!r}, got {got!r}"
        except AssertionError as e:
            failures.append(str(e))
        except Exception as e:  # noqa: BLE001
            failures.append(f"block {i} failed: {type(e).__name__}: {e}")
    assert failures == [], "\n".join(failures)
