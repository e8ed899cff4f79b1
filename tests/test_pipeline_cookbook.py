"""Execute every ```python block in docs/PIPELINE.md.

The curation cookbook's contract is that the end-to-end walkthrough
actually runs and its claims hold — the `assert` lines are part of the
examples.  Blocks run in document order in ONE shared namespace (so
`docs`, `N_DOCS` etc. carry forward, as they would in a user session)
with `spark` provided and the SQL functions registered.
"""

import os
import re

DOC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs",
    "PIPELINE.md",
)

_BLOCK_RE = re.compile(r"```python\n(.*?)```", re.DOTALL)


def _blocks():
    with open(DOC) as f:
        return [m.group(1) for m in _BLOCK_RE.finditer(f.read())]


def test_cookbook_has_blocks():
    assert len(_blocks()) >= 10, "pipeline cookbook looks truncated"


def test_every_block_runs(spark):
    from datasketches_spark import register

    register(spark)
    ns = {"spark": spark}
    for i, block in enumerate(_blocks()):
        try:
            exec(compile(block, f"PIPELINE.md[block {i}]", "exec"), ns)
        except Exception as e:  # noqa: BLE001
            raise AssertionError(
                f"PIPELINE.md block {i} failed: {type(e).__name__}: {e}"
            ) from e
