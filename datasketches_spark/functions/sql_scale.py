"""The two-phase blob-only scale plan from a pure ``spark.sql()`` entry.

The pandas-UDAF registrations (``datasketch_theta(x)`` etc.) shuffle
RAW ROWS to the reducer — Spark runs grouped-agg pandas UDFs without
partial aggregation (documented trade-off in
functions/aggregates.py).  DataFrame users get the scale plan through
:func:`datasketches_spark.aggregation.sketch_agg`; this module gives
SQL-only users the same plan shape without leaving SQL:

    SELECT g, datasketch_theta(sketch) AS sketch
    FROM datasketch_partials(TABLE(SELECT g, x FROM t), 'theta', 14)
    GROUP BY g

``datasketch_partials`` is a Python UDTF over an UNPARTITIONED table
argument: Spark evaluates it once per EXISTING input partition with no
exchange (verified empirically and plan-tested in
tests/test_sql_scale.py), so phase 1 emits one bounded sketch blob per
(input partition × group) — the map-side combine.  The outer GROUP BY
then shuffles ONLY those blobs, and the family's aggregate merges them
(every ``datasketch_<family>`` UDAF merges when fed blobs).  That is
exactly ``sketch_agg``'s plan: scan → per-partition partials →
blob-only exchange → merge.

Contract of the table argument: every column EXCEPT THE LAST is a
group key; the LAST column is the value being sketched.  Do NOT write
``PARTITION BY`` in the call — that would re-introduce the raw-row
shuffle this exists to avoid (a single-partition spec likewise
serializes the scan).

Scale note vs sketch_agg: the plan (and therefore the shuffle volume,
the thing that breaks at 100 TB) is identical, but UDTF evaluation is
row-at-a-time into a buffer while mapInPandas is Arrow-batched — the
map phase runs slower by a constant factor.  SQL-only entry points are
the use case; from Python always prefer ``sketch_agg``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_FAMILIES_WITH_DEFAULT_K = frozenset(["theta", "frequent_items", "stats"])


def _make_partials_udtf():
    # built lazily inside register_sql_scale: pyspark parses UDTF return
    # schemas against the active session, same as the scalar registry
    from pyspark.sql.functions import AnalyzeArgument, AnalyzeResult, udtf
    from pyspark.sql.types import BinaryType, StructType

    class DatasketchPartials:
        """eval() buffers (group_key -> values); terminate() builds one
        sketch per group seen in this partition and emits its blob."""

        def __init__(self):
            self._groups: dict[tuple, list] = {}
            self._family: str | None = None
            self._k = None

        @staticmethod
        def analyze(table: AnalyzeArgument, family: AnalyzeArgument, k=None):
            if not isinstance(table.dataType, StructType):
                raise ValueError("first argument must be TABLE(...)")
            if len(table.dataType.fields) < 1:
                raise ValueError(
                    "TABLE argument needs at least a value column"
                )
            fam = family.value
            if fam is None:
                raise ValueError(
                    "family must be a constant string, e.g. 'theta'"
                )
            out = StructType()
            for f in table.dataType.fields[:-1]:
                out = out.add(f.name, f.dataType)
            out = out.add("sketch", BinaryType())
            return AnalyzeResult(schema=out)

        def eval(self, row, family: str, k=None):
            if self._family is None:
                self._family = family
                self._k = k
            vals = list(row)
            key, v = tuple(vals[:-1]), vals[-1]
            if v is not None:
                self._groups.setdefault(key, []).append(v)

        def terminate(self):
            if self._family is None:
                return
            import pandas as pd

            from ..families import build_params, create_sketch, update_sketch

            for key, vals in self._groups.items():
                s = pd.Series(vals)
                sk = create_sketch(
                    self._family, build_params(self._family, self._k, s)
                )
                update_sketch(self._family, sk, s)
                yield (*key, sk.serialize())

    return udtf(DatasketchPartials)


def register_sql_scale(spark: SparkSession) -> list[str]:
    """Register the SQL-surface scale-path helpers (idempotent)."""
    spark.udtf.register("datasketch_partials", _make_partials_udtf())
    return ["datasketch_partials"]
