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
group key; the LAST column is the value being sketched.  Family
``'reservoir_weighted'`` takes the last TWO columns as (value,
weight) — the weighted sample on the same blob-only plan (mirrors
``sketch_agg(weight_col=)``).  Do NOT write ``PARTITION BY`` in the
call — that would re-introduce the raw-row shuffle this exists to
avoid (a single-partition spec likewise serializes the scan).

Map-phase memory is BOUNDED: eval() flushes each group's value buffer
into its (mergeable) sketch every ``FLUSH_ROWS`` values, so peak state
per task is O(groups-in-partition × (FLUSH_ROWS + sketch size)) — the
same bounded-state contract the reference's Combine machinery has
(reference codegen/generated.cpp.j2:305-341), never the whole decoded
partition as boxed Python objects.

Scale note vs sketch_agg: the plan (and therefore the shuffle volume,
the thing that breaks at 100 TB) is identical, but UDTF evaluation is
row-at-a-time into a buffer while mapInPandas is Arrow-batched — the
map phase runs slower by a constant factor.  SQL-only entry points are
the use case; from Python always prefer ``sketch_agg``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# Values buffered per group before they are folded into the group's
# sketch.  64k doubles ≈ 512 KB raw (a few MB as a Python list) —
# large enough to amortize the pandas/update call, small enough that a
# fat partition cannot blow out executor memory.
FLUSH_ROWS = 65536


class DatasketchPartials:
    """Map-side combine: eval() accumulates values per group key and
    folds them into a per-group sketch every FLUSH_ROWS values;
    terminate() flushes the remainder and emits one blob per group.

    ``max_buffered`` records the high-water mark of values held across
    all group buffers — tests assert it never exceeds
    FLUSH_ROWS × live groups (bounded-memory contract).
    """

    def __init__(self):
        self._buffers: dict[tuple, list] = {}
        self._sketches: dict[tuple, object] = {}
        self._family: str | None = None
        self._k = None
        self._buffered = 0
        self.max_buffered = 0

    @staticmethod
    def analyze(table, family, k=None):
        from pyspark.sql.functions import AnalyzeResult
        from pyspark.sql.types import BinaryType, StructType

        if not isinstance(table.dataType, StructType):
            raise ValueError("first argument must be TABLE(...)")
        fam = family.value
        if fam is None:
            raise ValueError(
                "family must be a constant string, e.g. 'theta'"
            )
        n_val = 2 if fam in ("reservoir_weighted", "aod") else 1
        if len(table.dataType.fields) < n_val:
            raise ValueError(
                "TABLE argument needs a value column"
                + (
                    " and a weight column"
                    if fam == "reservoir_weighted"
                    else " (key) and a summary array column"
                    if fam == "aod"
                    else ""
                )
            )
        out = StructType()
        for f in table.dataType.fields[:-n_val]:
            out = out.add(f.name, f.dataType)
        out = out.add("sketch", BinaryType())
        return AnalyzeResult(schema=out)

    def _flush(self, key) -> None:
        vals = self._buffers[key]
        if not vals:
            return
        import pandas as pd

        from ..families import build_params, create_sketch, update_sketch

        weighted = self._family == "reservoir_weighted"
        if self._family == "aod":
            # (key, summary-array) pairs -> ArrayOfDoubles tuple sketch
            import numpy as np

            from ..sketches.tuple_aod import AodSketch

            first = next((a for _, a in vals if a is not None), None)
            m = len(first) if first is not None else 1
            sk = self._sketches.get(key)
            if sk is None:
                sk = self._sketches[key] = AodSketch(
                    int(self._k) if self._k is not None else 12, m
                )
            elif m > sk.num_values:
                # an earlier flush saw only NULL arrays (zero
                # summaries) — widen it now that the width is known
                sk._widen_to(m)
            mat = np.zeros((len(vals), sk.num_values), dtype=np.float64)
            for i, (_, a) in enumerate(vals):
                if a is not None:
                    if len(a) != sk.num_values:
                        raise ValueError(
                            "datasketch_partials('aod'): summary arrays "
                            f"must have a constant length (got {len(a)}, "
                            f"expected {sk.num_values})"
                        )
                    mat[i] = np.nan_to_num(
                        np.asarray(a, dtype=np.float64),
                        nan=0.0, posinf=np.inf, neginf=-np.inf,
                    )
            sk.update_batch(pd.Series([kv for kv, _ in vals]), mat)
            self._buffered -= len(vals)
            self._buffers[key] = []
            return
        fam = "reservoir" if weighted else self._family
        if weighted:
            s = pd.Series([v for v, _ in vals])
            w = pd.Series([wt for _, wt in vals], dtype="float64")
        else:
            s = pd.Series(vals)
        sk = self._sketches.get(key)
        if sk is None:
            sk = create_sketch(fam, build_params(fam, self._k, s))
            self._sketches[key] = sk
        if weighted:
            sk.update_series(s, weights=w)
        else:
            update_sketch(fam, sk, s)
        self._buffered -= len(vals)
        self._buffers[key] = []

    def eval(self, row, family: str, k=None):
        if self._family is None:
            self._family = family
            self._k = k
        vals = list(row)
        if family == "reservoir_weighted":
            key, v = tuple(vals[:-2]), (vals[-2], vals[-1])
            if v[0] is None or v[1] is None:
                return  # NULL value or weight: skipped like the UDAF
        elif family == "aod":
            key, v = tuple(vals[:-2]), (vals[-2], vals[-1])
            if v[0] is None:
                return  # NULL tuple key skips the row (UDAF parity);
                # a NULL summary array still counts the key (zeros)
        else:
            key, v = tuple(vals[:-1]), vals[-1]
            if v is None:
                # NULLs are skipped and never register the group (parity
                # with the r10 behavior and the UDAF NULL-skipping idiom)
                return
        buf = self._buffers.setdefault(key, [])
        buf.append(v)
        self._buffered += 1
        if self._buffered > self.max_buffered:
            self.max_buffered = self._buffered
        if len(buf) >= FLUSH_ROWS:
            self._flush(key)

    def terminate(self):
        if self._family is None:
            return
        for key in self._buffers:
            self._flush(key)
            yield (*key, self._sketches[key].serialize())


def _make_partials_udtf():
    # wrapped lazily inside register_sql_scale: pyspark parses UDTF
    # return schemas against the active session, same as the scalar
    # registry
    from pyspark.sql.functions import udtf

    return udtf(DatasketchPartials)


def register_sql_scale(spark: SparkSession) -> list[str]:
    """Register the SQL-surface scale-path helpers (idempotent)."""
    spark.udtf.register("datasketch_partials", _make_partials_udtf())
    return ["datasketch_partials"]
