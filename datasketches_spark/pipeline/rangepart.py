"""Sketch-driven range-partition planning — balanced boundaries for
sorting/partitioning a 100 TB table without sampling skew.

Spark's ``repartitionByRange`` re-samples per run (non-deterministic
boundaries, job-local); real pipelines need boundaries that are
DETERMINISTIC, persistable, and shared across jobs/days so that every
writer lands the same key in the same output partition (the same
problem Apache DataSketches' ``partitions`` package solves with
quantile sketches — org.apache.datasketches.partitions in the bundled
jar; this is the Spark-first equivalent on our mergeable KLL).

- :func:`partition_bounds` — n-1 balanced split points from a
  two-phase KLL build (blob-only shuffle; ONE bounded blob reaches
  the driver, never data).  Exact-mode sketches (k > rows) give exact
  quantile boundaries; estimation mode is within the KLL rank band.
- :func:`assign_range_partition` — the partition id of each row
  against FIXED bounds: ``pid = #{bounds <= value}``.  JVM-codegen
  comparison chain for small n; Arrow-batched numpy searchsorted
  above it.  Ties go to the HIGHER partition (searchsorted
  side='right' semantics) in both implementations.
- :func:`range_repartition` — convenience: assign + hash-repartition
  on the pid (exact partition-per-pid placement belongs to the
  writer: ``df.write.partitionBy(pid_col)``).
"""

from __future__ import annotations

from functools import reduce

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..aggregation import sketch_agg

# above this many boundaries the codegen comparison chain gives way to
# one Arrow-batched searchsorted (wide codegen expressions fall back
# to interpreted evaluation around the JVM method-size limit)
_CASE_CHAIN_MAX = 64


def partition_bounds(
    df: DataFrame,
    col: str,
    num_partitions: int,
    k: int = 32768,
    family: str = "kll",
) -> list[float]:
    """n-1 ascending split points that cut ``df[col]`` into
    ``num_partitions`` near-equal-row ranges.

    One quantile-sketch blob crosses the shuffle and reaches the
    driver — boundary planning costs O(k) driver memory at ANY input
    scale.  Boundaries are inclusive upper starts: value v belongs to
    partition ``#{bounds <= v}``.  ``family`` picks the quantile
    sketch: KLL (default; tightest bands) or the classic
    ``"quantiles"`` sketch, whose 2k base buffer stays EXACT twice as
    long at the same k (exactness threshold 2k rows vs k)."""
    if num_partitions < 2:
        raise ValueError("num_partitions must be >= 2")
    from pyspark.sql.types import StringType

    is_str = isinstance(df.schema[col].dataType, StringType)
    if is_str:
        # string sort keys plan through the string-items KLL
        # (sketches/kll_items.py, Apache KllItemsSketch wire); the
        # default "kll" silently routes there for convenience
        if family not in ("kll", "kll_items"):
            raise ValueError(
                f"string columns use the kll_items family, got {family!r}"
            )
        family = "kll_items"
    elif family not in ("kll", "quantiles", "req"):
        raise ValueError(f"family must be a quantile family, got {family!r}")
    ps = [i / num_partitions for i in range(1, num_partitions)]
    cast = str if is_str else float
    sql_t = "string" if is_str else "double"
    row = sketch_agg(
        df, col, family, k=k,
        finalize=lambda sk: {
            f"b{i}": cast(sk.get_quantile(p, True)) for i, p in enumerate(ps)
        },
        finalize_schema=", ".join(f"b{i} {sql_t}" for i in range(len(ps))),
    ).first()
    return [row[f"b{i}"] for i in range(len(ps))]


def assign_range_partition(
    df: DataFrame,
    col: str,
    bounds: list[float],
    output_col: str = "range_pid",
) -> DataFrame:
    """Stable partition id per row against FIXED bounds:
    ``pid = #{b in bounds : b <= value}``.  NULL and NaN values get a
    NULL pid — identically on BOTH implementations (Spark's NaN
    ordering would otherwise route NaN to the top cell on the codegen
    path while the Arrow path cannot distinguish NaN from NULL).

    The bounds are plan literals — whole-stage-codegen comparisons up
    to _CASE_CHAIN_MAX boundaries, a broadcast-free Arrow searchsorted
    beyond — so the assignment adds NO shuffle and NO join."""
    from pyspark.sql.types import DoubleType, FloatType, StringType

    is_str = isinstance(df.schema[col].dataType, StringType)
    if is_str:
        if any(not isinstance(b, str) for b in bounds):
            raise ValueError("string column needs string bounds")
        bs: list = sorted(bounds)
    else:
        bs = sorted(float(b) for b in bounds)
    c = F.col(col)
    is_float = isinstance(df.schema[col].dataType, (DoubleType, FloatType))
    if len(bs) <= _CASE_CHAIN_MAX:
        valid = c.isNotNull() & ~F.isnan(c) if is_float else c.isNotNull()
        # string comparisons are byte-wise UTF-8 on the JVM, which
        # equals code-point order — the same order Python str and the
        # Arrow path below use
        pid: Column = reduce(
            lambda acc, b: acc + (c >= F.lit(b)).cast("int"),
            bs,
            F.when(valid, F.lit(0)),
        )
        return df.withColumn(output_col, pid)

    import numpy as np

    if is_str:
        sarr = np.asarray(bs, dtype=object)

        @pandas_udf("int")
        def _pid_s(v: pd.Series) -> pd.Series:
            mask = v.notna()
            out = pd.Series([pd.NA] * len(v), dtype="Int32")
            if mask.any():
                vals = np.asarray(v[mask], dtype=object)
                out[mask] = np.searchsorted(sarr, vals, side="right").astype(
                    "int32"
                )
            return out

        return df.withColumn(output_col, _pid_s(c))

    arr = np.asarray(bs, dtype=np.float64)

    @pandas_udf("int")
    def _pid(v: pd.Series) -> pd.Series:
        vals = v.to_numpy(dtype="float64", na_value=np.nan)
        out = np.searchsorted(arr, vals, side="right").astype("float64")
        out[np.isnan(vals)] = np.nan
        return pd.Series(out).astype("Int32")

    return df.withColumn(output_col, _pid(c))


def range_repartition(
    df: DataFrame,
    col: str,
    num_partitions: int,
    k: int = 32768,
    bounds: list[float] | None = None,
    output_col: str = "range_pid",
    family: str = "kll",
) -> DataFrame:
    """Deterministically range-repartition ``df`` on ``col``: computed
    (or supplied, persisted) bounds -> pid column -> one shuffle keyed
    on the pid.  Unlike ``repartitionByRange`` the boundaries are a
    pure function of the data (and reusable across jobs): re-running
    the pipeline lands rows in the same partitions."""
    if bounds is None:
        bounds = partition_bounds(df, col, num_partitions, k=k, family=family)
    out = assign_range_partition(df, col, bounds, output_col)
    return out.repartition(num_partitions, F.col(output_col))
