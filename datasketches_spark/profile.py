"""One-pass table profiler: exact metadata + sketch estimates per column.

The reference's README pitches stored sketches as the substrate for
"data profiling" workflows (sketch state as data,
/root/reference/docs/README.md:9 and the stored-sketch examples in
test/sql/datasketch_hll.test:111-145); DuckDB users compose that by
hand, one aggregate query per column per metric.  This operator does
the whole profile in TWO scans regardless of column count:

  scan 1 (pure JVM, whole-stage codegen, no Python):  count(*),
      per-column non-null counts and min/max, in ONE global aggregate
      -- Catalyst computes every expression in the same pass and the
      map-side partials mean only one tiny row per task shuffles;
  scan 2 (Python sketch path, one shuffle of a single blob row):
      ``sketch_agg_multi`` folds a Theta sketch (distinct estimate)
      for every column plus a KLL sketch (quantiles) for every numeric
      column -- N sketches for the price of one scan.

The assembly (cross join of two 1-row frames, explode of per-column
structs) is constant-size driver work.  At 100 TB the cost is exactly
two scans of the pruned column set; the alternative -- one query per
column x metric -- is 5N scans.

Determinism contract (for the oracle gate): with exact-mode sketch
parameters (cardinality <= 2^lg_k for Theta, group size <= KLL
capacity) every output value is exact, so the profile hash-matches a
plain-SQL oracle.  In estimation mode the same columns carry the
sketches' usual error bands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ByteType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
)

from .aggregation import sketch_agg_multi

_NUMERIC = (ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)


def _ensure_registered(df: DataFrame) -> None:
    from . import register

    spark = df.sparkSession
    if not spark.catalog.functionExists("datasketch_theta_estimate"):
        register(spark)


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    lg_k: int = 16,
    kll_k: int = 32768,
    quantile_probs: tuple[float, ...] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Profile ``columns`` (default: all string/numeric) in two scans.

    Returns one row per column:
      column, n_rows, n_nonnull, n_null          -- exact (JVM scan)
      distinct_est                               -- Theta estimate
      min_num, max_num, q_* (one per prob)       -- numeric cols only
      min_str, max_str                           -- string cols only
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    if columns is None:
        columns = [
            n for n, t in fields.items() if isinstance(t, _NUMERIC + (StringType,))
        ]
    for c in columns:
        if c not in fields:
            raise ValueError(f"profile_table: no such column {c!r}")
        if not isinstance(fields[c], _NUMERIC + (StringType,)):
            raise ValueError(
                f"profile_table: unsupported type {fields[c]} for column {c!r}"
            )
    if not columns:
        raise ValueError("profile_table: no profilable columns")
    numeric = [c for c in columns if isinstance(fields[c], _NUMERIC)]
    _ensure_registered(df)

    # scan 1: every exact stat in one JVM aggregate
    exact_exprs = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        exact_exprs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        if c in numeric:
            exact_exprs.append(F.min(c).cast("double").alias(f"__min_{c}"))
            exact_exprs.append(F.max(c).cast("double").alias(f"__max_{c}"))
        else:
            exact_exprs.append(F.min(c).alias(f"__min_{c}"))
            exact_exprs.append(F.max(c).alias(f"__max_{c}"))
    exact = df.agg(*exact_exprs)

    # scan 2: all sketches in one pass (one blob row crosses the
    # shuffle), answered by the fused finalize in the SAME merge round
    # -- no separate scalar-UDF pass over the blob frame
    specs = [(c, "theta", lg_k, f"__t_{c}") for c in columns]
    specs += [(c, "kll", kll_k, f"__q_{c}") for c in numeric]
    probs = [float(p) for p in quantile_probs]
    pct = [int(round(p * 100)) for p in probs]
    cols_f, num_f = list(columns), list(numeric)

    def _fin(sks):
        out = {}
        for c in cols_f:
            out[f"t_{c}"] = float(sks[f"__t_{c}"].get_estimate())
        for c in num_f:
            for p, pp in zip(probs, pct):
                # all-NULL column -> empty sketch -> get_quantile None;
                # surface NULL like the scalar SQL path does
                q = sks[f"__q_{c}"].get_quantile(p, True)
                out[f"q_{c}_{pp}"] = None if q is None else float(q)
        return out

    ddl = ", ".join(
        [f"`t_{c}` double" for c in columns]
        + [f"`q_{c}_{pp}` double" for c in numeric for pp in pct]
    )
    sketches = sketch_agg_multi(df, specs, finalize=_fin, finalize_schema=ddl)

    joined = exact.join(sketches)  # 1 row x 1 row

    null_d = F.lit(None).cast("double")
    structs = []
    for c in columns:
        parts = [
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            F.col(f"__nn_{c}").alias("n_nonnull"),
            (F.col("__n") - F.col(f"__nn_{c}")).alias("n_null"),
            F.col(f"t_{c}").alias("distinct_est"),
        ]
        if c in numeric:
            parts += [
                F.col(f"__min_{c}").alias("min_num"),
                F.col(f"__max_{c}").alias("max_num"),
            ]
            for pp in pct:
                parts.append(F.col(f"q_{c}_{pp}").alias(f"q_{pp}"))
            parts += [
                F.lit(None).cast("string").alias("min_str"),
                F.lit(None).cast("string").alias("max_str"),
            ]
        else:
            parts += [null_d.alias("min_num"), null_d.alias("max_num")]
            parts += [
                null_d.alias(f"q_{int(round(p * 100))}") for p in quantile_probs
            ]
            parts += [
                F.col(f"__min_{c}").alias("min_str"),
                F.col(f"__max_{c}").alias("max_str"),
            ]
        structs.append(F.struct(*parts))

    return joined.select(F.explode(F.array(*structs)).alias("p")).select("p.*")
