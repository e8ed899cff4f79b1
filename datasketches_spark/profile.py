"""One-pass table profiler: exact metadata + sketch estimates per column.

The reference's README pitches stored sketches as the substrate for
"data profiling" workflows (sketch state as data,
/root/reference/docs/README.md:9 and the stored-sketch examples in
test/sql/datasketch_hll.test:111-145); DuckDB users compose that by
hand, one aggregate query per column per metric.  This operator does
the whole profile in ONE scan regardless of column count: a single
``sketch_agg_multi`` pass folds, per column, the exact mergeable
``stats`` state (count / non-null / min / max — sketches/stats.py), a
Theta sketch (distinct estimate), and for numeric columns a KLL sketch
(quantiles).  One blob row crosses the shuffle and the fused finalize
answers every metric in the merge round.

The assembly (explode of per-column structs over the 1-row result) is
constant-size work.  At 100 TB the cost is exactly one scan of the
pruned column set; the alternative -- one query per column x metric --
is 5N scans.

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
    string_quantiles: bool = False,
) -> DataFrame:
    """Profile ``columns`` (default: all string/numeric) in ONE scan.

    Returns one row per column:
      column, n_rows, n_nonnull, n_null          -- exact (stats family)
      distinct_est                               -- Theta estimate
      min_num, max_num, q_* (one per prob)       -- numeric cols only
      min_str, max_str                           -- string cols only
      q_str_* (one per prob)                     -- with
        ``string_quantiles=True``: quantiles of string columns via the
        string-items KLL (sketches/kll_items.py), folded into the SAME
        single scan; NULL for numeric columns.  Off by default (adds
        columns to the output schema).
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

    # ONE scan: per-column exact stats (the mergeable `stats` family),
    # a Theta sketch per column, and a KLL per numeric column all fold
    # in the same mapInPandas pass; one blob row crosses the shuffle
    # and the fused finalize answers every metric in the merge round.
    specs = [(c, "stats", None, f"__s_{c}") for c in columns]
    specs += [(c, "theta", lg_k, f"__t_{c}") for c in columns]
    specs += [(c, "kll", kll_k, f"__q_{c}") for c in numeric]
    strings = [c for c in columns if c not in numeric]
    if string_quantiles:
        specs += [(c, "kll_items", kll_k, f"__qs_{c}") for c in strings]
    probs = [float(p) for p in quantile_probs]
    pct = [int(round(p * 100)) for p in probs]
    cols_f, num_f = list(columns), list(numeric)
    str_f = list(strings) if string_quantiles else []

    def _fin(sks):
        out = {}
        for i, c in enumerate(cols_f):
            st = sks[f"__s_{c}"]
            if i == 0:
                out["n"] = int(st.get_n())
            out[f"nn_{c}"] = int(st.get_nonnull())
            if c in num_f:
                mn, mx = st.get_min(), st.get_max()
                out[f"min_{c}"] = None if mn is None else float(mn)
                out[f"max_{c}"] = None if mx is None else float(mx)
            else:
                out[f"min_{c}"] = st.get_min()
                out[f"max_{c}"] = st.get_max()
            out[f"t_{c}"] = float(sks[f"__t_{c}"].get_estimate())
        for c in num_f:
            for p, pp in zip(probs, pct):
                # all-NULL column -> empty sketch -> get_quantile None;
                # surface NULL like the scalar SQL path does
                q = sks[f"__q_{c}"].get_quantile(p, True)
                out[f"q_{c}_{pp}"] = None if q is None else float(q)
        for c in str_f:
            for p, pp in zip(probs, pct):
                q = sks[f"__qs_{c}"].get_quantile(p, True)
                out[f"qs_{c}_{pp}"] = None if q is None else str(q)
        return out

    ddl = ", ".join(
        ["`n` bigint"]
        + [f"`nn_{c}` bigint" for c in columns]
        + [
            f"`min_{c}` {'double' if c in numeric else 'string'}, "
            f"`max_{c}` {'double' if c in numeric else 'string'}"
            for c in columns
        ]
        + [f"`t_{c}` double" for c in columns]
        + [f"`q_{c}_{pp}` double" for c in numeric for pp in pct]
        + [f"`qs_{c}_{pp}` string" for c in str_f for pp in pct]
    )
    joined = sketch_agg_multi(df, specs, finalize=_fin, finalize_schema=ddl)

    null_d = F.lit(None).cast("double")
    structs = []
    for c in columns:
        parts = [
            F.lit(c).alias("column"),
            F.col("n").alias("n_rows"),
            F.col(f"nn_{c}").alias("n_nonnull"),
            (F.col("n") - F.col(f"nn_{c}")).alias("n_null"),
            F.col(f"t_{c}").alias("distinct_est"),
        ]
        if c in numeric:
            parts += [
                F.col(f"min_{c}").alias("min_num"),
                F.col(f"max_{c}").alias("max_num"),
            ]
            for pp in pct:
                parts.append(F.col(f"q_{c}_{pp}").alias(f"q_{pp}"))
            parts += [
                F.lit(None).cast("string").alias("min_str"),
                F.lit(None).cast("string").alias("max_str"),
            ]
            if string_quantiles:
                parts += [
                    F.lit(None).cast("string").alias(f"q_str_{pp}")
                    for pp in pct
                ]
        else:
            parts += [null_d.alias("min_num"), null_d.alias("max_num")]
            parts += [
                null_d.alias(f"q_{int(round(p * 100))}") for p in quantile_probs
            ]
            parts += [
                F.col(f"min_{c}").alias("min_str"),
                F.col(f"max_{c}").alias("max_str"),
            ]
            if string_quantiles:
                parts += [
                    F.col(f"qs_{c}_{pp}").alias(f"q_str_{pp}") for pp in pct
                ]
        structs.append(F.struct(*parts))

    return joined.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def drift_report(
    df_a: DataFrame,
    df_b: DataFrame,
    columns: list[str],
    k: int = 32768,
) -> DataFrame:
    """Per-column distribution drift between two corpora — the "did
    this week's data move?" report.

    One ``sketch_agg_multi`` scan per side builds a KLL + exact-stats
    blob per numeric column; the two one-row blob sets CROSS JOIN
    (blobs only — no raw rows meet) and every metric is a registered
    pair scalar:

      column, n_a, n_b, mean_a, mean_b, ks

    ``ks`` is the two-sample Kolmogorov-Smirnov statistic
    (``datasketch_kll_ks``) — EXACT while both sketches are in exact
    mode (k > rows), within the KLL rank band otherwise.  Monitoring
    convention: alert around ks > 0.1 for large samples, or feed the
    stored blobs to :func:`datasketches_spark.streaming.streaming_drift_monitor`
    for the continuous version.
    """
    for df in (df_a, df_b):
        fields = {f.name: f.dataType for f in df.schema.fields}
        for c in columns:
            if c not in fields:
                raise ValueError(f"drift_report: no such column {c!r}")
            if not isinstance(fields[c], _NUMERIC):
                raise ValueError(
                    f"drift_report: column {c!r} is not numeric "
                    f"({fields[c]}) — KS needs an ordered numeric domain"
                )
    if not columns:
        raise ValueError("drift_report: no columns")
    _ensure_registered(df_a)
    specs = [(c, "kll", k, f"q_{c}") for c in columns] + [
        (c, "stats", None, f"s_{c}") for c in columns
    ]
    a = sketch_agg_multi(df_a, specs)
    b = sketch_agg_multi(df_b, specs)
    a2 = a.select([F.col(c).alias(f"a_{c}") for c in a.columns])
    b2 = b.select([F.col(c).alias(f"b_{c}") for c in b.columns])
    j = a2.crossJoin(b2)

    def mean(side: str, c: str):
        return (
            F.expr(f"datasketch_stats_sum({side}_s_{c})")
            / F.expr(f"datasketch_stats_nonnull({side}_s_{c})")
        ).alias(f"mean_{side}")

    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.expr(f"datasketch_stats_nonnull(a_s_{c})").alias("n_a"),
            F.expr(f"datasketch_stats_nonnull(b_s_{c})").alias("n_b"),
            mean("a", c),
            mean("b", c),
            F.expr(f"datasketch_kll_ks(a_q_{c}, b_q_{c})").alias("ks"),
        )
        for c in columns
    ]
    return j.select(F.explode(F.array(*structs)).alias("p")).select("p.*")
