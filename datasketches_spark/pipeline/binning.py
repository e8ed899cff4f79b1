"""Equi-depth bucketing and histograms without a global sort.

``NTILE(n) OVER (ORDER BY x)`` — the textbook way to label rows with
their quantile bucket — forces a single-partition global sort: every
row shuffles through one task, a non-starter at 100 TB.  The sketch
formulation is two passes, both embarrassingly parallel:

1. one scan builds a KLL sketch per group (two-phase ``sketch_agg``
   path: only bounded blobs cross the shuffle);
2. the n-1 cut points decoded from each sketch are broadcast back and
   every row's bucket is ``1 + #{cuts < value}`` — a pure JVM
   array-filter expression, map-side, whole-stage-codegen'd, no second
   shuffle of the data.

With exact-mode K (cardinality below sketch capacity) the labels match
NTILE's cumulative-distribution semantics exactly; in estimation mode
the buckets are approximately equi-depth with KLL's rank-error
guarantee (~1.33% at K=200 — docs/README.md:532 in the reference).

Equivalent capability in the reference: none directly — its host
(DuckDB) runs NTILE via the sort path; this operator exists precisely
because Spark-at-scale must not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..aggregation import sketch_agg

_CUTS = "__qb_cuts"


def hist_quantile_cuts(
    df: DataFrame,
    col: str,
    num_buckets: int,
    by: list[str] | None = None,
) -> DataFrame:
    """Exact inclusive-rank cut points via a value histogram — the fast
    path for bounded-cardinality columns (ints, prices in cents, ages).

    One shuffle collapses the data to (group, value, count) — map-side
    partial aggregation means only distinct pairs cross the wire — then
    a window over that tiny frame computes each value's cumulative
    share, and cut i is ``min(value : cum_share >= i/n)``, the same
    cume_dist definition NTILE implies.  Everything stays in the JVM.

    At 100 TB this holds as long as distinct(by, col) is bounded (the
    window runs over distinct values, not rows); for genuinely
    continuous columns use the sketch path (``quantile_cuts``).
    """
    if num_buckets < 2:
        raise ValueError(f"num_buckets ({num_buckets}) must be >= 2")
    by = list(by or [])
    counts = (
        df.filter(F.col(col).isNotNull())
        .groupBy(*by, col)
        .agg(F.count("*").alias("__c"))
        .select(*by, F.col(col).cast("double").alias("__v"), "__c")
    )
    return _cuts_from_value_counts(counts, num_buckets, by)


def _cuts_from_value_counts(
    counts: DataFrame, num_buckets: int, by: list[str]
) -> DataFrame:
    """(by..., __qb_cuts) from a pre-aggregated (by, __v double, __c)
    distinct-value frame — THE cume_dist cut definition, shared by
    every hist path so the two callers cannot drift.  The windows run
    over distinct values (bounded by construction), not rows."""
    w_cum = (
        Window.partitionBy(*by)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*by)
    cdf = counts.select(
        *by,
        "__v",
        (F.sum("__c").over(w_cum) / F.sum("__c").over(w_all)).alias("__cd"),
    )
    aggs = [
        F.min(F.when(F.col("__cd") >= i / num_buckets, F.col("__v"))).alias(
            f"__cut{i}"
        )
        for i in range(1, num_buckets)
    ]
    cuts = cdf.groupBy(*by).agg(*aggs)
    return cuts.select(
        *by,
        F.array(*[F.col(f"__cut{i}") for i in range(1, num_buckets)]).alias(
            _CUTS
        ),
    )


def quantile_cuts(
    df: DataFrame,
    col: str,
    num_buckets: int,
    by: list[str] | None = None,
    k: int = 200,
) -> DataFrame:
    """(by..., __qb_cuts array<double>) — the n-1 inclusive-rank cut
    points per group.  Tiny output (one row per group)."""
    if num_buckets < 2:
        raise ValueError(f"num_buckets ({num_buckets}) must be >= 2")
    by = list(by or [])
    sk = sketch_agg(df, col, "kll", group_cols=by, k=k)
    qs = [
        F.expr(f"datasketch_kll_quantile(sketch, {i / num_buckets!r}D, true)")
        for i in range(1, num_buckets)
    ]
    return sk.select(*by, F.array(*qs).alias(_CUTS))


def quantile_bucket(
    df: DataFrame,
    col: str,
    num_buckets: int,
    by: list[str] | None = None,
    k: int = 200,
    output_col: str = "bucket",
    method: str = "sketch",
) -> DataFrame:
    """Label every row with its equi-depth bucket (1..num_buckets) of
    ``col``, optionally per ``by`` group.  NULL values get NULL.

    ``method='sketch'`` (default) decodes cuts from a KLL sketch;
    ``method='hist'`` computes exact cuts from a value histogram
    (fast + exact when distinct(col) is bounded).

    The cut-point frame is broadcast (num_buckets-1 doubles per
    group); the data-side plan is scan -> broadcast-join -> project.
    """
    by = list(by or [])
    if method == "hist":
        cuts = hist_quantile_cuts(df, col, num_buckets, by=by)
    elif method == "sketch":
        cuts = quantile_cuts(df, col, num_buckets, by=by, k=k)
    else:
        raise ValueError(f"method ({method!r}) must be 'sketch' or 'hist'")
    joined = (
        df.join(F.broadcast(cuts), by) if by else df.crossJoin(F.broadcast(cuts))
    )
    n_below = F.size(F.filter(F.col(_CUTS), lambda c: F.col(col) > c))
    return joined.withColumn(
        output_col,
        F.when(F.col(col).isNotNull(), n_below + F.lit(1)),
    ).drop(_CUTS)


def quantile_clip(
    df: DataFrame,
    col: str,
    lower: float = 0.01,
    upper: float = 0.99,
    by: list[str] | None = None,
    k: int = 200,
    mode: str = "clip",
    method: str = "sketch",
    output_col: str | None = None,
) -> DataFrame:
    """Winsorize (``mode='clip'``) or drop (``mode='filter'``) numeric
    outliers by per-group quantile bounds — the standard treatment for
    heavy-tailed features before training.

    Same two embarrassingly parallel passes as :func:`quantile_bucket`:
    phase 1 reduces the data to one (lo, hi) row per group (KLL
    sketch via the blob-only two-phase path, or the exact value
    histogram for bounded-cardinality columns); phase 2 broadcasts
    that tiny frame back and clamps/filters map-side — no global sort,
    no second shuffle of the data.  Bounds follow the inclusive
    cume_dist convention (min v with cd >= q), so they are actual data
    values and the clipped column keeps its original type; exact for
    ``method='hist'`` or exact-mode K, within KLL rank error
    otherwise.

    ``mode='clip'``: values clamp into [lo, hi]; NULLs pass through.
    ``mode='filter'``: keep rows with lo <= v <= hi; NULLs drop.
    ``output_col`` (clip mode) writes the clamped value to a new
    column instead of replacing ``col``.
    """
    if not 0.0 <= lower <= upper <= 1.0:
        raise ValueError(
            f"need 0 <= lower <= upper <= 1; got ({lower}, {upper})"
        )
    if mode not in ("clip", "filter"):
        raise ValueError(f"mode ({mode!r}) must be 'clip' or 'filter'")
    by = list(by or [])
    if method == "sketch":
        sk = sketch_agg(df, col, "kll", group_cols=by, k=k)
        bounds = sk.select(
            *by,
            F.expr(
                f"datasketch_kll_quantile(sketch, {float(lower)!r}D, true)"
            ).alias("__qc_lo"),
            F.expr(
                f"datasketch_kll_quantile(sketch, {float(upper)!r}D, true)"
            ).alias("__qc_hi"),
        )
    elif method == "hist":
        counts = (
            df.filter(F.col(col).isNotNull())
            .groupBy(*by, col)
            .agg(F.count("*").alias("__c"))
            .select(*by, F.col(col).cast("double").alias("__v"), "__c")
        )
        w_cum = (
            Window.partitionBy(*by)
            .orderBy("__v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        w_all = (
            Window.partitionBy(*by)
            .orderBy("__v")
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        cdf = counts.select(
            *by,
            "__v",
            (F.sum("__c").over(w_cum) / F.sum("__c").over(w_all)).alias("__cd"),
        )
        bounds = cdf.groupBy(*by).agg(
            F.min(F.when(F.col("__cd") >= lower, F.col("__v"))).alias("__qc_lo"),
            F.min(F.when(F.col("__cd") >= upper, F.col("__v"))).alias("__qc_hi"),
        )
    else:
        raise ValueError(f"method ({method!r}) must be 'sketch' or 'hist'")

    joined = (
        df.join(F.broadcast(bounds), by)
        if by
        else df.crossJoin(F.broadcast(bounds))
    )
    # bounds are actual data values; casting them to the column's own
    # type keeps the clipped column's type stable
    dt = df.schema[col].dataType
    lo = F.col("__qc_lo").cast(dt)
    hi = F.col("__qc_hi").cast(dt)
    if mode == "filter":
        return joined.filter((F.col(col) >= lo) & (F.col(col) <= hi)).drop(
            "__qc_lo", "__qc_hi"
        )
    clamped = F.when(
        F.col(col).isNotNull(), F.greatest(lo, F.least(hi, F.col(col)))
    ).otherwise(F.col(col))
    return joined.withColumn(output_col or col, clamped).drop(
        "__qc_lo", "__qc_hi"
    )


def equi_depth_histogram(
    df: DataFrame,
    col: str,
    num_buckets: int,
    by: list[str] | None = None,
    k: int = 200,
    method: str = "sketch",
) -> DataFrame:
    """(by..., bucket, lo, hi, cnt) — equi-depth histogram: bucket
    bounds from the cut points, exact per-bucket row counts from one
    grouped count over the labels.

    For ``method='hist'`` the histogram is derived entirely from the
    (group, value, count) frame that already produced the cut points:
    each distinct value's bucket is computable from the cuts, and
    lo/hi/cnt are min/max/sum over distinct values — so the raw table
    is scanned ONCE, and no broadcast-join back onto it is needed.
    The sketch path still labels raw rows (sketches don't retain the
    value histogram)."""
    by = list(by or [])
    if method == "hist":
        if num_buckets < 2:
            raise ValueError(f"num_buckets ({num_buckets}) must be >= 2")
        counts = df.groupBy(*by, col).agg(F.count("*").alias("__c"))
        vals = counts.select(
            *by, F.col(col).alias("__raw"),
            F.col(col).cast("double").alias("__v"), "__c",
        )
        # single linear chain: the cuts are window aggregates over the
        # SAME distinct-value frame, so the raw table is scanned and
        # aggregated exactly once.  (A broadcast-join of a separately
        # computed cut frame re-executes the value-count aggregation --
        # Catalyst does not reuse a shuffle feeding two branches.)
        # NULL values ride along with their counts masked out of the
        # CDF; they land in bucket NULL as before.
        nn = F.when(F.col("__v").isNotNull(), F.col("__c")).otherwise(F.lit(0))
        w_cum = (
            Window.partitionBy(*by)
            .orderBy(F.col("__v").asc_nulls_first())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        # full-frame aggregates are order-independent, so give w_all the
        # SAME ordering as w_cum: same-sort window specs share one Sort
        # node (measured: drops a whole Sort stage pass, ~0.05 s at
        # sf0.1; an orderless partitionBy spec forces its own sort)
        w_all = (
            Window.partitionBy(*by)
            .orderBy(F.col("__v").asc_nulls_first())
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        tot = F.sum(nn).over(w_all)
        # ANSI guard: a group whose values are ALL NULL has masked
        # total 0 -- emit NULL cd and drop those rows below, matching
        # the pre-rewrite behavior (the cut frame had no row for such
        # groups, so the inner join dropped them)
        cdf = vals.withColumn(
            "__cd", F.when(tot > 0, F.sum(nn).over(w_cum) / tot)
        ).filter(F.col("__cd").isNotNull())
        cut_exprs = [
            F.min(F.when(F.col("__cd") >= i / num_buckets, F.col("__v")))
            .over(w_all)
            for i in range(1, num_buckets)
        ]
        labeled = cdf.withColumn(_CUTS, F.array(*cut_exprs))
        n_below = F.size(F.filter(F.col(_CUTS), lambda c: F.col("__v") > c))
        labeled = labeled.withColumn(
            "bucket", F.when(F.col("__v").isNotNull(), n_below + F.lit(1))
        )
        return labeled.groupBy(*by, "bucket").agg(
            F.min("__raw").alias("lo"), F.max("__raw").alias("hi"),
            F.sum("__c").alias("cnt"),
        )
    labeled = quantile_bucket(df, col, num_buckets, by=by, k=k, method=method)
    counts = labeled.groupBy(*by, "bucket").agg(
        F.min(col).alias("lo"), F.max(col).alias("hi"),
        F.count("*").alias("cnt"),
    )
    return counts
