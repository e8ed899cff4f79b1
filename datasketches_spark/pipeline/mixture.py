"""Source-mixture rebalancing and token-budget selection for training
corpora.

Two steps every LLM data pipeline runs after cleaning/dedup:

1. **Mixture sampling** — the corpus has organic source/language
   proportions; training wants declared ones ("30% web, 20% code ...").
   ``sample_to_mixture`` downsamples each source to the *largest
   feasible* corpus with exactly the target proportions (no source is
   upsampled; the binding source is kept whole).  Membership is the
   same deterministic md5 unit-hash as ``pipeline/split.py`` — stable
   under repartitioning and incremental ingest, auditable in any
   engine.

2. **Token-budget selection** — keep the best documents until a token
   budget is exhausted (per language/source shard).  With a
   deterministic total order (score desc, id asc) the kept set is a
   pure function of the data; the cumulative-sum window is partitioned
   by the shard columns, so each shard selects in parallel.

Scale notes: the per-source count frame is O(#sources) rows and
broadcast back (no second shuffle of the data); the budget window
shuffles once on the shard key — and when one shard dominates, the
two-phase :func:`sharded_prefix_sum` path (``bucket_col=``) splits
the shard over monotone range buckets so no single window task is a
straggler.  Equivalent capability in the reference: none — its host
(DuckDB) would run both as window queries; the operators exist here so
the 100 TB plan is one bounded shuffle, not a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .split import unit_hash

_KF = "__mx_keep_frac"


def _normalized(weights: dict[str, float]) -> dict[str, float]:
    if not weights:
        raise ValueError("weights must be a non-empty dict")
    total = float(sum(weights.values()))
    if total <= 0 or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative and sum to a positive value")
    return {s: float(w) / total for s, w in weights.items()}


def mixture_keep_fractions(
    df: DataFrame, source_col: str, weights: dict[str, float]
) -> DataFrame:
    """(source, n, keep_frac) — the per-source survival fraction that
    realizes the target mixture at the largest feasible size.

    capacity = min_s(n_s / w_s) is the total corpus size at which the
    scarcest source is used in full; keep_frac_s = w_s * capacity / n_s.
    Sources absent from ``weights`` get keep_frac 0 (dropped).
    """
    weights = _normalized(weights)
    w_expr = F.lit(None).cast("double")
    for s, w in weights.items():
        w_expr = F.when(F.col(source_col) == s, F.lit(w)).otherwise(w_expr)
    counts = (
        df.groupBy(source_col)
        .agg(F.count("*").cast("double").alias("n"))
        .withColumn("__w", w_expr)
    )
    capacity = counts.filter(F.col("__w") > 0).select(
        F.min(F.col("n") / F.col("__w")).alias("__cap")
    )
    return counts.crossJoin(F.broadcast(capacity)).select(
        source_col,
        F.col("n"),
        F.coalesce(
            F.col("__w") * F.col("__cap") / F.col("n"), F.lit(0.0)
        ).alias("keep_frac"),
    )


def sample_to_mixture(
    df: DataFrame,
    source_col: str,
    id_col: str,
    weights: dict[str, float],
    salt: str = "",
) -> DataFrame:
    """Rows of ``df`` surviving the mixture downsample.

    A row survives iff unit_hash(id, salt) < keep_frac(source) — the
    same engine-portable md5 hash as ``hash_split``, so the selection
    is reproducible anywhere and joinable after the fact.  The tiny
    fraction frame is broadcast; the data side is scan → broadcast-join
    → filter, no shuffle.
    """
    fracs = mixture_keep_fractions(df, source_col, weights).select(
        source_col, F.col("keep_frac").alias(_KF)
    )
    return (
        df.join(F.broadcast(fracs), source_col)
        .filter(unit_hash(id_col, salt) < F.col(_KF))
        .drop(_KF)
    )


def sharded_prefix_sum(
    df: DataFrame,
    val: Column,
    order_by: list[Column | str],
    by: list[str],
    bucket_col: str,
    output_col: str,
) -> DataFrame:
    """Two-phase distributed prefix sum: the scale-safe alternative to
    ``sum(val) OVER (PARTITION BY by ORDER BY order_by)``, which puts
    an entire shard through ONE window task (at 100 TB, "English" is
    one task).

    Requires ``bucket_col``: a range-bucket id that is monotone
    NON-DECREASING along ``order_by`` within each shard (e.g.
    ``binning.quantile_bucket`` of the leading order column — flip
    sign for descending orders).  Then:

      phase 1: per-(shard, bucket) totals — a plain aggregate, tiny
          output (shards x buckets rows);
      offsets: exclusive running total over that tiny frame (a window
          over buckets, not rows);
      phase 2: broadcast offsets back; each bucket computes its LOCAL
          window cumsum and adds its offset — parallelism is
          shards x buckets, and no task ever sees more than one
          bucket's rows.

    Exactness: bucket monotonicity means every row of bucket b
    precedes every row of bucket b+1 in the shard order, so local
    cumsum + prior-bucket total == the global cumsum, identically.
    """
    w_local = (
        Window.partitionBy(*by, bucket_col)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    totals = df.groupBy(*by, bucket_col).agg(F.sum(val).alias("__ps_tot"))
    w_off = (
        Window.partitionBy(*by)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        *by,
        bucket_col,
        F.coalesce(F.sum("__ps_tot").over(w_off), F.lit(0)).alias("__ps_off"),
    )
    # null-safe equi-join: groupBy and Window.partitionBy both treat
    # NULL as a real key, so the offsets frame has a NULL-key row --
    # a plain inner join (NULL != NULL) would silently drop that
    # shard, breaking bit-identity with the single-window path
    off = offsets
    for c in [*by, bucket_col]:
        off = off.withColumnRenamed(c, f"__ps_{c}")
    cond = [
        df[c].eqNullSafe(off[f"__ps_{c}"]) for c in [*by, bucket_col]
    ]
    joined = df.join(F.broadcast(off), cond).drop(
        *[f"__ps_{c}" for c in [*by, bucket_col]]
    )
    return joined.withColumn(
        output_col, F.sum(val).over(w_local) + F.col("__ps_off")
    ).drop("__ps_off")


def token_budget_filter(
    df: DataFrame,
    tokens_col: str,
    budget: int,
    order_by: list[Column | str],
    by: list[str] | None = None,
    cum_col: str | None = None,
    bucket_col: str | None = None,
) -> DataFrame:
    """The prefix of ``df`` (under ``order_by``, per ``by`` shard)
    whose cumulative ``tokens_col`` stays within ``budget``.

    ``order_by`` must be a deterministic total order (e.g. score desc,
    id asc) or the kept set is not reproducible.  Rows with NULL or
    non-positive token counts are dropped.  Cumulative sums are
    monotone, so the result is exactly the longest affordable prefix
    of each shard.  With ``cum_col`` set, the running total is kept in
    the output.

    By default the cumsum is one window task per shard — fine for
    many small shards, a straggler when one shard dominates.  Pass
    ``bucket_col`` (a range-bucket id monotone non-decreasing along
    ``order_by``; see :func:`sharded_prefix_sum`) and the cumsum runs
    two-phase with shards x buckets parallelism, bit-identical
    result."""
    if budget < 1:
        raise ValueError(f"budget ({budget}) must be >= 1")
    by = list(by or [])
    t = F.col(tokens_col).cast("long")
    name = cum_col or "__tb_cum"
    pos = df.filter(t > 0)
    if bucket_col is not None:
        out = sharded_prefix_sum(pos, t, order_by, by, bucket_col, name)
    else:
        w = (
            Window.partitionBy(*by)
            .orderBy(*order_by)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = pos.withColumn(name, F.sum(t).over(w))
    out = out.filter(F.col(name) <= F.lit(int(budget)))
    return out if cum_col else out.drop(name)
