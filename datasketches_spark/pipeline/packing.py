"""Sequence packing: chunk an ordered document stream into fixed-size
training context windows (the GPT-style concat-and-chunk step).

Conceptually: concatenate every document's tokens in a deterministic
order, then cut the stream every ``seq_len`` tokens.  A document whose
span crosses a cut contributes a slice to each window it touches.  The
output is the (pack, slice) assignment — exactly what a data loader
needs to materialize training sequences.

Spark plan: one window cumulative sum to place each doc's [start, end)
token span, then ``explode(sequence(...))`` over the touched pack ids
— a doc of ``t`` tokens touches at most ``t/seq_len + 1`` packs, so
output size is bounded by ``total_tokens/seq_len + n_docs``, never
quadratic.  All JVM expressions; no Python in the path.

Scale note: an un-partitioned window is a single-task global sort —
fine for one shard, wrong for 100 TB.  Pass ``by=<shard column>``
(e.g. a date or a hash bucket) and each shard packs independently in
parallel; and when ONE shard is itself huge (English at 100 TB), pass
``bucket_col`` to run the token-offset prefix sum two-phase
(``mixture.sharded_prefix_sum``) with shards x buckets parallelism —
bit-identical output, no single-shard straggler task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_pack(
    df: DataFrame,
    tokens_col: str,
    seq_len: int,
    order_col: str,
    by: list[str] | None = None,
    bucket_col: str | None = None,
) -> DataFrame:
    """Assign each document its pack slices.

    Returns the input's ``by`` + ``order_col`` columns plus:
    ``pack_id`` (0-based window index), ``slice_start`` (token offset
    inside the doc where this slice begins), ``slice_len``.  Docs with
    NULL or <= 0 tokens are dropped (nothing to pack).  Every pack
    except the last in a shard holds exactly ``seq_len`` tokens.

    The default cumsum is one window task per shard.  Pass
    ``bucket_col`` (a range-bucket id monotone non-decreasing in
    ``order_col`` within each shard, e.g. ``binning.quantile_bucket``
    of ``order_col``) and the token-offset prefix sum runs two-phase
    (``mixture.sharded_prefix_sum``): per-(shard, bucket) totals,
    broadcast exclusive offsets, local windows — shards x buckets
    parallelism, bit-identical pack assignment.
    """
    if seq_len < 1:
        raise ValueError(f"seq_len ({seq_len}) must be >= 1")
    by = list(by or [])
    t = F.col(tokens_col).cast("long")
    pos = df.filter(t > 0)
    if bucket_col is not None:
        from .mixture import sharded_prefix_sum

        rows = sharded_prefix_sum(
            pos, t, [order_col], by, bucket_col, "__end"
        ).select(*by, order_col, t.alias("__t"), "__end")
    else:
        w = (
            Window.partitionBy(*by).orderBy(order_col)
            if by
            else Window.partitionBy().orderBy(order_col)
        )
        rows = pos.select(
            *by,
            order_col,
            t.alias("__t"),
            (F.sum(t).over(w)).alias("__end"),
        )
    start = F.col("__end") - F.col("__t")
    L = F.lit(int(seq_len))
    packed = rows.withColumn(
        "pack_id",
        F.explode(
            F.sequence(
                F.floor(start / L), F.floor((F.col("__end") - 1) / L)
            )
        ),
    )
    p0 = F.col("pack_id") * L
    return packed.select(
        *by,
        order_col,
        F.col("pack_id").cast("long").alias("pack_id"),
        F.greatest(F.lit(0), p0 - start).cast("long").alias("slice_start"),
        (
            F.least(F.col("__end"), p0 + L) - F.greatest(start, p0)
        ).cast("long").alias("slice_len"),
    )


def pack_stats(packed: DataFrame, by: list[str] | None = None) -> DataFrame:
    """(by..., pack_id, n_docs, n_tokens) per pack — quick audit that
    every non-final pack is exactly full."""
    by = list(by or [])
    return packed.groupBy(*by, "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("slice_len").alias("n_tokens"),
    )
