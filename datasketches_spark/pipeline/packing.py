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
parallel, which is how production loaders shard anyway; pack ids are
then per-shard.
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
) -> DataFrame:
    """Assign each document its pack slices.

    Returns the input's ``by`` + ``order_col`` columns plus:
    ``pack_id`` (0-based window index), ``slice_start`` (token offset
    inside the doc where this slice begins), ``slice_len``.  Docs with
    NULL or <= 0 tokens are dropped (nothing to pack).  Every pack
    except the last in a shard holds exactly ``seq_len`` tokens.
    """
    if seq_len < 1:
        raise ValueError(f"seq_len ({seq_len}) must be >= 1")
    by = list(by or [])
    w = (
        Window.partitionBy(*by).orderBy(order_col)
        if by
        else Window.partitionBy().orderBy(order_col)
    )
    t = F.col(tokens_col).cast("long")
    rows = df.filter(t > 0).select(
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
