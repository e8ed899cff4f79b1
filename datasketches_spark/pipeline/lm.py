"""Unigram language-model quality scoring (the CCNet-style filter).

Rank documents by how "ordinary" their token distribution is: the mean
ln P(token) under the corpus's own unigram model.  Low scores flag
gibberish, boilerplate explosions, and wrong-language text — the
classic cheap LM filter applied before expensive model-based scoring.

Two engines, one contract:

- ``engine="exact"``: explode tokens -> count -> join scores back ->
  per-doc mean.  Two shuffles; the vocabulary materializes as a table.
  ANSI-SQL-expressible, so this engine is the oracle gate.
- ``engine="cms"`` — THE 100 TB PATH: token counts live in a Count-Min
  sketch built by the blob-only two-phase plan (one narrow explode +
  map-side partials; only KB-scale blobs cross the shuffle), the
  merged blob is broadcast, and every document is scored in a
  map-only Arrow pass probing the sketch.  The raw text NEVER
  shuffles and no vocabulary table exists at any scale — the sketch
  is the language model.  CMS overestimates rare-token counts by at
  most eps*W w.h.p. (eps printed by the sketch), which BIASES scores
  UP for rare tokens — at filtering thresholds this is conservative
  (junk scores slightly less junky, never the reverse); size lg_w so
  eps*W is well under the rarest count you care about.  At gate SF
  the sketch is collision-free and the two engines are equal
  (tests/test_pipeline.py gates the equality).

Connect caveat: without a JVM bridge the model blob is
closure-captured (compat.broadcast_value) and ships with EVERY task —
at the default lg_w=20 that is tens of MB per launch (two blobs for
bigram).  compat warns past 4 MiB; lower ``lg_w`` (each step halves
the blob) or run a classic session for fat models.
"""

from __future__ import annotations

import re
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from .. import compat
from ..aggregation import sketch_agg
from .text import tokens

# Java regex \s without UNICODE_CHARACTER_CLASS — ASCII only.  Python's
# \s is Unicode-aware (NBSP, thin space, ideographic space), so a naive
# twin splits tokens the JVM model never saw -> estimate 0 -> log(0).
_JWS = re.compile(r"[ \t\n\x0b\f\r]+")


def _py_tokens(text: str) -> list[str]:
    """Python twin of text.tokens() — must match the JVM expression
    token-for-token (measured semantics, tests/test_pipeline.py
    TestPyTokensTwin): lower, trim STRIPS ASCII SPACE 0x20 ONLY (a
    leading tab/NBSP survives), split on JAVA-\\s runs (ASCII class)
    with limit=-1 semantics — leading AND trailing empty tokens are
    KEPT ('\\t' -> ['', ''])."""
    t = text.lower().strip(" ")
    return _JWS.split(t) if t else []


def _segment_means(vals: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Per-segment mean of a flat value array, NaN for empty segments.

    ``vals`` is the concatenation of variable-length per-doc segments
    whose lengths are ``lens``.  One ``np.add.reduceat`` over the
    non-empty segments' start offsets: zero-length segments contribute
    no elements to ``vals``, so consecutive non-empty starts are
    strictly increasing and each reduceat slab covers exactly one
    segment (reduceat's repeated-index quirk never fires)."""
    out = np.full(lens.size, np.nan)
    nz = lens > 0
    if not nz.any():
        return out
    starts = np.zeros(lens.size, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    out[nz] = np.add.reduceat(vals, starts[nz]) / lens[nz]
    return out


def unigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    engine: str = "exact",
    lg_w: int = 20,
) -> DataFrame:
    """(id, n_tokens, logprob): mean ln(count(tok)/total_tokens) per
    document, under the corpus's own unigram distribution.  Documents
    with zero tokens keep n_tokens = 0 and a NULL logprob."""
    if engine == "exact":
        return _exact(docs, id_col, text_col)
    if engine == "cms":
        return _cms(docs, id_col, text_col, lg_w)
    raise ValueError(f"unknown engine: {engine!r} (want 'exact' or 'cms')")


def bigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    engine: str = "exact",
    lg_w: int = 20,
    lam: float = 0.7,
) -> DataFrame:
    """(id, n_bigrams, logprob): interpolated bigram score — the mean
    over positions i >= 2 of
    ``ln(lam * c(w_{i-1} w_i)/c(w_{i-1}) + (1-lam) * c(w_i)/T)``.

    Sharper than the unigram filter at catching token-level garble and
    templated repetition (fluent bigrams score high even when the
    unigrams are rare).  Same engine contract as
    :func:`unigram_logprob`: ``exact`` is the SQL-expressible oracle
    twin; ``cms`` keeps the model in TWO Count-Min blobs (unigram +
    bigram), broadcast, scored map-only — bigram vocabulary is the
    thing that truly cannot materialize at 100 TB (it grows ~n^1.5+),
    which is exactly what the sketch sidesteps.  Documents with fewer
    than two tokens get n_bigrams = 0 and NULL logprob."""
    if engine == "exact":
        return _bigram_exact(docs, id_col, text_col, lam)
    if engine == "cms":
        return _bigram_cms(docs, id_col, text_col, lg_w, lam)
    raise ValueError(f"unknown engine: {engine!r} (want 'exact' or 'cms')")


def _bigram_pairs(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    t = tokens(F.col(text_col))
    n = F.size(t)
    pairs = F.when(
        n >= 2,
        F.arrays_zip(
            F.slice(t, 1, n - 1).alias("prev"), F.slice(t, 2, n - 1).alias("cur")
        ),
    ).otherwise(F.array().cast("array<struct<prev:string,cur:string>>"))
    return docs.select(F.col(id_col), F.explode(pairs).alias("p")).select(
        id_col, F.col("p.prev").alias("prev"), F.col("p.cur").alias("cur")
    )


def _bigram_exact(
    docs: DataFrame, id_col: str, text_col: str, lam: float
) -> DataFrame:
    toks = docs.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
    uni = toks.groupBy("tok").agg(F.count("*").alias("c"))
    total = uni.agg(F.sum("c").alias("t"))
    bgl = _bigram_pairs(docs, id_col, text_col)
    bgc = bgl.groupBy("prev", "cur").agg(F.count("*").alias("cb"))
    cp = uni.select(F.col("tok").alias("prev"), F.col("c").alias("c_prev"))
    cc = uni.select(F.col("tok").alias("cur"), F.col("c").alias("c_cur"))
    scored = (
        bgl.join(bgc, ["prev", "cur"])
        .join(cp, "prev")
        .join(cc, "cur")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.avg(
                F.log(
                    F.lit(lam) * F.col("cb") / F.col("c_prev")
                    + F.lit(1.0 - lam) * F.col("c_cur") / F.col("t")
                )
            ).alias("logprob"),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            "logprob",
        )
    )


def _bigram_cms(
    docs: DataFrame, id_col: str, text_col: str, lg_w: int, lam: float
) -> DataFrame:
    from ..sketches import CountMinSketch  # noqa: PLC0415

    toks = docs.select(F.explode(tokens(F.col(text_col))).alias("tok"))
    bgs = _bigram_pairs(docs, id_col, text_col).select(
        F.concat_ws(" ", "prev", "cur").alias("bg")
    )
    uni_rows = sketch_agg(toks, "tok", "cms", k=lg_w).collect()
    bg_rows = sketch_agg(bgs, "bg", "cms", k=lg_w).collect()
    if not uni_rows or not bg_rows:
        return docs.select(
            F.col(id_col),
            F.lit(0).cast("long").alias("n_bigrams"),
            F.lit(None).cast("double").alias("logprob"),
        )
    bc_uni = compat.broadcast_value(docs.sparkSession, bytes(uni_rows[0]["sketch"]))
    bc_bg = compat.broadcast_value(docs.sparkSession, bytes(bg_rows[0]["sketch"]))
    schema = StructType(
        [
            StructField(id_col, docs.schema[id_col].dataType, True),
            StructField("n_bigrams", LongType(), True),
            StructField("logprob", DoubleType(), True),
        ]
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        uni = CountMinSketch.deserialize(bc_uni.value)
        bg = CountMinSketch.deserialize(bc_bg.value)
        total = float(uni.total_weight())
        for pdf in batches:
            # vectorized across the WHOLE batch: flatten every doc's
            # bigram positions once, probe each sketch role once, then
            # segment-mean with np.add.reduceat — the per-doc pandas
            # Series construction was the dominant constant (measured
            # r14, BASELINE_LOCAL.md "CMS LM scorer")
            toks = [
                _py_tokens(t) if t is not None else [] for t in pdf[text_col]
            ]
            lens = np.fromiter(
                (len(tk) - 1 if len(tk) >= 2 else 0 for tk in toks),
                dtype=np.int64,
                count=len(toks),
            )
            prev_flat = [w for tk in toks if len(tk) >= 2 for w in tk[:-1]]
            cur_flat = [w for tk in toks if len(tk) >= 2 for w in tk[1:]]
            if prev_flat:
                cb = np.asarray(
                    bg.estimate_series(
                        pd.Series(
                            [f"{p} {c}" for p, c in zip(prev_flat, cur_flat)]
                        )
                    ),
                    dtype=np.float64,
                )
                cp = np.asarray(
                    uni.estimate_series(pd.Series(prev_flat)), dtype=np.float64
                )
                cc = np.asarray(
                    uni.estimate_series(pd.Series(cur_flat)), dtype=np.float64
                )
                vals = np.log(lam * cb / cp + (1.0 - lam) * cc / total)
            else:
                vals = np.empty(0)
            means = _segment_means(vals, lens)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bigrams": lens,
                    "logprob": [
                        None if n == 0 else float(m)
                        for n, m in zip(lens, means)
                    ],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(score, schema=schema)


def _exact(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = docs.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
    counts = toks.groupBy("tok").agg(F.count("*").alias("c"))
    total = counts.agg(F.sum("c").alias("t"))
    scored = (
        toks.join(counts, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.avg(F.log(F.col("c").cast("double") / F.col("t"))).alias("logprob"),
        )
    )
    # zero-token docs never appear in `toks`; re-attach them
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            "logprob",
        )
    )


def _cms(docs: DataFrame, id_col: str, text_col: str, lg_w: int) -> DataFrame:
    from ..sketches import CountMinSketch  # noqa: PLC0415

    toks = docs.select(F.explode(tokens(F.col(text_col))).alias("tok"))
    # explode is NARROW — the two-phase CMS build's only exchange moves
    # fixed-size blobs; the one-row result must reach the driver anyway
    # (it becomes the broadcast model)
    rows = sketch_agg(toks, "tok", "cms", k=lg_w).collect()
    if not rows:  # corpus with zero tokens: nothing to model
        return docs.select(
            F.col(id_col),
            F.lit(0).cast("long").alias("n_tokens"),
            F.lit(None).cast("double").alias("logprob"),
        )
    blob = bytes(rows[0]["sketch"])
    bc = compat.broadcast_value(docs.sparkSession, blob)
    schema = StructType(
        [
            StructField(id_col, docs.schema[id_col].dataType, True),
            StructField("n_tokens", LongType(), True),
            StructField("logprob", DoubleType(), True),
        ]
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sk = CountMinSketch.deserialize(bc.value)
        total = float(sk.total_weight())
        for pdf in batches:
            # one flatten + ONE estimate_series probe per batch, then
            # segment means via np.add.reduceat (was: three pandas
            # Series per document — see BASELINE_LOCAL.md "CMS LM
            # scorer" for the measured constant drop)
            toks = [
                _py_tokens(t) if t is not None else [] for t in pdf[text_col]
            ]
            lens = np.fromiter(
                (len(tk) for tk in toks), dtype=np.int64, count=len(toks)
            )
            flat = [w for tk in toks for w in tk]
            if flat:
                est = np.asarray(
                    sk.estimate_series(pd.Series(flat)), dtype=np.float64
                )
                vals = np.log(est / total)
            else:
                vals = np.empty(0)
            means = _segment_means(vals, lens)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_tokens": lens,
                    "logprob": [
                        None if n == 0 else float(m)
                        for n, m in zip(lens, means)
                    ],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(score, schema=schema)
