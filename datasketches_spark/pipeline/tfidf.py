"""TF-IDF term scoring over a document corpus.

Classic corpus analytics for training-data curation: surface the
terms that characterize each shard (language/source/topic), feed
stopword discovery, or weight near-dup verification.  Everything is
built from exact counting aggregates plus one natural log, so a SQL
oracle can verify the output value-for-value (the gate orders by the
ROUNDED score with a term tiebreak, making the ranking robust to
last-ulp ``ln`` differences between engines).

Scale shape: ONE scan of the (dominant-cost) text column, by
construction — the plan is a linear chain (explode → occurrence
aggregate → (term, group) aggregate → per-term window), never a
branch, because Spark/AQE does NOT reuse the shuffle stage when the
same pre-aggregate feeds two different aggregations (verified: the
branched formulation materialized the occurrence exchange twice,
scanning the parquet twice).  Each shuffle is strictly smaller than
the previous; the per-term window sums #groups rows per term —
bounded.  Corpus size N joins in as a broadcast one-row frame
(never a driver-side ``.count()``).  The final per-group top-k uses
:func:`..pipeline.sampling.grouped_topk`, whose WindowGroupLimit
pushdown keeps every task bounded at 100 TB.

Equivalent capability in the reference: none (pure host-SQL
territory); the module exists so the engine's text stack covers the
standard curation loop end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import grouped_topk
from .text import oracle_tokens_sql, tokens


def term_stats(
    df: DataFrame, id_col: str, text_col: str, group_col: str
) -> DataFrame:
    """(group, term, tf, df, tfidf) for every (group, term).

    tf = occurrences of term within the group; df = number of
    distinct documents (corpus-wide) containing the term;
    tfidf = tf * ln((N+1)/(df+1)) with N = corpus document count,
    rounded to 6 decimals (the cross-engine-stable surface).
    """
    tok = df.select(
        F.col(id_col), F.col(group_col), F.explode(tokens(F.col(text_col))).alias("term")
    ).filter(F.col("term") != "")
    # linear chain — no plan branch, so the raw text column (the
    # dominant cost at scale) is scanned and exploded exactly once:
    #   occ: distinct (term, doc) occurrences with counts
    #   t1:  per-(term, group) tf + how many docs of the group hold it
    #   df:  corpus-wide doc count per term = window sum over t1
    # (a doc has one group, so occ is distinct on (term, doc) and the
    # window sums #groups rows per term — bounded, never a straggler)
    occ = tok.groupBy("term", id_col, group_col).agg(F.count("*").alias("__cnt"))
    t1 = occ.groupBy("term", group_col).agg(
        F.sum("__cnt").alias("tf"), F.count("*").alias("__docs")
    )
    dfed = t1.withColumn(
        "df", F.sum("__docs").over(Window.partitionBy("term"))
    )
    n = df.select(F.count("*").cast("double").alias("__n"))
    return dfed.crossJoin(F.broadcast(n)).select(
        group_col,
        "term",
        "tf",
        "df",
        F.round(
            F.col("tf") * F.log((F.col("__n") + 1.0) / (F.col("df") + 1.0)), 6
        ).alias("tfidf"),
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    k: int = 5,
    n_buckets: int | None = None,
) -> DataFrame:
    """Top-k characteristic terms per group by TF-IDF, deterministic
    order (rounded score desc, term asc)."""
    scored = term_stats(df, id_col, text_col, group_col)
    return grouped_topk(
        scored,
        [F.col("tfidf").desc(), F.col("term").asc()],
        k,
        by=[group_col],
        bucket_by=F.col("term"),
        n_buckets=n_buckets,
    )


def oracle_tfidf_top_terms_sql(
    table: str,
    id_col: str,
    text_col: str,
    group_col: str,
    k: int = 5,
) -> str:
    """DuckDB twin of :func:`tfidf_top_terms` (for the oracle gate)."""
    toks = oracle_tokens_sql(text_col)
    return f"""
        WITH tok AS (
            SELECT {id_col} AS id, {group_col} AS g,
                   unnest({toks}) AS term
            FROM {table}),
        tok2 AS (SELECT * FROM tok WHERE term <> ''),
        tf AS (SELECT g, term, count(*)::BIGINT AS tf FROM tok2 GROUP BY 1, 2),
        dfq AS (SELECT term, count(DISTINCT id)::BIGINT AS df
                FROM tok2 GROUP BY 1),
        n AS (SELECT count(*)::DOUBLE AS n FROM {table}),
        s AS (SELECT g, term, tf, df,
                     round(tf * ln((n + 1.0) / (df + 1.0)), 6) AS tfidf
              FROM tf JOIN dfq USING (term) CROSS JOIN n),
        r AS (SELECT g, term, tf, df, tfidf,
                     row_number() OVER (PARTITION BY g
                                        ORDER BY tfidf DESC, term ASC) AS rn
              FROM s)
        SELECT g AS {group_col}, term, tf, df, tfidf
        FROM r WHERE rn <= {k}
    """
