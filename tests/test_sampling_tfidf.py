"""Weighted sampling (A-ES) and TF-IDF operators."""

import math

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from datasketches_spark.pipeline.sampling import (
    grouped_topk,
    weighted_sample,
    weighted_sample_key,
)
from datasketches_spark.pipeline.tfidf import term_stats, tfidf_top_terms


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, ["en", "de", "fr"][i % 3], 10 + (i * 37) % 500)
        for i in range(300)
    ]
    return spark.createDataFrame(rows, "id long, lang string, w long")


def _single_window_sample(df, k):
    key = weighted_sample_key("id", "w", salt="s")
    w = Window.partitionBy("lang").orderBy(key.desc(), F.col("id").asc())
    return (
        df.filter(F.col("w") > 0)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def test_two_phase_topk_matches_single_window(docs):
    got = weighted_sample(docs, "id", "w", k=7, by=["lang"], salt="s", n_buckets=5)
    want = _single_window_sample(docs, 7)
    assert sorted(r["id"] for r in got.collect()) == sorted(
        r["id"] for r in want.collect()
    )


def test_deterministic_and_salt_sensitive(docs):
    a = sorted(r["id"] for r in weighted_sample(docs, "id", "w", 5, by=["lang"]).collect())
    b = sorted(r["id"] for r in weighted_sample(docs, "id", "w", 5, by=["lang"]).collect())
    c = sorted(r["id"] for r in weighted_sample(docs, "id", "w", 5, by=["lang"], salt="other").collect())
    assert a == b
    assert a != c


def test_nonpositive_and_null_weights_dropped(spark):
    df = spark.createDataFrame(
        [(1, 5), (2, 0), (3, -4), (4, None), (5, 9)], "id long, w long"
    )
    got = weighted_sample(df, "id", "w", k=10)
    assert sorted(r["id"] for r in got.collect()) == [1, 5]


def test_k_larger_than_group_returns_all(docs):
    got = weighted_sample(docs, "id", "w", k=1000, by=["lang"])
    assert got.count() == docs.count()


def test_grouped_topk_random_buckets_still_exact(docs):
    # explicit bucketed path without bucket_by: round-robin buckets
    # are run-dependent but the top-k result must still be exact
    order = [F.col("w").desc(), F.col("id").asc()]
    got = grouped_topk(docs, order, 4, by=["lang"], n_buckets=3)
    w = Window.partitionBy("lang").orderBy(*order)
    want = docs.withColumn("rn", F.row_number().over(w)).filter("rn <= 4")
    assert sorted(r["id"] for r in got.collect()) == sorted(
        r["id"] for r in want.collect()
    )


def test_default_plan_has_partial_window_group_limit(docs):
    # the scale contract: Spark pushes a partial top-k below the
    # exchange, so the plain window is already two-phase
    plan = weighted_sample(docs, "id", "w", k=3, by=["lang"])._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_weighted_inclusion_bias(spark):
    # one heavy row among many light ones: across 40 salts, the heavy
    # row must be sampled far more often than any individual light row
    rows = [(i, 1) for i in range(100)] + [(100, 1000)]
    df = spark.createDataFrame(rows, "id long, w long")
    heavy = sum(
        1
        for s in range(40)
        if any(
            r["id"] == 100
            for r in weighted_sample(df, "id", "w", k=5, salt=str(s)).collect()
        )
    )
    assert heavy >= 35  # P(include) ~ 1000/1100 per draw, k=5


def test_grouped_topk_validates_k(docs):
    with pytest.raises(ValueError, match="must be >= 1"):
        grouped_topk(docs, [F.col("w").desc()], 0, by=["lang"])


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "en", "the cat sat"),
        (1, "en", "the cat ran"),
        (2, "de", "der hund lief"),
        (3, "de", "der hund der hund"),
        (4, "fr", ""),
    ]
    return spark.createDataFrame(rows, "id long, lang string, text string")


def test_term_stats_exact(corpus):
    out = {
        (r["lang"], r["term"]): (r["tf"], r["df"], r["tfidf"])
        for r in term_stats(corpus, "id", "text", "lang").collect()
    }
    n = 5
    # 'the' appears twice in en, in 2 docs corpus-wide
    assert out[("en", "the")] == (2, 2, round(2 * math.log((n + 1) / 3), 6))
    # 'der' appears 3x in de (doc 3 has it twice), 2 docs
    assert out[("de", "der")] == (3, 2, round(3 * math.log((n + 1) / 3), 6))
    # 'sat' once, 1 doc
    assert out[("en", "sat")] == (1, 1, round(math.log((n + 1) / 2), 6))
    # empty doc contributes no terms
    assert not any(lang == "fr" for lang, _ in out)


def test_tfidf_topk_order_and_ties(corpus):
    top = tfidf_top_terms(corpus, "id", "text", "lang", k=2, n_buckets=3).collect()
    by_lang = {}
    for r in top:
        by_lang.setdefault(r["lang"], []).append(r["term"])
    # en: cat/the tie on score (tf=2, df=2 -> 1.386) and beat ran/sat
    # (tf=1, df=1 -> 1.099); tie broken by term asc
    assert by_lang["en"] == ["cat", "the"]
    assert by_lang["de"][0] == "der"  # tf=3 dominates
    assert "fr" not in by_lang
