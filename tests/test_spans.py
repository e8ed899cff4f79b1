"""duplicate_spans / strip_duplicate_spans — repeated n-gram span
detection (the exact-substring dedup step, Lee et al. 2021 style).
Semantics pinned here; corpus-scale hash-match runs in the oracle gate
(`duplicate_ngram_spans` / `strip_dup_spans_stats` pairs)."""

import pytest
from pyspark.sql import functions as F

from datasketches_spark.pipeline.spans import (
    duplicate_spans,
    strip_duplicate_spans,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _spans(df, **kw):
    out = duplicate_spans(df, "doc_id", "text", **kw).orderBy(
        "doc_id", "span_start"
    )
    return [(r.doc_id, r.span_start, r.span_end) for r in out.collect()]


def test_cross_doc_duplicate_span(spark):
    df = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "intro words then the quick brown fox jumps over the lazy dog"),
            (3, "completely different text with no overlap at all here now"),
        ],
    )
    got = _spans(df, n=8, min_count=2)
    # doc1 tokens 1-9 duplicated (two 8-gram starts merge), doc2 4-12
    assert got == [(1, 1, 9), (2, 4, 12)]


def test_within_doc_self_repeat_counts(spark):
    df = _docs(spark, [(1, "a b c d a b c d x y"), (2, "unrelated words")])
    # "a b c d" occurs twice inside doc 1 -> min_count=2 catches it
    assert _spans(df, n=4, min_count=2) == [(1, 1, 8)]
    # but min_docs=2 requires cross-document evidence -> nothing
    assert _spans(df, n=4, min_count=2, min_docs=2) == []


def test_adjacent_and_gap_semantics(spark):
    # overlapping-or-adjacent intervals merge; a gap > n starts anew
    df = _docs(
        spark,
        [
            (1, "p q r s junk1 junkA junkB junkC junkD junkE p q r s"),
            (2, "p q r s zz p q r s"),
        ],
    )
    got = _spans(df, n=4, min_count=2)
    # doc1: starts 1 and 11, gap 10 > 4 -> two spans
    assert got == [(1, 1, 4), (1, 11, 14), (2, 1, 4), (2, 6, 9)]


def test_case_insensitive_and_short_docs(spark):
    df = _docs(
        spark,
        [
            (1, "Hello World Foo Bar"),
            (2, "hello world foo bar"),
            (3, "tiny"),  # shorter than n -> no n-grams
            (4, ""),
            (5, None),
        ],
    )
    assert _spans(df, n=4, min_count=2) == [(1, 1, 4), (2, 1, 4)]


def test_strip_preserves_case_and_survivors(spark):
    df = _docs(
        spark,
        [
            (1, "KEEP Me the quick brown fox jumps END"),
            (2, "the quick brown fox jumps"),
            (3, "Nothing   duplicated    here"),
        ],
    )
    out = {
        r.doc_id: r.text
        for r in strip_duplicate_spans(
            df, "doc_id", "text", n=5, min_count=2
        ).collect()
    }
    assert out[1] == "KEEP Me END"  # original casing survives
    assert out[2] == ""  # fully covered
    assert out[3] == "Nothing duplicated here"  # whitespace canonicalized


def test_strip_out_col(spark):
    df = _docs(spark, [(1, "a b c a b c"), (2, "x y z w v u")])
    out = strip_duplicate_spans(
        df, "doc_id", "text", n=3, min_count=2, out_col="clean"
    )
    row = {r.doc_id: r for r in out.collect()}
    assert row[1].text == "a b c a b c" and row[1].clean == ""
    assert row[2].clean == "x y z w v u"


def test_hash_and_string_keys_agree(spark):
    df = _docs(
        spark,
        [(i, f"shared prefix tokens here tail{i} alpha beta") for i in range(6)],
    )
    assert _spans(df, n=4, min_count=2) == _spans(
        df, n=4, min_count=2, hash_join=False
    )


def test_validation_errors(spark):
    df = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError, match="n must be"):
        duplicate_spans(df, "doc_id", "text", n=0)
    with pytest.raises(ValueError, match="min_count or min_docs"):
        duplicate_spans(df, "doc_id", "text", n=3, min_count=1, min_docs=1)


def test_plan_has_no_python_nodes(spark):
    df = _docs(spark, [(1, "a b c d e f g h")])
    plan = (
        strip_duplicate_spans(df, "doc_id", "text", n=4, min_count=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert marker not in plan


# ------------------------------------------------- line-level boilerplate


def test_common_lines_and_removal(spark):
    from datasketches_spark.pipeline.spans import (
        common_lines,
        remove_common_lines,
    )

    df = spark.createDataFrame(
        [
            (1, "Header Line\nbody one\nFooter"),
            (2, "header line\nbody two\nfooter"),
            (3, "  header line  \nunique text"),
            (4, "all common\nall common"),  # twice in ONE doc: n_docs=1
            (5, "all common\nsolo"),
            (6, None),
            (7, ""),
        ],
        "doc_id bigint, text string",
    )
    cl = {r.line_key: r.n_docs for r in common_lines(df, "doc_id", "text").collect()}
    assert cl == {"header line": 3, "footer": 2, "all common": 2}
    out = {
        r.doc_id: r.text
        for r in remove_common_lines(df, "doc_id", "text").collect()
    }
    assert out[1] == "body one" and out[2] == "body two"  # original case kept
    assert out[3] == "unique text"  # trim-matched, removed
    assert out[4] == "" and out[5] == "solo"
    assert out[6] is None and out[7] == ""
    out2 = {
        r.doc_id: r.text
        for r in remove_common_lines(
            df, "doc_id", "text", hash_join=False
        ).collect()
    }
    assert out == out2


def test_remove_common_lines_custom_delim_and_out_col(spark):
    from datasketches_spark.pipeline.spans import remove_common_lines

    df = spark.createDataFrame(
        [(1, "dup|keep1"), (2, "dup|keep2"), (3, "solo only")],
        "doc_id bigint, text string",
    )
    out = remove_common_lines(
        df, "doc_id", "text", delim="|", out_col="clean"
    )
    rows = {r.doc_id: (r.text, r.clean) for r in out.collect()}
    assert rows[1] == ("dup|keep1", "keep1")
    assert rows[2] == ("dup|keep2", "keep2")
    assert rows[3] == ("solo only", "solo only")


def test_common_lines_min_docs_validation(spark):
    from datasketches_spark.pipeline.spans import (
        common_lines,
        remove_common_lines,
    )

    df = spark.createDataFrame([(1, "a")], "doc_id bigint, text string")
    import pytest as _pt

    with _pt.raises(ValueError, match="min_docs"):
        common_lines(df, "doc_id", "text", min_docs=1)
    with _pt.raises(ValueError, match="min_docs"):
        remove_common_lines(df, "doc_id", "text", min_docs=0)


def test_remove_common_lines_plan_is_jvm_only(spark):
    from datasketches_spark.pipeline.spans import remove_common_lines

    df = spark.createDataFrame([(1, "a\nb")], "doc_id bigint, text string")
    plan = (
        remove_common_lines(df, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert marker not in plan


# --------------------------------------------------- stored counts route


def test_counts_table_route_matches_direct(spark, tmp_path):
    from datasketches_spark.pipeline.spans import (
        duplicate_spans,
        strip_duplicate_spans,
        upsert_ngram_counts,
        write_ngram_counts,
    )

    df = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "intro words then the quick brown fox jumps over the lazy dog"),
            (3, "completely different text with no overlap at all here now"),
            (4, "the quick brown fox jumps over the lazy dog again ok"),
        ],
    )
    path = str(tmp_path / "ngc")
    # incremental: docs 1-2 at write time, 3-4 arrive later
    write_ngram_counts(df.filter("doc_id <= 2"), "doc_id", "text", path, n=8)
    upsert_ngram_counts(df.filter("doc_id > 2"), "doc_id", "text", path, n=8)

    direct = duplicate_spans(df, "doc_id", "text", n=8, min_count=2)
    stored = duplicate_spans(df, "doc_id", "text", n=8, min_count=2, counts=path)
    key = lambda r: (r.doc_id, r.span_start)  # noqa: E731
    assert sorted(map(tuple, direct.collect()), key=lambda t: t[:2]) == sorted(
        map(tuple, stored.collect()), key=lambda t: t[:2]
    )
    s1 = strip_duplicate_spans(df, "doc_id", "text", n=8, min_count=2)
    s2 = strip_duplicate_spans(
        df, "doc_id", "text", n=8, min_count=2, counts=path
    )
    assert sorted(map(tuple, s1.collect())) == sorted(map(tuple, s2.collect()))


def test_counts_table_validation(spark, tmp_path):
    from datasketches_spark.pipeline.spans import (
        duplicate_spans,
        write_ngram_counts,
    )

    df = _docs(spark, [(1, "a b c d e f g h i j")])
    path = str(tmp_path / "ngc2")
    write_ngram_counts(df, "doc_id", "text", path, n=8)
    with pytest.raises(ValueError, match="written at n=8"):
        duplicate_spans(df, "doc_id", "text", n=10, counts=path)
    with pytest.raises(ValueError, match="distinct-document"):
        duplicate_spans(
            df, "doc_id", "text", n=8, min_docs=2, counts=path
        )
    with pytest.raises(ValueError, match="xxhash64-keyed"):
        duplicate_spans(
            df, "doc_id", "text", n=8, hash_join=False, counts=path
        )


def test_approx_facade_span_wrappers(spark):
    from datasketches_spark import approx

    df = _docs(spark, [(1, "a b c d a b c d"), (2, "x\ny"), (3, "x\nz")])
    out = {r.doc_id: r.text
           for r in approx.strip_repeats(df, "doc_id", "text", n=4).collect()}
    assert out[1] == ""
    bp = {r.doc_id: r.text
          for r in approx.remove_boilerplate(df, "doc_id", "text").collect()}
    assert bp[2] == "y" and bp[3] == "z"


def test_compact_ngram_counts_preserves_answers(spark, tmp_path):
    from datasketches_spark.pipeline.spans import (
        compact_ngram_counts,
        duplicate_spans,
        upsert_ngram_counts,
        write_ngram_counts,
    )

    df = _docs(
        spark,
        [(i, "shared span tokens here body alpha beta gamma "
             f"tail{i} more words") for i in range(8)],
    )
    path = str(tmp_path / "ngc3")
    write_ngram_counts(df.filter("doc_id < 3"), "doc_id", "text", path, n=6)
    for lo in (3, 5):
        upsert_ngram_counts(
            df.filter(f"doc_id >= {lo} and doc_id < {lo + 2}"),
            "doc_id", "text", path, n=6,
        )
    upsert_ngram_counts(df.filter("doc_id >= 7"), "doc_id", "text", path, n=6)
    before = sorted(
        map(tuple, duplicate_spans(df, "doc_id", "text", n=6,
                                   min_count=2, counts=path).collect())
    )
    rows_before = spark.read.parquet(path).count()
    compact_ngram_counts(spark, path)
    rows_after = spark.read.parquet(path).count()
    assert rows_after < rows_before          # partials folded
    # distinct hashes unchanged, metadata survives, answers identical
    after = sorted(
        map(tuple, duplicate_spans(df, "doc_id", "text", n=6,
                                   min_count=2, counts=path).collect())
    )
    assert after == before and len(before) > 0
    # n mismatch still raises off the preserved metadata
    with pytest.raises(ValueError, match="written at n=6"):
        duplicate_spans(df, "doc_id", "text", n=8, counts=path)


def test_top_duplicate_ngrams_order_and_validation(spark):
    from datasketches_spark.pipeline.spans import top_duplicate_ngrams

    df = _docs(
        spark,
        [
            (1, "a b c x1 a b c x2 a b c"),   # "a b c" 3 times, 1 doc
            (2, "d e f y1 d e f"),            # "d e f" 2 times
            (3, "a b c once more here"),      # +1 occurrence, +1 doc
        ],
    )
    rows = top_duplicate_ngrams(df, "doc_id", "text", n=3, k=2).collect()
    assert [(r.ngram, r.n_occurrences, r.n_docs) for r in rows] == [
        ("a b c", 4, 2),
        ("d e f", 2, 1),
    ]
    with pytest.raises(ValueError, match="k must be"):
        top_duplicate_ngrams(df, "doc_id", "text", n=3, k=0)
    with pytest.raises(ValueError, match="min_count"):
        top_duplicate_ngrams(df, "doc_id", "text", n=3, min_count=1)


def test_normalize_text_options(spark):
    from datasketches_spark.pipeline.text import normalize_text

    df = spark.createDataFrame(
        [(1, "  Visit https://ex.com/a?b=1 NOW!!  it's   GREAT  ")],
        "id bigint, t string",
    )
    full = df.select(
        normalize_text(
            F.col("t"), strip_urls=True, strip_punct=True
        ).alias("x")
    ).first().x
    assert full == "visit <url> now it s great"
    keep_case = df.select(
        normalize_text(F.col("t"), lowercase=False).alias("x")
    ).first().x
    assert keep_case == "Visit https://ex.com/a?b=1 NOW!! it's GREAT"


def test_duplication_stats_merged_spans_never_double_count(spark):
    from datasketches_spark.pipeline.spans import duplication_stats

    df = _docs(
        spark,
        [
            (1, "a b c d a b c d"),     # overlapping repeats -> one span
            (2, "unique words only here"),
        ],
    )
    row = duplication_stats(df, "doc_id", "text", n=4, min_count=2).first()
    assert row.n_docs == 2 and row.docs_with_dups == 1
    assert row.total_tokens == 12
    assert row.dup_tokens == 8        # the merged [1,8] span, not 2x4+...
    assert abs(row.dup_fraction - 8 / 12) < 1e-12


def test_duplication_stats_zero_dups(spark):
    from datasketches_spark.pipeline.spans import duplication_stats

    df = _docs(spark, [(1, "w1 w2 w3 w4 w5"), (2, "x1 x2 x3 x4 x5")])
    row = duplication_stats(df, "doc_id", "text", n=4, min_count=2).first()
    assert row.docs_with_dups == 0 and row.dup_tokens == 0
    assert row.dup_fraction == 0.0
