"""Text-analysis operators for large-scale training-data pipelines.

All hot-path operators are pure Column expressions (JVM-side,
whole-stage codegen) -- no Python in the per-row path.  Heuristics are
deliberately simple and *exactly mirrorable in ANSI SQL* so the DuckDB
oracle can verify them value-for-value:

- token counting (whitespace tokenization + a BPE-ish regex variant)
- quality scoring (length / punctuation / stopword ratios)
- language ID (stopword-hit argmax with deterministic tie-break)
- document fingerprinting (md5 canonical hash + char-set Jaccard)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword lists; order matters for the tie-break
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "una", "es", "por"],
    "de": ["der", "die", "das", "und", "zu", "in", "ist", "ein", "mit", "von"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "une", "est", "pour"],
}


def tokens(col) -> Column:
    """Whitespace tokens of lower-cased text ('' -> empty array)."""
    c = F.trim(F.lower(col))
    return F.when(F.length(c) == 0, F.array().cast("array<string>")).otherwise(
        F.split(c, r"\s+")
    )


def token_count(col) -> Column:
    return F.size(tokens(col)).alias("n_tokens")


def bpe_ish_token_count(col) -> Column:
    """Sub-word-ish token count: splits on whitespace AND
    letter/digit/punctuation boundaries (a cheap BPE proxy)."""
    c = F.trim(col)
    pieces = F.split(c, r"\s+|(?<=[a-zA-Z])(?=[0-9])|(?<=[0-9])(?=[a-zA-Z])|(?=[^\w\s])")
    return F.size(F.filter(pieces, lambda p: F.length(p) > 0))


def punct_count(col) -> Column:
    """Number of non-alphanumeric, non-space characters (charclass kept
    engine-portable: computed as length delta after stripping)."""
    return F.length(col) - F.length(F.regexp_replace(col, "[^a-zA-Z0-9 ]", ""))


def stopword_hits(col, lang: str = "en") -> Column:
    words = STOPWORDS[lang]
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(arr, t)))


def quality_score(col) -> Column:
    """Deterministic 0..1 quality heuristic (SQL-mirrorable):

    0.4 * min(1, n_tokens/100) + 0.4 * min(1, 2*stop_ratio)
    + 0.2 * (1 - min(1, 5*punct_ratio)), rounded to 6 decimals.
    """
    n_tok = F.size(tokens(col)).cast("double")
    n_chars = F.length(col).cast("double")
    stop_ratio = stopword_hits(col, "en").cast("double") / F.greatest(n_tok, F.lit(1.0))
    punct_ratio = punct_count(col).cast("double") / F.greatest(n_chars, F.lit(1.0))
    score = (
        0.4 * F.least(F.lit(1.0), n_tok / 100.0)
        + 0.4 * F.least(F.lit(1.0), 2.0 * stop_ratio)
        + 0.2 * (1.0 - F.least(F.lit(1.0), 5.0 * punct_ratio))
    )
    return F.round(score, 6)


def lang_id(col) -> Column:
    """Stopword-hit argmax over {en, es, de, fr}; ties break in that
    order (en wins all-zero).  Deterministic, SQL-mirrorable."""
    en, es, de, fr = (stopword_hits(col, L) for L in ("en", "es", "de", "fr"))
    return (
        F.when((en >= es) & (en >= de) & (en >= fr), F.lit("en"))
        .when((es >= de) & (es >= fr), F.lit("es"))
        .when(de >= fr, F.lit("de"))
        .otherwise(F.lit("fr"))
    )


def doc_fingerprint(col) -> Column:
    """Canonical content fingerprint: md5 of lower-cased text with
    runs of whitespace collapsed.  Identical across engines."""
    return F.md5(F.regexp_replace(F.lower(col), r"\s+", " "))


def char_jaccard(a, b) -> Column:
    """Case-sensitive distinct-character Jaccard similarity --
    semantics identical to DuckDB's ``jaccard(s1, s2)`` for
    cross-engine verification."""
    ca = F.array_remove(F.array_distinct(F.split(a, "")), "")
    cb = F.array_remove(F.array_distinct(F.split(b, "")), "")
    inter = F.size(F.array_intersect(ca, cb)).cast("double")
    union = F.size(F.array_union(ca, cb)).cast("double")
    return inter / union


def oracle_token_count_sql(text: str = "text") -> str:
    """DuckDB mirror of token_count()."""
    t = f"trim(lower({text}))"
    return f"CASE WHEN length({t}) = 0 THEN 0 ELSE len(string_split_regex({t}, '\\s+')) END"


def oracle_stop_hits_sql(lang: str, text: str = "text") -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    t = f"trim(lower({text}))"
    return (
        f"CASE WHEN length({t}) = 0 THEN 0 ELSE "
        f"len(list_filter(string_split_regex({t}, '\\s+'), "
        f"x -> list_contains([{words}], x))) END"
    )


def oracle_quality_score_sql(text: str = "text") -> str:
    n_tok = f"({oracle_token_count_sql(text)})::DOUBLE"
    punct = f"(length({text}) - length(regexp_replace({text}, '[^a-zA-Z0-9 ]', '', 'g')))::DOUBLE"
    stop = f"({oracle_stop_hits_sql('en', text)})::DOUBLE"
    return (
        f"round(0.4 * least(1.0, {n_tok} / 100.0) "
        f"+ 0.4 * least(1.0, 2.0 * ({stop} / greatest({n_tok}, 1.0))) "
        f"+ 0.2 * (1.0 - least(1.0, 5.0 * ({punct} / greatest(length({text})::DOUBLE, 1.0)))), 6)"
    )


def oracle_lang_id_sql(text: str = "text") -> str:
    en = oracle_stop_hits_sql("en", text)
    es = oracle_stop_hits_sql("es", text)
    de = oracle_stop_hits_sql("de", text)
    fr = oracle_stop_hits_sql("fr", text)
    return (
        f"CASE WHEN ({en}) >= ({es}) AND ({en}) >= ({de}) AND ({en}) >= ({fr}) THEN 'en' "
        f"WHEN ({es}) >= ({de}) AND ({es}) >= ({fr}) THEN 'es' "
        f"WHEN ({de}) >= ({fr}) THEN 'de' ELSE 'fr' END"
    )


def oracle_fingerprint_sql(text: str = "text") -> str:
    return f"md5(regexp_replace(lower({text}), '\\s+', ' ', 'g'))"
