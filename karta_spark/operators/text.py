"""Text analysis operators for the documents table (training-data pipeline).

All hot-path expressions are pure Catalyst (length / regexp / split — JVM,
codegen'd); the heuristics are deliberately simple and deterministic so they
are oracle-expressible in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "fr": ("le", "la", "les", "et", "est", "dans", "que", "pour"),
}

_PUNCT = "[.,;:!?'\"()\\[\\]{}-]"


def token_count(col: Column) -> Column:
    """Whitespace token count; empty/blank strings count 0."""
    t = F.trim(col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def char_count(col: Column) -> Column:
    return F.length(col)


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are common ASCII punctuation."""
    removed = F.length(F.regexp_replace(col, _PUNCT, ""))
    return F.when(F.length(col) == 0, F.lit(0.0)).otherwise(
        (F.length(col) - removed).cast("double") / F.length(col))


def upper_ratio(col: Column) -> Column:
    removed = F.length(F.regexp_replace(col, "[A-Z]", ""))
    return F.when(F.length(col) == 0, F.lit(0.0)).otherwise(
        (F.length(col) - removed).cast("double") / F.length(col))


def digit_ratio(col: Column) -> Column:
    removed = F.length(F.regexp_replace(col, "[0-9]", ""))
    return F.when(F.length(col) == 0, F.lit(0.0)).otherwise(
        (F.length(col) - removed).cast("double") / F.length(col))


def stopword_hits(col: Column, lang: str = "en") -> Column:
    """Number of stopword occurrences (word-boundary matches, lowercased)."""
    lower = F.lower(col)
    total = F.lit(0)
    for w in STOPWORDS[lang]:
        pat = r"\b" + w + r"\b"
        # occurrences = (len - len(without)) / len(word); word-boundary safe
        cnt = (F.length(lower) - F.length(F.regexp_replace(lower, pat, ""))) / len(w)
        total = total + cnt.cast("int")
    return total


def mean_token_len(col: Column) -> Column:
    t = F.trim(col)
    no_space = F.length(F.regexp_replace(t, r"\s+", ""))
    return F.when(token_count(col) == 0, F.lit(0.0)).otherwise(
        no_space.cast("double") / token_count(col))


def quality_score(col: Column) -> Column:
    """Deterministic [0,1] quality heuristic: rewards moderate length and
    wordiness, penalizes punctuation/digit soup. (Gopher-rules-style
    filters, reduced to oracle-expressible arithmetic.)"""
    ntok = token_count(col)
    len_score = F.least(ntok.cast("double") / 100.0, F.lit(1.0))
    mtl = mean_token_len(col)
    token_ok = F.when((mtl >= 3.0) & (mtl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.5))
    clean = F.lit(1.0) - F.least(punct_ratio(col) * 4.0 + digit_ratio(col) * 2.0, F.lit(1.0))
    return (len_score * 0.4 + token_ok * 0.3 + clean * 0.3)


def lang_id(col: Column) -> Column:
    """Argmax of per-language stopword hits; ties + zero -> 'unknown'."""
    scores = {lang: stopword_hits(col, lang) for lang in STOPWORDS}
    best = F.greatest(*scores.values())
    out = F.lit("unknown")
    # later branches win ties in reverse order -> apply in fixed order, first wins
    for lang in reversed(list(STOPWORDS)):
        out = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(out)
    return out


def fingerprint(col: Column) -> Column:
    """64-bit document fingerprint over normalized text (lowercase,
    whitespace collapsed) — xxhash64, JVM-side."""
    norm = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.xxhash64(norm)


def text_profile(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One row per document with the full feature set."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        token_count(c).alias("n_tokens"),
        char_count(c).alias("n_chars"),
        F.round(punct_ratio(c), 6).alias("punct_ratio"),
        F.round(upper_ratio(c), 6).alias("upper_ratio"),
        F.round(digit_ratio(c), 6).alias("digit_ratio"),
        F.round(mean_token_len(c), 6).alias("mean_token_len"),
        F.round(quality_score(c), 6).alias("quality"),
        lang_id(c).alias("lang_pred"),
        fingerprint(c).alias("fingerprint"),
    )
