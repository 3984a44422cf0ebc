"""Text analysis for training-data pipelines (SURVEY.md extensions):
language ID, quality scoring, token counting, document fingerprinting.

All pure column expressions — these run over every document of a 100 TB
corpus, so they must stay inside whole-stage codegen (no Python UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Tiny high-frequency function-word lists per language for the n-gram/
# stopword-ratio language heuristic. Deliberately small: at corpus scale
# the signal comes from relative counts, not list size.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "für"],
    "fr": ["le", "la", "les", "et", "est", "pour", "dans", "que", "une", "des"],
    "es": ["el", "la", "los", "las", "es", "para", "que", "una", "con", "por"],
}


def words(col: Column) -> Column:
    """Whitespace-ish word array of lowercased text."""
    return F.filter(
        F.split(F.lower(col), r"[^\p{L}\p{N}']+"), lambda w: w != ""
    )


def token_count(col: Column) -> Column:
    """Whitespace token count (the `wc -w` definition)."""
    return F.size(F.filter(F.split(col, r"\s+"), lambda w: w != ""))


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish token estimate: count of word/number/punctuation chunks via a
    GPT-style pre-tokenizer regex. Upper-bounds the true BPE count; useful
    as a fast budget estimator."""
    return F.size(
        F.regexp_extract_all(col, F.lit(r"[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s]"), 0)
    )


def lang_scores(col: Column) -> dict[str, Column]:
    ws = words(col)
    total = F.greatest(F.size(ws), F.lit(1))
    return {
        lang: F.size(F.filter(ws, lambda w: w.isin(*markers))) / total
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(col: Column, min_ratio: float = 0.02) -> Column:
    """Heuristic language ID: highest marker-word ratio wins; 'und'
    (undetermined) when no language clears ``min_ratio``.

    Expressed as greatest-of-structs so it compiles to one codegen stage.
    """
    scores = lang_scores(col)
    pairs = [
        F.struct(score.alias("score"), F.lit(lang).alias("lang"))
        for lang, score in sorted(scores.items())
    ]
    best = F.greatest(*pairs)
    return F.when(best["score"] >= min_ratio, best["lang"]).otherwise(F.lit("und"))


def quality_features(df: DataFrame, text_col: str) -> DataFrame:
    """Per-document quality features: length, word stats, punctuation and
    stopword ratios, plus a composite keep/drop heuristic (Gopher-rule
    flavored: C4/Gopher-style length and symbol filters)."""
    c = F.col(text_col)
    ws = words(c)
    n_chars = F.length(c)
    n_words = F.size(ws)
    mean_word_len = F.when(n_words > 0, (F.aggregate(ws, F.lit(0), lambda acc, w: acc + F.length(w)) / n_words)).otherwise(F.lit(0.0))
    n_punct = F.size(F.regexp_extract_all(c, F.lit(r"[^\w\s]"), 0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    en_stop = F.size(F.filter(ws, lambda w: w.isin(*LANG_MARKERS["en"])))
    stop_ratio = F.when(n_words > 0, en_stop / n_words).otherwise(F.lit(0.0))
    return df.select(
        "*",
        n_chars.alias("q_n_chars"),
        n_words.alias("q_n_words"),
        F.round(mean_word_len, 4).alias("q_mean_word_len"),
        F.round(punct_ratio, 4).alias("q_punct_ratio"),
        F.round(stop_ratio, 4).alias("q_stop_ratio"),
        (
            (n_words >= 5)
            & (mean_word_len >= 2)
            & (mean_word_len <= 12)
            & (punct_ratio <= 0.3)
        ).alias("q_keep"),
    )


def doc_fingerprint(col: Column) -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted distinct
    word set. Robust to whitespace/shuffling mutations; used for fuzzy
    exact-dedup (same bag of words)."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(words(col))), " "))
